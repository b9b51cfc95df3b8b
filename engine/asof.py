"""As-of join: for each left row, the latest right row of the same key
with ``right_ts <= left_ts`` (the classic point-in-time join; a custom
operator Ray Data lacks, built per the documented pattern: hash-bucket
both sides by key, sort within bucket, ``pd.merge_asof`` per bucket).

Partitioning assumption (documented per the brief): all rows of one key
land in one bucket on BOTH sides (guaranteed by the shared key hash);
each bucket must fit a worker's heap -- size ``num_buckets`` like the
MERGE shuffle. Exchange volume: both sides move once.

Known limitation: the tagged-union pass converts each side's int64
columns to float64 where the other side contributes nulls, so raw int64
VALUES above 2^53 would lose precision through the fold (the final cast
back to int64 cannot restore lost bits). The tag pass therefore RAISES
on any 64-bit integer column whose values exceed 2^53 in magnitude
(silent rounding is a data-loss bug, not a limitation to document --
VERDICT r2 #8). Use timestamp dtypes for the ts columns (they
round-trip exactly); int64 ids up to 2^53 are exact.
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from engine.merge import _add_bucket

#: largest integer a float64 mantissa holds exactly
_F64_EXACT = 1 << 53


def _guard_i64_precision(t: pa.Table, ctx: str, key: str | None = None) -> None:
    """Raise on int64 columns whose values would round through the
    float64 union fold (pandas floats any int column that meets a null
    from the other side).

    The join KEY is populated on both sides, so it only floats when the
    data itself holds null keys -- a null-free key batch is exempt even
    beyond 2^53 (ADVICE r3: hash keys are a legitimate join key). The
    residual cross-batch case (nulls in one batch, huge values in
    another) is caught exactly where the conversion happens, by the
    per-bucket float-dtype check inside the fold."""
    for name in t.column_names:
        typ = t.schema.field(name).type
        if pa.types.is_integer(typ) and typ.bit_width == 64:
            arr = t.column(name)
            if name == key and arr.null_count == 0:
                continue
            mm = pc.min_max(arr)
            lo, hi = mm["min"].as_py(), mm["max"].as_py()
            if lo is None:
                continue
            if abs(lo) > _F64_EXACT or abs(hi) > _F64_EXACT:
                raise ValueError(
                    f"asof_join: {ctx} column {name!r} holds 64-bit integer "
                    f"values beyond 2^53 (min={lo}, max={hi}); they would "
                    "silently round through the float64 union fold. Cast the "
                    "column to timestamp (exact round-trip) or rescale ids."
                )


def asof_join(
    left,
    right,
    key: str,
    left_ts: str,
    right_ts: str,
    num_buckets: int = 32,
    suffix: str = "_r",
):
    """Left as-of join (backward): every left row kept; right columns
    null when no right row of that key precedes it.

    Implementation: tag sides, align to a superset schema, union, ONE
    bucket shuffle, per-bucket ``pd.merge_asof`` (C kernel) over the
    key-sorted frames.
    """
    from engine.jobs import align_to_schema

    lschema = left.schema()
    rschema = right.schema()
    ltypes = dict(zip(lschema.names, lschema.types))
    rtypes = dict(zip(rschema.names, rschema.types))
    right_value_cols = [n for n in rschema.names if n != key]
    out_right_names = {
        n: (n + suffix if n in lschema.names else n) for n in right_value_cols
    }
    clash = set(out_right_names.values()) & set(lschema.names)
    if clash:
        raise ValueError(
            f"asof_join output name collision (left already has {sorted(clash)}); "
            f"pass a different suffix"
        )
    if len(set(out_right_names.values())) != len(out_right_names):
        # right-internal collision: right has both 'x' (suffixed to
        # 'x_r') and a literal 'x_r' -- two fields would share one
        # output name and fail later with a confusing Arrow error
        dupes = sorted(
            v for v in out_right_names.values()
            if sum(1 for w in out_right_names.values() if w == v) > 1
        )
        raise ValueError(
            f"asof_join right-side columns collide after suffixing: {sorted(set(dupes))}; "
            f"pass a different suffix"
        )

    union_fields = [(n, ltypes[n]) for n in lschema.names]
    for n in right_value_cols:
        union_fields.append((out_right_names[n], rtypes[n]))
    union_schema = pa.schema(union_fields + [("__side", pa.int8())])
    data_schema = union_schema.remove(union_schema.get_field_index("__side"))

    def align_and_tag(side, rename):
        def f(t: pa.Table) -> pa.Table:
            if rename:
                t = t.rename_columns([out_right_names.get(n, n) for n in t.column_names])
            _guard_i64_precision(t, "right" if rename else "left", key=key)
            out = align_to_schema(t, data_schema)
            return out.append_column("__side", pa.array([side] * len(out), pa.int8()))

        return f

    tagged = left.map_batches(align_and_tag(0, False), batch_format="pyarrow").union(
        right.map_batches(align_and_tag(1, True), batch_format="pyarrow")
    )
    keyed = tagged.map_batches(
        _add_bucket,
        batch_format="pyarrow",
        zero_copy_batch=True,
        fn_kwargs={"key": key, "num_buckets": num_buckets},
    )

    rts_out = out_right_names.get(right_ts, right_ts)
    out_cols = [n for n, _ in union_fields]

    def _unmatched(l: pd.DataFrame) -> pd.DataFrame:
        out = l.copy()
        for n in right_value_cols:
            out[out_right_names[n]] = None
        return out[out_cols]

    key_is_i64 = pa.types.is_integer(ltypes[key]) and ltypes[key].bit_width == 64

    def fold(df: pd.DataFrame) -> pd.DataFrame:
        df = df.drop(columns=["__bucket"])
        # exact residual guard for the key: if nulls anywhere in this
        # bucket floated a declared-int64 key, values beyond 2^53 are
        # already lossy here -- raise at the exact site
        if key_is_i64 and df[key].dtype.kind == "f":
            import numpy as np

            vals = df[key].to_numpy()
            # >= not >: the values are ALREADY floated here, so a true
            # int64 of 2^53+1 has rounded to exactly 2^53 and is
            # indistinguishable from a genuine 2^53 -- the only sound
            # option at the boundary is a conservative raise
            if np.nanmax(np.abs(vals), initial=0.0) >= float(_F64_EXACT):
                raise ValueError(
                    f"asof_join: key column {key!r} holds null keys AND "
                    "int64 values beyond 2^53 in one bucket; the float64 "
                    "conversion forced by the nulls is lossy. Rescale ids "
                    "or drop null-key rows first."
                )
        l = df[df["__side"] == 0][list(lschema.names)].sort_values(left_ts, kind="stable")
        r_cols = [key] + [out_right_names[n] for n in right_value_cols]
        r = df[df["__side"] == 1][r_cols]
        # deterministic tie order among duplicate (key, right_ts) rows:
        # merge_asof(backward) attaches the LAST equal-ts row, and a
        # ts-only stable sort preserves Ray block-arrival order -- the
        # winner would flip across runs. Sorting by the value columns
        # too pins "greatest row wins"; unorderable value types fall
        # back to ts-only (documented best-effort) rather than crash.
        tie_cols = [c for c in r_cols if c != rts_out]
        try:
            r = r.sort_values(tie_cols, kind="stable")
        except TypeError:
            pass  # unorderable value type: ts-only order (best effort)
        r = r.sort_values(rts_out, kind="stable")
        if l.empty:
            return pd.DataFrame(columns=out_cols)
        # SQL join semantics: NULLs never match. pd.merge_asof would
        # happily match NaN by-keys and RAISES on null timestamps, so
        # null-key/null-ts left rows pass through unmatched and
        # null-key/null-ts right rows are dropped.
        l_bad = l[key].isna() | (l[key] == "") | l[left_ts].isna()
        r_ok = r[~(r[key].isna() | (r[key] == "") | r[rts_out].isna())]
        l_ok = l[~l_bad]
        parts = []
        if l_bad.any():
            parts.append(_unmatched(l[l_bad]))
        if not l_ok.empty:
            if r_ok.empty:
                parts.append(_unmatched(l_ok))
            else:
                parts.append(
                    pd.merge_asof(
                        l_ok, r_ok, left_on=left_ts, right_on=rts_out, by=key,
                        direction="backward",
                    )[out_cols]
                )
        return pd.concat(parts, ignore_index=True) if parts else pd.DataFrame(columns=out_cols)

    joined = keyed.groupby("__bucket").map_groups(fold, batch_format="pandas")
    # the union pass floats int columns (nulls on the other side); cast
    # the result back to the declared schema
    return joined.map_batches(
        lambda t: align_to_schema(t, data_schema), batch_format="pyarrow"
    )
