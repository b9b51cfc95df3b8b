"""Partial+final aggregation combinators (A2/A3/A4, SURVEY 2.5) and the
distributed versions of the reference's sample aggregates.

The pattern: ``map_batches`` emits one tiny partial row per batch
(counts, counters, (matched, total) pairs), a ``groupby``/driver step
folds the partials. Rows shuffled = O(batches), not O(rows).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from engine.infer import ALPHA


def pattern_score_distributed(ds, width_col: str) -> float:
    """A2 at scale: P = (1/K) * sum_k N_k * max(alpha, L_k-1)/L_k over
    the global row-width histogram, computed as per-batch value_counts ->
    groupby(width).sum (the histogram is tiny: K distinct widths)."""

    def partial(t: pa.Table) -> pa.Table:
        vc = pc.value_counts(t.column(width_col).combine_chunks())
        return pa.table(
            {
                "width": vc.field("values").cast(pa.int64()),
                "n": vc.field("counts").cast(pa.int64()),
            }
        )

    hist = (
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("width")
        .sum("n")
        .to_pandas()
    )
    if hist.empty:
        return 0.0
    # zero-width rows raise ZeroDivisionError like infer.pattern_score
    # (reference parity: a blank row disqualifies the candidate)
    widths = hist["width"].to_numpy()
    if (widths == 0).any():
        raise ZeroDivisionError("division by zero")
    score = float(
        (hist["sum(n)"].to_numpy() * np.maximum(ALPHA, widths - 1) / widths).sum()
    )
    return score / len(hist)


def ratio_distributed(partials_ds, num_col: str, den_col: str) -> float:
    """Final step of the A3 partial+final pattern: ``partials_ds`` must
    already be per-batch partial rows (one (numerator, denominator) row
    per batch, e.g. produced like ``__ray_entry__._q_type_score``), so
    materializing it is O(batches), not O(rows)."""
    parts = partials_ds.to_pandas()
    den = parts[den_col].sum()
    return float(parts[num_col].sum() / den) if den else 0.0


def null_safe_key(arr):
    """The ONE null-safe composite-key encode shared by every grouped
    aggregate (group_count_null_safe, grouped_sum_count,
    skew.salted_group_count, the stats_minmax query): Ray's sort-based
    groupby cannot compare ``None``, so NULL keys are encoded as
    ``(type-zero fill, __isnull=1)`` -- collision-free (a genuine
    ""/0/epoch key has ``__isnull=0``) and single-typed. Arrow-side on
    purpose: a pandas ``fillna`` path floats int64 keys in any
    null-bearing batch, silently rounding values beyond 2^53 and
    splitting one key into two groups (e.g. microsecond window labels).
    Returns ``(filled_key_array, isnull_int64_array)``."""
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    kt = arr.type
    if pa.types.is_string(kt) or pa.types.is_large_string(kt):
        fill = pa.scalar("", type=kt)
    elif pa.types.is_binary(kt) or pa.types.is_large_binary(kt):
        fill = pa.scalar(b"", type=kt)
    else:
        fill = pa.scalar(0, type=kt)  # int / float / timestamp / duration
    return pc.fill_null(arr, fill), pc.is_null(arr).cast(pa.int64())


def restore_null_key(agg: pd.DataFrame, col: str) -> pd.DataFrame:
    """Invert :func:`null_safe_key` on a (tiny) final frame: rows with
    ``__isnull == 1`` get their key set back to None. When a NULL group
    exists the key column goes through object dtype, NOT float -- a
    float round-trip would corrupt int64 keys beyond 2^53."""
    if (agg["__isnull"] != 0).any():
        agg[col] = agg[col].astype(object).where(agg["__isnull"] == 0, other=None)
    return agg.drop(columns="__isnull")


def group_count_null_safe(ds, col: str, out_col: str = "n") -> pd.DataFrame:
    """Grouped ``count(*)`` tolerating NULL keys (SQL semantics: NULL is
    one group). Arrow pre-aggregation per batch (combiner: rows shuffled
    = O(keys x batches)), distributed final groupby on the null-free
    composite, NULL restored on the result."""

    def partial(t: pa.Table) -> pa.Table:
        filled, isnull = null_safe_key(t.column(col))
        comp = pa.table({col: filled, "__isnull": isnull})
        return comp.group_by([col, "__isnull"]).aggregate([([], "count_all")])

    parts = ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
    agg = parts.groupby([col, "__isnull"]).sum("count_all").to_pandas()
    if col not in agg.columns:  # empty input: Ray drops empty blocks
        return pd.DataFrame({col: pd.Series(dtype=object), out_col: pd.Series(dtype="int64")})
    agg = restore_null_key(agg, col)
    return pd.DataFrame({col: agg[col], out_col: agg["sum(count_all)"].astype("int64")})


def grouped_sum_count(ds, key: str, value_col: str):
    """Pre-aggregated grouped sum+count: per-batch Arrow group_by emits
    one partial row per key per batch; the exchange then moves partials
    only (combiner before shuffle, SURVEY 4.2).

    SQL semantics throughout: NULL keys form ONE group (null_safe_key
    composite); ``n`` is ``count(*)`` (rows, not non-null values);
    ``sum`` skips NULL values, is NULL -- not 0 -- for an all-NULL
    group, and propagates NaN (a NaN is a value, like SQL)."""

    def partial(t: pa.Table) -> pa.Table:
        filled, isnull = null_safe_key(t.column(key))
        comp = pa.table({key: filled, "__isnull": isnull, "__v": t.column(value_col)})
        return comp.group_by([key, "__isnull"]).aggregate(
            [("__v", "sum"), ("__v", "count"), ([], "count_all")]
        )

    partials = ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
    agg = (
        partials.groupby([key, "__isnull"])
        .sum(["__v_sum", "__v_count", "count_all"])
        .to_pandas()
    )
    if key not in agg.columns:  # empty input: Ray drops empty blocks
        return pd.DataFrame(
            {
                key: pd.Series(dtype=object),
                "sum_value": pd.Series(dtype="float64"),
                "n": pd.Series(dtype="int64"),
            }
        )
    agg = restore_null_key(agg, key)
    return pd.DataFrame(
        {
            key: agg[key],
            "sum_value": agg["sum(__v_sum)"].where(agg["sum(__v_count)"] > 0, other=np.nan),
            "n": agg["sum(count_all)"].astype("int64"),
        }
    )
