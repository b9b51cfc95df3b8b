"""Hash-partitioned MERGE INTO (the engine's only join shape, SURVEY 2.4).

Semantics re-expressed from the reference's ``_group_records_by_id``
(``/root/reference/backend/app/services/csv_handler.py:66-97``):

- rows whose merge key is NULL/empty pass through un-merged (``:81-84``)
- the first row of a key anchors the output; later rows overwrite each
  field **only with non-empty values** (``:91-95``); the key itself is
  never overwritten (``:92-93``)
- "later" in the reference is positional row order; the engine orders by
  ``warc_ts`` (last-writer-wins), per BASELINE.json north_star.

Equivalently, per key and per column::

    result[col] = value-at-max-ts among rows where col is non-empty,
                  else value-at-min-ts  (the anchor's value, possibly empty)

Execution (Ray-Data-first, single pass over the input):

1. add ``__bucket = hash64(key) % B`` vectorized in ``map_batches``
   (B ~ 2-4x cluster cores; at 10^12 rows B is thousands -- each bucket
   must fit one worker's heap, which is the documented partitioning
   assumption of this operator); NULL/empty-key passthrough rows are
   spread round-robin across buckets instead of being split into a
   second branch, which would re-scan the input,
2. ``groupby("__bucket").map_groups(fold)`` -- ONE vectorized pandas fold
   per bucket (C-speed groupby inside), NOT one Python call per key;
   the fold passes NULL-key rows through unmerged.

Skew: the key is ``url`` (high cardinality), so bucket skew is
statistical, not semantic; hot buckets are bounded by raising B
(config.merge_buckets). This is the "salt hot keys" knob for MERGE.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc


def _is_missing_key(arr: pa.Array):
    return pc.or_kleene(pc.is_null(arr), pc.equal(pc.cast(arr, pa.string()), ""))


def _bucket_of(keys: pd.Series, num_buckets: int) -> np.ndarray:
    # deterministic-within-run 64-bit hash, C-vectorized
    h = pd.util.hash_array(keys.to_numpy(dtype=object), categorize=False)
    return (h % np.uint64(num_buckets)).astype(np.int64)


def _add_bucket(batch: pa.Table, key: str, num_buckets: int) -> pa.Table:
    """hash(key) % B for mergeable rows; NULL/empty keys (passthrough
    rows) are spread round-robin so no bucket becomes a null hotspot."""
    keys = batch.column(key).to_pandas()
    buckets = _bucket_of(keys.fillna(""), num_buckets)
    missing = keys.isna().to_numpy() | (keys == "").to_numpy()
    if missing.any():
        buckets[missing] = np.arange(missing.sum()) % num_buckets
    return batch.append_column("__bucket", pa.array(buckets))


def merge_fold(df: pd.DataFrame, key: str, ts: str) -> pd.DataFrame:
    """Vectorized LWW + non-empty-coalesce fold over one bucket.

    Runs pandas C kernels over *all* keys in the bucket at once.
    """
    if df.empty:
        return df
    df = df.sort_values(ts, kind="stable")
    value_cols = [c for c in df.columns if c != key]
    anchor = df.drop_duplicates(subset=[key], keep="first").set_index(key)

    masked = df.copy()
    for c in value_cols:
        col = masked[c]
        if col.dtype == object or pd.api.types.is_string_dtype(col):
            # empty string / empty bytes count as "missing" (csv_handler.py:91-95)
            empty = col.map(lambda v: v == "" or v == b"", na_action="ignore")
            empty = empty.fillna(False).astype(bool)
            masked[c] = col.where(col.notna() & ~empty)
    # groupby.last skips missing values -> "latest non-empty"
    last_nonempty = masked.groupby(key, sort=False).last()
    out = last_nonempty.fillna(anchor[value_cols])
    # all-missing columns fall back to the anchor's literal (possibly empty) value
    out = out.where(out.notna(), anchor[value_cols])
    return out.reset_index()[df.columns.tolist()]


def merge_datasets(
    ds,
    key: str = "url",
    ts: str = "warc_ts",
    num_buckets: int = 64,
):
    """MERGE INTO over a Dataset: one surviving row per non-null key,
    NULL/empty-key rows passed through unmerged. Output is unordered
    (row-set semantics, SURVEY 2.6 O3).

    Single-pass: NULL/empty-key rows are NOT split into a second branch
    (that would re-scan the input); they ride the same shuffle spread
    round-robin over buckets and the per-bucket fold passes them
    through untouched."""
    keyed = ds.map_batches(
        _add_bucket,
        batch_format="pyarrow",
        zero_copy_batch=True,
        fn_kwargs={"key": key, "num_buckets": num_buckets},
    )

    def fold(df: pd.DataFrame) -> pd.DataFrame:
        df = df.drop(columns=["__bucket"])
        null_mask = df[key].isna() | (df[key] == "")
        merged = merge_fold(df[~null_mask], key, ts)
        if null_mask.any():
            merged = pd.concat([merged, df[null_mask]], ignore_index=True)
        return merged

    return keyed.groupby("__bucket").map_groups(fold, batch_format="pandas")
