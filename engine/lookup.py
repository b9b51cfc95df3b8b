"""Broadcast lookups / joins (J1, SURVEY 2.4).

The reference's only lookup is a point metadata fetch by id
(``file_repository.py:121-123``); the engine generalizes it to the
broadcast-small-side join: the dimension table is ``ray.put`` ONCE and
every map task reads it zero-copy from the local object store -- no
shuffle of the fact side, ever. This is the correct join shape whenever
one side fits in a node's memory (dimension tables, vocab, blocklists);
both-sides-large joins go through hash bucketing instead (see
engine.merge for the engine's one such shape).
"""

from __future__ import annotations

from typing import Optional

import numpy as np
import pandas as pd
import pyarrow as pa
import ray


def broadcast_join(
    ds,
    dim_df: pd.DataFrame,
    left_on: str,
    right_on: str,
    columns: Optional[list] = None,
    how: str = "inner",
):
    """Join a (large) Dataset against a (small) pandas dimension table.

    ``dim_df`` is broadcast once; each batch does a C-speed
    ``pd.merge``. ``columns`` restricts which dimension columns are
    attached. how='inner' drops unmatched fact rows; 'left' keeps them
    with nulls.
    """
    dim = dim_df if columns is None else dim_df[[right_on] + [c for c in columns if c != right_on]]
    dim_ref = ray.put(dim)

    def attach(df: pd.DataFrame) -> pd.DataFrame:
        d = ray.get(dim_ref)
        return df.merge(d, how=how, left_on=left_on, right_on=right_on)

    return ds.map_batches(attach, batch_format="pandas")


def broadcast_semi_join(ds, keys, col: str, anti: bool = False):
    """Keep (or drop, anti=True) rows whose ``col`` is in the broadcast
    key set -- the reference's admission filter generalized (M5)."""
    key_ref = ray.put(np.asarray(list(keys)))

    def filt(t: pa.Table) -> pa.Table:
        arr = t.column(col).to_numpy(zero_copy_only=False)
        mask = np.isin(arr, ray.get(key_ref))
        if anti:
            mask = ~mask
        return t.filter(pa.array(mask))

    return ds.map_batches(filt, batch_format="pyarrow", zero_copy_batch=True)
