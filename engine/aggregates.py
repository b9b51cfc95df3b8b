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


def group_count_null_safe(ds, col: str, out_col: str = "n") -> pd.DataFrame:
    """Grouped count that tolerates NULL keys. Ray's sort-based groupby
    cannot compare ``None`` with a string (``'<' not supported``), so a
    NULL-keyed corpus crashes ``ds.groupby(col).count()`` outright. Here
    each batch pre-aggregates onto the composite ``(fillna(''), __isnull)``
    key -- collision-free (a true ``''`` has ``__isnull=0``) and
    NULL-free, so the distributed final groupby works -- then NULL is
    restored on the (tiny) result. Rows shuffled = O(keys x batches),
    the combiner pattern, not O(rows). SQL semantics: NULL is one group
    (matches ``GROUP BY col``)."""

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        s = df[col]
        comp = pd.DataFrame({col: s.fillna(""), "__isnull": s.isna().astype("int64")})
        g = comp.groupby([col, "__isnull"], as_index=False, sort=False).size()
        return g.rename(columns={"size": "__pn"})

    parts = ds.map_batches(partial, batch_format="pandas")
    agg = parts.groupby([col, "__isnull"]).sum("__pn").to_pandas()
    out = pd.DataFrame(
        {
            col: agg[col].where(agg["__isnull"] == 0, other=None),
            out_col: agg["sum(__pn)"].astype("int64"),
        }
    )
    return out


def grouped_sum_count(ds, key: str, value_col: str):
    """Pre-aggregated grouped sum+count: per-batch pandas groupby emits
    one partial row per key per batch; the exchange then moves partials
    only (combiner before shuffle, SURVEY 4.2).

    SQL semantics throughout: NULL keys form ONE group (pandas groupby
    silently drops them and Ray's sort can't compare None, hence the
    fillna('')+__isnull composite); ``n`` is ``count(*)`` (rows, not
    non-null values); ``sum`` skips NULL values but is NULL -- not 0 --
    for an all-NULL group."""

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        s = df[key]
        # dtype-aware null fill: ""/0/epoch so the composite stays
        # single-typed (a mixed object column would crash the Ray sort)
        if s.dtype.kind in "mM":
            fill = pd.Timestamp(0, tz=getattr(s.dtype, "tz", None))
        elif s.dtype == object:
            fill = ""
        else:
            fill = 0
        comp = pd.DataFrame(
            {key: s.fillna(fill), "__isnull": s.isna().astype("int64"), "__v": df[value_col]}
        )
        g = comp.groupby([key, "__isnull"], as_index=False, sort=False).agg(
            __psum=("__v", "sum"), __pn=("__v", "size"), __pnn=("__v", "count")
        )
        return g

    partials = ds.map_batches(partial, batch_format="pandas")
    agg = (
        partials.groupby([key, "__isnull"])
        .sum(["__psum", "__pn", "__pnn"])
        .to_pandas()
    )
    out = pd.DataFrame(
        {
            key: agg[key].where(agg["__isnull"] == 0, other=None),
            "sum_value": agg["sum(__psum)"].where(agg["sum(__pnn)"] > 0, other=np.nan),
            "n": agg["sum(__pn)"].astype("int64"),
        }
    )
    return out
