"""Exact distributed quantiles by multi-pass selection (no global sort).

``quantile_disc(ds, col, qs)`` returns the exact discrete quantiles of a
numeric column with DuckDB/Postgres ``quantile_disc``/``percentile_disc``
semantics: the value at 1-indexed rank ``ceil(q * n)`` of the non-NULL
values in ascending order (verified empirically against DuckDB in
tests). ``quantile_cont`` linearly interpolates at index ``q * (n - 1)``
(DuckDB ``quantile_cont``).

Why not ``ds.sort(col)``: a full range-partition sort moves every byte
of the dataset through an all-to-all exchange to answer a question
whose result is O(len(qs)) scalars. The classic distributed-selection
alternative used here streams the data a small constant number of
times and moves only per-batch summaries:

  pass 1  count non-NULL values; per-batch strided *sorted* sample of
          candidate splitters (evenly spaced batch quantiles), thinned
          through one map_batches fold so the driver never holds
          O(batches) lists;
  pass 2  one histogram pass: every value maps to a candidate interval
          via ``np.searchsorted`` (vectorized); per-batch nonzero
          (interval, count) partials fold through a Ray groupby -- the
          exchange moves O(intervals x batches) tiny rows;
  pass 3  fetch ONLY the bracket intervals containing the target ranks
          (expected size ~ n / n_candidates per bracket) and select the
          exact rank offsets driver-side.

If skew makes a bracket exceed ``bracket_limit``, extra splitters are
sampled from inside the oversized intervals and pass 2 repeats -- each
refinement shrinks brackets geometrically, so the number of passes is
O(log_S n) with S candidates (2-3 passes at 100 TB).

NaN handling matches DuckDB ordering: NaN sorts after every number
(``np.searchsorted`` places NaN past every finite candidate and
``np.sort`` places it last), so quantiles of NaN-bearing columns agree
with the SQL oracle. NULLs are excluded on both sides (SQL aggregate
semantics). int64 columns never pass through float64 -- values beyond
2^53 stay exact (CLAUDE.md key-hash/precision invariant family).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def _valid_numpy(arr) -> np.ndarray:
    """Non-NULL values of an Arrow numeric array as a native-dtype
    numpy array (int stays int: no silent float64 widening)."""
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    return arr.drop_null().to_numpy(zero_copy_only=False)


def _candidates(ds, col: str, per_batch: int, cap: int) -> tuple[int, np.ndarray]:
    """Pass 1: total non-NULL count + a thinned, sorted, deduplicated
    global candidate array (<= cap values)."""

    def partial(t: pa.Table) -> pa.Table:
        vt = t.schema.field(col).type
        v = _valid_numpy(t.column(col))
        n = len(v)
        if n:
            s = np.sort(v)
            step = max(1, n // per_batch)
            sample = s[:: step]
        else:
            sample = v
        return pa.table(
            {
                "n": pa.array([n], type=pa.int64()),
                # explicit list type: an empty batch must not degrade the
                # union schema to list<null>
                "cands": pa.array([sample.tolist()], type=pa.list_(vt)),
            }
        )

    parts = ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)

    def thin(t: pa.Table) -> pa.Table:
        lt = t.schema.field("cands").type
        ns = t.column("n").to_numpy(zero_copy_only=False)
        flat = t.column("cands").combine_chunks().flatten().to_numpy(
            zero_copy_only=False
        )
        u = np.unique(flat)  # sorted
        if len(u) > cap:
            u = u[:: len(u) // cap + 1]
        return pa.table(
            {
                "n": pa.array([int(ns.sum())], type=pa.int64()),
                "cands": pa.array([u.tolist()], type=lt),
            }
        )

    # one fold level bounds the driver at O(fold_blocks x cap), not
    # O(batches x per_batch)
    folded = parts.map_batches(thin, batch_format="pyarrow").to_pandas()
    if folded.empty:
        return 0, np.array([])
    n = int(folded["n"].sum())
    flat = np.concatenate([np.asarray(c) for c in folded["cands"]]) if len(folded) else np.array([])
    u = np.unique(flat)
    if len(u) > cap:
        u = u[:: len(u) // cap + 1]
    return n, u


def _interval_counts(ds, col: str, cands: np.ndarray) -> np.ndarray:
    """Pass 2: count of values per candidate interval
    (id = #{cands <= v}, ids 0..len(cands))."""
    import ray

    ref = ray.put(cands)

    def hist(t: pa.Table) -> pa.Table:
        c = ray.get(ref)
        v = _valid_numpy(t.column(col))
        ids = np.searchsorted(c, v, side="right")
        cnt = np.bincount(ids, minlength=len(c) + 1)
        nz = np.flatnonzero(cnt)
        return pa.table(
            {
                "id": pa.array(nz.astype(np.int64)),
                "cnt": pa.array(cnt[nz].astype(np.int64)),
            }
        )

    agg = (
        ds.map_batches(hist, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("id")
        .sum("cnt")
        .to_pandas()
    )
    out = np.zeros(len(cands) + 1, dtype=np.int64)
    if "id" in agg.columns and len(agg):
        out[agg["id"].to_numpy()] = agg["sum(cnt)"].to_numpy()
    return out


def _bracket_values(ds, col: str, cands: np.ndarray, needed: np.ndarray) -> dict:
    """Pass 3: values of the needed intervals, one dict id -> sorted
    numpy array. Bounded by the (refined) bracket sizes."""
    import ray

    cref, nref = ray.put(cands), ray.put(np.sort(needed))

    def pick(t: pa.Table) -> pa.Table:
        c, nd = ray.get(cref), ray.get(nref)
        v = _valid_numpy(t.column(col))
        ids = np.searchsorted(c, v, side="right")
        m = np.isin(ids, nd)
        return pa.table({"id": pa.array(ids[m].astype(np.int64)), "v": pa.array(v[m])})

    got = ds.map_batches(pick, batch_format="pyarrow", zero_copy_batch=True).to_pandas()
    out: dict[int, np.ndarray] = {}
    if got.empty:
        return out
    for i, g in got.groupby("id"):
        out[int(i)] = np.sort(g["v"].to_numpy())
    return out


def _select_ranks(
    ds,
    col: str,
    ranks: list[int],
    n: int,
    cands: np.ndarray,
    *,
    bracket_limit: int = 4_000_000,
    max_refine: int = 4,
) -> dict[int, object]:
    """Exact values at the given 1-indexed ranks of the non-NULL values
    of ``col``, given the pass-1 result (n, candidate splitters).
    Returns {clamped_rank: value}."""
    ranks = [min(max(r, 1), n) for r in ranks]
    refines = 0
    while True:
        counts = _interval_counts(ds, col, cands)
        cum = np.cumsum(counts)
        target = {r: int(np.searchsorted(cum, r, side="left")) for r in ranks}
        needed = np.unique(list(target.values()))
        big = needed[counts[needed] > bracket_limit]
        if len(big) == 0 or refines >= max_refine:
            break
        # skewed bracket: split every oversized needed interval by
        # sampling extra splitters from inside it (one extra pass),
        # then re-histogram -- brackets shrink geometrically
        refines += 1
        vals = _bracket_values(ds, col, cands, big)
        extra = []
        for i in big:
            v = vals.get(int(i))
            if v is not None and len(v):
                step = max(1, len(v) // 64)
                extra.append(v[::step])
        if not extra:
            break
        new = np.unique(np.concatenate([cands, *extra]))
        if len(new) == len(cands):  # no new splitters: one giant tie
            break
        cands = new
    vals = _bracket_values(ds, col, cands, needed)
    out = {}
    for r in ranks:
        i = target[r]
        before = int(cum[i - 1]) if i > 0 else 0
        out[r] = vals[i][r - before - 1].item()
    return out


def quantile_disc(
    ds,
    col: str,
    qs,
    *,
    candidates_per_batch: int = 1024,
    max_candidates: int = 65536,
    **kw,
) -> list:
    """Exact discrete quantiles (value at rank ``ceil(q*n)``), NULLs
    excluded -- DuckDB ``quantile_disc`` semantics. Returns one scalar
    per q (None on empty input)."""
    qs = list(qs)
    n, cands = _candidates(ds, col, candidates_per_batch, max_candidates)
    if n == 0:
        return [None] * len(qs)
    ranks = [min(max(int(np.ceil(q * n)), 1), n) for q in qs]
    got = _select_ranks(ds, col, ranks, n, cands, **kw)
    return [got[r] for r in ranks]


def quantile_cont(
    ds,
    col: str,
    qs,
    *,
    candidates_per_batch: int = 1024,
    max_candidates: int = 65536,
    **kw,
) -> list:
    """Linearly interpolated quantiles at index ``q*(n-1)`` (DuckDB
    ``quantile_cont``), NULLs excluded."""
    qs = list(qs)
    n, cands = _candidates(ds, col, candidates_per_batch, max_candidates)
    if n == 0:
        return [None] * len(qs)
    ranks, pos = [], []
    for q in qs:
        x = q * (n - 1)
        lo = int(np.floor(x))
        hi = min(lo + 1, n - 1)
        pos.append((x - lo, lo + 1, hi + 1))
        ranks += [lo + 1, hi + 1]
    got = _select_ranks(ds, col, sorted(set(ranks)), n, cands, **kw)
    out = []
    for frac, r_lo, r_hi in pos:
        a, b = float(got[r_lo]), float(got[r_hi])
        out.append(a + frac * (b - a))
    return out
