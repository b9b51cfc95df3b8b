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
          candidate splitters (evenly spaced batch quantiles). The
          driver merges the per-batch samples as a STREAM
          (``iter_batches``), folding into a running <=cap unique
          array -- peak driver memory is O(cap + stream batch), not
          O(batches x per_batch);
  pass 2  one histogram pass: every value maps to a candidate interval
          via ``np.searchsorted`` (vectorized); per-batch nonzero
          (interval, count, eq-count) partials fold through a Ray
          groupby -- the exchange moves O(intervals x batches) tiny
          rows. The eq-count records how many values EQUAL the
          interval's lower candidate: since candidates are actual data
          values, heavy ties concentrate ON candidates, and a rank that
          lands inside an eq run is answered directly from the
          candidate -- no data fetched at all;
  pass 3  fetch ONLY the strict interiors (values equal to no
          candidate) of the intervals still holding unresolved ranks
          (expected size ~ n / n_candidates per bracket) and select the
          exact rank offsets driver-side.

If skew makes an interior exceed ``bracket_limit``, extra splitters are
sampled from inside the oversized intervals (per-batch strided samples,
streamed -- never the bracket itself) and pass 2 repeats; each
refinement shrinks interiors geometrically, so the number of passes is
O(log_S n) with S candidates (2-3 passes at 100 TB). Pure ties can
never force a refinement or a fetch: they resolve through the eq-count
path.

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


def _stream_merge_samples(parts, cap: int) -> tuple[int, np.ndarray]:
    """Fold (n, cands-list) partial rows into (total_n, <=cap unique
    sorted candidates) by STREAMING them through the driver -- a
    map_batches 'thin' stage would fuse into the producing task and see
    one row at a time (review finding), so the fold lives here, where
    the running array keeps the bound honest."""
    n = 0
    u: np.ndarray | None = None
    for b in parts.iter_batches(batch_format="pyarrow", batch_size=256):
        n += int(pc.sum(b.column("n")).as_py() or 0)
        flat = b.column("cands").combine_chunks().flatten().to_numpy(
            zero_copy_only=False
        )
        if len(flat) == 0:
            continue
        u = np.unique(flat) if u is None or len(u) == 0 else np.unique(
            np.concatenate([u, flat])
        )
        if len(u) > cap:
            u = u[:: len(u) // cap + 1]
    return n, (u if u is not None else np.array([]))


def _candidates(ds, col: str, per_batch: int, cap: int) -> tuple[int, np.ndarray]:
    """Pass 1: total non-NULL count + the streamed-merged candidate
    splitter array."""

    def partial(t: pa.Table) -> pa.Table:
        vt = t.schema.field(col).type
        v = _valid_numpy(t.column(col))
        n = len(v)
        if n:
            s = np.sort(v)
            step = max(1, n // per_batch)
            sample = s[::step]
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
    return _stream_merge_samples(parts, cap)


def _ids(c: np.ndarray, v: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Interval id (= #candidates <= v, so values equal to candidate
    ``c[i-1]`` sit at the BOTTOM of interval i) and the left-side id
    (differs exactly for values equal to a candidate)."""
    return np.searchsorted(c, v, side="right"), np.searchsorted(c, v, side="left")


def _interval_counts(ds, col: str, cands: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Pass 2: per-interval total counts AND eq-counts (values equal to
    the interval's lower candidate). Returns (counts[B+1], eqb[B+1])
    with eqb[0] = 0."""
    import ray

    ref = ray.put(cands)

    def hist(t: pa.Table) -> pa.Table:
        c = ray.get(ref)
        v = _valid_numpy(t.column(col))
        ids_r, ids_l = _ids(c, v)
        cnt = np.bincount(ids_r, minlength=len(c) + 1)
        eqm = ids_l < ids_r  # v == c[ids_l]; its interval id is ids_l + 1
        eqb = np.bincount(ids_l[eqm] + 1, minlength=len(c) + 1)
        nz = np.flatnonzero(cnt | eqb)
        return pa.table(
            {
                "id": pa.array(nz.astype(np.int64)),
                "cnt": pa.array(cnt[nz].astype(np.int64)),
                "eqb": pa.array(eqb[nz].astype(np.int64)),
            }
        )

    agg = (
        ds.map_batches(hist, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("id")
        .sum(["cnt", "eqb"])
        .to_pandas()
    )
    counts = np.zeros(len(cands) + 1, dtype=np.int64)
    eqb = np.zeros(len(cands) + 1, dtype=np.int64)
    if "id" in agg.columns and len(agg):
        idx = agg["id"].to_numpy()
        counts[idx] = agg["sum(cnt)"].to_numpy()
        eqb[idx] = agg["sum(eqb)"].to_numpy()
    return counts, eqb


def _interior_values(ds, col: str, cands: np.ndarray, needed: np.ndarray) -> dict:
    """Pass 3: STRICT-INTERIOR values (equal to no candidate) of the
    needed intervals, one dict id -> sorted numpy array. Candidate-tie
    mass never ships: it is already resolved from the eq-counts."""
    import ray

    cref, nref = ray.put(cands), ray.put(np.sort(needed))

    def pick(t: pa.Table) -> pa.Table:
        c, nd = ray.get(cref), ray.get(nref)
        v = _valid_numpy(t.column(col))
        ids_r, ids_l = _ids(c, v)
        m = np.isin(ids_r, nd) & (ids_l == ids_r)
        return pa.table({"id": pa.array(ids_r[m].astype(np.int64)), "v": pa.array(v[m])})

    got = ds.map_batches(pick, batch_format="pyarrow", zero_copy_batch=True).to_pandas()
    out: dict[int, np.ndarray] = {}
    if got.empty:
        return out
    for i, g in got.groupby("id"):
        out[int(i)] = np.sort(g["v"].to_numpy())
    return out


def _interior_samples(
    ds, col: str, cands: np.ndarray, big: np.ndarray, per_batch: int = 64
) -> np.ndarray:
    """Refinement sampler: per-batch strided sorted samples of the
    strict interiors of the oversized intervals, streamed to the driver
    (O(batches x per_batch) flowing, O(cap) resident) -- the bracket
    itself is never materialized anywhere."""
    import ray

    cref, bref = ray.put(cands), ray.put(np.sort(big))

    def sample(t: pa.Table) -> pa.Table:
        vt = t.schema.field(col).type
        c, bd = ray.get(cref), ray.get(bref)
        v = _valid_numpy(t.column(col))
        ids_r, ids_l = _ids(c, v)
        w = v[np.isin(ids_r, bd) & (ids_l == ids_r)]
        if len(w):
            w = np.sort(w)[:: max(1, len(w) // per_batch)]
        return pa.table(
            {
                "n": pa.array([0], type=pa.int64()),
                "cands": pa.array([w.tolist()], type=pa.list_(vt)),
            }
        )

    parts = ds.map_batches(sample, batch_format="pyarrow", zero_copy_batch=True)
    _, extra = _stream_merge_samples(parts, 65536)
    return extra


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
        counts, eqb = _interval_counts(ds, col, cands)
        cum = np.cumsum(counts)
        resolved: dict[int, object] = {}
        residual: dict[int, tuple[int, int]] = {}
        for r in ranks:
            i = int(np.searchsorted(cum, r, side="left"))
            offset = r - (int(cum[i - 1]) if i > 0 else 0)
            if i >= 1 and offset <= eqb[i]:
                # the rank lands in the run of values equal to the
                # interval's lower candidate: answer with no fetch
                resolved[r] = cands[i - 1].item()
            else:
                residual[r] = (i, offset - int(eqb[i]))
        if not residual:
            return resolved
        needed = np.unique([i for i, _ in residual.values()])
        interior = counts[needed] - eqb[needed]
        big = needed[interior > bracket_limit]
        if len(big) and refines < max_refine:
            extra = _interior_samples(ds, col, cands, big)
            new = np.unique(np.concatenate([cands, extra])) if len(extra) else cands
            if len(new) > len(cands):
                cands = new
                refines += 1
                continue
        break
    vals = _interior_values(ds, col, cands, needed)
    out = dict(resolved)
    for r, (i, off) in residual.items():
        out[r] = vals[i][off - 1].item()
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
