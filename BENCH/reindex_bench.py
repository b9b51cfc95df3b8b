#!/usr/bin/env python
"""IVF reindex maintenance at scale: build a 500k x 64-dim index,
upsert 5% with stale assignments, and measure drift-proportional
reindex vs a fresh full rebuild.

Run:  python BENCH/reindex_bench.py [--rows 500000] [--dim 64]
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=500_000)
    ap.add_argument("--dim", type=int, default=64)
    ap.add_argument("--cpus", type=int, default=32)
    ap.add_argument("--upsert-frac", type=float, default=0.05)
    args = ap.parse_args()

    import numpy as np
    import pyarrow as pa
    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=args.cpus, include_dashboard=False,
                 logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    import ray.data

    from engine.similarity import build_ivf_index, ivf_topk_indexed, reindex_ivf
    from engine.writer import write_files
    from engine.manifest import Table

    rng = np.random.default_rng(0)
    m = rng.standard_normal((args.rows, args.dim)).astype(np.float32)
    t = pa.table({
        "vec_id": pa.array(np.arange(args.rows), pa.int64()),
        "embedding": pa.array([r.tolist() for r in m], pa.list_(pa.float32())),
    })
    root = "/tmp/reindex-bench-ivf"
    shutil.rmtree(root, ignore_errors=True)

    t0 = time.perf_counter()
    table, cents = build_ivf_index(
        ray.data.from_arrow(t), root, n_centroids=64, rows_per_file=50_000
    )
    sec_build = time.perf_counter() - t0

    n_up = int(args.rows * args.upsert_frac)
    m2 = rng.standard_normal((n_up, args.dim)).astype(np.float32)
    up = pa.table({
        "vec_id": pa.array(np.arange(10_000_000, 10_000_000 + n_up), pa.int64()),
        "embedding": pa.array([r.tolist() for r in m2], pa.list_(pa.float32())),
        "__list": pa.array(np.zeros(n_up, np.int64)),
    })
    entries = write_files(
        ray.data.from_arrow(up), table.data_dir, prefix="upsert",
        stats_cols=("vec_id", "__list"),
    )
    table.commit("merge", add_files=entries)

    t0 = time.perf_counter()
    table, st = reindex_ivf(table)
    sec_reindex = time.perf_counter() - t0

    t0 = time.perf_counter()
    table, st2 = reindex_ivf(table)
    sec_noop = time.perf_counter() - t0

    print(json.dumps({
        "what": "IVF reindex maintenance: drift-proportional rewrite vs full build",
        "rows": args.rows, "dim": args.dim, "cpus": args.cpus,
        "upserted": n_up,
        "sec_full_build": round(sec_build, 2),
        "sec_reindex_after_5pct_upsert": round(sec_reindex, 2),
        "sec_reindex_noop": round(sec_noop, 2),
        "files_rewritten": st["files_rewritten"],
        "rows_rewritten": st["rows_rewritten"],
        "noop_files_rewritten": st2["files_rewritten"],
    }))
    ray.shutdown()


if __name__ == "__main__":
    main()
