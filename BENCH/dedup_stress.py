#!/usr/bin/env python
"""Near-dup dedup stress: prove the round-2 claim that no stage
materializes the corpus driver-side.

Builds a synthetic corpus (default 5M docs, ~150 tokens equivalent via
repeated sf0.1 documents text with planted near-dups), runs
minhash_dedup_pairs with the candidate-id prefilter DISABLED (pure
partitioned-join path) plus distributed components + shuffle survivor
filter, and reports wall time, pair counts, survivor counts and the
driver's peak RSS. Pass --rows to resize.

Run:  python BENCH/dedup_stress.py [--rows 5000000] [--cpus 32]
"""

from __future__ import annotations

import argparse
import json
import os
import resource
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=5_000_000)
    ap.add_argument("--cpus", type=int, default=32)
    ap.add_argument("--dup-rate", type=float, default=0.05)
    args = ap.parse_args()

    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq
    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=args.cpus, include_dashboard=False,
                 logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    import os
    import shutil

    import ray.data

    from engine.dedup import drop_near_duplicates_shuffle, minhash_dedup_pairs

    # --- untimed input build: realistic dup structure --------------------
    # each non-planted doc is ~40 words drawn from the sf0.1 vocabulary
    # (random docs share ~no shingles -> Jaccard ~0); dup_rate of rows
    # copy the previous row's text with a one-token change -> guaranteed
    # high-jaccard planted pairs. (A first version reused whole sf0.1
    # texts as bases -- that makes 99.5% of the corpus mutual near-dups,
    # the boilerplate-cluster blowup now covered by the max_cell cap and
    # tests/test_dedup.py::test_hot_cell_cap_preserves_components.)
    src = pq.read_table("/root/testdata/sf0.1/documents.parquet", columns=["text"])
    vocab = np.unique(
        np.concatenate([np.array((t or "").split()) for t in src.column("text").to_pylist()])
    )
    rng = np.random.default_rng(11)
    work = f"/tmp/dedup-stress-{os.getpid()}"
    shutil.rmtree(work, ignore_errors=True)
    os.makedirs(work)
    n_files = 64
    per = args.rows // n_files
    words_per_doc = 40
    doc_id = 0
    for fidx in range(n_files):
        ids = np.arange(doc_id, doc_id + per, dtype=np.int64)
        doc_id += per
        w = vocab[rng.integers(0, len(vocab), (per, words_per_doc))]
        texts = [" ".join(row) for row in w]
        dup_mask = rng.random(per) < args.dup_rate
        for i in np.flatnonzero(dup_mask):
            if i:
                prev = texts[i - 1].split()
                prev[words_per_doc // 2] = f"edit{ids[i]}"
                texts[i] = " ".join(prev)
        pq.write_table(
            pa.table({"doc_id": pa.array(ids), "text": pa.array(texts, pa.string())}),
            os.path.join(work, f"in-{fidx:03d}.parquet"),
            compression="zstd",
        )

    ds = ray.data.read_parquet(work)
    t0 = time.perf_counter()
    # prefilter_limit=0 -> the pure hash-partitioned-join verify path.
    # max_cell=64: this pipeline consumes CONNECTIVITY only (components
    # + survivors), so the hot-cell star cap is the right trade -- the
    # boilerplate clusters planted below are O(m^2) pairs uncapped.
    pairs = minhash_dedup_pairs(
        ds, threshold=0.6, prefilter_limit=0, max_cell=64
    ).materialize()
    t_pairs = time.perf_counter() - t0
    n_pairs = pairs.count()

    t0 = time.perf_counter()
    survivors = drop_near_duplicates_shuffle(
        ray.data.read_parquet(work), pairs, num_buckets=128
    )
    n_survivors = survivors.count()
    t_drop = time.perf_counter() - t0

    rss_mb = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1024
    out = {
        "rows": args.rows,
        "cpus": args.cpus,
        "pairs": n_pairs,
        "survivors": n_survivors,
        "dropped": args.rows - n_survivors,
        "sec_pairs": round(t_pairs, 2),
        "sec_components_and_filter": round(t_drop, 2),
        "driver_peak_rss_mb": round(rss_mb, 1),
    }
    shutil.rmtree(work, ignore_errors=True)
    print(json.dumps(out))
    ray.shutdown()


if __name__ == "__main__":
    main()
