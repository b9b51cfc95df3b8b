#!/usr/bin/env python
"""Scale measurement for the round-5 text operators (trigram entropy,
Gopher repetition stats, C4 global line dedup) on an expanded 6M-doc
documents table at 32 CPUs. Consumption = count() over the final stage
(no driver materialization of results beyond the counter).

Run:  python BENCH/text_ops_6m_r5.py [--expand 30] [--cpus 32]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--expand", type=int, default=400)
    ap.add_argument("--cpus", type=int, default=32)
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
    import ray.data

    # untimed input: sf0.1 documents x expand, with synthetic newlines
    # injected (every 12th token) so the line ops do real line work
    src = pq.read_table("/root/testdata/sf0.1/documents.parquet",
                        columns=["doc_id", "text"])
    n = len(src)
    texts = src.column("text").to_pylist()
    with_nl = []
    for t in texts:
        tk = (t or "").split(" ")
        with_nl.append("\n".join(" ".join(tk[i:i + 12]) for i in range(0, len(tk), 12)))
    base = pa.table({"doc_id": src.column("doc_id"),
                     "text": pa.array(with_nl, pa.string())})
    in_dir = f"/tmp/text-ops-input-{args.expand}"
    os.makedirs(in_dir, exist_ok=True)
    per_file = 20  # reps per parquet file: 100k-row files, not 400 tiny ones
    ids = base.column("doc_id").to_numpy()
    for f0 in range(0, args.expand, per_file):
        p = os.path.join(in_dir, f"d-{f0:04d}.parquet")
        if not os.path.exists(p):
            t = pa.concat_tables([
                base.set_column(0, "doc_id", pa.array(ids + rep * n, pa.int64()))
                for rep in range(f0, min(f0 + per_file, args.expand))
            ])
            pq.write_table(t, p, compression="zstd")
    rows = n * args.expand

    from engine.dedup import dedup_lines_global
    from engine.textstats import add_repetition_stats, add_trigram_entropy

    def timed(name, fn):
        t0 = time.perf_counter()
        out = fn()
        sec = time.perf_counter() - t0
        return name, round(sec, 2), out

    ds = lambda: ray.data.read_parquet(in_dir, columns=["doc_id", "text"])  # noqa: E731
    results = {}
    for name, fn in [
        ("quality_entropy", lambda: add_trigram_entropy(ds()).count()),
        ("rep_stats", lambda: add_repetition_stats(ds()).count()),
        ("line_dedup", lambda: dedup_lines_global(ds()).count()),
    ]:
        nm, sec, out = timed(name, fn)
        assert out == rows, (nm, out, rows)
        results[nm] = sec
    print(json.dumps({
        "what": "round-5 text ops on expanded sf0.1 documents (newline-injected), 32 CPUs",
        "rows": rows, "cpus": args.cpus, "sec": results,
        "rows_per_sec": {k: round(rows / v) for k, v in results.items()},
    }))
    ray.shutdown()


if __name__ == "__main__":
    main()
