#!/usr/bin/env python
"""jobs.dedup_lines at a multi-million-row pages-shaped table (html
carried through the rewrite -- a full-table rewrite op, like cluster).

Input is built untimed: sf0.1 documents expanded with UNIQUE urls (the
op's documented post-merge precondition), newline-injected text so the
line machinery does real work, and an html payload derived from text.

Run:  python BENCH/dedup_lines_bench.py [--expand 400] [--cpus 32]
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

    from engine.config import EngineConfig
    from engine.jobs import dedup_lines
    from engine.manifest import FileEntry, Table

    src = pq.read_table("/root/testdata/sf0.1/documents.parquet", columns=["text"])
    n = len(src)
    with_nl = []
    for t in src.column("text").to_pylist():
        tk = (t or "").split(" ")
        with_nl.append("\n".join(" ".join(tk[i:i + 12]) for i in range(0, len(tk), 12)))
    in_dir = f"/tmp/dedup-lines-input-{args.expand}"
    os.makedirs(in_dir, exist_ok=True)
    per_file = 20
    for f0 in range(0, args.expand, per_file):
        p = os.path.join(in_dir, f"d-{f0:04d}.parquet")
        if not os.path.exists(p):
            parts = []
            for rep in range(f0, min(f0 + per_file, args.expand)):
                ids = np.arange(n, dtype=np.int64) + rep * n
                parts.append(pa.table({
                    "url": pa.array([f"https://example.com/p/{i}" for i in ids], pa.string()),
                    "warc_ts": pa.array(ids * 1_000_000, pa.timestamp("us")),
                    "text": pa.array(with_nl, pa.string()),
                    "lang": pa.array(["en"] * n, pa.string()),
                    "html": pa.array(
                        [f"<html><body>{x}</body></html>".encode() for x in with_nl],
                        pa.large_binary(),
                    ),
                }))
            pq.write_table(pa.concat_tables(parts), p, compression="zstd")
    root = "/tmp/dedup-lines-bench-table"
    shutil.rmtree(root, ignore_errors=True)
    paths = sorted(os.path.join(in_dir, p) for p in os.listdir(in_dir))
    entries, schema = [], None
    for p in paths:
        md = pq.ParquetFile(p)
        if schema is None:
            schema = md.schema_arrow
        entries.append(FileEntry(path=p, rows=md.metadata.num_rows, bytes=os.path.getsize(p)))
    t = Table.create(root, schema=schema)
    t.commit("register", add_files=entries, schema=schema)
    rows = sum(e.rows for e in entries)

    t0 = time.perf_counter()
    out = dedup_lines(t, EngineConfig())
    sec = time.perf_counter() - t0
    assert out["rows"] == rows, out
    print(json.dumps({
        "what": f"jobs.dedup_lines full-table rewrite at {rows} unique-url pages rows (html carried)",
        "rows": rows, "cpus": args.cpus, "sec": round(sec, 2),
        "rows_per_sec": round(rows / sec), "files_out": out["files"],
    }))
    ray.shutdown()


if __name__ == "__main__":
    main()
