#!/usr/bin/env python
"""jobs.dedup_lines at the 6M-row bench pages input (html carried
through the rewrite -- a full-table rewrite op, like cluster).

Table setup is untimed: the manifest simply registers the existing
bench input files (immutable-file contract allows entries outside
data_dir)."""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyarrow.parquet as pq
import ray

ray.init(address="local", num_cpus=32, include_dashboard=False, logging_level="ERROR")
from ray.data import DataContext

DataContext.get_current().enable_progress_bars = False

from engine.config import EngineConfig
from engine.jobs import dedup_lines
from engine.manifest import FileEntry, Table

in_dir = os.environ.get("BENCH_INPUT_DIR", "/tmp/bench-shared-watchdog/input")
import shutil

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
    "what": "jobs.dedup_lines full-table rewrite at the 2.4M-row bench pages input (html carried)",
    "rows": rows, "cpus": 32, "sec": round(sec, 2),
    "rows_per_sec": round(rows / sec), "files_out": out["files"],
}))
ray.shutdown()
