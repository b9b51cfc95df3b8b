#!/usr/bin/env python
"""Wide-merge end-to-end bench (round-2 VERDICT #9).

Measures MERGE INTO over a 2.4M-row pages table (the scaling-bench
input: sf0.1 documents expanded 480x, ~4x url duplication) through both
paths on identical data:

- ``single_pass``: the default local path -- one bucketed exchange
  moving FULL rows (html payload included).
- ``wide``: ``merge_datasets_wide`` with ``html`` kept out of the
  shuffle -- phase A exchanges light columns + one bool, phase B
  re-reads the input and ships only winning payload rows.

Reports wall times (best-of-2 per path, interleaved against VM noise),
measured per-column bytes (parquet-compressed AND in-memory Arrow), the
derived exchange-byte model for each path, and the auto-routing
decisions (`_auto_wide_cols`) under the single-node gate, the forced
topology, and the size/share thresholds. Output:
``BENCH/merge_wide_<tag>.json`` (tag via ``BENCH_WIDE_TAG``,
default r3) + one line on stdout.

Standalone script: owns its Ray session (CLAUDE.md contract).
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("BENCH_EXPAND", "480")

import ray

NUM_CPUS = int(os.environ.get("RAY_GRAFT_CPUS", "32"))


def main() -> dict:
    if not ray.is_initialized():
        ray.init(address="local", num_cpus=NUM_CPUS, include_dashboard=False,
                 logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    import pyarrow as pa

    import bench
    from engine.config import EngineConfig
    from engine.jobs import _auto_wide_cols, ingest, merge_into, payload_column_shares
    from engine.manifest import Table

    work = "/tmp/merge_wide_bench"
    shutil.rmtree(work, ignore_errors=True)
    in_dir, rows = bench._build_input(work)

    root = os.path.join(work, "table")
    table = Table.create(root)
    base_cfg = dict(merge_buckets=64, shuffle_blocks=64)
    ing = ingest(table, ray.data.read_parquet(in_dir), EngineConfig(**base_cfg))
    ingest_snap = ing["snapshot_id"]

    # --- measured bytes (untimed instrumentation) ----------------------
    disk_bytes = sum(f.bytes for f in table.live_files())
    shares = payload_column_shares(table)

    def col_bytes(t: pa.Table) -> pa.Table:
        return pa.table(
            {c: pa.array([t.column(c).nbytes], pa.int64()) for c in t.column_names}
        )

    mem = (
        table.scan()
        .map_batches(col_bytes, batch_format="pyarrow", zero_copy_batch=True)
        .to_pandas()
        .sum()
        .to_dict()
    )
    mem_total = int(sum(mem.values()))

    # --- auto-routing decisions ---------------------------------------
    routing = {
        "single_node_gate": _auto_wide_cols(table, EngineConfig(**base_cfg)),
        "forced_topology": _auto_wide_cols(
            table, EngineConfig(**base_cfg, merge_wide_single_node=True)
        ),
        "forced_low_floor": _auto_wide_cols(
            table,
            EngineConfig(**base_cfg, merge_wide_single_node=True,
                         merge_wide_min_bytes=1 << 20),
        ),
        "thresholds": {
            "merge_wide_share": EngineConfig().merge_wide_share,
            "merge_wide_min_bytes": EngineConfig().merge_wide_min_bytes,
            "table_disk_bytes": disk_bytes,
            "compressed_shares": {k: round(v, 4) for k, v in shares.items()},
        },
    }

    # --- timed variants (interleaved best-of-2) ------------------------
    def reset():
        cur = os.path.join(root, "manifest", "CURRENT")
        with open(cur + ".tmp", "w") as f:
            f.write(f"snapshot-{ingest_snap:08d}.json")
        os.replace(cur + ".tmp", cur)

    cfgs = {
        "single_pass": EngineConfig(**base_cfg, merge_wide_auto=False),
        "wide": EngineConfig(**base_cfg, merge_wide_cols=("html",),
                             merge_wide_single_node=True),
    }
    times: dict = {k: [] for k in cfgs}
    merged_rows: dict = {}
    for rep in range(2):
        for name, cfg in cfgs.items():
            reset()
            t = Table.load(root)
            t0 = time.perf_counter()
            out = merge_into(t, cfg)
            times[name].append(round(time.perf_counter() - t0, 3))
            merged_rows[name] = out["rows"]

    # --- semantic cross-check: both paths produce the same table -------
    reset()
    import duckdb

    t = Table.load(root)
    frames = {}
    for name, cfg in cfgs.items():
        reset()
        t = Table.load(root)
        merge_into(t, cfg)
        t2 = Table.load(root)
        frames[name] = (
            t2.scan()
            .map_batches(
                lambda b: pa.table(
                    {
                        "url": b.column("url"),
                        "warc_ts": b.column("warc_ts"),
                        "text": b.column("text"),
                        "lang": b.column("lang"),
                        "html_len": pa.compute.binary_length(b.column("html")),
                    }
                ),
                batch_format="pyarrow",
                zero_copy_batch=True,
            )
            .to_pandas()
        )
    con = duckdb.connect()
    con.register("a", frames["single_pass"])
    con.register("b", frames["wide"])
    diff = con.sql(
        "SELECT count(*) FROM ((SELECT * FROM a EXCEPT SELECT * FROM b) "
        "UNION ALL (SELECT * FROM b EXCEPT SELECT * FROM a))"
    ).fetchone()[0]

    # --- exchange-byte model from the MEASURED column bytes ------------
    n_keys = merged_rows["single_pass"]
    light_cols = [c for c in mem if c != "html"]
    model = {
        "what": "in-memory Arrow bytes entering the bucketed exchange(s), from the measured per-column sizes",
        "single_pass_exchange_bytes": mem_total,
        "wide_phaseA_exchange_bytes": int(sum(mem[c] for c in light_cols)) + rows,
        "wide_phaseB_payload_bytes": int(mem["html"] * n_keys / rows),
        "wide_total_exchange_bytes": int(sum(mem[c] for c in light_cols)) + rows
        + int(mem["html"] * n_keys / rows),
    }
    model["payload_bytes_kept_off_exchange"] = (
        model["single_pass_exchange_bytes"] - model["wide_total_exchange_bytes"]
    )

    result = {
        "bench": "merge_wide_" + os.environ.get("BENCH_WIDE_TAG", "r3"),
        "rows": rows,
        "merged_rows": merged_rows,
        "num_cpus": NUM_CPUS,
        "times_sec": times,
        "best_sec": {k: min(v) for k, v in times.items()},
        "results_identical": diff == 0,
        "routing": routing,
        "bytes": {
            "disk_total": disk_bytes,
            "arrow_in_memory_per_column": {k: int(v) for k, v in mem.items()},
            "arrow_in_memory_total": mem_total,
        },
        "exchange_model": model,
    }
    out_path = os.path.join(os.path.dirname(os.path.abspath(__file__)), f"merge_wide_{os.environ.get('BENCH_WIDE_TAG', 'r3')}.json")
    with open(out_path, "w") as f:
        json.dump(result, f, indent=2)
    shutil.rmtree(work, ignore_errors=True)
    return result


if __name__ == "__main__":
    r = main()
    ray.shutdown()
    print(json.dumps(r))
