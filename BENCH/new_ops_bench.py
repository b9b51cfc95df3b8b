"""Scaling record for the late-round-4 operators over the shared 6 M-row
expanded pages input: per-op wall at a given CPU count.

Usage: BENCH_INPUT_DIR=... RAY_GRAFT_CPUS=N python BENCH/new_ops_bench.py
Prints one JSON line. Owns its Ray session (BENCH scripts only)."""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    import ray

    ncpu = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
    in_dir = os.environ["BENCH_INPUT_DIR"]
    ray.init(
        address="local",
        num_cpus=ncpu,
        include_dashboard=False,
        logging_level="ERROR",
    )
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    import pyarrow as pa
    import pyarrow.compute as pc
    import ray.data

    # warm page cache + worker pool (untimed)
    ray.data.read_parquet(in_dir).map_batches(
        lambda t: t.slice(0, 1), batch_format="pyarrow"
    ).count()
    rows = ray.data.read_parquet(in_dir).count()
    timings = {}

    t0 = time.perf_counter()
    from engine.terms import top_terms_per_lang

    top_terms_per_lang(
        ray.data.read_parquet(in_dir, columns=["text", "lang"]), k=5
    ).count()
    timings["top_terms"] = round(time.perf_counter() - t0, 3)

    t0 = time.perf_counter()
    from engine.quantiles import grouped_quantile_disc, quantile_disc

    lens = ray.data.read_parquet(in_dir, columns=["text"]).map_batches(
        lambda t: pa.table(
            {"len": pc.utf8_length(pc.fill_null(t.column("text"), ""))}
        ),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    quantile_disc(lens, "len", [0.25, 0.5, 0.99])
    timings["quantiles"] = round(time.perf_counter() - t0, 3)

    t0 = time.perf_counter()
    gl = ray.data.read_parquet(in_dir, columns=["text", "lang"]).map_batches(
        lambda t: pa.table(
            {
                "lang": t.column("lang"),
                "len": pc.utf8_length(pc.fill_null(t.column("text"), "")),
            }
        ),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    grouped_quantile_disc(gl, "lang", "len", [0.5, 0.9])
    timings["grouped_quantiles"] = round(time.perf_counter() - t0, 3)

    t0 = time.perf_counter()
    from engine.redact import redact_text

    redact_text(
        ray.data.read_parquet(in_dir, columns=["text"])
    ).map_batches(
        lambda t: pa.table({"n": [t.num_rows]}), batch_format="pyarrow"
    ).sum("n")
    timings["redact"] = round(time.perf_counter() - t0, 3)

    t0 = time.perf_counter()
    from engine.aggregates import grouped_count_topk

    grouped_count_topk(
        ray.data.read_parquet(in_dir, columns=["url"]), "url", 10
    ).count()
    timings["top_dup_urls"] = round(time.perf_counter() - t0, 3)

    t0 = time.perf_counter()
    from engine.aggregates import grouped_topk

    grouped_topk(
        ray.data.read_parquet(in_dir, columns=["lang", "url", "warc_ts"]),
        "lang",
        "warc_ts",
        3,
        tie_cols=("url",),
    ).count()
    timings["grouped_topk"] = round(time.perf_counter() - t0, 3)

    print(
        json.dumps(
            {"num_cpus": ncpu, "rows": rows, "queries": timings,
             "total": round(sum(timings.values()), 3)}
        )
    )
    ray.shutdown()


if __name__ == "__main__":
    main()
