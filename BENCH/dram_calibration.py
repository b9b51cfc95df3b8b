#!/usr/bin/env python
"""Aggregate memory-bandwidth calibration vs concurrent task count.

Why this exists (round 4): every gated scaling run shows the same
shape -- the maintenance dataflow scales near-linearly up to ~8-12
CPUs and plateaus near ~130k rows/s from 16 CPUs on, while per-task
pure-FLOP calibrations keep scaling. The hypothesis is single-NODE
memory-bandwidth saturation: this VM's 32 logical CPUs share one DRAM
domain, so a bandwidth-bound pipeline stops scaling when aggregate
traffic hits the socket limit. A real 4N-node cluster adds 4N DRAM
domains -- the resource this sandbox cannot add.

This script measures it directly: K concurrent Ray tasks each stream a
~256 MB triad (a[:] = b + c, the classic STREAM shape) and report
per-task and AGGREGATE GB/s at K = 1, 2, 4, 8, 16, 32. If aggregate
GB/s plateaus well below 32x the single-task number, the node -- not
the engine -- is the scaling limit at high K.

Writes one JSON line; saved to BENCH/dram_calibration.json.
"""

import json
import os
import subprocess
import sys

_SRC = """
import ray, time, numpy as np, warnings, json
warnings.filterwarnings("ignore")
ray.init(address="local", num_cpus={k}, include_dashboard=False, logging_level="ERROR")

@ray.remote(num_cpus=1)
def stream(_):
    n = 32 * 1024 * 1024  # 3 x 256 MB float64
    b = np.ones(n)
    c = np.ones(n)
    a = np.empty(n)
    # warm (first-touch)
    np.add(b, c, out=a)
    reps = 6
    t0 = time.perf_counter()
    for _ in range(reps):
        np.add(b, c, out=a)
    dt = time.perf_counter() - t0
    # bytes moved per rep: read b + read c + write a
    return (3 * n * 8 * reps) / dt

ray.get([stream.remote(i) for i in range({k})])  # warm pool
rates = ray.get([stream.remote(i) for i in range({k})])
print(json.dumps({{"k": {k}, "per_task_gbs": round(sum(rates)/len(rates)/1e9, 2),
                   "aggregate_gbs": round(sum(rates)/1e9, 2)}}))
ray.shutdown()
"""


def main() -> None:
    out = []
    for k in (1, 2, 4, 8, 16, 32):
        r = subprocess.run(
            [sys.executable, "-c", _SRC.format(k=k)],
            capture_output=True, text=True, check=True,
        )
        rec = json.loads(r.stdout.strip().splitlines()[-1])
        print(rec, flush=True)
        out.append(rec)
    base = out[0]["aggregate_gbs"]
    sat = {r["k"]: round(r["aggregate_gbs"] / base, 2) for r in out}
    result = {
        "what": "STREAM-triad aggregate GB/s vs concurrent 1-CPU Ray tasks "
                "(256 MB working set each; plateau = single-node DRAM "
                "saturation, the resource a multi-node cluster multiplies)",
        "points": out,
        "aggregate_vs_1task": sat,
    }
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)), "dram_calibration.json")
    with open(path, "w") as f:
        json.dump(result, f, indent=1)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
