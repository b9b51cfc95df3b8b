#!/usr/bin/env python
"""Clean-window watchdog for the north_rule scaling measurement.

This VM's host contention varies by the minute (BASELINE.md: identical
code measured 0.38-0.78 raw efficiency purely by window). The honest
way to measure the PIPELINE rather than the host is to gate the run on
a pure-compute calibration: poll the 64-task numpy ceiling, launch
``bench.py --scaling`` only when the host itself scales (ceiling >=
GATE), and record the pre-gate ceiling alongside the result.

Round-4 upgrade: the north rule says N vs 4N CPUs, not WHICH pair, and
the two pairs see very different neighbor exposure on this shared
32-vCPU host (measured 4->16 ceiling 0.805 in the same minute 8->32
measured 0.416 -- BASELINE.md "scaling-pair exposure"). Each poll now
calibrates all four levels and fires on whichever pair's window the
host offers: 8->32 preferred (comparable to rounds 1-3), 4->16
otherwise (``BENCH_SCALING_LEVELS=4,16``). Gated runs default to ONE
interleaved round (``WATCH_ROUNDS=1``): half the in-window dwell of
the best-of-2 default, because runs 1-3 all fired on real windows that
faded before the ~4-minute measurement finished.

Usage:  python BENCH/scaling_watchdog.py [max_hours]
Writes /tmp/scaling_watch_<n>.json per successful run; stops after
MAX_RUNS successes or the time budget.
"""

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import bench  # noqa: E402
from bench import _calibrate  # noqa: E402

GATE = float(os.environ.get("WATCH_GATE", "0.75"))
GATE416 = float(os.environ.get("WATCH_GATE416", "0.78"))
POLL_SECONDS = int(os.environ.get("WATCH_POLL", "480"))
MAX_RUNS = int(os.environ.get("WATCH_MAX_RUNS", "2"))
ROUNDS = os.environ.get("WATCH_ROUNDS", "1")
#: seconds between the first gate pass and the confirming re-measure.
#: Round-4 runs 1-2 fired on 0.807/0.799 spikes that collapsed to
#: 0.676/0.634 before the ~4-minute bench finished -- a single
#: instantaneous gate measures window HEIGHT but the bench needs
#: window LENGTH, so require two consecutive passes before spending a
#: run (a fading spike fails the confirm and costs one poll, nothing
#: else).
CONFIRM_DELAY = int(os.environ.get("WATCH_CONFIRM_DELAY", "45"))


def _ceilings() -> dict:
    """One calibration per level; both pair ceilings from the same
    sweep so they describe the same instant."""
    c = {n: _calibrate(n) for n in (4, 8, 16, 32)}
    return {
        "8,32": (c[8] / c[32]) / 4,
        "4,16": (c[4] / c[16]) / 4,
    }


def _pick(ceil: dict) -> str | None:
    """Preferred pair whose gate passes this instant (8->32 wins ties:
    it is the pair rounds 1-3 recorded)."""
    if ceil["8,32"] >= GATE:
        return "8,32"
    if ceil["4,16"] >= GATE416:
        return "4,16"
    return None


def main() -> None:
    budget_h = float(sys.argv[1]) if len(sys.argv) > 1 else 3.0
    deadline = time.time() + budget_h * 3600
    # prebuild the deterministic scaling input ONCE, before any gate:
    # the gated bench then spends its clean window measuring, not
    # rebuilding 4x ~365 MB of setup (bench._reusable_input contract)
    expand = int(os.environ.get("BENCH_EXPAND", "480"))
    if bench._reusable_input(expand) is None:
        in_dir, _ = bench._build_input("/tmp/bench-shared-watchdog", expand=expand)
        os.environ["BENCH_INPUT_DIR"] = in_dir
        print(f"prebuilt input: {in_dir}", flush=True)
    done = 0
    n = 0
    while time.time() < deadline and done < MAX_RUNS:
        ceil = _ceilings()
        pair = _pick(ceil)
        print(f"poll: 8,32={ceil['8,32']:.3f} 4,16={ceil['4,16']:.3f}", flush=True)
        if pair is not None:
            time.sleep(CONFIRM_DELAY)
            ceil2 = _ceilings()
            pair2 = _pick(ceil2)
            print(
                f"confirm: 8,32={ceil2['8,32']:.3f} 4,16={ceil2['4,16']:.3f}",
                flush=True,
            )
            if pair2 != pair:
                # the SAME pair must pass BOTH sweeps: firing on a pair
                # that only passed the confirm would record a
                # pre_gate_ceiling that never actually passed any gate
                # (review finding), corrupting the window-quality
                # bookkeeping BASELINE.md conclusions rest on. A failed
                # confirm costs ONE poll period, as documented: without
                # this sleep a ceiling hovering at the gate tight-loops
                # calibrations, loading the very host whose idle
                # scaling is being measured.
                time.sleep(POLL_SECONDS)
                continue
            n += 1
            env = dict(
                os.environ,
                BENCH_SCALING_LEVELS=pair,
                BENCH_SCALING_ROUNDS=ROUNDS,
            )
            out = subprocess.run(
                [sys.executable, os.path.join(os.path.dirname(os.path.dirname(
                    os.path.abspath(__file__))), "bench.py"), "--scaling"],
                capture_output=True, text=True, env=env,
            )
            try:
                rec = json.loads(out.stdout.strip().splitlines()[-1])
            except Exception:
                print("run failed:", out.stderr[-500:], flush=True)
                continue
            rec["pre_gate_ceiling"] = round(ceil[pair], 3)
            rec["confirm_ceiling"] = round(ceil2[pair], 3)
            rec["levels"] = pair
            path = f"/tmp/scaling_watch_{n}.json"
            with open(path, "w") as f:
                json.dump(rec, f)
            print(f"run {n}: levels={pair} raw={rec['value']} -> {path}", flush=True)
            done += 1
        else:
            time.sleep(POLL_SECONDS)


if __name__ == "__main__":
    main()
