#!/usr/bin/env python
"""Interleaved measurement of the north-rule N→4N pair (1→4 cores).

The one-shot ladder measures each level ONCE, so a noise burst during
a single stage corrupts the ratio (the r3 ladder measured a 4→8
"efficiency" of 1.41 — impossible, ergo ambient). Alternating the two
levels spreads ambient load across both and the mean ratio is
defensible. Reuses the cached tmpfs feed; same taskset/heap protocol
as bench_scaling.py.

Usage: python BENCH/pair_1_4.py [rounds]   (default 2: 4,1,4,1[,4...])
Writes BENCH/pair_1_4.json.
"""

from __future__ import annotations

import json
import os
import statistics
import subprocess
import sys
import time

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
N_EVENTS = int(os.environ.get("SPARK_GRAFT_BENCH_EVENTS", "32000000"))


def run_level(cpus: int) -> float:
    env = {
        **os.environ,
        "SPARK_GRAFT_CPUS": str(cpus),
        "SPARK_GRAFT_BENCH_EVENTS": str(N_EVENTS),
        "SPARK_GRAFT_BENCH_ONLY": "cdc",
    }
    env.pop("SPARK_DRIVER_MEM", None)
    cmd = ["taskset", "-c", f"0-{cpus - 1}", sys.executable,
           os.path.join(HERE, "bench.py")]
    out = subprocess.run(cmd, env=env, capture_output=True, text=True,
                         timeout=2400)
    line = [l for l in out.stdout.splitlines() if l.startswith("{")][-1]
    return json.loads(line)["queries"]["cdc_events_per_sec_steady"]


def main() -> None:
    rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    seq = []
    for _ in range(rounds):
        seq += [4, 1]
    seq.append(4)  # 4-core runs bracket the slow 1-core runs
    results: dict[int, list[float]] = {1: [], 4: []}
    for cpus in seq:
        t0 = time.time()
        v = run_level(cpus)
        results[cpus].append(v)
        print(json.dumps({"cpus": cpus, "steady": v,
                          "wall": round(time.time() - t0, 1)}),
              file=sys.stderr, flush=True)
    m1 = statistics.mean(results[1])
    m4 = statistics.mean(results[4])
    report = {
        "metric": "cdc_apply_pair_1_4_interleaved",
        "n_events": N_EVENTS,
        "runs_1c": results[1],
        "runs_4c": results[4],
        "mean_1c": round(m1, 1),
        "mean_4c": round(m4, 1),
        "efficiency_1_to_4": round(m4 / m1 / 4, 3),
        "ts": int(time.time()),
    }
    with open(os.path.join(HERE, "BENCH", "pair_1_4.json"), "w") as f:
        json.dump(report, f, indent=2)
    print(json.dumps(report))


if __name__ == "__main__":
    main()
