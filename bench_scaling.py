#!/usr/bin/env python
"""Two-cluster-size scaling protocol (BASELINE.json north_rule).

No real cluster exists in this sandbox, so the N → 4N executor
comparison is evidenced by running the SAME CDC replay on the SAME
pre-generated feed at two parallelism levels, each in its own JVM
**confined to exactly N CPUs with taskset** (otherwise GC/JIT threads
of a small local[N] borrow the machine's idle cores and inflate the
small-N number). Throughput is measured at steady state (first two
micro-batches dropped — JIT/codegen warmup), heap scales per-core like
a real executor fleet, and scratch lives on tmpfs (the sandbox's single
shared disk does not scale with parallelism; cluster storage does).

Hardware ceiling on this VM (pure-CPU multiprocessing sha256):
1→4 procs ≈ 1.02 efficiency, 2→8 ≈ 0.88, 8→32 ≈ 0.66 — the upper
pairs are memory/turbo-bound at the machine level, so the headline
N→4N pair is 1→4 (engine measured 0.98; see BENCH/BASELINE.md).

Usage: python bench_scaling.py [N ...]   (default 1 4 8 32; the 1-core
level takes ~13 min at the default 32M events)
Writes BENCH/scaling.json and prints one JSON line.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

HERE = os.path.dirname(os.path.abspath(__file__))


def run_level(cpus: int, n_events: int) -> dict:
    env = {
        **os.environ,
        "SPARK_GRAFT_CPUS": str(cpus),
        "SPARK_GRAFT_BENCH_EVENTS": str(n_events),
        "SPARK_GRAFT_BENCH_ONLY": "cdc",
    }
    env.pop("SPARK_DRIVER_MEM", None)  # let bench.py size heap per-core
    cmd = [sys.executable, os.path.join(HERE, "bench.py")]
    n_host = os.cpu_count() or cpus
    if cpus < n_host:
        cmd = ["taskset", "-c", f"0-{cpus - 1}"] + cmd
    out = subprocess.run(cmd, env=env, capture_output=True, text=True, timeout=1800)
    line = [l for l in out.stdout.splitlines() if l.startswith("{")][-1]
    return json.loads(line)


def main() -> None:
    levels = [int(x) for x in sys.argv[1:]] or [1, 4, 8, 32]
    n_events = int(os.environ.get("SPARK_GRAFT_BENCH_EVENTS", "32000000"))
    results = {}
    for n in levels:
        r = run_level(n, n_events)["queries"]
        results[n] = {
            "apply_sec": r["cdc_apply"],
            "events": r["cdc_events"],
            "events_per_sec": r["cdc_events_per_sec"],
            "events_per_sec_steady": r["cdc_events_per_sec_steady"],
            "batch_walls_ms": r["cdc_batch_walls_ms"],
        }
        print(f"local[{n}] (taskset 0-{n-1}): {results[n]}", file=sys.stderr)

    pairs = {}
    for n in levels:
        if 4 * n in results:
            eff = (
                results[4 * n]["events_per_sec_steady"]
                / results[n]["events_per_sec_steady"]
                / 4
            )
            pairs[f"{n}->{4*n}"] = round(eff, 3)

    report = {
        "metric": "cdc_apply_scaling",
        "unit": "events/sec",
        "n_events": n_events,
        "protocol": "taskset-confined local[N], per-core heap, steady-state (2 warmup batches dropped), tmpfs scratch",
        "levels": {str(k): v for k, v in results.items()},
        "scaling_efficiency_steady": pairs,
        "ts": int(time.time()),
    }
    os.makedirs(os.path.join(HERE, "BENCH"), exist_ok=True)
    with open(os.path.join(HERE, "BENCH", "scaling.json"), "w") as f:
        json.dump(report, f, indent=2)
    print(json.dumps(report))


if __name__ == "__main__":
    main()
