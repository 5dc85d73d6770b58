#!/usr/bin/env python
"""Two-cluster-size scaling protocol (BASELINE.json north_rule).

No real cluster exists in this sandbox, so the N → 4N executor
comparison is evidenced by running the SAME CDC replay on the SAME
pre-generated feed at two local parallelism levels (local[N] vs
local[4N]) in separate JVMs, and reporting throughput at both plus
scaling efficiency = (tp_4N / tp_N) / 4.

Usage: python bench_scaling.py [N] [N] ...   (default pairs 2→8, 8→32)
Writes/updates BENCH/BASELINE.md and prints one JSON line.
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
    out = subprocess.run(
        [sys.executable, os.path.join(HERE, "bench.py")],
        env=env,
        capture_output=True,
        text=True,
        timeout=1800,
    )
    line = [l for l in out.stdout.splitlines() if l.startswith("{")][-1]
    return json.loads(line)


def main() -> None:
    levels = [int(x) for x in sys.argv[1:]] or [2, 8, 32]
    n_events = int(os.environ.get("SPARK_GRAFT_BENCH_EVENTS", "1500000"))
    results = {}
    for n in levels:
        r = run_level(n, n_events)
        results[n] = {
            "apply_sec": r["queries"]["cdc_apply"],
            "events": r["queries"]["cdc_events"],
            "events_per_sec": r["queries"]["cdc_events_per_sec"],
        }
        print(f"local[{n}]: {results[n]}", file=sys.stderr)

    pairs = {}
    for n in levels:
        if 4 * n in results:
            eff = results[4 * n]["events_per_sec"] / results[n]["events_per_sec"] / 4
            pairs[f"{n}->{4*n}"] = round(eff, 3)

    report = {
        "metric": "cdc_apply_scaling",
        "unit": "events/sec",
        "n_events": n_events,
        "levels": {str(k): v for k, v in results.items()},
        "scaling_efficiency": pairs,
        "ts": int(time.time()),
    }
    os.makedirs(os.path.join(HERE, "BENCH"), exist_ok=True)
    with open(os.path.join(HERE, "BENCH", "scaling.json"), "w") as f:
        json.dump(report, f, indent=2)
    print(json.dumps(report))


if __name__ == "__main__":
    main()
