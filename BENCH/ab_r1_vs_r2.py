#!/usr/bin/env python
"""Interleaved A/B: round-1 engine (a4b24d3) vs HEAD, same feed, same JVM
config, taskset-confined. Settles whether the r2 ladder's -42% 32-core
steady drop was code or machine (VERDICT r02 top-next).

bench.py / feedgen.py are IDENTICAL between the two commits (verified:
`git diff a4b24d3..HEAD -- bench.py replicator_spark/feedgen.py` is
empty), so the feed is bit-identical and shared via the tmpfs cache;
only the replicator_spark engine differs.

Runs strictly interleaved (A,B,A,B,...) so slow-drift machine noise
hits both arms equally. Writes BENCH/ab_r1_vs_r2.json.

Usage: python BENCH/ab_r1_vs_r2.py [reps32] [reps8]
"""

from __future__ import annotations

import json
import os
import statistics
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
# BOTH arms pinned in worktrees (r1 = a4b24d3, r2 = 1263fb7) so ongoing
# round-3 edits in the live repo cannot contaminate the comparison.
WT_R1 = os.path.join(REPO, ".scratch", "wt_r1")
WT_R2 = os.path.join(REPO, ".scratch", "wt_r2")
N_EVENTS = int(os.environ.get("SPARK_GRAFT_BENCH_EVENTS", "32000000"))


def run_one(tree: str, cpus: int) -> dict:
    env = {
        **os.environ,
        "SPARK_GRAFT_CPUS": str(cpus),
        "SPARK_GRAFT_BENCH_EVENTS": str(N_EVENTS),
        "SPARK_GRAFT_BENCH_ONLY": "cdc",
    }
    env.pop("SPARK_DRIVER_MEM", None)
    cmd = [sys.executable, os.path.join(tree, "bench.py")]
    n_host = os.cpu_count() or cpus
    if cpus < n_host:
        cmd = ["taskset", "-c", f"0-{cpus - 1}"] + cmd
    out = subprocess.run(cmd, env=env, capture_output=True, text=True,
                         timeout=2400, cwd=tree)
    line = [l for l in out.stdout.splitlines() if l.startswith("{")][-1]
    q = json.loads(line)["queries"]
    return {
        "steady": q["cdc_events_per_sec_steady"],
        "whole": q["cdc_events_per_sec"],
        "walls_ms": q["cdc_batch_walls_ms"],
    }


def main() -> None:
    reps32 = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    reps8 = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    arms = {"r1": WT_R1, "r2": WT_R2}
    results: dict = {"n_events": N_EVENTS, "runs": []}
    plan = [(32, i) for i in range(reps32)] + [(8, i) for i in range(reps8)]
    for cpus, rep in plan:
        for name, tree in arms.items():
            t0 = time.time()
            r = run_one(tree, cpus)
            r.update(arm=name, cpus=cpus, rep=rep, wall=round(time.time() - t0, 1))
            results["runs"].append(r)
            print(json.dumps(r), file=sys.stderr, flush=True)
            with open(os.path.join(REPO, "BENCH", "ab_r1_vs_r2.json"), "w") as f:
                json.dump(results, f, indent=2)

    for cpus in (32, 8):
        for name in arms:
            vals = [r["steady"] for r in results["runs"]
                    if r["arm"] == name and r["cpus"] == cpus]
            if vals:
                results[f"{name}_{cpus}c"] = {
                    "runs": vals,
                    "mean": round(statistics.mean(vals), 1),
                    "stdev": round(statistics.stdev(vals), 1) if len(vals) > 1 else 0,
                }
    with open(os.path.join(REPO, "BENCH", "ab_r1_vs_r2.json"), "w") as f:
        json.dump(results, f, indent=2)
    print(json.dumps({k: v for k, v in results.items() if k != "runs"}))


if __name__ == "__main__":
    main()
