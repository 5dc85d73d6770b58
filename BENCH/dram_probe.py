#!/usr/bin/env python
"""The VM's DRAM-bandwidth N→4N ceiling — the binding one for this
engine (r3 finding: the merge path is memory-bound at multi-core; its
scaling ceiling is the memory bus, not the cores). N taskset-pinned
worker processes each repeatedly memcpy a 256 MB numpy buffer; the
aggregate bytes/s at 1 vs 4 workers bounds any memory-bound software's
1→4 efficiency on this box in this time window.

r3 measured this ad hoc (BENCH/machine_ceiling_r3.json,
dram_bandwidth_1_to_4 = 0.769 vs engine 0.744 = 97% of ceiling); this
script makes the probe repeatable per round.

Usage: python BENCH/dram_probe.py [N [reps]]   (default 1→4, 3 reps)
Prints one JSON line.
"""

from __future__ import annotations

import json
import statistics
import subprocess
import sys
import time

BUF_MB = 256
PASSES = 40  # ~10 GB copied per worker per run


def _worker() -> None:
    import numpy as np

    src = np.ones(BUF_MB << 20, dtype=np.uint8)
    dst = np.empty_like(src)
    for _ in range(PASSES):
        np.copyto(dst, src)
    sys.stdout.write(str(int(dst[0])))


def run_level(n: int) -> float:
    """Aggregate copy throughput (GB/s) with n taskset-pinned procs."""
    procs = []
    t0 = time.time()
    for i in range(n):
        procs.append(
            subprocess.Popen(
                ["taskset", "-c", str(i), sys.executable, __file__, "--worker"],
                stdout=subprocess.DEVNULL,
            )
        )
    for p in procs:
        p.wait()
    dt = time.time() - t0
    # memcpy reads + writes: count both directions, the convention the
    # r3 ad-hoc probe used
    return n * PASSES * BUF_MB * 2 / 1024 / dt


def main() -> None:
    if "--worker" in sys.argv:
        _worker()
        return
    n_hi = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    lo, hi = [], []
    for _ in range(reps):
        lo.append(round(run_level(1), 1))
        hi.append(round(run_level(n_hi), 1))
    eff = statistics.mean(hi) / (n_hi * statistics.mean(lo))
    print(
        json.dumps(
            {
                "metric": f"dram_bandwidth_1_to_{n_hi}",
                "runs_1c_gbps": lo,
                f"runs_{n_hi}c_gbps": hi,
                "efficiency": round(eff, 3),
                "ts": int(time.time()),
            }
        )
    )


if __name__ == "__main__":
    main()
