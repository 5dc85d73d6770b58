#!/usr/bin/env python
"""The VM's own pure-CPU N→4N ceiling, measured the same way as the
engine pair (taskset-confined): N worker processes each hashing a
fixed byte budget with sha256. No Spark, no I/O — an upper bound on
ANY software's scaling efficiency on this box in this time window.

Usage: python BENCH/machine_ceiling.py [N [reps]]   (default 1→4, 3 reps)
Prints one JSON line.
"""

from __future__ import annotations

import hashlib
import json
import os
import statistics
import subprocess
import sys
import time

BYTES_PER_PROC = 3 << 30  # ~3 GiB of hashing per worker (~8 s/core)


def _worker() -> None:
    h = hashlib.sha256()
    block = b"\xab" * (1 << 20)
    for _ in range(BYTES_PER_PROC >> 20):
        h.update(block)
    sys.stdout.write(h.hexdigest()[:8])


def run_level(n: int) -> float:
    """Aggregate hash throughput (bytes/s) with n taskset-pinned procs."""
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
    return n * BYTES_PER_PROC / dt


def main() -> None:
    if "--worker" in sys.argv:
        _worker()
        return
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    lo, hi = [], []
    for _ in range(reps):  # interleaved small/large
        lo.append(run_level(n))
        hi.append(run_level(4 * n))
    eff = statistics.mean(hi) / statistics.mean(lo) / 4
    print(
        json.dumps(
            {
                "metric": f"machine_ceiling_{n}_to_{4*n}",
                "runs_lo_gbps": [round(x / 2**30, 2) for x in lo],
                "runs_hi_gbps": [round(x / 2**30, 2) for x in hi],
                "efficiency": round(eff, 3),
                "ts": int(time.time()),
            }
        )
    )


if __name__ == "__main__":
    main()
