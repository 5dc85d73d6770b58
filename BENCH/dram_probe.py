#!/usr/bin/env python
"""The VM's DRAM-bandwidth N→4N ceiling — the binding one for this
engine (r3 finding: the merge path is memory-bound at multi-core; its
scaling ceiling is the memory bus, not the cores). N taskset-pinned
worker processes each repeatedly memcpy a 256 MB numpy buffer; the
aggregate bytes/s at 1 vs 4 workers bounds any memory-bound software's
1→4 efficiency on this box in this time window.

Protocol hardening (review r4 #9 — the first cut timed Popen-to-exit,
so interpreter+numpy startup, first-touch page faults, and a cold
first rep polluted the numbers into incoherence): each worker
allocates and WARMS its buffers, reports "ready", blocks on a stdin
barrier, then times ONLY the copy loop; the parent releases all
workers at once and aggregates bytes over the overlapped window
(sum of bytes / max of per-worker elapsed).

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
WARMUP_PASSES = 3


def _worker() -> None:
    import numpy as np

    src = np.ones(BUF_MB << 20, dtype=np.uint8)
    dst = np.empty_like(src)
    for _ in range(WARMUP_PASSES):  # fault in both buffers, warm caches
        np.copyto(dst, src)
    sys.stdout.write("ready\n")
    sys.stdout.flush()
    sys.stdin.readline()  # barrier: wait for the parent's go
    t0 = time.time()
    for _ in range(PASSES):
        np.copyto(dst, src)
    dt = time.time() - t0
    sys.stdout.write(f"{dt}\n")
    sys.stdout.flush()


def run_level(n: int) -> float:
    """Aggregate copy throughput (GB/s) with n taskset-pinned procs,
    timed over the overlapped copy window only."""
    procs = [
        subprocess.Popen(
            ["taskset", "-c", str(i), sys.executable, __file__, "--worker"],
            stdin=subprocess.PIPE,
            stdout=subprocess.PIPE,
            text=True,
        )
        for i in range(n)
    ]
    for p in procs:
        assert p.stdout.readline().strip() == "ready"
    for p in procs:  # release the barrier everywhere at once
        p.stdin.write("go\n")
        p.stdin.flush()
    elapsed = [float(p.stdout.readline()) for p in procs]
    for p in procs:
        p.wait()
    # memcpy reads + writes: count both directions (the r3 convention)
    return n * PASSES * BUF_MB * 2 / 1024 / max(elapsed)


def main() -> None:
    if "--worker" in sys.argv:
        _worker()
        return
    n_hi = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    run_level(1)  # throwaway: fault in the page-cache/allocator path
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
