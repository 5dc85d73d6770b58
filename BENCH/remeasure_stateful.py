#!/usr/bin/env python
"""Re-measure repo_activity_stateful (VERDICT r04 "what's wrong" #2).

r4 recorded 7.85 s vs r3's 2.68 s (+193%) with NO code change on its
path — outside even the documented ±45% noise band, so it needs a
dedicated re-measure before being dismissed as ambient. Protocol:
one warmup, then N interleaved (control, target) pairs in one session
at sf0.1 / local[32] — the control (decimal_generated_column, which
SWUNG THE OTHER WAY in r4: 7.1→0.99 s) calibrates the window's noise.

Prints one JSON line with per-iteration walls + medians.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entry  # noqa: E402
from replicator_spark.session import get_spark  # noqa: E402


def run(spark, name, sf_dir):
    t0 = time.time()
    entry.queries()[name](spark, sf_dir).write.format("noop").mode(
        "overwrite"
    ).save()
    return round(time.time() - t0, 3)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    n = int(os.environ.get("N_ITER", "5"))
    spark = get_spark("remeasure", cores=32, shuffle_partitions=32)
    target, control = "repo_activity_stateful", "decimal_generated_column"
    # warmup (JVM/codegen)
    run(spark, control, sf_dir)
    run(spark, target, sf_dir)
    walls = {target: [], control: []}
    for _ in range(n):
        walls[control].append(run(spark, control, sf_dir))
        walls[target].append(run(spark, target, sf_dir))
    out = {
        "metric": "repo_activity_stateful_remeasure",
        "sf": sf_dir,
        "walls": walls,
        "median": {k: round(statistics.median(v), 3) for k, v in walls.items()},
        "r3_recorded": 2.68,
        "r4_recorded": 7.85,
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
