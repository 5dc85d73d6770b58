#!/usr/bin/env python
"""Interleaved sf0.01-vs-sf0.1 scaling pair for the two shuffle-
heaviest curation ops (VERDICT r04 #6): ``dedup_pipeline_end2end``
(shingle → minhash → band join → verify → CC) and ``substring_dedup``
(gram-keyed shuffles + per-doc reassembly).

The north pair only measures cdc_apply; this records whether the
curation ops' gram/band-keyed shuffle chains scale ~linearly in input
size (10× rows sf0.01 → sf0.1, ~9.1× bytes). Same interleaving
rationale as pair_1_4.py: one-shot per-level measurements on this VM
are corrupted by ambient bursts (±30-45%), so levels alternate within
one session and medians are compared. Walls at sf0.01 carry a fixed
per-job scheduling floor (dozens of Spark jobs per op), so the
wall ratio is an UPPER bound on the data-linear term; report both the
raw ratio and the floor-adjusted view.

Usage: python BENCH/pair_curation_sf.py [iters]   (default 3)
Writes BENCH/pair_curation_sf.json.
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

OPS = ["dedup_pipeline_end2end", "substring_dedup"]
SFS = {"sf0.01": "/root/testdata/sf0.01", "sf0.1": "/root/testdata/sf0.1"}
ROWS = {"sf0.01": 500, "sf0.1": 5000}


def run(spark, name, sf_dir) -> float:
    t0 = time.time()
    entry.queries()[name](spark, sf_dir).write.format("noop").mode(
        "overwrite"
    ).save()
    return round(time.time() - t0, 3)


def main() -> None:
    iters = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    spark = get_spark("pair_curation", cores=32, shuffle_partitions=32)
    walls: dict[str, dict[str, list[float]]] = {
        op: {sf: [] for sf in SFS} for op in OPS
    }
    for op in OPS:  # warmup both levels (JVM/codegen/file-index caches)
        for sf, d in SFS.items():
            run(spark, op, d)
    for i in range(iters):
        for op in OPS:
            for sf in ("sf0.1", "sf0.01"):  # big first, alternating
                w = run(spark, op, SFS[sf])
                walls[op][sf].append(w)
                print(
                    json.dumps({"iter": i, "op": op, "sf": sf, "wall": w}),
                    file=sys.stderr,
                    flush=True,
                )
    report = {"metric": "curation_sf_pair_interleaved", "iters": iters,
              "rows": ROWS, "ops": {}}
    for op in OPS:
        m001 = statistics.median(walls[op]["sf0.01"])
        m01 = statistics.median(walls[op]["sf0.1"])
        report["ops"][op] = {
            "walls_sf0.01": walls[op]["sf0.01"],
            "walls_sf0.1": walls[op]["sf0.1"],
            "median_sf0.01": round(m001, 3),
            "median_sf0.1": round(m01, 3),
            # 10× data; ratio 1.0 = pure fixed cost, 10 = pure linear
            "wall_ratio_10x_data": round(m01 / m001, 2),
        }
    out = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "pair_curation_sf.json")
    with open(out, "w") as f:
        json.dump(report, f, indent=2)
    print(json.dumps(report))


if __name__ == "__main__":
    main()
