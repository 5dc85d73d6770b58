#!/usr/bin/env python
"""Point-lookup pruning probe: LakeTable.lookup (one-bucket read via
driver-side xxhash64 routing) vs the naive full-scan filter, on a
bench-scale table.

Builds a 32-bucket mor table from a deterministic 2M-event feed (same
generator as bench.py), leaves deltas unresolved, then times N point
lookups both ways. Two outputs, with different scale meaning:

- files_per_lookup vs total_files — the DATA-PROPORTIONAL metric: the
  lookup reads 1/num_buckets of the table's files and skips the same
  fraction of LWW-resolve work. This ratio is what survives a 100-TB
  scale-up, where the full-scan form is a non-starter.
- wall speedup — honest but overhead-dominated at this toy scale
  (~0.2-0.3 s of job scheduling is the floor for BOTH arms, and 32
  cores chew 124 small files quickly); expect it far below the 32×
  file ratio here and approaching it only as per-bucket bytes grow.

Writes BENCH/lookup_probe.json.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(HERE))

from pyspark.sql import functions as F  # noqa: E402

from replicator_spark.feedgen import gen_changes, write_feed  # noqa: E402
from replicator_spark.laketable import LakeTable  # noqa: E402
from replicator_spark.model import REPOS_SCHEMA  # noqa: E402
from replicator_spark.pipeline import replay_feed  # noqa: E402
from replicator_spark.session import get_spark  # noqa: E402

SCRATCH = os.environ.get(
    "SPARK_GRAFT_SCRATCH",
    "/dev/shm/replicator_bench" if os.path.isdir("/dev/shm") else
    os.path.join(os.path.dirname(HERE), ".scratch", "bench"),
)
N_EVENTS = int(os.environ.get("LOOKUP_PROBE_EVENTS", "2000000"))
N_LOOKUPS = int(os.environ.get("LOOKUP_PROBE_N", "12"))


def main() -> None:
    spark = get_spark(
        "lookup-probe",
        cores=int(os.environ.get("SPARK_GRAFT_CPUS", "32")),
        shuffle_partitions=32,
    )
    root = os.path.join(SCRATCH, "lookup_table")
    feed = os.path.join(SCRATCH, f"lookup_feed_{N_EVENTS}")
    if not os.path.exists(os.path.join(feed, "_DONE")):
        shutil.rmtree(feed, ignore_errors=True)
        write_feed(
            gen_changes(spark, N_EVENTS, n_repos=200, paths_per_repo=500,
                        n_batches=4),
            feed,
        )
        open(os.path.join(feed, "_DONE"), "w").close()
    shutil.rmtree(root, ignore_errors=True)
    t = LakeTable(spark, root)
    t.create(REPOS_SCHEMA, num_buckets=32)
    # mor, compaction off: deltas stay unresolved so lookup also prunes
    # the LWW-resolve work, the realistic steady-state shape
    replay_feed(spark, feed, t, mode="mor", compact_after_deltas=100,
                write_metrics=False)

    repos = [f"repo-{i:04d}" for i in range(0, 200, 200 // N_LOOKUPS)][:N_LOOKUPS]
    # warm both paths once (JVM/codegen warmup out of the measurement)
    t.lookup(repos[0]).count()
    t.read().where(F.col("repo") == repos[0]).count()

    lookup_walls, scan_walls = [], []
    rows_l = rows_s = 0
    for r in repos:
        t0 = time.time()
        rows_l += t.lookup(r).count()
        lookup_walls.append(time.time() - t0)
        t0 = time.time()
        rows_s += t.read().where(F.col("repo") == r).count()
        scan_walls.append(time.time() - t0)
    assert rows_l == rows_s, (rows_l, rows_s)

    snap = t._snap()
    deltas = t._deltas(snap)
    total_files = sum(len(v) for v in snap.files.values()) + sum(
        len(v) for v in deltas.values()
    )
    per_lookup_files = [
        len(snap.files.get(str(t.bucket_of(r, snap)), []))
        + len(deltas.get(str(t.bucket_of(r, snap)), []))
        for r in repos
    ]
    out = {
        "metric": "point_lookup_vs_full_scan",
        "n_events": N_EVENTS,
        "n_lookups": N_LOOKUPS,
        "num_buckets": snap.num_buckets,
        "total_files": total_files,
        "files_per_lookup_mean": round(
            sum(per_lookup_files) / len(per_lookup_files), 1
        ),
        "file_read_fraction": round(
            sum(per_lookup_files) / len(per_lookup_files) / total_files, 4
        ),
        "rows_checked": rows_l,
        "lookup_mean_s": round(sum(lookup_walls) / len(lookup_walls), 4),
        "full_scan_mean_s": round(sum(scan_walls) / len(scan_walls), 4),
        "speedup": round(
            (sum(scan_walls) / len(scan_walls))
            / (sum(lookup_walls) / len(lookup_walls)),
            2,
        ),
        "ts": int(os.environ.get("SOURCE_DATE_EPOCH", time.time())),
    }
    with open(os.path.join(HERE, "lookup_probe.json"), "w") as f:
        json.dump(out, f)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
