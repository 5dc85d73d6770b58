#!/usr/bin/env python
"""Per-query measurement harness for optimization work (guide §1.4).

bench.py is FROZEN for driver measurement; this file exists so single
queries can be isolated with the noop sink without paying for the whole
bench. Usage:

    python bench_extra.py [--sf DIR] [--explain plans/r06 --tag before] q1 q2 ...

Prints one JSON line {"sf_dir":..., "queries": {name: sec, ...}} and,
with --explain, writes <dir>/<query>_<tag>.txt with the formatted plan.
Same session shape as bench.py (local[$SPARK_GRAFT_CPUS], shuffle
partitions = cores, scratch on tmpfs).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from replicator_spark.session import get_spark  # noqa: E402

SCRATCH = os.environ.get(
    "SPARK_GRAFT_SCRATCH",
    "/dev/shm/replicator_bench" if os.path.isdir("/dev/shm") else
    os.path.join(os.path.dirname(os.path.abspath(__file__)), ".scratch", "bench"),
)


def _formatted_plan(df) -> str:
    jqe = df._jdf.queryExecution()
    jvm = df.sparkSession._jvm
    return jvm.org.apache.spark.sql.api.python.PythonSQLUtils.explainString(
        jqe, "formatted"
    )


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="+")
    ap.add_argument("--sf", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--explain", default=None, help="directory for plan dumps")
    ap.add_argument("--tag", default="before")
    ap.add_argument("--repeat", type=int, default=1)
    ap.add_argument("--plan-only", action="store_true",
                    help="skip the timed noop run; just dump plans")
    args = ap.parse_args()

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    heap_gb = int(os.environ.get("SPARK_GRAFT_HEAP_GB", str(min(3 * cpus, 28))))
    os.environ.setdefault("SPARK_DRIVER_MEM", f"{heap_gb}g")
    os.makedirs(SCRATCH, exist_ok=True)
    spark = get_spark(
        "bench_extra",
        cores=cpus,
        shuffle_partitions=cpus,
        extra_conf={
            "spark.local.dir": os.path.join(SCRATCH, "spark-local"),
            "spark.driver.extraJavaOptions": (
                f"-XX:+UseG1GC -XX:+AlwaysPreTouch -Xms{heap_gb}g"
            ),
        },
    )
    import __spark_entry__ as entry

    qs = entry.queries()
    out: dict = {}
    for name in args.names:
        fn = qs[name]
        samples = []
        for r in range(0 if args.plan_only else args.repeat):
            spark.sparkContext.setJobDescription(f"{name} [{args.tag} r{r}]")
            t0 = time.time()
            df = fn(spark, args.sf)
            df.write.format("noop").mode("overwrite").save()
            samples.append(round(time.time() - t0, 3))
            spark.sparkContext.setJobDescription(None)
        out[name] = (samples if args.repeat > 1 else samples[0]) if samples else None
        if args.explain:
            os.makedirs(args.explain, exist_ok=True)
            with open(os.path.join(args.explain, f"{name}_{args.tag}.txt"), "w") as f:
                f.write(_formatted_plan(fn(spark, args.sf)))
    print(json.dumps({"sf_dir": args.sf, "cpus": cpus, "tag": args.tag, "queries": out}))


if __name__ == "__main__":
    main()
