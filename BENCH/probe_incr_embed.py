#!/usr/bin/env python
"""Phase breakdown of incremental_embedding_dedup at a given SF
(guide §1: measure before touching). Mirrors q_incremental_embedding_dedup
but times each add_batch sub-phase: prepare/checkpoint, order guard,
vectors merge, bands merge, candidate+verify materialization.
"""
import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from replicator_spark.session import get_spark  # noqa: E402
from replicator_spark.ops.incremental_embed import EmbeddingIndex  # noqa: E402

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf1.0"
cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
os.environ.setdefault("SPARK_DRIVER_MEM", "28g")
spark = get_spark("probe_incr_embed", cores=cpus, shuffle_partitions=cpus,
                  extra_conf={"spark.local.dir": "/dev/shm/replicator_bench/spark-local"})

emb = spark.read.parquet(f"{SF}/embeddings.parquet")
v = F.transform(F.col("embedding"), lambda x: x.cast("double"))
base = emb.select("vec_id", v.alias("v"))
perturb = lambda off: F.concat(F.array(F.col("v")[0] + F.lit(off)), F.slice(F.col("v"), 2, 63))  # noqa
d1 = base.where(F.col("vec_id") % 10 == 0).select((F.col("vec_id") + 100000).alias("vec_id"), perturb(0.05).alias("v"))
d2 = base.where(F.col("vec_id") % 20 == 0).select((F.col("vec_id") + 200000).alias("vec_id"), perturb(0.07).alias("v"))
aug = base.unionByName(d1).unionByName(d2)
mid = int(base.selectExpr("percentile(vec_id, 0.5) as m").first()[0])

root = "/dev/shm/replicator_bench/probe_emb_idx"
shutil.rmtree(root, ignore_errors=True)
idx = EmbeddingIndex(spark, root, dim=64, num_tables=16, max_bucket=500)
idx.create(num_buckets=8)

bounds = [None, mid, 100000, 200000, None]
res = []
for b in range(4):
    blo, bhi = bounds[b], bounds[b + 1]
    batch = aug
    if blo is not None:
        batch = batch.where(F.col("vec_id") >= blo)
    if bhi is not None:
        batch = batch.where(F.col("vec_id") < bhi)
    t = {}
    t0 = time.time()
    prepared = idx._prepared(batch, "vec_id", "v").localCheckpoint(eager=True)
    t["prep"] = round(time.time() - t0, 2)
    t0 = time.time()
    batch_lo = prepared.agg(F.min("vec_id")).first()[0]
    t["guard"] = round(time.time() - t0, 2)
    t0 = time.time()
    idx.vectors.merge(
        prepared.select("vec_id", "v").dropDuplicates(["vec_id"]).select(
            "vec_id", "v", F.col("vec_id").alias("seq"), F.lit("upsert").alias("op")),
        f"vecs-{b}", mode="mor")
    t["merge_vec"] = round(time.time() - t0, 2)
    rk_cols = [f"rk{r+1}" for r in range(4)]
    t0 = time.time()
    idx.bands.merge(
        prepared.select("band_key", "vec_id", *rk_cols,
                        F.col("vec_id").alias("seq"), F.lit("upsert").alias("op")),
        f"vecs-{b}", mode="mor")
    t["merge_bands"] = round(time.time() - t0, 2)
    # candidate stage alone (no verify): join + window caps + distinct
    t0 = time.time()
    index_df = idx.bands.read().select(
        "band_key", F.col("vec_id").alias("old_id"),
        *[F.col(f"rk{r+1}").alias(f"ork{r+1}") for r in range(4)])
    mine = prepared.select("band_key", F.col("vec_id").alias("new_id"), *rk_cols)
    j = mine.join(index_df, "band_key").where(F.col("old_id") < F.col("new_id"))
    n_joined = j.count()
    t["join_count"] = round(time.time() - t0, 2)
    t0 = time.time()
    pairs = idx._verified_pairs(prepared).localCheckpoint(eager=True)
    npairs = pairs.count()
    t["verify_all"] = round(time.time() - t0, 2)
    t["n_joined"] = n_joined
    t["n_pairs"] = npairs
    res.append(t)
    print(json.dumps({"batch": b, **t}), flush=True)
print(json.dumps({"total_per_phase": {k: round(sum(r[k] for r in res), 2) for k in res[0]}}))
