#!/usr/bin/env python
"""Stage timing for the document-dedup family at a given SF: which part
of minhash_lsh / simhash_dedup / substring_dedup owns the wall (guide
§1.4 noop isolation of sub-plans)."""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from replicator_spark.session import get_spark  # noqa: E402

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf1.0"
cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
os.environ.setdefault("SPARK_DRIVER_MEM", "28g")
spark = get_spark("probe_docs", cores=cpus, shuffle_partitions=cpus,
                  extra_conf={"spark.local.dir": "/dev/shm/replicator_bench/spark-local"})

def noop(df):
    t0 = time.time()
    df.write.format("noop").mode("overwrite").save()
    return round(time.time() - t0, 2)

docs = spark.read.parquet(f"{SF}/documents.parquet")
res = {}

# --- minhash_lsh stages ---
from replicator_spark.ops.dedup_text import (  # noqa: E402
    bucket_candidate_pairs, bucket_stats, lsh_band_buckets,
    minhash_signatures, shingle_expr,
)

_TEMPLATE_TEXT = (
    "all rights reserved terms of service privacy policy cookie notice "
    "subscribe to our newsletter for updates contact us about careers"
)
planted = docs.where(F.col("doc_id") < 60).select(
    (F.col("doc_id") + 10_000_000).alias("doc_id"), F.lit(_TEMPLATE_TEXT).alias("text"))
corpus = docs.select("doc_id", "text").unionByName(planted)

res["mh_shingle_only"] = noop(corpus.select("doc_id", shingle_expr("text", 5).alias("sh")))
sh = F.col("_sh")
base = corpus.select(F.col("doc_id"), shingle_expr("text", 5).alias("_sh"))
h0 = F.transform(sh, lambda s: F.conv(F.substring(F.sha2(s, 256), 1, 15), 16, 10).cast("long"))
res["mh_sha2_conv"] = noop(base.select("doc_id", h0.alias("h")))
sigs = minhash_signatures(corpus, num_hashes=128, base_hash="sha2_60")
res["mh_signatures"] = noop(sigs)
t0 = time.time()
sized = lsh_band_buckets(sigs, "doc_id", 16).localCheckpoint(eager=True)
res["mh_band_bucket_ckpt"] = round(time.time() - t0, 2)
res["mh_pairs"] = noop(bucket_candidate_pairs(sized, max_bucket=50))
res["mh_stats"] = noop(bucket_stats(sized, max_bucket=50))
print(json.dumps({k: v for k, v in res.items() if k.startswith("mh")}), flush=True)

# --- simhash stages ---
from replicator_spark.ops.dedup_text import simhash64, simhash_near_dups  # noqa: E402

toks = F.split(F.trim(F.col("text")), r"\s+")
th = F.transform(toks, lambda t: F.conv(F.sha2(t, 256).substr(1, 15), 16, 10).cast("long"))
res["sh_tokhash_only"] = noop(docs.select("doc_id", th.alias("th")))
hashes = simhash64(docs, token_hash="sha2")
res["sh_simhash"] = noop(hashes)
t0 = time.time()
hck = hashes.localCheckpoint(eager=True)
res["sh_simhash_ckpt"] = round(time.time() - t0, 2)
res["sh_block_verify"] = noop(simhash_near_dups(hck, max_hamming=3))
print(json.dumps({k: v for k, v in res.items() if k.startswith("sh")}), flush=True)

# --- substring_dedup stages ---
from replicator_spark.ops.dedup_text import strip_duplicated_substrings  # noqa: E402

res["ss_full"] = noop(strip_duplicated_substrings(docs, k=15))
wdf = docs.select(F.col("doc_id").alias("_id"), F.split(F.trim(F.col("text")), r"\s+").alias("_w"))
words = F.col("_w")
n_starts = F.greatest(F.size(words) - 14, F.lit(0))
starts_seq = F.slice(F.sequence(F.lit(1), F.greatest(n_starts, F.lit(1))), 1, n_starts)
grams = wdf.select("_id", F.explode(F.transform(
    starts_seq, lambda i: F.struct((i - 1).alias("p"), F.concat_ws(" ", F.slice(words, i, 15)).alias("gram")))).alias("g")
).select("_id", F.col("g.p").alias("p"), F.col("g.gram").alias("gram"))
res["ss_grams_only"] = noop(grams)
res["ss_dupcount"] = noop(grams.groupBy("gram").agg(F.count(F.lit(1)).alias("cnt")).where(F.col("cnt") > 1))
print(json.dumps(res))
