"""Hot-key skew handling: the hot repo's bucket splits across salted
files; shuffle keys stay high-cardinality."""

import os

from pyspark.sql import functions as F

from replicator_spark.feedgen import gen_changes, write_feed
from replicator_spark.laketable import LakeTable, bucket_expr
from replicator_spark.model import BUCKET_COL, REPOS_SCHEMA
from replicator_spark.pipeline import replay_feed


def test_salted_write_splits_hot_bucket(spark, tmp_path):
    feed = str(tmp_path / "feed")
    # 40% of events on repo-0000
    write_feed(
        gen_changes(spark, 4000, n_repos=16, hot_repo_pct=40, n_batches=1), feed
    )
    t = LakeTable(spark, str(tmp_path / "t"))
    t.create(REPOS_SCHEMA, num_buckets=8)
    replay_feed(
        spark, feed, t, mode="mor", files_per_bucket=4, write_metrics=False
    )
    snap = t._snap()
    deltas = snap.props["deltas"]
    # find the hot repo's bucket
    hot_bucket = (
        spark.createDataFrame([("repo-0000",)], "repo string")
        .select(bucket_expr(8))
        .first()[0]
    )
    files = deltas[str(hot_bucket)]
    assert len(files) == 4, "hot bucket must split across salted files"
    sizes = sorted(os.path.getsize(f) for f in files)
    assert sizes[0] > 0.25 * sizes[-1], f"salted files should be balanced: {sizes}"


def test_hot_repo_does_not_skew_lww_shuffle(spark, tmp_path):
    """LWW partitions by the full (repo,path,commit) key: even a 40%%-hot
    repo spreads across shuffle partitions."""
    feed = str(tmp_path / "feed")
    write_feed(
        gen_changes(spark, 4000, n_repos=16, hot_repo_pct=40, n_batches=1), feed
    )
    from replicator_spark.dedup import lww_latest
    from replicator_spark.model import KEY_COLS
    from replicator_spark.pipeline import infer_payload_schema, normalize

    raw = spark.read.parquet(f"{feed}/batch_id=0")
    prep = lww_latest(normalize(raw, infer_payload_schema(raw)), KEY_COLS, "seq")
    dist = (
        prep.withColumn("pid", F.spark_partition_id())
        .groupBy("pid")
        .count()
        .collect()
    )
    counts = [r["count"] for r in dist]
    assert max(counts) < 3 * (sum(counts) / len(counts)), counts
