"""Multi-source fan-in (the reference's multi-source aggregation,
``examples/configs/multi-source-aggregation.yaml``): several change
feeds replay into ONE table; stream-namespaced batch keys keep the
idempotence ledger from aliasing one stream's batches to another's."""

import hashlib

from pyspark.sql import functions as F

from replicator_spark.feedgen import gen_changes, write_feed
from replicator_spark.laketable import LakeTable
from replicator_spark.model import REPOS_SCHEMA
from replicator_spark.pipeline import replay_feed

from .oracle import content_sha, sequential_apply


def test_multi_source_fanin(spark, tmp_path):
    d1, d2 = str(tmp_path / "f1"), str(tmp_path / "f2")
    write_feed(gen_changes(spark, 1500, n_repos=8, n_batches=2, seed=1), d1)
    # second source: later log segment — seqs shifted past source 1's
    # (cross-source LWW needs a globally comparable order)
    write_feed(
        gen_changes(spark, 1500, n_repos=8, n_batches=2, seed=2)
        .withColumn("seq", F.col("seq") + F.lit(1_000_000))
        # event ids are a per-source namespace (each source is its own
        # log); without the prefix they'd collide with source 1's
        .withColumn("event_id", F.concat(F.lit("s2-"), F.col("event_id"))),
        d2,
    )
    root = str(tmp_path / "t")
    table = LakeTable(spark, root)
    table.create(REPOS_SCHEMA, num_buckets=8)

    r1 = replay_feed(spark, d1, table, mode="mor", stream_name="s1", write_metrics=False)
    r2 = replay_feed(spark, d2, table, mode="mor", stream_name="s2", write_metrics=False)
    # the second stream's batches must actually apply, not alias s1's
    assert all(not r.merge.replayed for r in r2)
    assert sum(r.merge.applied for r in r2) > 0
    assert len(table.committed_batches()) == len(r1) + len(r2)

    events = [
        r.asDict(recursive=True)
        for d in (d1, d2)
        for r in spark.read.parquet(d).collect()
    ]
    got = {
        (r["repo"], r["path"], r["commit"]): hashlib.sha256(
            (r["content"] or "").encode()
        ).hexdigest()
        for r in table.read().collect()
    }
    assert got == content_sha(sequential_apply(events))

    # re-replaying either stream is a no-op (per-stream exactly-once)
    assert all(r.merge.replayed for r in replay_feed(spark, d1, table, stream_name="s1"))
    assert all(r.merge.replayed for r in replay_feed(spark, d2, table, stream_name="s2"))
