"""Slice 0 (SURVEY §7.2): feed → normalize → LWW dedup → MERGE →
final table state equals the sequential-apply oracle, sha256-verified."""

import hashlib

import pytest
from pyspark.sql import functions as F

from replicator_spark.feedgen import gen_changes, write_feed
from replicator_spark.laketable import LakeTable
from replicator_spark.model import REPOS_SCHEMA
from replicator_spark.pipeline import replay_feed

from .oracle import content_sha, sequential_apply

N_EVENTS = 3000


@pytest.fixture(scope="module")
def feed(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("feed"))
    df = gen_changes(spark, N_EVENTS, n_repos=10, paths_per_repo=40, n_batches=4)
    write_feed(df, d)
    return d


def _spark_state(table):
    rows = table.read().collect()
    return {
        (r["repo"], r["path"], r["commit"]): {
            "lang": r["lang"],
            "content": r["content"],
        }
        for r in rows
    }


def test_feed_deterministic(spark):
    a = gen_changes(spark, 500).orderBy("event_id", "batch_id").collect()
    b = gen_changes(spark, 500).orderBy("event_id", "batch_id").collect()
    assert a == b


def test_feed_has_variants(spark):
    df = gen_changes(spark, 2000)
    n = df.count()
    n_unique = df.select("event_id").distinct().count()
    assert n > n_unique, "duplicate redeliveries must be present"
    ops = {r[0] for r in df.select("op").distinct().collect()}
    assert ops == {"insert", "update", "delete"}
    hot = df.where(F.col("key.repo") == "repo-0000").count()
    assert hot / n > 0.25, "hot-repo skew fixture"


def test_replay_matches_sequential_oracle(spark, feed, tmp_path):
    root = str(tmp_path / "repos_table")
    table = LakeTable(spark, root)
    table.create(REPOS_SCHEMA, num_buckets=8)
    results = replay_feed(spark, feed, table)
    assert all(not r.merge.replayed for r in results)

    events = [r.asDict(recursive=True) for r in spark.read.parquet(feed).collect()]
    oracle = sequential_apply(events)
    got = _spark_state(table)

    assert set(got) == set(oracle), (
        f"key sets differ: extra={list(set(got)-set(oracle))[:3]} "
        f"missing={list(set(oracle)-set(got))[:3]}"
    )
    oracle_sha = content_sha(oracle)
    for k, v in got.items():
        sha = hashlib.sha256((v["content"] or "").encode()).hexdigest()
        assert sha == oracle_sha[k], f"content sha mismatch at {k}"

    # engine invariant: exactly one live row per key
    live = table.read()
    assert live.count() == live.select("repo", "path", "commit").distinct().count()


def test_merge_idempotent_replay(spark, feed, tmp_path):
    root = str(tmp_path / "t2")
    table = LakeTable(spark, root)
    table.create(REPOS_SCHEMA, num_buckets=4)
    replay_feed(spark, feed, table, batches=[0, 1])
    v_before = table._snap().version
    state_before = _spark_state(table)
    # replaying an already-committed batch must be a no-op
    res = replay_feed(spark, feed, table, batches=[0])
    assert res[0].merge.replayed
    assert table._snap().version == v_before
    assert _spark_state(table) == state_before


def test_time_travel_and_tombstones(spark, feed, tmp_path):
    root = str(tmp_path / "t3")
    table = LakeTable(spark, root)
    table.create(REPOS_SCHEMA, num_buckets=4)
    replay_feed(spark, feed, table)
    v = table._snap().version
    assert v >= 2
    # earlier snapshot readable and different
    n_now = table.read().count()
    n_v1 = table.read(version=1).count()
    assert n_v1 != n_now or v == 1
    # tombstones retained for cross-batch LWW
    n_all = table.read(include_deleted=True).count()
    assert n_all >= n_now
