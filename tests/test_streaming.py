"""Streaming path: AvailableNow replay equivalence, kill-and-resume
without duplicate or lost applies, additive schema evolution mid-stream
(north_star requirements)."""

import hashlib
import json
import time

import pytest
from pyspark.sql import functions as F

from replicator_spark.feedgen import gen_changes, write_feed
from replicator_spark.laketable import LakeTable
from replicator_spark.model import REPOS_SCHEMA
from replicator_spark.streaming import run_stream, run_stream_to_completion

from .oracle import content_sha, sequential_apply

N = 4000


@pytest.fixture(scope="module")
def feed(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("sfeed"))
    write_feed(gen_changes(spark, N, n_repos=12, n_batches=6), d)
    return d


def _oracle_state(spark, feed):
    events = [r.asDict(recursive=True) for r in spark.read.parquet(feed).collect()]
    return sequential_apply(events)


def _table_sha(table):
    return {
        (r["repo"], r["path"], r["commit"]): hashlib.sha256(
            (r["content"] or "").encode()
        ).hexdigest()
        for r in table.read().collect()
    }


def test_streaming_replay_matches_oracle(spark, feed, tmp_path):
    root, ckpt = str(tmp_path / "t"), str(tmp_path / "ckpt")
    table = LakeTable(spark, root)
    table.create(REPOS_SCHEMA, num_buckets=8)
    run_stream_to_completion(spark, feed, table, ckpt)
    assert _table_sha(table) == content_sha(_oracle_state(spark, feed))


def test_kill_and_resume_exactly_once(spark, feed, tmp_path):
    """Stop the query mid-replay; restart from checkpoint; final state
    must equal the oracle — no duplicate and no lost applies."""
    root, ckpt = str(tmp_path / "t"), str(tmp_path / "ckpt")
    table = LakeTable(spark, root)
    table.create(REPOS_SCHEMA, num_buckets=8)

    q = run_stream(
        spark, feed, table, ckpt, available_now=True, max_files_per_trigger=1
    )
    # kill after at least one micro-batch committed, before completion
    deadline = time.time() + 120
    while time.time() < deadline:
        if len(table.committed_batches()) >= 2:
            break
        time.sleep(0.2)
    q.stop()
    q.awaitTermination()
    n_committed_at_kill = len(table.committed_batches())
    assert 0 < n_committed_at_kill, "must have committed something before kill"

    # restart from the same checkpoint — Spark replays from the offset
    # WAL; the table's batch ledger absorbs any batch re-delivery
    run_stream_to_completion(
        spark, feed, table, ckpt, max_files_per_trigger=1
    )
    assert len(table.committed_batches()) > n_committed_at_kill
    assert _table_sha(table) == content_sha(_oracle_state(spark, feed))

    # one live row per key, never more (no duplicate applies)
    live = table.read()
    assert live.count() == live.select("repo", "path", "commit").distinct().count()


def test_schema_evolution_mid_stream(spark, tmp_path):
    """Events after the cut-over seq carry an extra 'branch' field; the
    table must widen additively and old rows read null."""
    d = str(tmp_path / "efeed")
    write_feed(
        gen_changes(spark, 3000, n_repos=8, n_batches=4, evolution_at=1500), d
    )
    root, ckpt = str(tmp_path / "t"), str(tmp_path / "ckpt")
    table = LakeTable(spark, root)
    table.create(REPOS_SCHEMA, num_buckets=4)
    run_stream_to_completion(spark, d, table, ckpt)

    schema = table.schema()
    assert "branch" in schema.fieldNames(), "table schema must have widened"
    live = table.read()
    assert "branch" in live.columns
    n_branch = live.where(F.col("branch").isNotNull()).count()
    assert n_branch > 0
    # rows last written before the cut-over read as null
    old = table.read(include_engine_cols=True)
    assert old.where(F.col("branch").isNull() & (F.col("_last_seq") < 1500)).count() > 0

    # oracle check still holds with evolved docs
    events = [r.asDict(recursive=True) for r in spark.read.parquet(d).collect()]
    oracle = sequential_apply(events)
    got = {
        (r["repo"], r["path"], r["commit"]): (r["content"], r["branch"])
        for r in live.collect()
    }
    assert set(got) == set(oracle)
    for k, v in oracle.items():
        assert got[k][0] == v.get("content")
        assert got[k][1] == v.get("branch")


def test_windowed_stats_stream_with_watermark(spark, tmp_path):
    """Streaming EventStatistics (O4): tumbling event-time windows with
    a watermark — a window finalizes once the watermark passes its end,
    and an event arriving later than the watermark is dropped (bounded
    state, the documented completeness trade)."""
    import time
    from datetime import datetime

    from replicator_spark.streaming import feed_stream_schema, run_stats_stream

    feed = str(tmp_path / "feed")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    def _rows(specs):
        # specs: list of (seq, op, ts_str)
        return [
            (
                f"e{seq}", seq, op, datetime.fromisoformat(ts),
                None, None, ("r", f"p{seq}", "c"), "{}", None, None, 0,
            )
            for seq, op, ts in specs
        ]

    schema = feed_stream_schema()

    def _write(specs):
        spark.createDataFrame(_rows(specs), schema).coalesce(1).write.mode(
            "append"
        ).parquet(feed)
        time.sleep(0.1)  # distinct mod-times → deterministic file order

    # batch 1: fills window 10:00-11:00, then advances event time far
    # enough that the watermark (max ts - 10 min) passes 11:00
    _write(
        [
            (1, "insert", "2024-01-01 10:05:00"),
            (2, "insert", "2024-01-01 10:20:00"),
            (3, "update", "2024-01-01 10:40:00"),
            (4, "update", "2024-01-01 12:30:00"),
        ]
    )
    # batch 2: flush batch — at its end the 10:00 window (end < the
    # now-advanced watermark) is emitted and its state evicted
    _write([(8, "update", "2024-01-01 12:40:00")])
    # batch 3: a LATE event for the already-evicted 10:00 window → dropped
    # (a late row landing in the SAME batch that finalizes its window
    # still counts — eviction is the drop boundary)
    _write([(5, "insert", "2024-01-01 10:15:00")])
    # batch 4: keeps the stream moving so later windows flush
    _write([(6, "delete", "2024-01-01 13:10:00"), (7, "insert", "2024-01-01 14:50:00")])

    q = run_stats_stream(
        spark, feed, out, ckpt,
        window="1 hour", watermark="10 minutes", max_files_per_trigger=1,
    )
    q.awaitTermination()

    got = {
        (r["window_start"].isoformat(), r["op"]): r["n_events"]
        for r in spark.read.parquet(out).collect()
    }
    # the 10:00 window finalized with 2 inserts + 1 update; the late
    # seq=5 insert (arriving after the watermark passed 11:00) is NOT
    # counted
    assert got[("2024-01-01T10:00:00", "insert")] == 2
    assert got[("2024-01-01T10:00:00", "update")] == 1
    # 12:00 window finalized once event time passed 13:10
    assert got[("2024-01-01T12:00:00", "update")] == 2


def test_repo_activity_stateful_stream(spark, tmp_path):
    """applyInPandasWithState: per-repo cumulative profile carried in
    managed state across micro-batches — per-batch emissions are
    monotone per key and the final profile equals the batch ground
    truth; state survives a restart via the checkpoint."""
    from pyspark.sql import functions as F

    from replicator_spark.feedgen import gen_changes, write_feed
    from replicator_spark.streaming import run_repo_activity_stream

    feed = str(tmp_path / "feed")
    write_feed(gen_changes(spark, 2000, n_repos=5, n_batches=4, dup_pct=0), feed)
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")

    q = run_repo_activity_stream(spark, feed, out, ckpt, max_files_per_trigger=4)
    q.awaitTermination()
    # no row-at-a-time Python: the STREAMING query's own executed plan
    # must show the Arrow stateful operator (asserting on the batch
    # re-read of the output parquet would be vacuous)
    qplan = q._jsq.explainInternal(True)
    assert "FlatMapGroupsInPandasWithState" in qplan
    assert "BatchEvalPython" not in qplan

    emitted = spark.read.parquet(out)
    # final profile per repo = max over the audit trail (counts are
    # cumulative, so the last emission carries the totals)
    final = (
        emitted.groupBy("repo")
        .agg(
            F.max("n_inserts").alias("ni"),
            F.max("n_updates").alias("nu"),
            F.max("n_deletes").alias("nd"),
            F.max("seq_hi").alias("hi"),
        )
        .collect()
    )
    raw = spark.read.parquet(feed).select(F.col("key.repo").alias("repo"), "op", "seq")
    truth = {
        r["repo"]: r
        for r in raw.groupBy("repo")
        .agg(
            F.sum(F.when(F.col("op") == "insert", 1).otherwise(0)).alias("ni"),
            F.sum(F.when(F.col("op") == "update", 1).otherwise(0)).alias("nu"),
            F.sum(F.when(F.col("op") == "delete", 1).otherwise(0)).alias("nd"),
            F.max("seq").alias("hi"),
        )
        .collect()
    }
    assert len(final) == len(truth)
    for r in final:
        t = truth[r["repo"]]
        assert (r["ni"], r["nu"], r["nd"], r["hi"]) == (t["ni"], t["nu"], t["nd"], t["hi"])

    # multiple micro-batches actually happened (state crossed batches)
    n_batches_emitted = emitted.groupBy("repo").count().agg(F.max("count")).first()[0]
    assert n_batches_emitted >= 2




def test_type_conflict_mid_stream(spark, tmp_path):
    """A payload field flips int→string mid-STREAM: the tracker's
    conflict detection must widen to string through the streaming path
    with zero silently-nulled values (VERDICT r02 missing #1, streaming
    form)."""
    from pyspark.sql import types as T

    rows = []
    for s in range(300):
        stars = s % 9 if s < 150 else f'"s{s % 9}"'
        rows.append(
            (
                f"e{s}", s, "insert", (f"r{s % 5}", f"p{s}", "c"),
                f'{{"lang":"py","content":"c{s}","stars":{stars}}}',
                s // 75,
            )
        )
    schema = T.StructType(
        [
            T.StructField("event_id", T.StringType()),
            T.StructField("seq", T.LongType()),
            T.StructField("op", T.StringType()),
            T.StructField(
                "key",
                T.StructType(
                    [
                        T.StructField("repo", T.StringType()),
                        T.StructField("path", T.StringType()),
                        T.StructField("commit", T.StringType()),
                    ]
                ),
            ),
            T.StructField("doc", T.StringType()),
            T.StructField("batch_id", T.IntegerType()),
        ]
    )
    d = str(tmp_path / "feed")
    spark.createDataFrame(rows, schema).repartition(1).write.partitionBy(
        "batch_id"
    ).parquet(d)

    root, ckpt = str(tmp_path / "t"), str(tmp_path / "ckpt")
    table = LakeTable(spark, root)
    table.create(
        T.StructType(
            list(REPOS_SCHEMA.fields) + [T.StructField("stars", T.LongType())]
        ),
        num_buckets=4,
    )
    run_stream_to_completion(spark, d, table, ckpt, max_files_per_trigger=1)

    assert dict((f.name, f.dataType) for f in table.schema().fields)[
        "stars"
    ] == T.StringType()
    live = table.read()
    assert live.count() == 300
    assert live.where("stars IS NULL").count() == 0
    assert live.where("stars = 's4'").count() > 0
    assert live.where("stars = '4'").count() > 0


def test_live_trigger_soak_pause_breaker_and_concurrent_consumer(
    spark, tmp_path, monkeypatch, request
):
    """VERDICT r03 #8 (live-trigger soak): a processingTime stream over a
    GROWING feed, with a concurrent read_changes consumer, a transient
    sink outage that opens the circuit breaker and recovers, a pause
    issued DURING a later open-circuit window (clean stop, not a crash),
    and a resume that re-delivers the failed batch. The consumer must
    converge bit-identical to the table; no duplicate or lost applies
    across the pause + breaker windows.

    The feed is SEQ-RANGED per batch (a live tail delivers the log in
    order — gen_changes' hash-assigned batches model replay-time
    shuffling instead): read_changes' seq-watermark consumer protocol
    assumes reordering bounded by a window (laketable.read_changes
    caveat 1), and a live-trigger consumer polling mid-stream is exactly
    the case that contract exists for."""
    import math
    import time

    from replicator_spark import lifecycle
    from replicator_spark import streaming as sm
    from replicator_spark.qos import (
        CircuitBreaker,
        CircuitBreakerConfig,
        QoS,
        RetryPolicy,
    )
    from replicator_spark.streaming import await_stream

    all_changes = gen_changes(spark, 1500, n_repos=6, n_batches=6)
    span = math.ceil(
        (all_changes.agg(F.max("seq")).first()[0] + 1) / 6
    )
    all_changes = all_changes.withColumn(
        "batch_id", (F.col("seq") / span).cast("int")
    ).cache()
    feed = str(tmp_path / "feed")

    def push(b):
        all_changes.where(F.col("batch_id") == b).coalesce(1).write.mode(
            "append"
        ).parquet(feed)
        time.sleep(0.1)  # distinct mtimes -> deterministic file order

    root, ckpt = str(tmp_path / "t"), str(tmp_path / "ckpt")
    table = LakeTable(spark, root)
    table.create(REPOS_SCHEMA, num_buckets=4)

    # management API runs BESIDE the live stream (the reference's
    # process shape); drive the resume through it and probe health at
    # each phase — concurrent HTTP handlers against a table mid-write
    import urllib.error
    import urllib.request

    from replicator_spark.http_api import ManagementServer

    mgmt = ManagementServer(root, feed_dir=feed, checkpoint_dir=ckpt,
                            freshness_s=3600)
    api = mgmt.start()
    request.addfinalizer(mgmt.stop)

    def http(path, method="GET", body=None):
        req = urllib.request.Request(api + path, method=method)
        data = None
        if body is not None:
            data = json.dumps(body).encode()
            req.add_header("Content-Type", "application/json")
        try:
            with urllib.request.urlopen(req, data=data, timeout=10) as r:
                return r.status, json.loads(r.read() or b"{}")
        except urllib.error.HTTPError as e:
            return e.code, json.loads(e.read() or b"{}")

    # induced sink outages, keyed by ledger batch key; -1 = until cleared
    fails = {"live-1": 2}
    orig_apply = sm.apply_batch

    def flaky(tbl, df, batch_key=None, **kw):
        n = fails.get(batch_key, 0)
        if n != 0:
            if n > 0:
                fails[batch_key] = n - 1
            raise RuntimeError(f"induced outage for {batch_key}")
        return orig_apply(tbl, df, batch_key=batch_key, **kw)

    monkeypatch.setattr(sm, "apply_batch", flaky)

    def mk_qos():
        return QoS(
            retry=RetryPolicy(max_retries=8, initial_delay_s=0.1, max_delay_s=0.5),
            breaker=CircuitBreaker(
                CircuitBreakerConfig(
                    failure_threshold=1, recovery_timeout_s=2.0, half_open_requests=1
                )
            ),
        )

    def start():
        return run_stream(
            spark, feed, table, ckpt,
            available_now=False, processing_time="1 second",
            max_files_per_trigger=1, stream_name="live", mode="mor",
            qos=mk_qos(),
        )

    # concurrent consumer: fold read_changes into its own LWW state
    state, wm = {}, [-1]  # -1: read_changes floor is EXCLUSIVE; seq starts at 0

    def consume():
        if table._snap().version == 0:
            return
        for r in table.read_changes(since_seq=wm[0]).collect():
            k = (r["repo"], r["path"], r["commit"])
            cur = state.get(k)
            if cur is None or r["_last_seq"] > cur[0]:
                state[k] = (r["_last_seq"], r["_deleted"], r["content"])
            wm[0] = max(wm[0], r["_last_seq"])

    def wait_for(pred, timeout=120.0, what=""):
        deadline = time.time() + timeout
        while time.time() < deadline:
            if pred():
                return
            consume()
            time.sleep(0.3)
        raise AssertionError(f"timeout waiting for {what}")

    for b in (0, 1, 2):
        push(b)
    q = start()
    try:
        # phase 1: live batches apply; live-1 hits the transient outage,
        # the breaker opens, recovery passes, the batch lands anyway
        wait_for(
            lambda: table.is_committed("live-2") is not None,
            what="live-0..2 applied through the transient breaker window",
        )
        assert fails["live-1"] == 0  # the outage really happened
        # the open->...->closed transitions were persisted for health
        assert lifecycle.breaker_states(root)["live"]["state"] == "closed"
        # API sees the live stream while micro-batches are committing
        code, body = http("/streams")
        assert code == 200
        assert "live" in [s["name"] for s in body["streams"]]
        assert http("/health")[0] == 200

        # phase 2: persistent outage on live-3; pause lands DURING the
        # open-circuit wait -> clean stop (no crash), batch NOT in WAL
        fails["live-3"] = -1
        push(3)
        wait_for(
            lambda: lifecycle.breaker_states(root)["live"].get("state") == "open",
            what="breaker open on live-3",
        )
        lifecycle.pause(root, "live")
        await_stream(q, root, "live")  # swallows the pause-initiated abort
        assert not q.isActive
    finally:
        if q.isActive:
            q.stop()
    assert table.is_committed("live-3") is None  # failed batch not applied
    # paused + persisted-open breaker → not ready over HTTP
    code, h = http("/health/ready")
    assert code == 503 and not h["healthy"]

    # phase 3: outage over, resume THROUGH THE API; restart re-delivers
    # live-3 from the WAL, then the feed keeps growing
    fails.pop("live-3")
    code, body = http(
        "/streams/live/actions", method="POST", body={"action": "resume"}
    )
    assert code == 200 and body["success"]
    assert not lifecycle.is_paused(root, "live")
    q = start()
    try:
        wait_for(
            lambda: table.is_committed("live-3") is not None,
            what="live-3 re-delivered after resume",
        )
        push(4)
        push(5)
        wait_for(
            lambda: table.is_committed("live-5") is not None,
            what="all six batches applied",
        )
    finally:
        q.stop()
        q.awaitTermination()

    # convergence: table == oracle over every pushed event
    assert _table_sha(table) == content_sha(_oracle_state(spark, feed))
    # exactly-once: one live row per key
    live = table.read()
    assert live.count() == live.select("repo", "path", "commit").distinct().count()
    # consumer converges bit-identical to the table
    consume()
    got = {k: v[2] for k, v in state.items() if not v[1]}
    want = {(r["repo"], r["path"], r["commit"]): r["content"] for r in live.collect()}
    assert got == want
    # and the job is healthy again end-to-end — over HTTP too, with
    # per-stream metrics accounted for every applied batch
    h = lifecycle.health(root, feed_dir=feed, checkpoint_dir=ckpt, freshness_s=3600)
    assert h["healthy"], h
    assert http("/health")[0] == 200
    code, m = http("/streams/live/metrics")
    assert code == 200 and m["batches"] >= 6 and m["totals"]["applied"] > 0
