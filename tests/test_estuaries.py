"""Estuary fan-out: multi-sink write, keyed-log ordering, continue-on-error."""

import json

from pyspark.sql import functions as F

from replicator_spark.estuaries import (
    ConsoleSink,
    KeyedLogSink,
    LakeSink,
    Sink,
    fan_out,
)
from replicator_spark.feedgen import gen_changes, write_feed
from replicator_spark.laketable import LakeTable
from replicator_spark.model import KEY_COLS, REPOS_SCHEMA
from replicator_spark.pipeline import infer_payload_schema, normalize
from replicator_spark.dedup import lww_latest


class _Boom(Sink):
    name = "boom"

    def write(self, prepared, batch_key):
        raise RuntimeError("sink down")


def _prepared(spark, tmp_path, n=800):
    feed = str(tmp_path / "feed")
    write_feed(gen_changes(spark, n, n_repos=5, n_batches=1), feed)
    raw = spark.read.parquet(f"{feed}/batch_id=0")
    flat = normalize(raw, infer_payload_schema(raw))
    return lww_latest(flat, KEY_COLS, "seq")


def test_fanout_lake_and_keyedlog(spark, tmp_path):
    prepared = _prepared(spark, tmp_path)
    table = LakeTable(spark, str(tmp_path / "t"))
    table.create(REPOS_SCHEMA, num_buckets=4)
    log_dir = str(tmp_path / "log")
    res = fan_out(
        prepared, "b0", [LakeSink(table), KeyedLogSink(log_dir, num_partitions=4)]
    )
    assert not res.errors
    assert table.read().count() > 0
    log = spark.read.parquet(f"{log_dir}/batch=b0")
    assert log.count() == prepared.count()
    row = json.loads(log.first()["value"])
    assert {"repo", "path", "commit", "seq", "op"} <= set(row)
    # keying: each key lands in exactly one partition (ordering preserved)
    multi = (
        log.groupBy("key")
        .agg(F.countDistinct("partition").alias("np"))
        .where(F.col("np") > 1)
        .count()
    )
    assert multi == 0


def test_fanout_continue_on_error(spark, tmp_path):
    prepared = _prepared(spark, tmp_path)
    table = LakeTable(spark, str(tmp_path / "t2"))
    table.create(REPOS_SCHEMA, num_buckets=4)
    res = fan_out(prepared, "b0", [_Boom(), LakeSink(table)])
    assert "boom" in res.errors
    assert table.read().count() > 0  # later sinks still ran


def test_kafka_wire_sink_produce_decode_roundtrip(spark, tmp_path):
    """The wire sink writes REAL RecordBatch v2 segments in the broker
    layout; read_kafka_segments decodes exactly what was produced —
    keys/values byte-identical, per-partition offsets contiguous and
    continuing across micro-batches, key→partition stable."""
    from replicator_spark.estuaries import KafkaWireSink
    from replicator_spark.sources.kafka_wire import read_kafka_segments

    import os

    out = str(tmp_path / "wire")
    sink = KafkaWireSink(out, num_partitions=4)
    b0 = _prepared(spark, tmp_path, n=400)
    sink.write(b0, "b0")
    # executors spooled, driver only patched headers + linked: the
    # batch's spool dir is gone and no stray files sit beside segments
    assert not os.path.exists(os.path.join(out, ".spool", "b0"))
    for p in range(4):
        d = os.path.join(out, f"partition={p}")
        if os.path.isdir(d):
            assert all(n.endswith(".log") for n in os.listdir(d))
    feed1 = read_kafka_segments(spark, out, topic="repos").collect()
    assert len(feed1) == b0.count()
    # values decode to the full row JSON
    row = json.loads(feed1[0]["value"])
    assert {"repo", "path", "commit", "seq"} <= set(row)
    # per-partition offsets are 0..n-1 (contiguous, zero-based)
    per = {}
    for r in feed1:
        per.setdefault(r["partition"], []).append(r["offset"])
    for offs in per.values():
        assert sorted(offs) == list(range(len(offs)))
    # key → one partition only (ordering preserved for re-ingestion)
    k2p = {}
    for r in feed1:
        k2p.setdefault(r["key"], set()).add(r["partition"])
    assert all(len(ps) == 1 for ps in k2p.values())

    # second micro-batch: offsets continue where the last segment ended
    b1 = _prepared(spark, tmp_path / "second", n=300)
    sink.write(b1, "b1")
    feed2 = read_kafka_segments(spark, out, topic="repos").collect()
    assert len(feed2) == len(feed1) + b1.count()
    per2 = {}
    for r in feed2:
        per2.setdefault(r["partition"], []).append(r["offset"])
    for offs in per2.values():
        assert sorted(offs) == list(range(len(offs)))  # still contiguous
    # same key in both batches keeps its partition (stable hash)
    k2p2 = {}
    for r in feed2:
        k2p2.setdefault(r["key"], set()).add(r["partition"])
    assert all(len(ps) == 1 for ps in k2p2.values())


def test_kafka_wire_sink_guards(spark, tmp_path):
    """Produce-side hardening: CAS segment publish (no silent clobber
    between racing producers), the 2^40 offset budget enforced at
    produce time, and header-only next-offset scans."""
    import os

    import pytest

    from replicator_spark.estuaries import KafkaWireSink
    from replicator_spark.sources.kafka_wire import KafkaSegmentWriter

    out = str(tmp_path / "wire")
    sink = KafkaWireSink(out, num_partitions=2)
    w = KafkaSegmentWriter()
    w.append_batch([(b"k", b"v"), (b"k2", b"v2")])
    seg = bytes(w.buf)

    spooled = iter(range(100))

    def spool():
        # _publish patches the spool file in place, so every publish
        # needs a FRESH spool file (exactly what executors produce)
        p = str(tmp_path / f"spool-{next(spooled)}.seg")
        with open(p, "wb") as f:
            f.write(seg)
        return p

    # 1) normal publish lands at base 0; next lands at base 2
    sink._publish(0, spool())
    sink._publish(0, spool())
    names = sorted(os.listdir(os.path.join(out, "partition=0")))
    assert names == [f"{0:020d}.log", f"{2:020d}.log"]

    # 2) racing producer: same base computed → CAS link fails loudly
    conflict = os.path.join(out, "partition=0", f"{4:020d}.log")
    open(conflict, "wb").close()
    with pytest.raises(RuntimeError, match="concurrent producer"):
        sink._publish(0, spool())

    # 3) crossing the 2^40 seq budget raises at PRODUCE time
    d1 = os.path.join(out, "partition=1")
    os.makedirs(d1)
    big = KafkaSegmentWriter(base_offset=(1 << 40) - 1)
    big.append_batch([(b"k", b"v")])
    with open(os.path.join(d1, f"{(1 << 40) - 1:020d}.log"), "wb") as f:
        f.write(bytes(big.buf))
    with pytest.raises(ValueError, match="2\\^40 offset budget"):
        sink._publish(1, spool())


def test_kafka_partition_from_leaf_dir_only(spark, tmp_path):
    """An ancestor directory that happens to contain partition=N must
    not mis-tag segments — only the segment's immediate parent counts."""
    from replicator_spark.sources.kafka_wire import (
        KafkaSegmentWriter,
        read_kafka_segments,
    )

    w = KafkaSegmentWriter()
    w.append_batch([(b"k", b"{}")])
    nested = tmp_path / "partition=3" / "feed" / "partition=1"
    w.save(str(nested / "00000000000000000000.log"))
    rows = read_kafka_segments(
        spark, str(tmp_path / "partition=3" / "feed"), topic="t"
    ).collect()
    assert [r["partition"] for r in rows] == [1]
    # flat file directly under a non-partition dir → partition 0
    w.save(str(tmp_path / "flat" / "seg.log"))
    rows = read_kafka_segments(spark, str(tmp_path / "flat"), topic="t").collect()
    assert [r["partition"] for r in rows] == [0]
