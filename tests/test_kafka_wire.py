"""Kafka RecordBatch v2 wire-format decode: CRC32C vectors, zigzag
varints, writer→decoder roundtrip, corruption detection, and the Spark
feed into from_kafka_messages.  The reference receives driver-decoded
ConsumerMessages via Sarama (pkg/streams/kafka_stream.go:226-274);
decoding the public record-batch format directly leaves only the
group-join/fetch RPC transport as a sandbox stand-in."""

import json
import struct

import pytest

from replicator_spark.sources.kafka_wire import (
    KafkaSegmentWriter,
    crc32c,
    decode_segment,
    decode_varint,
    encode_varint,
    read_kafka_segments,
)


def test_crc32c_known_vectors():
    # RFC 3720 / public test vectors for Castagnoli
    assert crc32c(b"123456789") == 0xE3069283
    assert crc32c(b"") == 0
    assert crc32c(b"\x00" * 32) == 0x8A9136AA


def test_zigzag_varint_roundtrip():
    for n in (0, -1, 1, 63, -64, 300, -301, 2**31, -(2**31), 2**62):
        assert decode_varint(encode_varint(n), 0)[0] == n
    assert encode_varint(0) == b"\x00"
    assert encode_varint(-1) == b"\x01"  # zigzag law
    assert encode_varint(1) == b"\x02"


def test_segment_roundtrip_offsets_nulls_headers():
    w = KafkaSegmentWriter()
    w.append_batch(
        [(b"k1", b"v1"), (None, b"v2")],
        headers=[[("trace", b"abc"), ("nil", None)], []],
    )
    w.append_batch([(b"k3", None)])  # tombstone
    rs = decode_segment(bytes(w.buf))
    assert [(r["offset"], r["key"], r["value"]) for r in rs] == [
        (0, b"k1", b"v1"),
        (1, None, b"v2"),
        (2, b"k3", None),
    ]
    assert rs[0]["headers"] == [("trace", b"abc"), ("nil", None)]
    ts = [r["timestamp"] for r in rs]
    assert ts == sorted(ts) and len(set(ts)) == 3


def test_decode_rejects_corruption():
    w = KafkaSegmentWriter()
    w.append_batch([(b"k", b"v")])
    raw = bytearray(w.buf)
    flipped = raw.copy()
    flipped[-1] ^= 0xFF  # corrupt last value byte → CRC must catch it
    with pytest.raises(ValueError, match="CRC32C mismatch"):
        decode_segment(bytes(flipped))
    badmagic = raw.copy()
    badmagic[16] = 1  # magic byte (offset 8+4+4)
    with pytest.raises(ValueError, match="unsupported magic"):
        decode_segment(bytes(badmagic))
    with pytest.raises(ValueError, match="torn record batch"):
        decode_segment(bytes(raw[:-3]))
    shortlen = raw.copy()  # batchLength torn to a tiny/negative value
    struct.pack_into(">i", shortlen, 8, 3)
    with pytest.raises(ValueError, match="invalid batch length"):
        decode_segment(bytes(shortlen))
    struct.pack_into(">i", shortlen, 8, -5)
    with pytest.raises(ValueError, match="invalid batch length"):
        decode_segment(bytes(shortlen))
    with pytest.raises(ValueError, match="trailing bytes"):
        decode_segment(bytes(raw) + b"\x00\x01")


def test_batch_header_is_the_61_byte_v2_layout():
    w = KafkaSegmentWriter(base_offset=7)
    w.append_batch([(b"k", b"v")])
    raw = bytes(w.buf)
    base_off, blen = struct.unpack_from(">qi", raw, 0)
    assert base_off == 7
    assert blen == len(raw) - 12
    assert raw[16] == 2  # magic
    n = struct.unpack_from(">i", raw, 57)[0]  # recordCount at byte 57
    assert n == 1


def test_multi_partition_layout_and_seq_composition(spark, tmp_path):
    """Broker-layout directories (partition=N/<baseOffset>.log): the
    partition id comes from the path, seq = (partition<<40)|offset —
    per-partition total order, Kafka's actual delivery contract."""
    for part in (0, 1, 5):
        w = KafkaSegmentWriter()
        w.append_batch(
            [(b"k", json.dumps({"data": json.dumps({"p": part, "n": i})}).encode())
             for i in range(3)]
        )
        w.save(str(tmp_path / f"partition={part}" / "00000000000000000000.log"))

    feed = read_kafka_segments(spark, str(tmp_path), topic="t")
    rows = feed.orderBy("seq").collect()
    assert len(rows) == 9
    assert sorted({r["partition"] for r in rows}) == [0, 1, 5]
    for r in rows:
        assert r["seq"] == (r["partition"] << 40) | r["offset"]
    # per-partition offsets independent: each partition sees 0,1,2
    per = {}
    for r in rows:
        per.setdefault(r["partition"], []).append(r["offset"])
    assert all(v == [0, 1, 2] for v in per.values())


def test_offset_beyond_seq_budget_raises(spark, tmp_path):
    w = KafkaSegmentWriter(base_offset=1 << 40)
    w.append_batch([(b"k", b"{}")])
    w.save(str(tmp_path / "partition=0" / "big.log"))
    feed = read_kafka_segments(spark, str(tmp_path), topic="t")
    with pytest.raises(Exception, match="seq budget"):
        feed.collect()


def test_non_utf8_payload_flows_to_log_and_skip(spark, tmp_path):
    """Kafka keys/values are arbitrary bytes: a msgpack/avro producer's
    non-UTF-8 payload must reach the normalizer's non-JSON guard as a
    garbled string (log-and-skip), not crash the whole segment decode
    task with UnicodeDecodeError."""
    from replicator_spark.sources.normalize import from_kafka_messages

    w = KafkaSegmentWriter()
    w.append_batch(
        [
            (b"\xff\xfe", b"\x80\x81\xffnot-utf8"),
            (b"1", json.dumps({"action": "insert", "data": "{}"}).encode()),
        ]
    )
    w.save(str(tmp_path / "partition=0" / "00000000000000000000.log"))
    feed = read_kafka_segments(spark, str(tmp_path), topic="t")
    rows = feed.orderBy("offset").collect()
    assert len(rows) == 2  # decode survives
    assert "�" in rows[0]["value"]  # replaced, not raised
    assert from_kafka_messages(feed).count() == 1  # garbled row dropped


def test_spark_kafka_segment_feed_normalizes(spark, tmp_path):
    from replicator_spark.sources.normalize import from_kafka_messages

    w = KafkaSegmentWriter()
    msgs = [
        {"action": "insert", "schema": "appdb", "collection": "files",
         "data": json.dumps({"id": 1, "rev": 10})},
        {"action": "update", "data": json.dumps({"id": 1, "rev": 11})},
    ]
    w.append_batch(
        [(b"1", json.dumps(m).encode()) for m in msgs]
        + [(b"2", b"not json")]  # reference log-and-skips these
    )
    w.save(str(tmp_path / "00000000000000000000.log"))

    feed = read_kafka_segments(spark, str(tmp_path), topic="files-topic")
    out = from_kafka_messages(feed).orderBy("seq").collect()
    assert len(out) == 2  # non-JSON dropped
    assert [r["op"] for r in out] == ["insert", "update"]
    assert out[0]["db"] == "appdb" and out[0]["tbl"] == "files"
    assert out[1]["db"] == "srcdb" and out[1]["tbl"] == "files-topic"
    assert json.loads(out[1]["doc"])["rev"] == 11
    assert [r["seq"] for r in out] == [0, 1]  # native partition offsets
