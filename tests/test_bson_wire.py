"""MongoDB BSON wire-format decode: encoder/decoder roundtrip over the
full implemented type set, change-stream event framing, and the Spark
feed into from_mongo_events.  The reference receives driver-decoded
bson.M events (pkg/streams/mongodb_stream.go:306-399); decoding the
public BSON spec directly leaves only the command transport as a
sandbox stand-in."""

import json
import struct

import pytest

from replicator_spark.sources.bson_wire import (
    BsonTimestamp,
    ChangeStreamWriter,
    ObjectId,
    UtcDatetime,
    decode_bson,
    decode_changestream,
    encode_bson,
    read_changestream_feed,
    to_canonical_json,
)


def test_bson_roundtrip_all_types():
    doc = {
        "d": 1.5,
        "s": "héllo",
        "sub": {"a": 1, "b": None},
        "arr": [1, "two", {"three": 3}],
        "oid": ObjectId.from_int(42),
        "flag": True,
        "when": UtcDatetime(1_700_000_000_123),
        "nil": None,
        "i32": -7,
        "ts": BsonTimestamp(1_700_000_000, 5),
        "i64": 2**40,
    }
    out, off = decode_bson(encode_bson(doc))
    assert off == len(encode_bson(doc))
    assert list(out) == list(doc)  # element order preserved
    assert out["d"] == 1.5 and out["s"] == "héllo"
    assert out["sub"] == {"a": 1, "b": None}
    assert out["arr"] == [1, "two", {"three": 3}]
    assert out["oid"] == ObjectId.from_int(42)
    assert out["flag"] is True and out["nil"] is None
    assert out["when"].ms == 1_700_000_000_123
    assert out["i32"] == -7 and out["i64"] == 2**40
    assert isinstance(out["i32"], int)
    assert out["ts"].seq == (1_700_000_000 << 32) | 5


def test_bson_int_width_selection():
    small = encode_bson({"v": 1})
    big = encode_bson({"v": 2**40})
    assert small[4] == 0x10 and big[4] == 0x12  # int32 vs int64 element


def test_decode_rejects_unknown_type_and_torn_doc():
    raw = bytearray(encode_bson({"v": 1}))
    raw[4] = 0x13  # decimal128: not implemented
    with pytest.raises(ValueError, match="unsupported BSON element"):
        decode_bson(bytes(raw))
    torn = encode_bson({"v": 1})[:-1] + b"\x01"
    with pytest.raises(ValueError, match="terminator"):
        decode_bson(torn)


def test_zero_padded_stream_raises_instead_of_looping():
    """A zero-padded tail (crash-torn segment) declares document
    length 0, whose end-1 lands on the PREVIOUS document's terminator —
    without the length bound the change-stream loop would append empty
    docs forever without advancing."""
    doc = encode_bson({"v": 1})
    with pytest.raises(ValueError, match="malformed BSON document"):
        decode_bson(doc + b"\x00\x00\x00\x00", off=len(doc))
    with pytest.raises(ValueError, match="malformed BSON document"):
        decode_bson(doc[:8])  # declared length past EOF


def test_changestream_writer_decode():
    w = ChangeStreamWriter(db="appdb", coll="files")
    w.insert({"_id": ObjectId.from_int(1)}, {"_id": ObjectId.from_int(1), "rev": 1})
    w.update({"_id": ObjectId.from_int(1)},
             {"_id": ObjectId.from_int(1), "rev": 2},
             updated={"rev": 2})
    w.update({"_id": ObjectId.from_int(1)}, None, updated={"rev": 3})
    w.replace({"_id": ObjectId.from_int(1)}, {"_id": ObjectId.from_int(1), "rev": 4})
    w.delete({"_id": ObjectId.from_int(1)})
    evs = decode_changestream(bytes(w.buf))
    assert [e["operationType"] for e in evs] == [
        "insert", "update", "update", "replace", "delete"
    ]
    assert all(e["ns"] == {"db": "appdb", "coll": "files"} for e in evs)
    seqs = [e["clusterTime"].seq for e in evs]
    assert seqs == sorted(seqs) and len(set(seqs)) == len(seqs)
    assert "fullDocument" not in evs[2]  # updateLookup miss
    assert "fullDocument" not in evs[4]  # delete never carries one
    assert evs[1]["updateDescription"]["updatedFields"] == {"rev": 2}
    # resume token embeds the clusterTime like real tokens do
    t, i, canon = struct.unpack(">IIB", bytes.fromhex(evs[0]["_id"]["_data"]))
    assert (t << 32) | i == seqs[0] and canon == 0x29


def test_canonical_json_extjson_wrappers():
    s = to_canonical_json(
        {"_id": ObjectId.from_int(9), "at": UtcDatetime(123), "n": 2}
    )
    assert json.loads(s) == {
        "_id": {"$oid": ObjectId.from_int(9).hex},
        "at": {"$date": 123},
        "n": 2,
    }


def test_spark_changestream_feed_normalizes(spark, tmp_path):
    from replicator_spark.sources.normalize import from_mongo_events

    w = ChangeStreamWriter()
    w.insert({"_id": ObjectId.from_int(1)}, {"_id": ObjectId.from_int(1), "rev": 1})
    w.update({"_id": ObjectId.from_int(1)}, None, updated={"rev": 2})
    w.delete({"_id": ObjectId.from_int(1)})
    w.save(str(tmp_path / "seg.000001"))

    feed = read_changestream_feed(spark, str(tmp_path))
    out = from_mongo_events(
        feed.withColumnRenamed("documentKey", "documentKey_json")
        .withColumnRenamed("fullDocument", "fullDocument_json")
        .selectExpr(
            "seq",
            "operationType",
            "ns_coll",
            "documentKey_json as documentKey",
            "fullDocument_json as fullDocument",
        )
    ).orderBy("seq")
    rows = out.collect()
    assert [r["op"] for r in rows] == ["insert", "update", "delete"]
    assert json.loads(rows[0]["doc"])["rev"] == 1
    assert rows[1]["doc"] == "{}"  # tier-3 fallback: no state join here
    assert rows[2]["doc"] == "{}"  # delete convention
    assert all(r["tbl"] == "files" for r in rows)
