"""PostgreSQL pgoutput wire-format decode: writer→decoder roundtrip,
real column names recovered from Relation messages, Spark feed. The
reference's pglogrepl path (pkg/streams/postgresql_stream.go:250-360)
loses names to col_N synthetics; decoding the protocol directly keeps
them — only the walsender transport stays a sandbox stand-in."""

import pytest

from replicator_spark.sources.pgoutput import (
    PgOutputWriter,
    decode_pgoutput,
    read_pgoutput_feed,
)


def _sample():
    w = PgOutputWriter(columns=["id", "rev", "name"])
    w.begin(xid=7)
    w.insert(("1", "10", "a.txt"))
    w.insert(("2", "20", None))
    w.update(("2", "21", "b2.txt"), old=("2", "20", None))
    w.delete(("1", "10", "a.txt"))
    w.commit()
    return w


def test_roundtrip_decode_with_real_column_names():
    evs = decode_pgoutput(bytes(_sample().buf))
    assert [e["op"] for e in evs] == ["insert", "insert", "update", "delete"]
    assert all(e["namespace"] == "public" and e["relname"] == "files" for e in evs)
    assert evs[0]["new"] == {"id": "1", "rev": "10", "name": "a.txt"}
    assert evs[1]["new"]["name"] is None  # 'n' TupleData kind
    assert evs[2]["old"] == {"id": "2", "rev": "20", "name": None}
    assert evs[2]["new"]["rev"] == "21"
    assert evs[3]["old"]["id"] == "1"
    lsns = [e["lsn"] for e in evs]
    assert lsns == sorted(lsns)  # WAL order


def test_decode_rejects_unknown_messages():
    import struct

    bad = struct.pack(">I", 26) + b"w" + struct.pack(">QQQ", 1, 1, 0) + b"Z"
    with pytest.raises(ValueError, match="unsupported pgoutput message"):
        decode_pgoutput(bad)
    with pytest.raises(ValueError, match="unsupported copy message"):
        decode_pgoutput(struct.pack(">I", 1) + b"k")  # keepalive not framed here


def test_spark_pgoutput_feed_normalizes_with_names(spark, tmp_path):
    from replicator_spark.sources.normalize import from_pg_tuples

    d = str(tmp_path / "wal")
    w = _sample()
    w.save(f"{d}/seg.000001")
    feed = read_pgoutput_feed(spark, d)
    plan = feed._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan  # Arrow path only

    rows = from_pg_tuples(feed).orderBy("seq").collect()
    assert [r["op"] for r in rows] == ["insert", "insert", "update", "delete"]
    assert rows[0]["tbl"] == "files" and rows[0]["db"] == "public"
    import json

    assert json.loads(rows[2]["doc"]) == {"id": "2", "rev": "21", "name": "b2.txt"}
    # NULL column: the map-typed tuple keeps an explicit null in the doc
    # (to_json drops null STRUCT fields but keeps null MAP values)
    assert json.loads(rows[1]["doc"])["name"] is None
