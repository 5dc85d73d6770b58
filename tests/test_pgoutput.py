"""PostgreSQL pgoutput wire-format decode: writer→decoder roundtrip,
real column names recovered from Relation messages, Spark feed. The
reference's pglogrepl path (pkg/streams/postgresql_stream.go:250-360)
loses names to col_N synthetics; decoding the protocol directly keeps
them — only the walsender transport stays a sandbox stand-in."""

import pytest

from replicator_spark.sources.pgoutput import (
    UNCHANGED,
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


def test_unchanged_toast_is_absent_not_null():
    """ADVICE r04: TupleData 'u' (unchanged TOAST) must decode as
    column-ABSENT with partial=True — not as SQL NULL, which would make
    the LWW merge overwrite a stored TOAST value with null."""
    w = PgOutputWriter(columns=["id", "rev", "blob"])
    w.begin(xid=1)
    w.insert(("1", "10", "big-toast-value"))
    # update that doesn't touch the TOASTed column: walsender sends 'u'
    w.update(("1", "11", UNCHANGED), old=("1", "10", None))
    # contrast: an update that really nulls the column sends 'n'
    w.update(("1", "12", None), old=("1", "11", None))
    w.commit()
    evs = decode_pgoutput(bytes(w.buf))
    assert evs[0]["partial"] is False and "blob" in evs[0]["new"]
    assert evs[1]["partial"] is True
    assert "blob" not in evs[1]["new"]  # absent, not None
    assert evs[1]["new"] == {"id": "1", "rev": "11"}
    assert evs[2]["partial"] is False
    assert evs[2]["new"]["blob"] is None  # real SQL NULL stays null


def test_spark_feed_routes_unchanged_toast_as_partial(spark, tmp_path):
    d = str(tmp_path / "wal_toast")
    w = PgOutputWriter(columns=["id", "rev", "blob"])
    w.begin(xid=1)
    w.insert(("1", "10", "toast"))
    w.update(("1", "11", UNCHANGED), old=("1", "10", None))
    w.commit()
    w.save(f"{d}/seg.000001")
    rows = read_pgoutput_feed(spark, d).orderBy("seq").collect()
    assert [r["partial"] for r in rows] == [False, True]
    assert "blob" not in rows[1]["tuple"]  # key absent from the map


def test_unchanged_toast_flows_to_partial_merge(spark, tmp_path):
    """ADVICE r04 end-to-end: an update whose new image omits an
    unchanged-TOAST column must reach the lake as a PARTIAL merge
    (from_pg_tuples propagates the decoder's partial flag into
    meta['partial']='true') — the stored TOAST value survives instead
    of being nulled by a full-image LWW replace."""
    from pyspark.sql import functions as F

    from replicator_spark.laketable import LakeTable
    from replicator_spark.model import REPOS_SCHEMA
    from replicator_spark.pipeline import apply_batch
    from replicator_spark.sources.normalize import from_pg_tuples

    d = str(tmp_path / "wal_toast_merge")
    cols = ["repo", "path", "commit", "lang", "content"]
    w = PgOutputWriter(columns=cols)
    w.begin(xid=1)
    w.insert(("r1", "p1", "c1", "py", "big-toast-content"))
    # update that leaves the TOASTed content column untouched ('u')
    w.update(
        ("r1", "p1", "c1", "go", UNCHANGED), old=("r1", "p1", "c1", "py", None)
    )
    w.commit()
    w.save(f"{d}/seg.000001")

    feed = from_pg_tuples(
        read_pgoutput_feed(spark, d), rename={c: c for c in cols}
    )
    assert "meta" in feed.columns
    ev = feed.select(
        F.concat(F.lit("e"), F.col("seq").cast("string")).alias("event_id"),
        "seq",
        "op",
        F.struct(
            F.col("tuple")["repo"].alias("repo"),
            F.col("tuple")["path"].alias("path"),
            F.col("tuple")["commit"].alias("commit"),
        ).alias("key"),
        "doc",
        "meta",
    )
    t = LakeTable(spark, str(tmp_path / "t"))
    t.create(REPOS_SCHEMA, num_buckets=2)
    apply_batch(t, ev, "b-0", mode="mor", partial_updates=True, write_metrics=False)
    r = t.read().first()
    assert r["lang"] == "go"  # the sent column updated
    # was nulled before the meta propagation fix
    assert r["content"] == "big-toast-content"


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
