"""Property tests for the wire-format codecs (no Spark session):
BSON document roundtrip over arbitrary nested values, Kafka zigzag
varints over the full signed-64 range, record-batch roundtrip over
arbitrary key/value/header blobs, and CRC detection of arbitrary
single-byte corruption."""

from hypothesis import given, settings
from hypothesis import strategies as st

from replicator_spark.sources.bson_wire import (
    BsonTimestamp,
    ObjectId,
    UtcDatetime,
    decode_bson,
    encode_bson,
)
from replicator_spark.sources.kafka_wire import (
    KafkaSegmentWriter,
    decode_segment,
    decode_varint,
    encode_varint,
)

# -- BSON ---------------------------------------------------------------

_scalar = st.one_of(
    st.none(),
    st.booleans(),
    st.integers(min_value=-(2**63), max_value=2**63 - 1),
    st.floats(allow_nan=False, allow_infinity=False),
    st.text(max_size=40),
    st.binary(min_size=12, max_size=12).map(ObjectId),
    st.integers(min_value=0, max_value=2**63 - 1).map(
        lambda ms: UtcDatetime(ms)
    ),
    st.tuples(
        st.integers(min_value=0, max_value=2**32 - 1),
        st.integers(min_value=0, max_value=2**32 - 1),
    ).map(lambda t: BsonTimestamp(*t)),
)

# keys: no NUL (cstring framing), no '.' (BSON path convention), no
# surrogates (not UTF-8-encodable — st.characters does not exclude
# them by default the way st.text()'s default alphabet does)
_key = st.text(
    alphabet=st.characters(
        blacklist_characters="\x00.", blacklist_categories=("Cs",)
    ),
    min_size=1,
    max_size=20,
)

_value = st.recursive(
    _scalar,
    lambda children: st.one_of(
        st.lists(children, max_size=4),
        st.dictionaries(_key, children, max_size=4),
    ),
    max_leaves=12,
)


def _canon(v):
    """Wrapper classes → comparable plain values; lists/tuples unified."""
    if isinstance(v, ObjectId):
        return ("oid", v.raw)
    if isinstance(v, UtcDatetime):
        return ("date", v.ms)
    if isinstance(v, BsonTimestamp):
        return ("ts", v.t, v.i)
    if isinstance(v, dict):
        return {k: _canon(x) for k, x in v.items()}
    if isinstance(v, (list, tuple)):
        return [_canon(x) for x in v]
    return v


@settings(max_examples=200, deadline=None)
@given(st.dictionaries(_key, _value, max_size=6))
def test_bson_roundtrip_arbitrary_documents(doc):
    raw = encode_bson(doc)
    out, off = decode_bson(raw)
    assert off == len(raw)
    assert _canon(out) == _canon(doc)
    assert list(out) == list(doc)  # element order preserved


# -- Kafka varints ------------------------------------------------------


@settings(max_examples=300, deadline=None)
@given(st.integers(min_value=-(2**63), max_value=2**63 - 1))
def test_varint_roundtrip_full_signed_range(n):
    raw = encode_varint(n)
    v, off = decode_varint(raw, 0)
    assert v == n and off == len(raw)
    assert len(raw) <= 10


# -- Kafka record batches ----------------------------------------------

_blob = st.one_of(st.none(), st.binary(max_size=60))


@settings(max_examples=60, deadline=None)
@given(
    st.lists(st.tuples(_blob, _blob), min_size=1, max_size=8),
    st.integers(min_value=0, max_value=2**40),
)
def test_record_batch_roundtrip(records, base_offset):
    w = KafkaSegmentWriter(base_offset=base_offset)
    w.append_batch(records)
    out = decode_segment(bytes(w.buf))
    assert [(r["key"], r["value"]) for r in out] == records
    assert [r["offset"] for r in out] == list(
        range(base_offset, base_offset + len(records))
    )


@settings(max_examples=60, deadline=None)
@given(
    st.lists(st.tuples(_blob, _blob), min_size=1, max_size=4),
    st.data(),
)
def test_record_batch_detects_any_payload_corruption(records, data):
    """Flipping any byte at or after the CRC field must raise (CRC
    covers attributes..end; the crc field itself failing to match is
    the same error)."""
    w = KafkaSegmentWriter()
    w.append_batch(records)
    raw = bytearray(w.buf)
    pos = data.draw(st.integers(min_value=17, max_value=len(raw) - 1))
    delta = data.draw(st.integers(min_value=1, max_value=255))
    raw[pos] = (raw[pos] + delta) % 256
    try:
        decode_segment(bytes(raw))
        raised = False
    except (ValueError, IndexError, UnicodeDecodeError):
        raised = True
    assert raised, f"corruption at byte {pos} went undetected"


# -- MySQL binlog v4 ----------------------------------------------------

_i32 = st.integers(min_value=-(2**31), max_value=2**31 - 1)
_i64 = st.integers(min_value=-(2**63), max_value=2**63 - 1)
_vchar = st.one_of(st.none(), st.text(max_size=50))


@settings(max_examples=50, deadline=None)
@given(st.lists(st.tuples(_i32, _i64, _vchar), min_size=1, max_size=12))
def test_binlog_roundtrip_arbitrary_rows(rows):
    from replicator_spark.sources.binlog import (
        BinlogWriter,
        TableSchema,
        decode_binlog,
    )

    schema = TableSchema(
        db="d", table="t",
        columns=[("a", "long"), ("b", "longlong"), ("c", "varchar")],
    )
    w = BinlogWriter(schema)
    w.write_rows(rows)
    if len(rows) >= 2:
        w.update_rows([(rows[0], rows[1])])
        w.delete_rows([rows[-1]])
    w.xid(1)
    evs = decode_binlog(bytes(w.buf))
    ins = [e for e in evs if e["op"] == "insert"]
    assert [tuple(e["after"]) for e in ins] == [tuple(r) for r in rows]
    if len(rows) >= 2:
        upd = [e for e in evs if e["op"] == "update"]
        assert tuple(upd[0]["before"]) == tuple(rows[0])
        assert tuple(upd[0]["after"]) == tuple(rows[1])
        dels = [e for e in evs if e["op"] == "delete"]
        assert tuple(dels[0]["before"]) == tuple(rows[-1])
    pos = [e["log_pos"] for e in evs]
    assert pos == sorted(pos)


# -- PostgreSQL pgoutput ------------------------------------------------

# pgoutput TupleData carries TEXT-format values: arbitrary text or NULL
_pgval = st.one_of(st.none(), st.text(max_size=40))


@settings(max_examples=50, deadline=None)
@given(st.lists(st.tuples(_pgval, _pgval, _pgval), min_size=1, max_size=10))
def test_pgoutput_roundtrip_arbitrary_tuples(rows):
    from replicator_spark.sources.pgoutput import PgOutputWriter, decode_pgoutput

    w = PgOutputWriter(columns=["x", "y", "z"])
    w.begin(xid=1)
    for r in rows:
        w.insert(r)
    if len(rows) >= 2:
        w.update(rows[1], old=rows[0])
        w.delete(rows[-1])
    w.commit()
    evs = decode_pgoutput(bytes(w.buf))

    def vals(img):
        return (img["x"], img["y"], img["z"])

    # writer stringifies non-None values (wire format is text)
    want = [tuple(None if v is None else str(v) for v in r) for r in rows]
    ins = [e for e in evs if e["op"] == "insert"]
    assert [vals(e["new"]) for e in ins] == want
    if len(rows) >= 2:
        upd = [e for e in evs if e["op"] == "update"][0]
        assert vals(upd["old"]) == want[0] and vals(upd["new"]) == want[1]
        assert vals([e for e in evs if e["op"] == "delete"][0]["old"]) == want[-1]
    lsns = [e["lsn"] for e in evs]
    assert lsns == sorted(lsns) and len(set(lsns)) == len(lsns)
