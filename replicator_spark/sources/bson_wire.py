"""MongoDB change-stream BSON wire-format decode (and a writer for
fixtures).

The reference tails change streams through the mongo-go driver and
receives each event as a driver-decoded ``bson.M``
(``pkg/streams/mongodb_stream.go:306-399``: ``createChangeStream`` with
``SetFullDocument(UpdateLookup)``, then ``changeStream.Decode``).  Here
the BSON document format itself is parsed from the public spec
(bsonspec.org): a recorded segment is a sequence of concatenated BSON
documents (each self-describing via its leading little-endian int32
total length — no extra framing needed), every document being one
change-stream event of the driver shape::

    { _id: {_data: <hex resume token>},
      operationType: insert|update|replace|delete,
      clusterTime: Timestamp(t, i),
      ns: {db: ..., coll: ...},
      documentKey: {...},
      fullDocument: {...},              # absent on delete; optional on
                                        # update (updateLookup may miss)
      updateDescription: {updatedFields:{...}, removedFields:[...]} }

What remains sandbox-stubbed is the wire TRANSPORT (the MongoDB
hello/getMore command exchange); the event bytes are the real format.

Element types implemented: double 0x01, string 0x02, document 0x03,
array 0x04, ObjectId 0x07, bool 0x08, UTC datetime 0x09, null 0x0A,
int32 0x10, timestamp 0x11, int64 0x12 — the set a change-stream event
actually uses.  Scale shape mirrors binlog.py / pgoutput.py: one
recorded segment = one decode task (binaryFile → Arrow mapInPandas).
"""

from __future__ import annotations

import json
import os
import struct


class ObjectId:
    """12-byte BSON ObjectId (type 0x07)."""

    def __init__(self, raw: bytes):
        if len(raw) != 12:
            raise ValueError("ObjectId is exactly 12 bytes")
        self.raw = raw

    @classmethod
    def from_int(cls, n: int) -> "ObjectId":
        return cls(n.to_bytes(12, "big"))

    @property
    def hex(self) -> str:
        return self.raw.hex()

    def __eq__(self, other):
        return isinstance(other, ObjectId) and self.raw == other.raw

    def __repr__(self):
        return f"ObjectId({self.hex})"


class BsonTimestamp:
    """BSON timestamp (type 0x11): seconds + per-second increment —
    the oplog/change-stream ordering key (``clusterTime``)."""

    def __init__(self, t: int, i: int):
        self.t, self.i = t, i

    @property
    def seq(self) -> int:
        return (self.t << 32) | self.i

    def __repr__(self):
        return f"Timestamp({self.t},{self.i})"


class UtcDatetime:
    """BSON UTC datetime (type 0x09), millis since epoch."""

    def __init__(self, ms: int):
        self.ms = ms


def _encode_value(name: bytes, v) -> bytes:
    if isinstance(v, bool):  # before int: bool is an int subclass
        return b"\x08" + name + (b"\x01" if v else b"\x00")
    if isinstance(v, float):
        return b"\x01" + name + struct.pack("<d", v)
    if isinstance(v, int):
        if -(2**31) <= v < 2**31:
            return b"\x10" + name + struct.pack("<i", v)
        return b"\x12" + name + struct.pack("<q", v)
    if isinstance(v, str):
        b = v.encode()
        return b"\x02" + name + struct.pack("<i", len(b) + 1) + b + b"\x00"
    if isinstance(v, ObjectId):
        return b"\x07" + name + v.raw
    if isinstance(v, BsonTimestamp):
        return b"\x11" + name + struct.pack("<II", v.i, v.t)
    if isinstance(v, UtcDatetime):
        return b"\x09" + name + struct.pack("<q", v.ms)
    if v is None:
        return b"\x0a" + name
    if isinstance(v, dict):
        return b"\x03" + name + encode_bson(v)
    if isinstance(v, (list, tuple)):
        return b"\x04" + name + encode_bson(
            {str(i): x for i, x in enumerate(v)}
        )
    raise TypeError(f"unsupported BSON value {type(v).__name__}")


def encode_bson(doc: dict) -> bytes:
    body = b"".join(
        _encode_value(k.encode() + b"\x00", v) for k, v in doc.items()
    )
    return struct.pack("<i", len(body) + 5) + body + b"\x00"


def _cstr(b: bytes, off: int) -> tuple[str, int]:
    end = b.index(0, off)
    return b[off:end].decode(), end + 1


def decode_bson(b: bytes, off: int = 0) -> tuple[dict, int]:
    """One BSON document at ``off`` → (dict, next offset).  Preserves
    element order (plain dict — insertion-ordered).  Unknown element
    types raise: a torn or foreign byte stream must fail loudly, not
    skip silently."""
    (total,) = struct.unpack_from("<i", b, off)
    end = off + total
    # fail-loud bounds: the minimum document is int32 len + terminator
    # (5 bytes). A zero-padded tail (crash-torn segment) reads total=0,
    # whose end-1 lands on the PREVIOUS document's 0x00 terminator —
    # the empty doc would "decode" without advancing the offset and
    # spin the change-stream loop forever.
    if total < 5 or end > len(b):
        raise ValueError(
            f"malformed BSON document at {off}: declared length {total} "
            f"with {len(b) - off} bytes remaining"
        )
    if b[end - 1] != 0:
        raise ValueError("BSON document missing terminator")
    p = off + 4
    doc: dict = {}
    while p < end - 1:
        t = b[p]
        p += 1
        name, p = _cstr(b, p)
        if t == 0x01:
            (doc[name],) = struct.unpack_from("<d", b, p)
            p += 8
        elif t == 0x02:
            (ln,) = struct.unpack_from("<i", b, p)
            p += 4
            doc[name] = b[p : p + ln - 1].decode()
            p += ln
        elif t in (0x03, 0x04):
            sub, p = decode_bson(b, p)
            doc[name] = list(sub.values()) if t == 0x04 else sub
        elif t == 0x07:
            doc[name] = ObjectId(b[p : p + 12])
            p += 12
        elif t == 0x08:
            doc[name] = b[p] != 0
            p += 1
        elif t == 0x09:
            (ms,) = struct.unpack_from("<q", b, p)
            doc[name] = UtcDatetime(ms)
            p += 8
        elif t == 0x0A:
            doc[name] = None
        elif t == 0x10:
            (doc[name],) = struct.unpack_from("<i", b, p)
            p += 4
        elif t == 0x11:
            i, tsec = struct.unpack_from("<II", b, p)
            doc[name] = BsonTimestamp(tsec, i)
            p += 8
        elif t == 0x12:
            (doc[name],) = struct.unpack_from("<q", b, p)
            p += 8
        else:
            raise ValueError(f"unsupported BSON element type 0x{t:02x}")
    return doc, end


def _jsonable(v):
    """Decoded BSON value → plain-JSON-able, using the same Extended
    JSON wrappers functions/extjson.py unwraps downstream."""
    if isinstance(v, ObjectId):
        return {"$oid": v.hex}
    if isinstance(v, UtcDatetime):
        return {"$date": v.ms}
    if isinstance(v, BsonTimestamp):
        return {"$timestamp": {"t": v.t, "i": v.i}}
    if isinstance(v, dict):
        return {k: _jsonable(x) for k, x in v.items()}
    if isinstance(v, list):
        return [_jsonable(x) for x in v]
    return v


def to_canonical_json(doc: dict) -> str:
    return json.dumps(_jsonable(doc), separators=(",", ":"))


class ChangeStreamWriter:
    """Compose a recorded change-stream segment (concatenated BSON
    event documents) for fixtures/replay.  ``clusterTime`` advances
    monotonically; the resume token (``_id._data``) embeds it the way
    real tokens embed the oplog timestamp."""

    def __init__(self, *, db: str = "appdb", coll: str = "files",
                 start_t: int = 1_700_000_000):
        self.db, self.coll = db, coll
        self.t, self.i = start_t, 0
        self.buf = bytearray()

    def _event(self, op: str, key: dict, full_doc: dict | None,
               update_desc: dict | None = None) -> BsonTimestamp:
        self.i += 1
        if self.i == 1000:
            self.t, self.i = self.t + 1, 1
        ct = BsonTimestamp(self.t, self.i)
        token = struct.pack(">IIB", self.t, self.i, 0x29).hex()
        ev: dict = {
            "_id": {"_data": token},
            "operationType": op,
            "clusterTime": ct,
            "ns": {"db": self.db, "coll": self.coll},
            "documentKey": key,
        }
        if full_doc is not None:
            ev["fullDocument"] = full_doc
        if update_desc is not None:
            ev["updateDescription"] = update_desc
        self.buf += encode_bson(ev)
        return ct

    def insert(self, key: dict, doc: dict) -> BsonTimestamp:
        return self._event("insert", key, doc)

    def update(self, key: dict, full_doc: dict | None,
               updated: dict | None = None,
               removed: list | None = None) -> BsonTimestamp:
        return self._event(
            "update", key, full_doc,
            {"updatedFields": updated or {}, "removedFields": removed or []},
        )

    def replace(self, key: dict, doc: dict) -> BsonTimestamp:
        return self._event("replace", key, doc)

    def delete(self, key: dict) -> BsonTimestamp:
        return self._event("delete", key, None)

    def save(self, path: str) -> None:
        os.makedirs(os.path.dirname(path), exist_ok=True)
        tmp = path + ".tmp"
        with open(tmp, "wb") as f:
            f.write(self.buf)
        os.rename(tmp, path)


def decode_changestream(data: bytes) -> list[dict]:
    """Recorded segment → decoded event dicts (BSON values as the
    wrapper classes above)."""
    out, off = [], 0
    while off < len(data):
        doc, off = decode_bson(data, off)
        out.append(doc)
    return out


def read_changestream_feed(spark, stream_dir: str, *, streaming: bool = False):
    """Decode a directory of recorded change-stream segments into the
    frame ``from_mongo_events`` consumes: (seq, operationType, ns_coll,
    documentKey, fullDocument) with documents rendered as canonical
    JSON (Extended JSON wrappers for ObjectId/date, which
    ``decode_extended_json`` unwraps downstream).  ``seq`` is the
    clusterTime ``(t<<32)|i`` — the oplog's native total order, the
    same contract the resume token encodes.  Updates whose
    ``fullDocument`` is absent surface NULL and flow into the 3-tier
    recovery join.  ``streaming=True``: same frame as a Structured
    Streaming source (checkpoint file-source log ≙ the resume
    token)."""
    import pandas as pd

    from ._binfiles import load_binary_files

    files = load_binary_files(spark, stream_dir, streaming=streaming)
    schema = (
        "seq long, operationType string, ns_db string, ns_coll string, "
        "documentKey string, fullDocument string"
    )

    def _decode(it):
        for pdf in it:
            rows = []
            for content in pdf["content"]:
                for ev in decode_changestream(bytes(content)):
                    ct = ev["clusterTime"]
                    fd = ev.get("fullDocument")
                    rows.append(
                        (
                            ct.seq,
                            ev["operationType"],
                            ev["ns"]["db"],
                            ev["ns"]["coll"],
                            to_canonical_json(ev["documentKey"]),
                            None if fd is None else to_canonical_json(fd),
                        )
                    )
            yield pd.DataFrame(
                rows,
                columns=[
                    "seq", "operationType", "ns_db", "ns_coll",
                    "documentKey", "fullDocument",
                ],
            )

    return files.select("content").mapInPandas(_decode, schema=schema)


__all__ = [
    "ObjectId",
    "BsonTimestamp",
    "UtcDatetime",
    "encode_bson",
    "decode_bson",
    "decode_changestream",
    "to_canonical_json",
    "ChangeStreamWriter",
    "read_changestream_feed",
]
