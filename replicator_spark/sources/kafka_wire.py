"""Kafka log-segment RecordBatch v2 wire-format decode (and a writer
for fixtures).

The reference consumes Kafka through Sarama consumer groups
(``pkg/streams/kafka_stream.go:226-274`` — ``sarama.NewConfig()``,
``Version = V2_6_0_0``, round-robin rebalance) and receives
driver-decoded ``*sarama.ConsumerMessage``s.  Here the on-disk/on-wire
record-batch format itself is parsed from the public Kafka protocol
spec (message format v2, magic=2): a recorded segment is a sequence of
concatenated RecordBatches exactly as a broker log segment stores them
— 61-byte batch header (base offset, batch length, leader epoch,
magic, CRC32C, attributes, offset/timestamp deltas, producer fields,
record count) followed by varint-framed records (zigzag varints for
timestamp/offset deltas and key/value/header lengths, -1 = null).
CRC32C (Castagnoli) is verified over attributes..end like the broker
does; torn or corrupt batches fail loudly.

What remains sandbox-stubbed is the broker TRANSPORT (group join /
fetch RPC); the bytes are the real format.  Scale shape mirrors
binlog.py / pgoutput.py / bson_wire.py: one recorded segment = one
decode task (binaryFile → Arrow mapInPandas); offsets are the native
per-partition total order the reference's checkpoint relies on.
"""

from __future__ import annotations

import os
import re
import struct

# CRC32C (Castagnoli), reflected polynomial 0x82F63B78 — table-driven.
_CRC_TABLE = []
for _n in range(256):
    _c = _n
    for _ in range(8):
        _c = (_c >> 1) ^ 0x82F63B78 if _c & 1 else _c >> 1
    _CRC_TABLE.append(_c)


def crc32c(data: bytes) -> int:
    crc = 0xFFFFFFFF
    for b in data:
        crc = (crc >> 8) ^ _CRC_TABLE[(crc ^ b) & 0xFF]
    return crc ^ 0xFFFFFFFF


def _zigzag(n: int) -> int:
    return (n << 1) ^ (n >> 63)


def _unzigzag(n: int) -> int:
    return (n >> 1) ^ -(n & 1)


def encode_varint(n: int) -> bytes:
    """Signed → zigzag varint (the encoding every record field uses)."""
    u = _zigzag(n) & 0xFFFFFFFFFFFFFFFF
    out = bytearray()
    while True:
        b = u & 0x7F
        u >>= 7
        if u:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def decode_varint(b: bytes, off: int) -> tuple[int, int]:
    u, shift = 0, 0
    while True:
        byte = b[off]
        off += 1
        u |= (byte & 0x7F) << shift
        if not byte & 0x80:
            return _unzigzag(u), off
        shift += 7
        if shift > 70:
            raise ValueError("varint too long")


def _encode_record(offset_delta: int, ts_delta: int,
                   key: bytes | None, value: bytes | None,
                   headers: list[tuple[str, bytes | None]]) -> bytes:
    body = bytearray(b"\x00")  # record attributes: unused
    body += encode_varint(ts_delta)
    body += encode_varint(offset_delta)
    for blob in (key, value):
        if blob is None:
            body += encode_varint(-1)
        else:
            body += encode_varint(len(blob)) + blob
    body += encode_varint(len(headers))
    for hk, hv in headers:
        hkb = hk.encode()
        body += encode_varint(len(hkb)) + hkb
        if hv is None:
            body += encode_varint(-1)
        else:
            body += encode_varint(len(hv)) + hv
    return encode_varint(len(body)) + bytes(body)


class KafkaSegmentWriter:
    """Compose a recorded log segment (concatenated RecordBatch v2)
    for fixtures/replay.  One ``append_batch`` = one producer batch;
    offsets continue across batches like a real partition log."""

    def __init__(self, *, base_offset: int = 0,
                 base_timestamp: int = 1_700_000_000_000):
        self.next_offset = base_offset
        self.base_timestamp = base_timestamp
        self.buf = bytearray()

    def append_batch(
        self,
        records: list[tuple[bytes | None, bytes | None]],
        *,
        headers: list[list[tuple[str, bytes | None]]] | None = None,
        ts_step_ms: int = 1,
    ) -> None:
        if not records:
            raise ValueError("empty batch")
        base_off = self.next_offset
        base_ts = self.base_timestamp + (base_off - 0) * ts_step_ms
        recs = bytearray()
        for i, (k, v) in enumerate(records):
            h = headers[i] if headers else []
            recs += _encode_record(i, i * ts_step_ms, k, v, h)
        n = len(records)
        max_ts = base_ts + (n - 1) * ts_step_ms
        # attributes..end — the CRC'd region
        tail = struct.pack(
            ">hiqqqhii",
            0,                 # attributes: no compression, create-time
            n - 1,             # lastOffsetDelta
            base_ts, max_ts,
            -1, -1, -1,        # producerId, producerEpoch, baseSequence
            n,                 # recordCount
        ) + bytes(recs)
        head = struct.pack(">iBI", 0, 2, crc32c(tail))  # epoch, magic, crc
        batch = struct.pack(">qi", base_off, len(head) + len(tail)) + head + tail
        self.buf += batch
        self.next_offset += n

    def save(self, path: str) -> None:
        os.makedirs(os.path.dirname(path), exist_ok=True)
        tmp = path + ".tmp"
        with open(tmp, "wb") as f:
            f.write(self.buf)
        os.rename(tmp, path)


def decode_segment(data: bytes) -> list[dict]:
    """Recorded segment → record dicts ``{"offset", "timestamp",
    "key", "value", "headers"}`` (key/value as bytes or None).  Magic
    must be 2 and the CRC32C must verify; anything else raises."""
    out, off = [], 0
    while off + 12 <= len(data):
        base_off, blen = struct.unpack_from(">qi", data, off)
        if blen < 49:  # epoch+magic+crc (9) + fixed batch tail (40)
            raise ValueError(f"invalid batch length {blen}")
        body = data[off + 12 : off + 12 + blen]
        if len(body) < blen:
            raise ValueError("torn record batch")
        off += 12 + blen
        _epoch, magic, crc = struct.unpack_from(">iBI", body, 0)
        if magic != 2:
            raise ValueError(f"unsupported magic {magic}")
        tail = body[9:]
        actual = crc32c(tail)
        if actual != crc:
            raise ValueError(f"CRC32C mismatch: {actual:08x} != {crc:08x}")
        attrs, _last_delta, base_ts, _max_ts = struct.unpack_from(">hiqq", tail, 0)
        if attrs & 0x07:
            raise ValueError("compressed batches not supported")
        (n,) = struct.unpack_from(">i", tail, 36)
        p = 40
        for _ in range(n):
            rlen, p = decode_varint(tail, p)
            end = p + rlen
            p += 1  # record attributes
            ts_delta, p = decode_varint(tail, p)
            off_delta, p = decode_varint(tail, p)
            klen, p = decode_varint(tail, p)
            key = None if klen < 0 else tail[p : p + klen]
            p += max(klen, 0)
            vlen, p = decode_varint(tail, p)
            value = None if vlen < 0 else tail[p : p + vlen]
            p += max(vlen, 0)
            nh, p = decode_varint(tail, p)
            hdrs = []
            for _h in range(nh):
                hklen, p = decode_varint(tail, p)
                hk = tail[p : p + hklen].decode()
                p += hklen
                hvlen, p = decode_varint(tail, p)
                hv = None if hvlen < 0 else tail[p : p + hvlen]
                p += max(hvlen, 0)
                hdrs.append((hk, hv))
            if p != end:
                raise ValueError("record length mismatch")
            out.append(
                {
                    "offset": base_off + off_delta,
                    "timestamp": base_ts + ts_delta,
                    "key": key,
                    "value": value,
                    "headers": hdrs,
                }
            )
    if off != len(data):
        raise ValueError("trailing bytes after last batch")
    return out


# the segment's IMMEDIATE parent dir only — an ancestor path that
# happens to contain partition=N (e.g. a lake bucket layout above the
# recorded log) must not mis-tag every segment with its id
_PARTITION_RE = re.compile(r"partition=(\d+)/[^/]+$")


def read_kafka_segments(
    spark, segment_dir: str, *, topic: str, streaming: bool = False
):
    """Decode a directory of recorded log segments into the frame
    ``from_kafka_messages`` consumes: (seq, topic, partition, offset,
    key, value).  Multi-partition topics use the broker's own on-disk
    layout — ``<dir>/partition=N/<baseOffset>.log`` — and the partition
    id is recovered from the path (a flat directory is partition 0).

    ``seq`` composes ``(partition << 40) | offset``: totally ordered
    WITHIN a partition, arbitrary across partitions — exactly Kafka's
    delivery contract (the reference's consumer group makes no
    cross-partition promise either, ``kafka_stream.go:206-224``), and
    what the LWW merge needs when producers key messages by entity (a
    key lives in one partition, so its updates are seq-ordered).  2^40
    offsets per partition; beyond that a recorded segment replay should
    re-base offsets, and the decoder raises rather than alias.
    Tombstones (null value) surface as NULL and are dropped by the
    normalizer's non-JSON guard, matching the reference's log-and-skip.
    """
    import pandas as pd

    from ._binfiles import load_binary_files

    files = load_binary_files(
        spark, segment_dir, streaming=streaming, recursive=True
    )
    schema = (
        "seq long, topic string, partition int, offset long, "
        "key string, value string"
    )

    def _decode(it):
        for pdf in it:
            rows = []
            for path, content in zip(pdf["path"], pdf["content"]):
                m = _PARTITION_RE.search(path)
                part = int(m.group(1)) if m else 0
                for r in decode_segment(bytes(content)):
                    if r["offset"] >= 1 << 40:
                        raise ValueError(
                            f"offset {r['offset']} exceeds the 2^40 seq "
                            "budget; re-base the recorded segment"
                        )
                    rows.append(
                        (
                            (part << 40) | r["offset"],
                            topic,
                            part,
                            r["offset"],
                            # Kafka keys/values are arbitrary bytes — a
                            # non-UTF-8 payload (msgpack/avro producer)
                            # must flow to the normalizer's non-JSON
                            # log-and-skip guard as a garbled string,
                            # not crash the whole segment decode task
                            None if r["key"] is None
                            else r["key"].decode(errors="replace"),
                            None if r["value"] is None
                            else r["value"].decode(errors="replace"),
                        )
                    )
            yield pd.DataFrame(
                rows,
                columns=["seq", "topic", "partition", "offset", "key", "value"],
            )

    return files.select("path", "content").mapInPandas(_decode, schema=schema)


__all__ = [
    "crc32c",
    "encode_varint",
    "decode_varint",
    "KafkaSegmentWriter",
    "decode_segment",
    "read_kafka_segments",
]
