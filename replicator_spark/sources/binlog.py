"""MySQL binlog v4 wire-format decode (and a writer for fixtures).

The reference tails MySQL through go-mysql, which hands it decoded row
events (``pkg/streams/mysql_stream.go:210-323``); the wire-format
parse itself happens inside that library. Here the parse is
implemented directly from the public binlog v4 format: a binlog FILE
(or recorded byte stream) decodes to row events without any MySQL
client library, and the decoded rows feed the exact same
``from_mysql_rows`` normalization as the deterministic feed. What
remains sandbox-stubbed is only the replication TRANSPORT (handshake +
COM_BINLOG_DUMP socket protocol); the bytes are the real format.

Subset implemented (the row-replication core):

* magic ``\\xfe bin``; v4 common event header (19 bytes)
* FORMAT_DESCRIPTION_EVENT (15) — header length + checksum algorithm
* TABLE_MAP_EVENT (19) — db/table names, column types + metadata
* WRITE/UPDATE/DELETE_ROWS_EVENT v2 (30/31/32) — present-column
  bitmaps (validated: a partial row image, binlog_row_image=MINIMAL/
  NOBLOB, raises loudly rather than mis-binding values positionally),
  per-image null bitmaps, values
* column types LONG (4-byte int), LONGLONG (8-byte int), VARCHAR
  (1/2-byte length prefix by declared max length)
* other event types (QUERY, XID, ROTATE, ...) are skipped by size —
  exactly what a row-based consumer does

Checksum algorithm 0 (NONE) and 1 (CRC32) are both accepted; the alg
byte is located structurally from the FDE's declared post-header
array length (tail-sniffing misdetects ~1/256 of CRC32 files), and
CRC32 footers are verified on every event. Scale shape: one binlog segment file = one decode task
(``binaryFile`` source → ``mapInPandas``), matching how real binlogs
rotate; the per-event work is pure ``struct`` unpacking inside the
Arrow batch.
"""

from __future__ import annotations

import json
import os
import struct
from dataclasses import dataclass

MAGIC = b"\xfebin"
FDE, TABLE_MAP, WRITE_V2, UPDATE_V2, DELETE_V2 = 15, 19, 30, 31, 32
XID = 16
_TYPE_LONG, _TYPE_LONGLONG, _TYPE_VARCHAR = 3, 8, 15
_HDR = struct.Struct("<IBIIIH")  # ts, type, server_id, event_size, log_pos, flags


@dataclass
class TableSchema:
    db: str
    table: str
    # (name, type) with type in {"long", "longlong", "varchar"}
    columns: list[tuple[str, str]]
    varchar_max: int = 255

    @property
    def type_codes(self) -> list[int]:
        m = {"long": _TYPE_LONG, "longlong": _TYPE_LONGLONG, "varchar": _TYPE_VARCHAR}
        return [m[t] for _n, t in self.columns]


# -- writer (fixture/replay synthesis) ----------------------------------------


class BinlogWriter:
    """Compose a syntactically real binlog v4 file (server 5.6
    vocabulary). ``checksum="crc32"`` appends a CRC32 footer to every
    event (incl. the FDE) and declares alg 1 in the FDE, exactly the
    binlog_checksum=CRC32 layout; default is NONE."""

    def __init__(
        self,
        schema: TableSchema,
        *,
        table_id: int = 7,
        ts: int = 1700000000,
        checksum: str = "none",
    ):
        if checksum not in ("none", "crc32"):
            raise ValueError(f"unsupported checksum {checksum!r}")
        self.schema = schema
        self.table_id = table_id
        self.ts = ts
        self._crc = checksum == "crc32"
        self.buf = bytearray(MAGIC)
        self._fde()

    def _event(self, etype: int, body: bytes) -> None:
        import zlib

        size = 19 + len(body) + (4 if self._crc else 0)
        log_pos = len(self.buf) + size
        ev = _HDR.pack(self.ts, etype, 1, size, log_pos, 0) + body
        if self._crc:
            ev += struct.pack("<I", zlib.crc32(ev))
        self.buf += ev

    def _fde(self) -> None:
        post = bytearray(40)  # post-header lengths for event types 1..40
        # the FDE declares its OWN post-header length too: 2 (binlog
        # ver) + 50 (server ver) + 4 (ts) + 1 (header len) + n array
        # entries — what lets a reader locate the checksum-alg byte
        # structurally instead of guessing from the tail (ADVICE r04)
        post[FDE - 1] = 57 + len(post)
        post[TABLE_MAP - 1] = 8
        for t in (WRITE_V2, UPDATE_V2, DELETE_V2):
            post[t - 1] = 10
        body = (
            struct.pack("<H", 4)
            + b"5.6.40-log".ljust(50, b"\x00")
            + struct.pack("<I", self.ts)
            + bytes([19])
            + bytes(post)
            + bytes([1 if self._crc else 0])  # checksum_alg
        )
        self._event(FDE, bytes(body))

    def _lenenc(self, n: int) -> bytes:
        assert n < 0xFB, "subset: small counts only"
        return bytes([n])

    def _table_map(self) -> bytes:
        s = self.schema
        n = len(s.columns)
        meta = bytearray()
        for code in s.type_codes:
            if code == _TYPE_VARCHAR:
                meta += struct.pack("<H", s.varchar_max)
        body = (
            struct.pack("<Q", self.table_id)[:6]
            + struct.pack("<H", 0)
            + bytes([len(s.db)]) + s.db.encode() + b"\x00"
            + bytes([len(s.table)]) + s.table.encode() + b"\x00"
            + self._lenenc(n)
            + bytes(s.type_codes)
            + self._lenenc(len(meta)) + bytes(meta)
            + bytes((n + 7) // 8)  # null-ability bitmap (all NOT NULL)
        )
        return bytes(body)

    def _image(self, row: tuple) -> bytes:
        s = self.schema
        n = len(s.columns)
        null_bm = bytearray((n + 7) // 8)
        vals = bytearray()
        for i, ((_name, typ), v) in enumerate(zip(s.columns, row)):
            if v is None:
                null_bm[i // 8] |= 1 << (i % 8)
                continue
            if typ == "long":
                vals += struct.pack("<i", int(v))
            elif typ == "longlong":
                vals += struct.pack("<q", int(v))
            else:
                b = str(v).encode()
                if s.varchar_max < 256:
                    vals += bytes([len(b)]) + b
                else:
                    vals += struct.pack("<H", len(b)) + b
        return bytes(null_bm) + bytes(vals)

    def _rows_event(self, etype: int, images: list[bytes], n_bitmaps: int) -> None:
        n = len(self.schema.columns)
        present = bytes([0xFF] * ((n + 7) // 8))  # all columns present
        body = (
            struct.pack("<Q", self.table_id)[:6]
            + struct.pack("<H", 0)
            + struct.pack("<H", 2)  # extra_data_len (v2): just itself
            + self._lenenc(n)
            + present * n_bitmaps
            + b"".join(images)
        )
        self._event(TABLE_MAP, self._table_map())
        self._event(etype, bytes(body))

    def write_rows(self, rows: list[tuple]) -> None:
        self._rows_event(WRITE_V2, [self._image(r) for r in rows], 1)

    def update_rows(self, pairs: list[tuple[tuple, tuple]]) -> None:
        imgs = []
        for before, after in pairs:
            imgs += [self._image(before), self._image(after)]
        self._rows_event(UPDATE_V2, imgs, 2)

    def delete_rows(self, rows: list[tuple]) -> None:
        self._rows_event(DELETE_V2, [self._image(r) for r in rows], 1)

    def xid(self, xid: int = 1) -> None:
        self._event(XID, struct.pack("<Q", xid))

    def save(self, path: str) -> None:
        os.makedirs(os.path.dirname(path), exist_ok=True)
        tmp = path + ".tmp"
        with open(tmp, "wb") as f:
            f.write(self.buf)
        os.rename(tmp, path)


# -- decoder -------------------------------------------------------------------


def _read_lenenc(b: bytes, off: int) -> tuple[int, int]:
    v = b[off]
    if v < 0xFB:
        return v, off + 1
    if v == 0xFC:
        return struct.unpack_from("<H", b, off + 1)[0], off + 3
    if v == 0xFD:
        return int.from_bytes(b[off + 1 : off + 4], "little"), off + 4
    return struct.unpack_from("<Q", b, off + 1)[0], off + 9


def _parse_image(body: bytes, off: int, types: list[int], metas: list[int]):
    n = len(types)
    null_bm = body[off : off + (n + 7) // 8]
    off += (n + 7) // 8
    row = []
    for i, code in enumerate(types):
        if null_bm[i // 8] & (1 << (i % 8)):
            row.append(None)
            continue
        if code == _TYPE_LONG:
            row.append(struct.unpack_from("<i", body, off)[0])
            off += 4
        elif code == _TYPE_LONGLONG:
            row.append(struct.unpack_from("<q", body, off)[0])
            off += 8
        elif code == _TYPE_VARCHAR:
            if metas[i] < 256:
                ln = body[off]
                off += 1
            else:
                ln = struct.unpack_from("<H", body, off)[0]
                off += 2
            row.append(body[off : off + ln].decode())
            off += ln
        else:  # pragma: no cover — writer never emits other types
            raise ValueError(f"unsupported column type {code}")
    return tuple(row), off


def decode_binlog(data: bytes) -> list[dict]:
    """Binlog file bytes → row-event dicts:
    ``{"log_pos", "ts", "op", "db", "tbl", "before", "after"}``
    (one dict per ROW; update rows carry both images). Raises on a bad
    magic; skips non-row events by their declared size."""
    import zlib

    if data[:4] != MAGIC:
        raise ValueError("not a binlog file (bad magic)")
    off = 4
    checksum_trim = 0
    tables: dict[int, dict] = {}
    out: list[dict] = []
    while off + 19 <= len(data):
        ts, etype, _srv, size, _log_pos, _flags = _HDR.unpack_from(data, off)
        end_pos = off + size
        # fail-loud bounds: a zero-padded tail (crash-torn segment)
        # declares size=0, which would pin end_pos == off and spin this
        # loop forever (and in CRC mode crc32(b'') == 0 matches the
        # zeroed footer); a declared size past EOF is a torn event whose
        # positional row parse would silently drop trailing rows.
        if size < 19 or end_pos > len(data):
            raise ValueError(
                f"malformed binlog event at pos {off}: declared size "
                f"{size} with {len(data) - off} bytes remaining"
            )
        if checksum_trim and etype != FDE:
            (want,) = struct.unpack_from("<I", data, end_pos - 4)
            got = zlib.crc32(data[off : end_pos - 4])
            if got != want:
                raise ValueError(
                    f"binlog CRC32 mismatch at pos {off}: "
                    f"expected {want:#010x}, computed {got:#010x}"
                )
        body = data[off + 19 : end_pos - (checksum_trim if etype != FDE else 0)]
        if etype == FDE:
            # The checksum-alg byte sits STRUCTURALLY at 2 (binlog ver)
            # + 50 (server ver) + 4 (create ts) + 1 (header len) + n
            # post-header entries, where n comes from the FDE's own
            # declared post-header length (array entry for type 15 =
            # 57 + n). Tail-sniffing (body[-1]==0 vs body[-5]==1) is
            # ambiguous ~1/256 of the time — a CRC32 file whose FDE
            # checksum ends in 0x00 would silently misdetect as
            # checksum-free and corrupt every later parse (ADVICE r04).
            if len(body) < 57 + FDE:
                raise ValueError("malformed FDE: truncated post-header array")
            n_types = body[57 + FDE - 1] - 57
            if n_types < FDE or 57 + n_types > len(body):
                raise ValueError(
                    "malformed FDE: undeclared or inconsistent "
                    "post-header array length"
                )
            alg_off = 57 + n_types
            # pre-5.6.1 servers end the FDE at the array: no alg byte
            alg = body[alg_off] if alg_off < len(body) else 0
            if alg == 0:
                checksum_trim = 0
            elif alg == 1:
                checksum_trim = 4
                # the FDE checksums itself under the alg it declares
                (want,) = struct.unpack_from("<I", data, end_pos - 4)
                got = zlib.crc32(data[off : end_pos - 4])
                if got != want:
                    raise ValueError(
                        f"binlog FDE CRC32 mismatch: expected "
                        f"{want:#010x}, computed {got:#010x}"
                    )
            else:
                raise ValueError(
                    f"unsupported binlog checksum algorithm {alg}"
                )
        elif etype == TABLE_MAP:
            tid = int.from_bytes(body[0:6], "little")
            p = 8
            dblen = body[p]
            db = body[p + 1 : p + 1 + dblen].decode()
            p += 1 + dblen + 1
            tlen = body[p]
            tbl = body[p + 1 : p + 1 + tlen].decode()
            p += 1 + tlen + 1
            ncols, p = _read_lenenc(body, p)
            types = list(body[p : p + ncols])
            p += ncols
            mlen, p = _read_lenenc(body, p)
            metas = [0] * ncols
            q = p
            for i, code in enumerate(types):
                if code == _TYPE_VARCHAR:
                    metas[i] = struct.unpack_from("<H", body, q)[0]
                    q += 2
            tables[tid] = {"db": db, "tbl": tbl, "types": types, "metas": metas}
        elif etype in (WRITE_V2, UPDATE_V2, DELETE_V2):
            tid = int.from_bytes(body[0:6], "little")
            t = tables[tid]
            p = 8
            extra = struct.unpack_from("<H", body, p)[0]
            p += extra  # extra_data_len includes its own 2 bytes
            ncols, p = _read_lenenc(body, p)
            bm = (ncols + 7) // 8
            # present-column bitmaps: the positional image parse below
            # is only valid when every column is present. A binlog
            # written with binlog_row_image=MINIMAL/NOBLOB has partial
            # images — silently binding values to the wrong columns is
            # the worst failure mode, so fail loudly (ADVICE r04).
            for _img in range(2 if etype == UPDATE_V2 else 1):
                bmp = body[p : p + bm]
                for i in range(ncols):
                    if not (bmp[i // 8] >> (i % 8)) & 1:
                        raise ValueError(
                            "partial row image (binlog_row_image != "
                            "FULL) unsupported: column "
                            f"{i} absent from present-column bitmap"
                        )
                p += bm
            while p < len(body):
                img1, p = _parse_image(body, p, t["types"], t["metas"])
                rec = {
                    "log_pos": end_pos, "ts": ts, "db": t["db"], "tbl": t["tbl"],
                }
                if etype == WRITE_V2:
                    rec |= {"op": "insert", "before": None, "after": img1}
                elif etype == DELETE_V2:
                    rec |= {"op": "delete", "before": img1, "after": None}
                else:
                    img2, p = _parse_image(body, p, t["types"], t["metas"])
                    rec |= {"op": "update", "before": img1, "after": img2}
                out.append(rec)
        off = end_pos
    return out


# -- Spark integration ---------------------------------------------------------


def read_binlog_feed(spark, binlog_dir: str, *, streaming: bool = False):
    """Decode a directory of binlog segment files into the positional
    row-event frame ``from_mysql_rows`` consumes:
    (seq, op, db, tbl, row_json).

    One segment = one decode task (``binaryFile`` source → Arrow
    ``mapInPandas``), the natural parallelism of rotated binlogs.
    ``seq`` is (segment_number << 32) | log_pos — strictly increasing
    in true binlog order across rotations, exactly the LSN contract the
    LWW merge expects. Updates/deletes serialize their AFTER/BEFORE
    image respectively (what the reference applies too).

    ``streaming=True`` returns the same frame as a Structured
    Streaming source over the directory (new segments = new files —
    how a live replica tail accumulates); the checkpoint's file-source
    log is the resume position, standing in for the reference's
    binlog (file, offset) checkpoint."""
    import pandas as pd

    from ._binfiles import load_binary_files

    files = load_binary_files(spark, binlog_dir, streaming=streaming)

    schema = "seq long, op string, db string, tbl string, row_json string"

    def _decode(it):
        for pdf in it:
            rows = []
            for path, content in zip(pdf["path"], pdf["content"]):
                base = os.path.basename(path)
                seg = int(base.rsplit(".", 1)[-1]) if "." in base else 0
                for ev in decode_binlog(bytes(content)):
                    img = ev["after"] if ev["op"] != "delete" else ev["before"]
                    if ev["log_pos"] >= 1 << 32:
                        # the 32-bit log_pos budget is the real server's
                        # own uint32 position limit; a larger offset
                        # would alias into the next segment's seq range
                        # and silently misorder the LWW merge — same
                        # loud guard as the Kafka twin's 2^40 budget
                        raise ValueError(
                            f"binlog segment {base} exceeds the 4 GiB "
                            f"log_pos budget (offset {ev['log_pos']})"
                        )
                    rows.append(
                        (
                            (seg << 32) | ev["log_pos"],
                            ev["op"], ev["db"], ev["tbl"],
                            json.dumps(list(img)),
                        )
                    )
            yield pd.DataFrame(
                rows, columns=["seq", "op", "db", "tbl", "row_json"]
            )

    return files.select("path", "content").mapInPandas(_decode, schema=schema)
