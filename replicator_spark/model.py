"""Canonical change-event model and target-table schema.

Re-expresses the reference's two event shapes as one Spark StructType:

* legacy ``RecordEvent {Action, Schema, Collection, DocumentKey, OldData,
  Data}`` — reference ``pkg/events/events.go:22-29``;
* v2 ``ChangeEvent {ID, OperationType, Timestamp, Database, Collection,
  DocumentKey, FullDocument, UpdateFields, ResumeToken, Metadata}`` —
  reference ``pkg/models/models.go:27-40``.

The explicit total-order ``seq`` column stands in for the reference's
MySQL (file, position) / PostgreSQL LSN positions
(``pkg/position/mysql_position.go:13-28``, ``postgres_position.go:11-29``)
and is the last-writer-wins ordering key.
"""

from __future__ import annotations

from pyspark.sql import types as T

# Operation taxonomy — reference pkg/events/events.go:4-8 plus 'replace'
# from pkg/models/models.go:30 (replace folds into upsert semantics).
OP_INSERT = "insert"
OP_UPDATE = "update"
OP_DELETE = "delete"
OP_REPLACE = "replace"
OPS = (OP_INSERT, OP_UPDATE, OP_DELETE, OP_REPLACE)

# Key of the target source-code table (BASELINE.json input_hint).
KEY_COLS = ["repo", "path", "commit"]
SEQ_COL = "seq"
OP_COL = "op"

KEY_SCHEMA = T.StructType(
    [
        T.StructField("repo", T.StringType(), False),
        T.StructField("path", T.StringType(), False),
        T.StructField("commit", T.StringType(), False),
    ]
)

# Canonical change record: one row per change event.
CHANGE_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.StringType(), False),  # dedup key
        T.StructField("seq", T.LongType(), False),  # LSN / binlog position
        T.StructField("op", T.StringType(), False),  # insert|update|delete
        T.StructField("ts", T.TimestampType(), True),  # event time (may lag seq)
        T.StructField("db", T.StringType(), True),  # RecordEvent.Schema
        T.StructField("tbl", T.StringType(), True),  # RecordEvent.Collection
        T.StructField("key", KEY_SCHEMA, False),  # DocumentKey
        T.StructField("doc", T.StringType(), True),  # Data (full image JSON)
        T.StructField("old", T.StringType(), True),  # OldData (prior image)
        T.StructField("meta", T.MapType(T.StringType(), T.StringType()), True),
    ]
)

# Logical schema of the target lake table (input_hint). The sink adds
# engine-managed columns: _last_seq (LWW high-water mark per key) and the
# physical partition column repo_bucket = pmod(hash(repo), B).
REPOS_SCHEMA = T.StructType(
    [
        T.StructField("repo", T.StringType(), False),
        T.StructField("path", T.StringType(), False),
        T.StructField("commit", T.StringType(), False),
        T.StructField("lang", T.StringType(), True),
        T.StructField("content", T.StringType(), True),
    ]
)

LAST_SEQ_COL = "_last_seq"
BUCKET_COL = "repo_bucket"


def schema_to_json(schema: T.StructType) -> str:
    return schema.json()


def schema_from_json(s: str) -> T.StructType:
    return T.StructType.fromJson(__import__("json").loads(s))
