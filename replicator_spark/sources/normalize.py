"""Per-source event normalization → canonical change record columns.

Each function takes a DataFrame of raw source events and returns rows
shaped like model.CHANGE_SCHEMA's core (seq/op/db/tbl/doc[/key]), all
with native Column expressions (from_json/projections) — the decode
work the reference does struct-by-struct in Go:

* MySQL rows arrive as *positional JSON arrays with no column names*
  (``pkg/streams/mysql_stream.go:401-415``).
* PostgreSQL tuples arrive as text maps ``{col_0: ..., col_1: ...}``
  with synthetic ``relation_%d`` table names
  (``pkg/streams/postgresql_stream.go:506-531``).
* Kafka messages are JSON with optional ``action``/``schema``/
  ``collection`` keys, defaulting to insert / config db / topic
  (``pkg/streams/kafka_stream.go:382-414``).
* Mongo change-stream events carry operationType/ns/documentKey/
  fullDocument, with a fallback re-fetch when fullDocument is missing
  (``pkg/streams/mongodb_stream.go:402-581``) — expressed here as a
  left lookup join against current table state instead of a per-event
  FindOne.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def from_mysql_rows(
    df: DataFrame,
    columns: Sequence[str],
    *,
    row_col: str = "row_json",
    op_col: str = "op",
) -> DataFrame:
    """Positional JSON array row → named payload doc.

    ``columns`` is the declared table schema (the reference loses the
    names; we keep them — sanctioned improvement, SURVEY §2.1 S6).
    """
    # parse ONCE into an attribute: element_at references it per column,
    # and ≥2 references of a non-trivial alias block CollapseProject —
    # inlined, the array parse would re-run per projected column (r6;
    # measured 3× duplicate from_json in the plan)
    arr = F.col("_arr")
    doc = F.to_json(
        F.struct(
            *[F.element_at(arr, i + 1).alias(c) for i, c in enumerate(columns)]
        )
    )
    return (
        df.withColumn(
            "_arr", F.from_json(F.col(row_col), T.ArrayType(T.StringType()))
        )
        .withColumn("doc", doc)
        .drop("_arr")
    )


def from_pg_tuples(df: DataFrame, rename: dict[str, str] | None = None) -> DataFrame:
    """``{col_0: text, ...}`` map → doc JSON, optionally renaming the
    synthetic names to real ones.

    When the input carries the decoder's ``partial`` flag
    (``read_pgoutput_feed`` sets it for updates whose new image omitted
    unchanged-TOAST columns), it is propagated into the canonical
    ``meta['partial']='true'`` signal that ``pipeline.normalize``
    reads — without this the event would be applied as a full image and
    the LWW replace would null the stored TOAST value, the exact
    corruption the 'u'-kind decode exists to prevent (ADVICE r04).
    Note the engine-wide partial contract still applies: a partial
    image cannot set a column to SQL NULL (JSON-absent ≡ null ≡
    don't-touch), so an update that both nulls one column and skips a
    TOASTed one keeps the old value in the nulled column.
    """
    tuple_col = F.col("tuple")
    if rename:
        doc = F.to_json(
            F.struct(
                *[
                    F.element_at(tuple_col, syn).alias(real)
                    for syn, real in rename.items()
                ]
            )
        )
    else:
        doc = F.to_json(tuple_col)
    out = df.withColumn("doc", doc)
    if "partial" in df.columns:
        flag = F.coalesce(F.col("partial"), F.lit(False))
        pmeta = F.create_map(F.lit("partial"), F.lit("true"))
        if "meta" in df.columns:
            meta = F.when(~flag, F.col("meta")).otherwise(
                F.when(F.col("meta").isNull(), pmeta).otherwise(
                    F.map_concat(F.col("meta"), pmeta)
                )
            )
        else:
            meta = F.when(flag, pmeta)
        out = out.withColumn("meta", meta)
    return out


def from_kafka_messages(
    df: DataFrame,
    *,
    default_db: str = "srcdb",
    topic_col: str = "topic",
    value_col: str = "value",
    strict: bool = False,
) -> DataFrame:
    """Kafka value JSON → canonical columns with the reference's
    defaults: action→insert, schema→config db, collection→topic.
    Non-JSON payloads are dropped (``strict=False``, matching the
    reference's log-and-skip) or surfaced for dead-lettering."""
    parsed = F.from_json(
        F.col(value_col),
        T.StructType(
            [
                T.StructField("action", T.StringType()),
                T.StructField("schema", T.StringType()),
                T.StructField("collection", T.StringType()),
                T.StructField("data", T.StringType()),
            ]
        ),
    )
    out = (
        df.withColumn("_p", parsed)
        .withColumn("op", F.coalesce(F.col("_p.action"), F.lit("insert")))
        .withColumn("db", F.coalesce(F.col("_p.schema"), F.lit(default_db)))
        .withColumn("tbl", F.coalesce(F.col("_p.collection"), F.col(topic_col)))
        .withColumn("doc", F.coalesce(F.col("_p.data"), F.col(value_col)))
        .drop("_p")
    )
    if not strict:
        # invalid JSON → from_json yields all-null struct AND doc
        # fallback to raw value; mark droppable rows like the reference
        # logs-and-skips (kafka_stream.go:393-397)
        valid = F.from_json(F.col(value_col), T.MapType(T.StringType(), T.StringType())).isNotNull()
        out = out.where(valid)
    return out


def from_cosmos_documents(
    df: DataFrame,
    *,
    db: str,
    container: str,
    now_ts: int,
    high_water_ts: int | None = None,
    recency_window_s: int = 5,
    include_ops: Sequence[str] | None = None,
    exclude_ops: Sequence[str] | None = None,
    doc_col: str = "doc",
) -> DataFrame:
    """Cosmos DB change-feed normalize (S8 — ``pkg/streams/
    cosmosdb.go``): the reference polls ``SELECT * FROM c ORDER BY
    c._ts`` with a continuation token and infers the operation type from
    document metadata, since the Cosmos change feed carries none.

    * **Continuation token** (``cosmosdb.go:276-324``): the token is a
      high-water mark over the ``_ts`` order; here that is an explicit
      ``_ts > high_water_ts`` predicate — pushed into the scan, and the
      caller persists the batch's max ``_ts`` as the next token (the
      streaming checkpoint does this for free).
    * **Op-type inference** (``cosmosdb.go:373-391``): a document whose
      ``_ts`` is within ``recency_window_s`` of ``now_ts`` is a create
      (→ canonical ``insert``); anything older is an ``update``. The
      reference reads the wall clock; ``now_ts`` is explicit here so
      replays are deterministic.
    * **Operation filters** (``cosmosdb.go:393-421``): include list
      wins, then exclude list — evaluated post-inference like the
      reference.
    * Event shape (``cosmosdb.go:349-360``): Action=op, Schema=database,
      Collection=container, Data=the full document JSON.
    """
    ts = F.get_json_object(F.col(doc_col), "$._ts").cast("long")
    out = df.withColumn("_ts", ts)
    if high_water_ts is not None:
        out = out.where(F.col("_ts") > F.lit(high_water_ts))
    op = F.when(
        (F.lit(now_ts) - F.col("_ts")) < F.lit(recency_window_s), F.lit("insert")
    ).otherwise(F.lit("update"))
    out = (
        out.withColumn("op", op)
        .withColumn("db", F.lit(db))
        .withColumn("tbl", F.lit(container))
    )
    # The reference's filter vocabulary is the PRE-canonical op name:
    # determineOperationType returns "create" (cosmosdb.go:373-391) and
    # shouldFilterOperation compares against it — a ported config with
    # include_ops=["create"] must keep inserts, so map create→insert
    # (ADVICE r02).
    def _canon(ops):
        return [
            "insert" if o.lower() == "create" else o.lower() for o in ops
        ]

    if include_ops:
        out = out.where(F.col("op").isin(*_canon(include_ops)))
    if exclude_ops:
        out = out.where(~F.col("op").isin(*_canon(exclude_ops)))
    return out


def from_mongo_events(
    df: DataFrame,
    current_state: DataFrame | None = None,
    key_cols: Sequence[str] = ("repo", "path", "commit"),
) -> DataFrame:
    """Mongo change-stream shape → canonical, with the 3-tier
    fullDocument recovery (normal → lookup re-fetch → empty doc,
    ``mongodb_stream.go:523-581``).

    ``current_state`` is the lake table's live view; the re-fetch
    becomes one left join for the whole batch instead of a per-event
    FindOne round trip. Deletes get ``doc='{}'`` exactly like
    ``mongodb_stream.go:500-502``.
    """
    op = (
        F.when(F.col("operationType") == "replace", F.lit("update"))
        .otherwise(F.col("operationType"))
        .alias("op")
    )
    out = df.select(
        F.col("documentKey").alias("key"),
        op,
        F.col("fullDocument").alias("doc"),
        F.col("ns_coll").alias("tbl"),
        *[c for c in ("seq", "event_id", "ts") if c in df.columns],
    )
    if current_state is not None:
        # Scale-safe lookup: the table's live state can be arbitrarily
        # large, so it must NEVER be broadcast wholesale (the r01 form
        # OOMed executors at any real scale). Instead broadcast the
        # *batch's* keys — bounded by micro-batch size — into a semi-join
        # that prunes the state map-side, then left-join the pruned state
        # (now ≤ batch cardinality; AQE picks broadcast when it fits).
        state = current_state.select(
            F.struct(*[F.col(k) for k in key_cols]).alias("key"),
            F.col("doc_json").alias("_fallback_doc"),
        )
        batch_keys = out.select("key").distinct()
        state = state.join(F.broadcast(batch_keys), "key", "left_semi")
        looked = out.alias("e").join(
            state.alias("s"),
            F.col("e.key") == F.col("s.key"),
            "left",
        )
        out = looked.select(
            "e.*",
            F.coalesce(F.col("e.doc"), F.col("s._fallback_doc")).alias("_doc2"),
        ).drop("doc").withColumnRenamed("_doc2", "doc")
    # tier 3: still missing → {} (also the delete convention)
    return out.withColumn(
        "doc",
        F.when(F.col("op") == "delete", F.lit("{}")).otherwise(
            F.coalesce(F.col("doc"), F.lit("{}"))
        ),
    )
