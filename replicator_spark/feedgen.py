"""Deterministic synthetic change-event feed generator.

Stands in for the reference's source tails (MySQL binlog
``pkg/streams/mysql_stream.go``, PostgreSQL WAL ``postgresql_stream.go``,
Mongo change stream ``mongodb_stream.go``): emits the canonical change
record (model.CHANGE_SCHEMA) as partitioned parquet "log segments".

Everything is a pure function of (row id, seed) computed with Spark
column expressions (``xxhash64``) — no Python per-row code, no driver
loops, fully parallel and reproducible at any scale. Feed variants
(FIXTURES.md F2): duplicates (at-least-once redelivery), key contention,
out-of-order seq across batches, one hot repo (skew), additive schema
evolution after a cut-over seq.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

LANGS = ["py", "go", "rs", "js", "java"]


def _h(seed: int, tag: str, *cols) -> F.Column:
    """Deterministic 64-bit hash of (seed, tag, *cols)."""
    return F.xxhash64(F.lit(seed), F.lit(tag), *cols)


def _pm(col: F.Column, n: int) -> F.Column:
    return F.pmod(col, F.lit(n))


def gen_changes(
    spark: SparkSession,
    n_events: int,
    *,
    seed: int = 42,
    n_repos: int = 50,
    hot_repo_pct: int = 30,
    paths_per_repo: int = 200,
    commits_per_path: int = 4,
    dup_pct: int = 5,
    n_batches: int = 8,
    evolution_at: int | None = None,
    payload_repeat: int = 4,
) -> DataFrame:
    """Generate a change feed as a DataFrame (canonical record + batch_id).

    ``seq`` is the global total order (the synthetic LSN). Batch
    assignment is hashed, so within any batch seq values are arbitrary
    and interleaved — delivery order ≠ commit order, exercising LWW.
    ``hot_repo_pct`` percent of events hit repo 0 (skew fixture).
    Events with ``seq >= evolution_at`` carry an extra ``branch`` field
    in the doc JSON (additive schema evolution fixture).
    """
    df = spark.range(0, n_events).withColumnRenamed("id", "seq")
    s = F.col("seq")

    hot = _pm(_h(seed, "hot", s), 100) < F.lit(hot_repo_pct)
    repo_id = F.when(hot, F.lit(0)).otherwise(_pm(_h(seed, "repo", s), n_repos))
    path_id = _pm(_h(seed, "path", s), paths_per_repo)
    commit_id = _pm(_h(seed, "commit", s), commits_per_path)

    # op mix ~ 50% insert / 35% update / 15% delete
    op_r = _pm(_h(seed, "op", s), 100)
    op = (
        F.when(op_r < 50, F.lit("insert"))
        .when(op_r < 85, F.lit("update"))
        .otherwise(F.lit("delete"))
    )

    repo = F.concat(F.lit("repo-"), F.lpad(repo_id.cast("string"), 4, "0"))
    path = F.concat(
        F.lit("src/"),
        _pm(_h(seed, "dir", s), 16).cast("string"),
        F.lit("/f"),
        F.lpad(path_id.cast("string"), 5, "0"),
        F.lit(".txt"),
    )
    commit = F.substring(
        F.sha2(F.concat_ws("|", repo, path, commit_id.cast("string")), 256), 1, 12
    )
    lang = F.element_at(
        F.array(*[F.lit(x) for x in LANGS]), (_pm(_h(seed, "lang", s), len(LANGS)) + 1).cast("int")
    )
    # Deterministic content: hex blob derived from (key, seq) — each new
    # image of a key differs, and sha256(content) is reproducible anywhere.
    content = F.repeat(F.sha2(F.concat_ws("|", repo, path, commit, s.cast("string")), 256), payload_repeat)

    base_fields = [
        repo.alias("repo"),
        path.alias("path"),
        commit.alias("commit"),
        lang.alias("lang"),
        content.alias("content"),
    ]
    evolved = evolution_at is not None
    doc_struct_old = F.struct(*base_fields)
    if evolved:
        branch = F.concat(F.lit("branch-"), _pm(_h(seed, "branch", s), 8).cast("string"))
        doc_struct_new = F.struct(*base_fields, branch.alias("branch"))
        doc = F.when(
            s >= F.lit(evolution_at), F.to_json(doc_struct_new)
        ).otherwise(F.to_json(doc_struct_old))
    else:
        doc = F.to_json(doc_struct_old)
    doc = F.when(op == "delete", F.lit("{}")).otherwise(doc)

    out = df.select(
        F.concat(F.lit("ev-"), F.lpad(s.cast("string"), 12, "0")).alias("event_id"),
        s.alias("seq"),
        op.alias("op"),
        (F.timestamp_seconds(F.lit(1704067200) + s + _pm(_h(seed, "jit", s), 120) - 60)).alias("ts"),
        F.lit("srcdb").alias("db"),
        F.lit("repos").alias("tbl"),
        F.struct(repo.alias("repo"), path.alias("path"), commit.alias("commit")).alias("key"),
        doc.alias("doc"),
        F.when(op != "insert", F.lit("{}")).alias("old"),
        F.create_map(
            F.lit("source_type"), F.lit("feedgen"),
            F.lit("stream"), F.lit("synthetic-binlog"),
        ).alias("meta"),
        _pm(_h(seed, "batch", s), n_batches).cast("int").alias("batch_id"),
    )

    # At-least-once redelivery: dup_pct% of events are delivered twice
    # (same event_id, same seq — possibly in a different batch).
    if dup_pct > 0:
        dups = out.where(_pm(_h(seed, "dup", F.col("seq")), 100) < F.lit(dup_pct)).withColumn(
            "batch_id", _pm(_h(seed, "dupbatch", F.col("seq")), n_batches).cast("int")
        )
        out = out.unionByName(dups)
    return out


def write_feed(
    df: DataFrame, feed_dir: str, files_per_batch: int | None = None
) -> None:
    """Materialize the feed as parquet log segments partitioned by batch.

    Explicitly repartitions on (batch_id, event-hash salt) so every
    batch directory gets evenly sized, splittable files REGARDLESS of
    the generating session's core count — a feed generated at local[2]
    must not hand unsplittable 40MB single-row-group stragglers to a
    local[32] reader (single-file row groups serialize the scan).
    """
    n_batches = df.select("batch_id").distinct().count()
    if files_per_batch is None:
        approx_rows = df.count()
        files_per_batch = max(8, min(64, approx_rows // (n_batches * 100_000) + 1))
    salt = F.pmod(F.xxhash64(F.col("event_id"), F.lit(7)), F.lit(files_per_batch))
    (
        df.repartition(n_batches * files_per_batch, F.col("batch_id"), salt)
        .write.mode("overwrite")
        .partitionBy("batch_id")
        .parquet(feed_dir)
    )
