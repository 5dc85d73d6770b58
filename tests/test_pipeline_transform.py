"""Transform engine wired into the apply pipeline: enrichment reaches
the table (schema widens), dead-letter rows are quarantined."""

from pyspark.sql import functions as F

from replicator_spark.feedgen import gen_changes, write_feed
from replicator_spark.laketable import LakeTable
from replicator_spark.model import KEY_COLS, REPOS_SCHEMA
from replicator_spark.pipeline import replay_feed, apply_batch, infer_payload_schema
from replicator_spark.transform import Action, Condition, Rule, TransformEngine

PROTECTED = ("event_id", "seq", "op", *KEY_COLS)


def test_enrichment_rule_reaches_table(spark, tmp_path):
    feed = str(tmp_path / "feed")
    write_feed(gen_changes(spark, 1500, n_repos=6, n_batches=2), feed)
    table = LakeTable(spark, str(tmp_path / "t"))
    table.create(REPOS_SCHEMA, num_buckets=4)
    eng = TransformEngine(
        [
            Rule(
                "size-tier",
                actions=[
                    Action(
                        "computed",
                        {
                            "field": "size_tier",
                            "expr": F.when(F.length("content") > 512, F.lit("big"))
                            .otherwise(F.lit("small")),
                        },
                    )
                ],
            )
        ],
        protected=PROTECTED,
    )
    import os

    for b in sorted(os.listdir(feed)):
        if not b.startswith("batch_id="):
            continue
        bdf = spark.read.parquet(f"{feed}/{b}")
        apply_batch(
            table,
            bdf,
            batch_key=b,
            transform_engine=eng,
            write_metrics=False,
        )
    assert "size_tier" in table.schema().fieldNames()
    live = table.read()
    tiers = {r["size_tier"] for r in live.select("size_tier").distinct().collect()}
    assert tiers <= {"big", "small"}
    assert live.where(F.col("size_tier").isNull()).count() == 0


def test_dead_letter_rows_quarantined(spark, tmp_path):
    feed = str(tmp_path / "feed")
    write_feed(gen_changes(spark, 1000, n_repos=6, n_batches=1, dup_pct=0), feed)
    table = LakeTable(spark, str(tmp_path / "t"))
    table.create(REPOS_SCHEMA, num_buckets=4)
    # quarantine rows whose lang is 'py' (arbitrary but deterministic)
    eng = TransformEngine(
        [
            Rule(
                "no-py",
                actions=[Action("pass")],
                error_policy="dead_letter",
                validate=Condition("lang", "ne", "py"),
            )
        ],
        protected=PROTECTED,
    )
    bdf = spark.read.parquet(f"{feed}/batch_id=0")
    apply_batch(table, bdf, batch_key="b0", transform_engine=eng, write_metrics=False)
    dead = spark.read.parquet(f"{table.root}/_dead_letter")
    assert dead.count() > 0
    assert dead.where(F.col("lang") != "py").count() == 0
    assert table.read().where(F.col("lang") == "py").count() == 0


def test_dead_letter_not_duplicated_on_replay(spark, tmp_path):
    """Exactly-once covers the DLQ: redelivering a committed batch must
    not append its dead letters again (ADVICE r01)."""
    feed = str(tmp_path / "feed")
    write_feed(gen_changes(spark, 800, n_repos=6, n_batches=1, dup_pct=0), feed)
    table = LakeTable(spark, str(tmp_path / "t"))
    table.create(REPOS_SCHEMA, num_buckets=4)
    eng = TransformEngine(
        [
            Rule(
                "no-py",
                actions=[Action("pass")],
                error_policy="dead_letter",
                validate=Condition("lang", "ne", "py"),
            )
        ],
        protected=PROTECTED,
    )
    bdf = spark.read.parquet(f"{feed}/batch_id=0")
    apply_batch(table, bdf, batch_key="b0", transform_engine=eng, write_metrics=False)
    n1 = spark.read.parquet(f"{table.root}/_dead_letter").count()
    assert n1 > 0
    # redelivery (streaming restart replays the last micro-batch)
    res = apply_batch(
        table, bdf, batch_key="b0", transform_engine=eng, write_metrics=False
    )
    assert res.merge.replayed
    assert spark.read.parquet(f"{table.root}/_dead_letter").count() == n1


def test_payload_field_shadowing_engine_cols_is_ignored(spark, tmp_path):
    """A doc field named seq/op/event_id must not collide with the
    engine columns in normalize (ADVICE r01 — the reference protects the
    same critical tuple, service.go:493-501)."""
    from pyspark.sql import types as T

    from replicator_spark.pipeline import normalize

    rows = [
        ("e1", 10, "insert", ("r1", "p1", "c1"), '{"seq": 999, "op": "evil", "lang": "py"}'),
    ]
    schema = T.StructType(
        [
            T.StructField("event_id", T.StringType()),
            T.StructField("seq", T.LongType()),
            T.StructField("op", T.StringType()),
            T.StructField(
                "key",
                T.StructType(
                    [
                        T.StructField("repo", T.StringType()),
                        T.StructField("path", T.StringType()),
                        T.StructField("commit", T.StringType()),
                    ]
                ),
            ),
            T.StructField("doc", T.StringType()),
        ]
    )
    raw = spark.createDataFrame(rows, schema)
    flat = normalize(raw, infer_payload_schema(raw))
    assert len(flat.columns) == len(set(flat.columns))  # no dup names
    r = flat.first()
    assert r["seq"] == 10 and r["op"] == "insert" and r["lang"] == "py"
