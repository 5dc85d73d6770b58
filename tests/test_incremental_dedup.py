"""Incremental MinHash index (ops/incremental_dedup): online bucket
policy branches, exactly-once replay through the table ledger,
arrival-order enforcement, equality with the static LSH pass, and
compaction safety."""

import pytest
from pyspark.sql import functions as F

from replicator_spark.ops.dedup_text import (
    minhash_lsh_candidates,
    minhash_signatures,
)
from replicator_spark.ops.incremental_dedup import (
    MinHashIndex,
    replay_documents_incremental,
)

TEMPLATE = "the quick brown fox jumps over the lazy dog again and again"


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


@pytest.fixture()
def family_docs(spark):
    """8 pairwise-disjoint docs (token ranges don't overlap, so no
    background bands collide) + a 7-copy template family (100..106)."""
    rows = [
        (i, " ".join(f"tok{i * 40 + k:04d}" for k in range(30))) for i in range(8)
    ]
    rows += [(100 + j, TEMPLATE) for j in range(7)]
    return _docs(spark, rows)


def test_incremental_equals_static_when_no_oversized(spark, family_docs, tmp_path):
    inc = replay_documents_incremental(
        spark, family_docs, str(tmp_path / "idx"), n_batches=3, max_bucket=50
    )
    static = minhash_lsh_candidates(
        minhash_signatures(family_docs), max_bucket=50
    )
    assert sorted(map(tuple, inc.collect())) == sorted(map(tuple, static.collect()))
    # the family is a clique: 7*6/2 pairs at minimum
    fam = [r for r in inc.collect() if r["id_a"] >= 100]
    assert len(fam) == 21


def test_online_star_branch(spark, family_docs, tmp_path):
    """max_bucket=3: the first 4 family members pair fully (n_earlier
    ≤ 3), members 5..7 take ONE star edge each to the family min."""
    inc = replay_documents_incremental(
        spark, family_docs, str(tmp_path / "idx"), n_batches=2, max_bucket=3
    )
    fam = sorted(
        (r["id_a"], r["id_b"]) for r in inc.collect() if r["id_a"] >= 100
    )
    full = [(a, b) for a in range(100, 104) for b in range(a + 1, 104)]
    stars = [(100, b) for b in range(104, 107)]
    assert fam == sorted(full + stars)


def test_replay_is_ledger_noop(spark, family_docs, tmp_path):
    root = str(tmp_path / "idx")
    idx = MinHashIndex(spark, root).create(num_buckets=8)
    first = idx.add_batch(family_docs, "docs-0")
    n_pairs = first.count()
    assert n_pairs > 0
    rows_after = idx.table.read().count()
    # replaying the same batch: no new pairs, no new index rows, no
    # new snapshot version
    v = idx.table._snap().version
    assert idx.add_batch(family_docs, "docs-0") is None
    assert idx.table.read().count() == rows_after
    assert idx.table._snap().version == v


def test_out_of_order_batch_raises(spark, family_docs, tmp_path):
    idx = MinHashIndex(spark, str(tmp_path / "idx")).create(num_buckets=8)
    idx.add_batch(family_docs.where(F.col("doc_id") >= 100), "b0")
    with pytest.raises(ValueError, match="arrival order"):
        idx.add_batch(family_docs.where(F.col("doc_id") < 8), "b1")


def test_pairs_split_across_batches(spark, family_docs, tmp_path):
    """A cross-batch dup pair is discovered in the LATER doc's batch."""
    idx = MinHashIndex(spark, str(tmp_path / "idx")).create(num_buckets=8)
    p0 = idx.add_batch(family_docs.where(F.col("doc_id") <= 102), "b0")
    assert sorted(map(tuple, p0.select("id_a", "id_b").collect())) == [
        (100, 101), (100, 102), (101, 102)
    ]
    p1 = idx.add_batch(family_docs.where(F.col("doc_id") > 102), "b1")
    got = sorted(map(tuple, p1.select("id_a", "id_b").collect()))
    want = sorted(
        (a, b) for b in range(103, 107) for a in range(100, b)
    )
    assert got == want


def test_compaction_preserves_index(spark, family_docs, tmp_path):
    idx = MinHashIndex(spark, str(tmp_path / "idx")).create(num_buckets=4)
    idx.add_batch(family_docs.where(F.col("doc_id") < 8), "b0")
    idx.add_batch(family_docs.where(F.col("doc_id") >= 100), "b1")
    before = sorted(map(tuple, idx.table.read().collect()))
    idx.table.compact()
    assert sorted(map(tuple, idx.table.read().collect())) == before
    st = idx.stats()
    assert st["batches"] == 2 and st["index_rows"] == len(before)


def test_empty_batch_commits_and_emits_nothing(spark, family_docs, tmp_path):
    idx = MinHashIndex(spark, str(tmp_path / "idx")).create(num_buckets=4)
    empty = family_docs.where(F.col("doc_id") < 0)
    pairs = idx.add_batch(empty, "b0")
    assert pairs.count() == 0
    # committed: replay of the same key is a no-op, not a re-run
    assert idx.add_batch(empty, "b0") is None


def test_plans_arrow_only(spark, family_docs, tmp_path):
    """Banding runs via the Arrow-vectorized runner (never row-at-a-
    time pickling); the candidate join below the checkpoint is pure
    JVM."""
    idx = MinHashIndex(spark, str(tmp_path / "idx")).create(num_buckets=4)
    entries = idx._band_entries(family_docs, "text", "doc_id")
    plan = entries._jdf.queryExecution().executedPlan().toString()
    assert "ArrowEvalPython" in plan and "BatchEvalPython" not in plan
    pairs = idx.add_batch(family_docs, "b0")
    plan = pairs._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_candidates_for_reproduces_committed_batch(spark, family_docs, tmp_path):
    """The streaming crash-gap recovery path: after a batch's merge
    committed, candidates_for (no table write) must reproduce the
    identical pair set while no later batch has merged."""
    idx = MinHashIndex(spark, str(tmp_path / "idx")).create(num_buckets=4)
    original = idx.add_batch(family_docs, "b0")
    want = sorted(map(tuple, original.collect()))
    assert idx.add_batch(family_docs, "b0") is None  # replay
    got = sorted(map(tuple, idx.candidates_for(family_docs).collect()))
    assert got == want


def test_dedup_index_stream_end_to_end(spark, family_docs, tmp_path):
    """Structured-Streaming drain over a 3-batch doc feed: the landed
    per-batch pair files union to the same set as the batch replay,
    and a checkpointed restart re-processes nothing."""
    from replicator_spark.ops.incremental_dedup import run_dedup_index_stream

    feed = str(tmp_path / "feed")
    # one file per batch (the rate-limited reader's ordering contract)
    for b, (lo, hi) in enumerate([(0, 4), (4, 101), (101, 200)]):
        (
            family_docs.where((F.col("doc_id") >= lo) & (F.col("doc_id") < hi))
            .withColumn("batch_id", F.lit(b))
            .repartition(1)
            .write.mode("overwrite")
            .parquet(f"{feed}/batch_id={b}")
        )
    kw = dict(
        index_root=str(tmp_path / "idx"),
        checkpoint_dir=str(tmp_path / "ckpt"),
        pairs_dir=str(tmp_path / "pairs"),
    )
    q = run_dedup_index_stream(spark, feed, **kw)
    q.awaitTermination(120)
    got = sorted(
        map(tuple, spark.read.parquet(str(tmp_path / "pairs")).select("id_a", "id_b").collect())
    )
    static = minhash_lsh_candidates(minhash_signatures(family_docs), max_bucket=50)
    assert got == sorted(map(tuple, static.collect()))
    idx = MinHashIndex(spark, str(tmp_path / "idx"))
    v = idx.table._snap().version
    # restart from the checkpoint: everything is in the WAL — no new
    # merges, same pairs
    q2 = run_dedup_index_stream(spark, feed, **kw)
    q2.awaitTermination(120)
    assert idx.table._snap().version == v
    again = sorted(
        map(tuple, spark.read.parquet(str(tmp_path / "pairs")).select("id_a", "id_b").collect())
    )
    assert again == got


@pytest.mark.parametrize("seed", [3, 17, 29])
def test_online_policy_matches_closed_form_random(spark, tmp_path, seed):
    """Property: for a random corpus with dup families and a RANDOM
    id-monotonic batching, the incremental replay equals the closed
    form of the online policy computed directly over the final corpus
    (per bucket/doc: ≤ max_bucket earlier members → all pairs, else
    one star edge to the bucket min)."""
    import random

    from pyspark.sql import Window

    from replicator_spark.ops.dedup_text import band_rows, minhash_signatures

    rng = random.Random(seed)
    n_templates, max_bucket = 4, 2
    templates = [
        " ".join(f"t{t}w{w:03d}" for w in range(25)) for t in range(n_templates)
    ]
    rows = []
    for i in range(40):
        if rng.random() < 0.5:
            rows.append((i, templates[rng.randrange(n_templates)]))
        else:
            rows.append((i, " ".join(f"u{i}x{k:03d}" for k in range(25))))
    docs = _docs(spark, rows)
    cuts = sorted(rng.sample(range(1, 40), 3))
    inc = replay_documents_incremental(
        spark, docs, str(tmp_path / "idx"), splits=cuts,
        num_hashes=32, bands=4, max_bucket=max_bucket, num_buckets=4,
    )
    got = sorted(map(tuple, inc.collect()))

    sigs = minhash_signatures(docs, num_hashes=32)
    banded = band_rows(sigs, "doc_id", 4)
    w = Window.partitionBy("band_id", "band_hash")
    wo = w.orderBy("doc_id")
    rk = banded.select(
        "band_id", "band_hash", "doc_id",
        (F.row_number().over(wo) - 1).alias("n_earlier"),
        F.min("doc_id").over(w).alias("min_id"),
    )
    small = (
        rk.alias("r")
        .where((F.col("n_earlier") >= 1) & (F.col("n_earlier") <= max_bucket))
        .join(
            banded.alias("a"),
            (F.col("a.band_id") == F.col("r.band_id"))
            & (F.col("a.band_hash") == F.col("r.band_hash"))
            & (F.col("a.doc_id") < F.col("r.doc_id")),
        )
        .select(F.col("a.doc_id").alias("id_a"), F.col("r.doc_id").alias("id_b"))
    )
    star = rk.where(F.col("n_earlier") > max_bucket).select(
        F.col("min_id").alias("id_a"), F.col("doc_id").alias("id_b")
    )
    want = sorted(map(tuple, small.unionByName(star).distinct().collect()))
    assert got == want


def test_streamed_pairs_feed_clustering(spark, family_docs, tmp_path):
    """The composition the pipeline runs at scale: streamed per-batch
    pair files → connected components → canonical keep set. The star
    edges of an oversized family must still collapse it to ONE
    canonical doc."""
    from replicator_spark.ops.dedup_text import (
        connected_components,
        keep_canonical,
    )
    from replicator_spark.ops.incremental_dedup import run_dedup_index_stream

    feed = str(tmp_path / "feed")
    for b, (lo, hi) in enumerate([(0, 102), (102, 200)]):
        (
            family_docs.where((F.col("doc_id") >= lo) & (F.col("doc_id") < hi))
            .withColumn("batch_id", F.lit(b))
            .repartition(1)
            .write.mode("overwrite")
            .parquet(f"{feed}/batch_id={b}")
        )
    q = run_dedup_index_stream(
        spark,
        feed,
        index_root=str(tmp_path / "idx"),
        checkpoint_dir=str(tmp_path / "ckpt"),
        pairs_dir=str(tmp_path / "pairs"),
        max_bucket=2,  # force the star path on the 7-copy family
    )
    q.awaitTermination(120)
    pairs = spark.read.parquet(str(tmp_path / "pairs")).select("id_a", "id_b")
    clusters = connected_components(pairs, family_docs.select("doc_id"))
    kept = keep_canonical(family_docs, clusters)
    ids = sorted(r["doc_id"] for r in kept.collect())
    # family 100..106 collapses to its canonical 100; singles survive
    assert ids == [0, 1, 2, 3, 4, 5, 6, 7, 100]
