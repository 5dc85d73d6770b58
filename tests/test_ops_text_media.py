"""Text analysis + multimodal plumbing tests."""

import hashlib

import pytest
from pyspark.sql import functions as F

from replicator_spark.ops.multimodal import (
    extract_features,
    frame_sample_plan,
    gen_media,
)
from replicator_spark.ops.text import (
    detect_lang,
    doc_fingerprints,
    quality_features,
    token_stats,
)


def test_token_stats(spark):
    df = spark.createDataFrame([(1, "hello world foo")], "doc_id long, text string")
    r = token_stats(df).first()
    assert r["n_tokens"] == 3
    assert r["n_chars_measured"] == 15
    assert r["bpe_tokens_est"] == 4  # 13 word chars / 4 → ceil 4
    assert abs(r["mean_token_len"] - 13 / 3) < 1e-3


def test_quality_features(spark):
    df = spark.createDataFrame(
        [(1, "The cat, the dog! AND a bird.")], "doc_id long, text string"
    )
    r = quality_features(df).first()
    assert r["len"] == 29
    assert r["punct_ratio"] > 0
    assert r["upper_ratio"] > 0
    assert r["stopword_ratio"] > 0  # 'the', 'a'
    assert 0 < r["distinct_token_ratio"] <= 1


def test_detect_lang(spark):
    df = spark.createDataFrame(
        [
            (1, "the house and the tree of life"),
            (2, "der hund und die katze und der vogel"),
            (3, "el perro y los gatos y el sol"),
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r["lang_pred"] for r in detect_lang(df).collect()}
    assert out == {1: "en", 2: "de", 3: "es"}


def test_doc_fingerprints_deterministic(spark):
    df = spark.createDataFrame(
        [(1, "abcdefghij"), (2, "abcdefghij")], "doc_id long, text string"
    )
    rows = doc_fingerprints(df).collect()
    assert rows[0]["content_sha"] == rows[1]["content_sha"]
    assert rows[0]["min_gram_hash"] == rows[1]["min_gram_hash"]


def test_media_features_stub(spark):
    media = gen_media(spark, 50)
    feats = extract_features(media, feature_dim=8)
    rows = feats.collect()
    assert len(rows) == 50
    by_id = {r["media_id"]: r for r in rows}
    raw = {r["media_id"]: bytes(r["payload"]) for r in media.collect()}
    for mid, r in by_id.items():
        assert r["payload_sha"] == hashlib.sha256(raw[mid]).hexdigest()
        assert len(r["feature"]) == 8
        if r["kind"] == "image":
            assert r["width"] is not None and r["height"] is not None
        if r["kind"] == "video":
            assert r["n_frames"] is not None


def test_media_decode_stub_gate(spark):
    media = gen_media(spark, 3)
    with pytest.raises(Exception, match="NotImplementedError|real media decode"):
        extract_features(media, decode_stub=False).collect()


def test_frame_sample_plan(spark):
    media = gen_media(spark, 60)
    plan = frame_sample_plan(media, every_n=30)
    rows = plan.groupBy("media_id").agg(F.count(F.lit(1)).alias("n")).collect()
    assert len(rows) > 0
    assert all(r["n"] >= 1 for r in rows)


def test_boilerplate_strip_preserves_order(spark):
    from replicator_spark.ops.text import boilerplate_line_stats, strip_boilerplate

    rows = [
        (0, "unique alpha\nCOMMON FOOTER\nunique beta"),
        (1, "something else\nCOMMON FOOTER"),
        (2, "third doc\nCOMMON FOOTER\ntail"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    stats = {r["doc_id"]: r for r in boilerplate_line_stats(df, min_docs=3).collect()}
    assert stats[0]["n_lines"] == 3 and stats[0]["n_boilerplate_lines"] == 1
    clean = {r["doc_id"]: r["clean_text"] for r in strip_boilerplate(df, min_docs=3).collect()}
    assert clean[0] == "unique alpha\nunique beta"  # order preserved
    assert clean[1] == "something else"
    assert clean[2] == "third doc\ntail"


def test_hash_split_deterministic_and_proportioned(spark):
    from replicator_spark.ops.text import hash_split

    df = spark.range(5000).withColumnRenamed("id", "doc_id")
    out = hash_split(df, "doc_id")
    counts = {r["split"]: r["n"] for r in out.groupBy("split").count().withColumnRenamed("count", "n").collect()}
    assert abs(counts["train"] / 5000 - 0.9) < 0.02
    assert abs(counts["val"] / 5000 - 0.05) < 0.02
    assert abs(counts["test"] / 5000 - 0.05) < 0.02
    # stable across invocations; different salt reshuffles
    again = {r["doc_id"]: r["split"] for r in hash_split(df, "doc_id").collect()}
    first = {r["doc_id"]: r["split"] for r in out.collect()}
    assert again == first
    other = {r["doc_id"]: r["split"] for r in hash_split(df, "doc_id", salt="v2").collect()}
    assert other != first


def test_redact_pii_patterns(spark):
    from replicator_spark.ops.text import redact_pii

    df = spark.createDataFrame(
        [(0, "mail a.b+c@ex-co.io or visit https://x.y/z?q=1 call 415-555-0199 ok")],
        "doc_id long, text string",
    )
    out = redact_pii(df).first()["redacted"]
    assert "<EMAIL>" in out and "<URL>" in out and "<NUM>" in out
    assert "@" not in out and "https" not in out and "0199" not in out


def test_benchmark_decontamination(spark):
    from replicator_spark.ops.text import benchmark_ngram_collisions

    docs = spark.createDataFrame(
        [
            (0, "the quick brown fox jumps over the lazy dog near the old barn"),
            (1, "entirely different words about vectorized query execution plans"),
        ],
        "doc_id long, text string",
    )
    bench = spark.createDataFrame(
        [(9, "we note the quick brown fox jumps over the lazy dog near here")],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in
           benchmark_ngram_collisions(docs, bench, n=8).collect()}
    assert out[0]["contaminated"] and out[0]["n_collisions"] >= 1
    assert not out[1]["contaminated"] and out[1]["n_collisions"] == 0
    # docs shorter than n grams are clean, not errors
    short = spark.createDataFrame([(5, "too short")], "doc_id long, text string")
    r = benchmark_ngram_collisions(short, bench, n=8).first()
    assert r["n_collisions"] == 0


def test_repetition_stats_gopher_thresholds(spark):
    from replicator_spark.ops.text import repetition_stats

    docs = spark.createDataFrame(
        [
            (0, "alpha\nbeta\ngamma\ndelta"),
            (1, "spam\nspam\nspam\nspam\nham"),
            (2, "x\n\n  \nx\ny"),  # blank lines don't count
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in repetition_stats(docs).collect()}
    assert out[0]["keep"] and out[0]["dup_line_frac"] == 0.0
    assert not out[1]["keep"] and out[1]["dup_line_frac"] == 0.8
    assert out[2]["total_lines"] == 3 and out[2]["dup_line_frac"] == round(2 / 3, 4)


def test_sample_mixture_hits_target_proportions(spark):
    from replicator_spark.ops.text import sample_mixture

    # src0 is scarce relative to its weight → binding group, kept 100%
    rows = (
        [(i, "a", "src0") for i in range(100)]
        + [(1000 + i, "b", "src1") for i in range(1000)]
        + [(5000 + i, "c", "src2") for i in range(500)]
        + [(9000 + i, "d", "srcX") for i in range(50)]  # unweighted: dropped
    )
    df = spark.createDataFrame(rows, "doc_id long, text string, source string")
    out = sample_mixture(df, {"src0": 0.5, "src1": 0.3, "src2": 0.2})
    counts = {r["source"]: r["n"] for r in
              out.groupBy("source").agg(F.count("*").alias("n")).collect()}
    assert "srcX" not in counts
    assert counts["src0"] == 100  # binding group survives whole
    # achievable total C = 100/0.5 = 200 → targets 60 / 40; md5 sampling
    # is exact-threshold, so allow binomial slack
    assert abs(counts["src1"] - 60) <= 25
    assert abs(counts["src2"] - 40) <= 20
    # deterministic: same salt → identical survivor set
    a = {r["doc_id"] for r in out.collect()}
    b = {r["doc_id"] for r in
         sample_mixture(df, {"src0": 0.5, "src1": 0.3, "src2": 0.2}).collect()}
    assert a == b


def test_tfidf_keywords_ranks_distinctive_tokens(spark):
    from replicator_spark.ops.text import tfidf_keywords

    df = spark.createDataFrame(
        [
            (1, "common common zebra zebra zebra"),
            (2, "common common yak"),
            (3, "common xylo xylo"),
        ],
        "doc_id long, text string",
    )
    out = tfidf_keywords(df, k=2).collect()
    top = {r["doc_id"]: r["token"] for r in out if r["rank"] == 1}
    # 'common' appears in every doc → idf 0 → never the top keyword
    assert top == {1: "zebra", 2: "yak", 3: "xylo"}
    assert all(r["score"] >= 0 for r in out)
    ranks = sorted((r["doc_id"], r["rank"]) for r in out)
    assert ranks == [(1, 1), (1, 2), (2, 1), (2, 2), (3, 1), (3, 2)]


def test_ngram_novelty_flags_late_copies(spark):
    from replicator_spark.ops.text import ngram_novelty

    base = "alpha beta gamma delta epsilon zeta eta theta"
    df = spark.createDataFrame(
        [
            (1, base),                       # first: all grams fresh
            (2, "one two three four five"),  # unrelated: fresh
            (3, base),                       # exact late copy: all seen
            (4, base + " iota"),             # near-copy: mostly seen
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in ngram_novelty(df, n=3).collect()}
    assert out[1]["seen_frac"] == 0.0
    assert out[2]["seen_frac"] == 0.0
    assert out[3]["seen_frac"] == 1.0
    assert 0.5 < out[4]["seen_frac"] < 1.0
    assert out[1]["n_grams"] == 6  # 8 words → 6 distinct 3-grams
