"""Similarity search: brute-force correctness vs numpy; LSH recall."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from replicator_spark.ops.similarity import (
    brute_force_knn,
    cosine_near_dup_blocked,
    lsh_bucket_knn,
)

DIM = 16
N = 60


@pytest.fixture(scope="module")
def vecs(spark):
    rng = np.random.default_rng(7)
    base = rng.normal(size=(N, DIM)).astype("float32")
    # plant a near-identical pair for sanity
    base[1] = base[0] + rng.normal(scale=0.01, size=DIM).astype("float32")
    rows = [(int(i), [float(x) for x in base[i]]) for i in range(N)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    return df, base


def _numpy_knn(base, qidx, k):
    q = base[qidx].astype("float64")
    c = base.astype("float64")
    cos = (c @ q) / (np.linalg.norm(c, axis=1) * np.linalg.norm(q))
    cos[qidx] = -2
    order = sorted(range(len(cos)), key=lambda i: (-round(cos[i], 4), i))
    return order[:k]


def test_brute_force_matches_numpy(spark, vecs):
    df, base = vecs
    out = brute_force_knn(df, df.where(F.col("vec_id") < 3), k=5)
    got = {
        qid: [r["neighbor_id"] for r in rows]
        for qid, rows in (
            (q, sorted([r for r in out.collect() if r["query_id"] == q], key=lambda r: r["rank"]))
            for q in range(3)
        )
    }
    for q in range(3):
        assert got[q] == _numpy_knn(base, q, 5), f"query {q}"


def test_lsh_recall_at_least_half(spark, vecs):
    df, base = vecs
    queries = df.where(F.col("vec_id") < 5)
    exact = brute_force_knn(df, queries, k=5)
    approx = lsh_bucket_knn(df, queries, dim=DIM, k=5, hash_bits=4, num_tables=6)
    e = {(r["query_id"], r["neighbor_id"]) for r in exact.collect()}
    a = {(r["query_id"], r["neighbor_id"]) for r in approx.collect()}
    recall = len(e & a) / len(e)
    assert recall >= 0.5, f"recall {recall}"
    # the planted twin must be found
    assert (0, 1) in a


def test_blocked_near_dup_matches_numpy(spark, vecs):
    """The block-matmul kernel must find exactly the pairs numpy finds
    — every unordered pair once, regardless of which blocks the ids
    hash into."""
    df, base = vecs
    thr = 0.3  # low threshold → plenty of pairs, exercises both branches
    c = base.astype("float64")
    c = c / np.linalg.norm(c, axis=1, keepdims=True)
    cos = np.round(c @ c.T, 4)
    want = {
        (i, j): cos[i, j]
        for i in range(N)
        for j in range(i + 1, N)
        if cos[i, j] >= thr
    }
    got = {
        (r["id_a"], r["id_b"]): r["cos"]
        for r in cosine_near_dup_blocked(df, threshold=thr, n_blocks=5).collect()
    }
    assert set(got) == set(want)
    for k in want:
        assert abs(got[k] - want[k]) < 1e-9, k


def test_lsh_near_dup_pairs_matches_exact_on_dup_structure(spark, vecs):
    """VERDICT r03 #3: the composed scale path (LSH candidates → exact
    cosine verify) must find exactly the high-cos pairs the all-pairs
    baseline finds when the corpus has real dup structure, while
    generating far fewer candidate pairs than n(n-1)/2."""
    from replicator_spark.ops.similarity import lsh_near_dup_pairs

    df, base = vecs
    # plant a 3-member near-dup family and one extra pair
    rng = np.random.default_rng(11)
    aug = base.copy()
    aug[2] = aug[0] + rng.normal(scale=0.005, size=DIM).astype("float32")
    aug[11] = aug[10] + rng.normal(scale=0.005, size=DIM).astype("float32")
    rows = [(int(i), [float(x) for x in aug[i]]) for i in range(N)]
    adf = spark.createDataFrame(rows, "vec_id long, embedding array<float>")

    thr = 0.98
    exact = {
        (r["id_a"], r["id_b"]): r["cos"]
        for r in cosine_near_dup_blocked(adf, threshold=thr, n_blocks=4).collect()
    }
    assert {(0, 1), (0, 2), (1, 2), (10, 11)} <= set(exact)
    got = {
        (r["id_a"], r["id_b"]): r["cos"]
        for r in lsh_near_dup_pairs(
            adf, dim=DIM, threshold=thr, hash_bits=6, num_tables=8
        ).collect()
    }
    assert got == exact  # same pairs, same rounded cosines


def test_lsh_near_dup_refinement_survives_random_oversized_buckets(spark, vecs):
    """Review r4 #1: an oversized sign-projection bucket on a
    near-orthogonal corpus is NOT a dup family — star edges to the
    bucket-min would verify nothing and silently lose the true pair.
    With a cap so small every primary bucket overflows, refinement must
    still keep the planted twin pair together and find it."""
    from replicator_spark.ops.similarity import lsh_near_dup_pairs

    df, base = vecs  # fixture plants a twin: base[1] ≈ base[0]
    stats = {}
    got = {
        (r["id_a"], r["id_b"])
        for r in lsh_near_dup_pairs(
            df, dim=DIM, threshold=0.98, hash_bits=2, num_tables=4,
            max_bucket=3, stats_out=stats,
        ).collect()
    }
    assert (0, 1) in got
    # the cap accounting is surfaced, never silent
    assert stats.get("round_0_oversized_buckets", 0) > 0, stats


def test_lsh_near_dup_pairs_oversized_bucket_star_path(spark):
    """Skewed embedding corpora (one template vector repeated) must not
    lose the family to a bucket-size cap: tiny max_bucket forces
    refinement down to the exact-pile star fallback and the family
    still fully connects after verify."""
    from replicator_spark.ops.dedup_text import connected_components
    from replicator_spark.ops.similarity import lsh_near_dup_pairs

    rng = np.random.default_rng(3)
    v0 = rng.normal(size=DIM).astype("float32")
    rows = [
        (int(i), [float(x) for x in v0 + rng.normal(scale=0.002, size=DIM).astype("float32")])
        for i in range(30)
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    pairs = lsh_near_dup_pairs(
        df, dim=DIM, threshold=0.98, hash_bits=4, num_tables=4, max_bucket=5
    )
    n_pairs = pairs.count()
    assert 0 < n_pairs < 30 * 29 // 2  # star path: linear, not quadratic
    labels = connected_components(
        pairs.select("id_a", "id_b"), df.select("vec_id"), "vec_id"
    )
    assert {r["cluster"] for r in labels.collect()} == {0}


def test_lsh_deterministic(spark, vecs):
    df, _ = vecs
    q = df.where(F.col("vec_id") == 0)
    r1 = lsh_bucket_knn(df, q, dim=DIM, k=3).collect()
    r2 = lsh_bucket_knn(df, q, dim=DIM, k=3).collect()
    assert r1 == r2


def test_ivf_recall_and_twin(spark, vecs):
    from replicator_spark.ops.similarity import ivf_knn

    df, base = vecs
    queries = df.where(F.col("vec_id") < 5)
    exact = brute_force_knn(df, queries, k=5)
    approx = ivf_knn(df, queries, k=5, n_centroids=6, n_probe=3)
    e = {(r["query_id"], r["neighbor_id"]) for r in exact.collect()}
    a = {(r["query_id"], r["neighbor_id"]) for r in approx.collect()}
    recall = len(e & a) / len(e)
    assert recall >= 0.5, f"recall {recall}"
    # the planted near-identical twin shares a cell at any sane quantizer
    assert (0, 1) in a


def test_blocked_near_dup_auto_blocks_and_tiny_budget(spark, vecs):
    """VERDICT r01 #8: n_blocks auto-derives from corpus count × dim so
    a block stays under the byte budget (collect_list row ceiling). The
    result must be identical under the default and under a forced tiny
    budget (many blocks)."""
    df, _ = vecs
    thr = 0.3
    ref = {
        (r["id_a"], r["id_b"]): r["cos"]
        for r in cosine_near_dup_blocked(df, threshold=thr, n_blocks=5).collect()
    }
    auto = {
        (r["id_a"], r["id_b"]): r["cos"]
        for r in cosine_near_dup_blocked(df, threshold=thr).collect()
    }
    # tiny budget: every block ≈ one vector
    tiny = {
        (r["id_a"], r["id_b"]): r["cos"]
        for r in cosine_near_dup_blocked(
            df, threshold=thr, block_budget_bytes=256
        ).collect()
    }
    assert auto == ref and tiny == ref


def test_ivf_sampled_training_recall(spark, vecs):
    """VERDICT r02 #7: the contract query now trains the quantizer on a
    train_fraction sample (the 100-TB path). Recall vs brute force must
    hold with sampled training too."""
    from replicator_spark.ops.similarity import ivf_knn

    df, _ = vecs
    queries = df.where(F.col("vec_id") < 5)
    exact = brute_force_knn(df, queries, k=5)
    approx = ivf_knn(df, queries, k=5, n_centroids=6, n_probe=3,
                     train_fraction=0.5)
    e = {(r["query_id"], r["neighbor_id"]) for r in exact.collect()}
    a = {(r["query_id"], r["neighbor_id"]) for r in approx.collect()}
    recall = len(e & a) / len(e)
    assert recall >= 0.5, f"recall {recall}"
    # deterministic sampling: same result twice
    again = ivf_knn(df, queries, k=5, n_centroids=6, n_probe=3,
                    train_fraction=0.5)
    assert {tuple(r) for r in approx.collect()} == {tuple(r) for r in again.collect()}
