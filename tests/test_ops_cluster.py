"""Deterministic k-means + SemDedup (ops/cluster.py): assignment
correctness vs numpy Lloyd's, determinism across runs, empty-cluster
carry, planted-duplicate pruning, and the one-shuffle update shape."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from replicator_spark.ops.cluster import (
    assign_clusters,
    kmeans_fit_predict,
    semdedup,
)

DIM = 8
N = 80


@pytest.fixture(scope="module")
def vecs(spark):
    rng = np.random.default_rng(11)
    # two well-separated blobs so Lloyd's has unambiguous structure
    a = rng.normal(loc=0.0, scale=0.3, size=(N // 2, DIM))
    b = rng.normal(loc=4.0, scale=0.3, size=(N // 2, DIM))
    base = np.vstack([a, b]).astype("float32")
    rows = [(int(i), [float(x) for x in base[i]]) for i in range(N)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    return df, base


def _numpy_lloyd(base, k, iters):
    """The same contract: init = k smallest ids, per-iteration centroid
    round to 5 dp, argmin with smaller-cluster tiebreak."""
    x = base.astype("float64")
    cents = x[:k].copy()

    def assign(c):
        d = ((x[:, None, :] - c[None, :, :]) ** 2).sum(axis=2)
        return d.argmin(axis=1), d.min(axis=1)

    for _ in range(iters):
        lab, _ = assign(cents)
        for j in range(k):
            if (lab == j).any():
                cents[j] = np.round(
                    x[lab == j].sum(axis=0) / (lab == j).sum(), 5
                )
    return assign(cents)


def test_kmeans_matches_numpy_lloyd(spark, vecs):
    df, base = vecs
    out, cents = kmeans_fit_predict(df, k=4, iters=2, dim=DIM)
    got = {r["vec_id"]: r["cluster"] for r in out.collect()}
    lab, _ = _numpy_lloyd(base, 4, 2)
    assert got == {i: int(lab[i]) for i in range(N)}
    assert len(cents) == 4 and all(len(c) == DIM for c in cents)


def test_kmeans_two_blobs_separate(spark, vecs):
    df, _ = vecs
    out, _ = kmeans_fit_predict(df, k=2, iters=3, dim=DIM)
    rows = out.collect()
    lo = {r["cluster"] for r in rows if r["vec_id"] < N // 2}
    hi = {r["cluster"] for r in rows if r["vec_id"] >= N // 2}
    assert len(lo) == 1 and len(hi) == 1 and lo != hi


def test_kmeans_deterministic_rerun(spark, vecs):
    df, _ = vecs
    a, ca = kmeans_fit_predict(df, k=4, iters=2, dim=DIM)
    b, cb = kmeans_fit_predict(df, k=4, iters=2, dim=DIM)
    assert ca == cb
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))


def test_kmeans_k_exceeds_corpus_raises(spark):
    df = spark.createDataFrame(
        [(0, [0.0, 0.0]), (1, [1.0, 1.0])], "vec_id long, embedding array<float>"
    )
    with pytest.raises(ValueError, match="exceeds corpus"):
        kmeans_fit_predict(df, k=5, iters=1, dim=2)


def test_empty_cluster_keeps_previous_centroid(spark):
    # init takes the 3 smallest ids; ids 0 and 2 coincide, so in the
    # first assignment cluster 2 (the duplicate init point, losing the
    # distance tiebreak to cluster 0) is EMPTY and must carry its init
    # centroid [0,0] through the update unchanged
    rows = [
        (0, [0.0, 0.0]),
        (1, [10.0, 10.0]),
        (2, [0.0, 0.0]),
        (3, [10.1, 10.0]),
        (4, [0.2, 0.1]),
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out, cents = kmeans_fit_predict(df, k=3, iters=1, dim=2)
    assert cents[2] == [0.0, 0.0]  # carried, not zeroed or dropped
    # cluster 0's centroid moved to the mean of {0,2,4}; the final
    # assignment then puts the exact-zero points on the carried [0,0]
    assert cents[0] == [pytest.approx(0.06667), pytest.approx(0.03333)]
    got = {r["vec_id"]: r["cluster"] for r in out.collect()}
    assert got[0] == 2 and got[2] == 2  # dist 0 to the carried centroid
    assert got[4] == 0
    assert got[1] == 1 and got[3] == 1


def test_assign_tiebreak_smaller_cluster(spark):
    df = spark.createDataFrame(
        [(0, [1.0, 0.0])], "vec_id long, embedding array<float>"
    )
    out = assign_clusters(
        df.select("vec_id", F.transform("embedding", lambda x: x.cast("double")).alias("v")),
        [[2.0, 0.0], [0.0, 0.0]],  # both at distance 1.0
    )
    assert out.first()["cluster"] == 0


@pytest.fixture(scope="module")
def ortho(spark):
    """Near-orthogonal corpus: 32-dim standard gaussians — random
    pairwise cosines concentrate near 0 (std 1/sqrt(32) ≈ 0.18), so no
    background pair approaches the 0.99 thresholds used below."""
    rng = np.random.default_rng(23)
    base = rng.normal(size=(N, 32)).astype("float32")
    rows = [(int(i), [float(x) for x in base[i]]) for i in range(N)]
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def test_semdedup_drops_planted_copies(spark, ortho):
    v = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    base = ortho.select("vec_id", v.alias("v"))
    copies = base.where(F.col("vec_id") % 10 == 0).select(
        (F.col("vec_id") + 1000).alias("vec_id"),
        F.transform(F.col("v"), lambda x: x + F.lit(1e-4)).alias("v"),
    )
    aug = base.unionByName(copies)
    n_aug = aug.count()
    out = semdedup(aug, vec_col="v", k=4, iters=2, tau=0.99)
    rows = {r["vec_id"]: r for r in out.collect()}
    assert len(rows) == n_aug
    planted = [i + 1000 for i in range(0, N, 10)]
    for pid in planted:
        assert not rows[pid]["kept"], pid
        assert rows[pid]["dup_of"] == pid - 1000
    # originals survive (they are the family minimum)
    kept = [r for r in rows.values() if r["kept"]]
    assert len(kept) == n_aug - len(planted)


def test_semdedup_orthogonal_corpus_keeps_all(spark, ortho):
    out = semdedup(ortho, k=4, iters=1, tau=0.99)
    assert out.where(~F.col("kept")).count() == 0


def test_kmeans_update_is_partial_agg_below_exchange(spark, vecs):
    """The centroid update's sum must partial-aggregate BELOW the
    shuffle — the exchange then carries at most k×dim rows per
    partition, independent of corpus size — and stay JVM-only."""
    df, _ = vecs
    base = df.select(
        "vec_id", F.transform("embedding", lambda x: x.cast("double")).alias("v")
    )
    init = [list(r[0]) for r in base.orderBy("vec_id").limit(2).select("v").collect()]
    assigned = assign_clusters(base, init)
    agg = (
        assigned.select("cluster", F.posexplode("v").alias("i", "x"))
        .groupBy("cluster", "i")
        .agg(F.round(F.sum("x") / F.count(F.lit(1)), 5).alias("val"))
    )
    plan = agg._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan
    pre_exchange = plan.split("Exchange")[0]
    assert "HashAggregate" in pre_exchange or "SortAggregate" in pre_exchange


def test_assignment_plan_is_constant_size_in_k(spark, vecs):
    """The centroid matrix must enter the plan as ONE literal (an
    unrolled per-centroid expression tree cost seconds of Catalyst/
    codegen per action at k=8): plan string length must not scale
    with k."""
    df, _ = vecs
    base = df.select(
        "vec_id", F.transform("embedding", lambda x: x.cast("double")).alias("v")
    )
    cents = [list(r[0]) for r in base.orderBy("vec_id").limit(8).select("v").collect()]
    p2 = assign_clusters(base, cents[:2])._jdf.queryExecution().optimizedPlan().toString()
    p8 = assign_clusters(base, cents)._jdf.queryExecution().optimizedPlan().toString()
    # literal payload grows with k; the expression NODE count must not
    for node in ("lambdafunction", "aggregate(", "zip_with("):
        assert p8.lower().count(node) == p2.lower().count(node), node
