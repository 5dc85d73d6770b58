"""Deterministic embedding clustering + semantic dedup (SemDedup).

* kmeans_fit_predict — Lloyd's k-means written directly on the
  DataFrame API, fully deterministic and oracle-reproducible (unlike
  spark.ml's sampled init): centroids initialise from the k smallest
  ids, every iteration is ONE map-side-combinable shuffle (posexplode
  to (cluster, dim, x) then a narrow sum agg whose partial combine
  leaves k×dim rows per partition — shuffle volume independent of
  corpus size), and the k×dim centroid matrix rides the driver as one
  nested-array literal (broadcast-by-plan). Assignment is JVM-side
  ``transform``/``zip_with``/``aggregate`` folds — no Python in the
  hot path. Centroid coordinates round to 5 dp each update so independent
  engines (Spark vs the DuckDB oracle) converge to identical
  assignments despite FP summation-order differences.

* semdedup — SemDedup (Abbas et al. 2023, arXiv:2303.09540): cluster
  the corpus, then drop any point that has a lower-id near-duplicate
  (cosine ≥ tau) INSIDE its cluster. The cluster partitioning bounds
  the candidate set — the quadratic verify runs per cluster (~n/k
  rows), never globally, which is what makes semantic dedup tractable
  at corpus scale. Deterministic keep rule: the smallest id of a
  near-dup family inside a cluster survives.

Reference parity note: the reference engine (cohenjo/replicator) has
no clustering surface — these ops extend the curation toolkit the
same way ops/dedup_text.py extends text dedup; they follow the
published SemDedup recipe, not reference code.

100-TB shape: one shuffle per Lloyd iteration with agg state k×dim
(KBs); assignment/verify stay whole-stage-codegen'd; the per-cluster
self-join shuffles on the cluster id, pair count bounded by
sum(|cluster|^2) ≈ n^2/k — pick k ~ n/1e4 to bound verify cost, and
persist the (id, vec, cluster) projection between iterations.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .similarity import _as_double, _dot


def assign_clusters(
    df: DataFrame,
    centroids: list[list[float]],
    *,
    vec_col: str = "v",
) -> DataFrame:
    """Add ``cluster`` (argmin distance, ties to the smaller cluster
    id) and ``dist2`` columns.

    The k×dim centroid matrix enters the plan as ONE nested-array
    literal and the k distances come from a single ``transform`` HOF
    (sequential index-order folds — the DuckDB oracle sums in the same
    order, so both engines see the same value to the ulp);
    ``array_position`` of the min returns the FIRST match, which is
    exactly the smaller-cluster tiebreak. Keeping the expression tree
    O(1) in k matters: an unrolled per-centroid formulation (k
    zip_with/aggregate folds under an array_min of structs) cost
    seconds of Catalyst/codegen per ACTION at k=8 — 6× this form —
    and Lloyd's pays one action per iteration."""
    cent_lit = F.lit([[float(x) for x in c] for c in centroids])
    dists = F.transform(
        cent_lit,
        lambda c: F.aggregate(
            F.zip_with(F.col(vec_col), c, lambda x, y: (x - y) * (x - y)),
            F.lit(0.0),
            lambda s, x: s + x,
        ),
    )
    best = F.array_min(dists)
    return df.select(
        *df.columns,
        (F.array_position(dists, best) - 1).cast("int").alias("cluster"),
        best.alias("dist2"),
    )


def kmeans_fit_predict(
    df: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 8,
    iters: int = 2,
    dim: int | None = None,
) -> tuple[DataFrame, list[list[float]]]:
    """Deterministic Lloyd's: init = vectors of the k smallest ids,
    ``iters`` assign→update rounds, then a final assignment against
    the converged centroids. Returns (assignments, centroids); the
    assignments DataFrame carries (id, cluster, dist2) and recomputes
    from the source plan (no persisted state leaks to the caller).

    Empty clusters keep their previous centroid (matching the oracle's
    LEFT JOIN + coalesce), so cluster ids are stable across rounds.
    """
    base = df.select(
        F.col(id_col).alias("_id"), _as_double(F.col(vec_col)).alias("v")
    )
    if dim is None:
        dim = len(base.select("v").first()[0])
    base = base.persist()
    try:
        init = base.orderBy("_id").limit(k).select("v").collect()
        centroids = [list(r[0]) for r in init]
        if len(centroids) < k:
            raise ValueError(f"k={k} exceeds corpus size {len(centroids)}")
        for _ in range(iters):
            assigned = assign_clusters(base, centroids, vec_col="v")
            # posexplode → narrow (cluster, dim) agg: the partial (map-
            # side) aggregate combines to k×dim rows per partition
            # before the exchange (pinned in tests), so shuffle volume
            # is O(k×dim×partitions) regardless of corpus size — and
            # the 3-column agg stays codegen-cheap, unlike a 1+dim-
            # expression wide aggregate (5× slower to compile at dim=64)
            rows = (
                assigned.select("cluster", F.posexplode("v").alias("i", "x"))
                .groupBy("cluster", "i")
                .agg(F.round(F.sum("x") / F.count(F.lit(1)), 5).alias("val"))
                .collect()
            )
            fresh: dict[int, dict[int, float]] = {}
            for r in rows:
                fresh.setdefault(r["cluster"], {})[r["i"]] = r["val"]
            centroids = [
                [fresh[j][i] for i in range(dim)] if j in fresh else centroids[j]
                for j in range(k)
            ]
    finally:
        base.unpersist()
    out = assign_clusters(
        df.select(F.col(id_col).alias("_id"), _as_double(F.col(vec_col)).alias("v")),
        centroids,
        vec_col="v",
    ).select(F.col("_id").alias(id_col), "cluster", "dist2")
    return out, centroids


def _cluster_candidate_pairs(
    member: DataFrame,
    *,
    cut: float,
    k: int,
    block_budget_bytes: int = 64 << 20,
) -> DataFrame:
    """Within-cluster candidate pairs (id_a < id_b) whose numpy cosine
    clears ``cut`` — the blocked-matmul generator behind :func:`semdedup`.

    ``member`` carries (_id, cluster, v). Each cluster is hash-split
    into blocks sized off the LARGEST cluster under
    ``block_budget_bytes`` (skew-safe: a dominant cluster still gets
    bounded blocks), the (i ≤ j) block pairs join within the cluster,
    and each pair resolves with one BLAS matmul inside ``mapInPandas``
    — the same layout as ``similarity.cosine_near_dup_blocked``, scoped
    per cluster. O(Σ|cluster|²·d) flops at memory bandwidth instead of
    one interpreted lambda dispatch per vector element per pair.

    ``cut`` is a PRE-FILTER, deliberately below the caller's tau: the
    caller re-verifies survivors with the exact expression the oracle
    mirrors, so BLAS-vs-fold summation-order ulps can never change the
    emitted pair set — the kernel only has to never miss a pair, which
    a margin ≥ 1e-3 guarantees against ~1e-12 numeric spread."""
    import pandas as pd

    spark = member.sparkSession
    n_max, dim = (
        member.groupBy("cluster")
        .agg(F.count(F.lit(1)).alias("m"), F.first(F.size("v")).alias("d"))
        .agg(F.max("m"), F.max("d"))
        .first()
    )
    n_max, dim = int(n_max or 0), int(dim or 1)
    par = spark.sparkContext.defaultParallelism
    nb = max(
        math.ceil(n_max * dim * 8 / block_budget_bytes),
        math.ceil(par / max(k, 1)),
        1,
    )
    blocks = (
        member.withColumn(
            "_blk", F.pmod(F.xxhash64(F.col("_id").cast("string")), F.lit(nb))
        )
        .groupBy("cluster", "_blk")
        .agg(F.collect_list("_id").alias("ids"), F.collect_list("v").alias("vs"))
    )
    a = blocks.select(
        "cluster",
        F.col("_blk").alias("blk_a"),
        F.col("ids").alias("ids_a"),
        F.col("vs").alias("vs_a"),
    )
    b = blocks.select(
        F.col("cluster").alias("_cl_b"),
        F.col("_blk").alias("blk_b"),
        F.col("ids").alias("ids_b"),
        F.col("vs").alias("vs_b"),
    )
    pairs = a.join(
        b, (F.col("cluster") == F.col("_cl_b")) & (F.col("blk_a") <= F.col("blk_b"))
    ).repartition(min(k * nb * (nb + 1) // 2, par))

    def _kernel(pdf_iter):
        import numpy as np

        for pdf in pdf_iter:
            for row in pdf.itertuples(index=False):
                ids_a = np.asarray(row.ids_a, dtype=np.int64)
                ids_b = np.asarray(row.ids_b, dtype=np.int64)
                ma = np.asarray([np.asarray(v) for v in row.vs_a])
                mb = np.asarray([np.asarray(v) for v in row.vs_b])
                na = ma / np.sqrt((ma * ma).sum(axis=1, keepdims=True))
                nb_ = mb / np.sqrt((mb * mb).sum(axis=1, keepdims=True))
                cos = na @ nb_.T
                ia, ib = np.nonzero(cos >= cut)
                if len(ia) == 0:
                    continue
                ra, rb = ids_a[ia], ids_b[ib]
                if row.blk_a == row.blk_b:
                    keep = ra < rb
                    if not keep.any():
                        continue
                    ra, rb = ra[keep], rb[keep]
                else:
                    ra, rb = np.minimum(ra, rb), np.maximum(ra, rb)
                yield pd.DataFrame({"id_a": ra, "id_b": rb})

    return pairs.mapInPandas(_kernel, schema="id_a long, id_b long")


def semdedup(
    df: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 8,
    iters: int = 2,
    tau: float = 0.95,
    round_to: int = 4,
) -> DataFrame:
    """SemDedup: k-means partition, then per-cluster near-dup pruning.

    A row is dropped iff a SMALLER id in the SAME cluster has cosine
    ≥ tau with it; ``dup_of`` records the smallest such id (the family
    canonical), null for survivors. Pair work is bounded by the cluster
    sizes, never O(n²) globally.

    r6 shape: the per-cluster quadratic no longer runs as a self-join
    evaluating an interpreted ``aggregate`` fold per pair (O(pairs·d)
    lambda dispatches — 174 s at sf1.0). Candidates come from the
    blocked BLAS kernel (:func:`_cluster_candidate_pairs`) with a
    conservative ``tau − 1e-3`` pre-cut, and only the survivors (true
    near-dups plus a margin sliver) pay the exact sequential-fold
    cosine the DuckDB oracle mirrors — bit-identical emitted rows, at
    memory-bandwidth speed."""
    assigned, _ = kmeans_fit_predict(
        df, id_col=id_col, vec_col=vec_col, k=k, iters=iters
    )
    vecs = df.select(
        F.col(id_col).alias("_id"), _as_double(F.col(vec_col)).alias("v")
    )
    # one materialization feeds the kernel aggs, both verify sides and
    # the final left join — without it the kmeans-assign + join plan
    # would re-execute per consumer
    member = (
        assigned.join(vecs, assigned[id_col] == vecs["_id"])
        .select(F.col("_id"), F.col("cluster"), F.col("v"))
        .localCheckpoint(eager=True)
    )
    cand = _cluster_candidate_pairs(member, cut=tau - 1e-3, k=k)
    va = member.select(F.col("_id").alias("id_a"), F.col("v").alias("va"))
    vb = member.select(F.col("_id").alias("id_b"), F.col("v").alias("vb"))
    # exact verify on the surviving sliver: the SAME expression (raw
    # vectors, sequential folds, dot/(|a|·|b|), round) the self-join
    # form evaluated per pair — results are unchanged to the bit
    cos = F.round(
        _dot(F.col("va"), F.col("vb"))
        / (
            F.sqrt(_dot(F.col("va"), F.col("va")))
            * F.sqrt(_dot(F.col("vb"), F.col("vb")))
        ),
        round_to,
    )
    dup = (
        cand.join(va, "id_a")
        .join(vb, "id_b")
        .where(cos >= tau)
        .groupBy("id_b")
        .agg(F.min("id_a").alias("dup_of"))
    )
    return (
        member.join(dup, member["_id"] == dup["id_b"], "left")
        .select(
            F.col("_id").alias(id_col),
            "cluster",
            F.col("dup_of").isNull().alias("kept"),
            "dup_of",
        )
    )
