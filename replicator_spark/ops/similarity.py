"""Similarity search over an embedding column (array<float>).

* brute_force_knn — exact cosine top-k: the correctness baseline.
  Query set × corpus cross join; dot products via zip_with/aggregate
  (JVM, codegen). Fine when |queries| is small or the corpus fits a
  broadcast; O(Q×N) otherwise.
* lsh_bucket_knn — the scale path: random-hyperplane LSH (sign
  projections of deterministic hash-derived hyperplanes) buckets the
  corpus; each query probes only its bucket (plus multi-probe
  variants), turning O(Q×N) into O(Q×N/2^bits) per table. Recall is
  tunable via ``num_tables``/``hash_bits``.

An IVF variant would cluster with KMeans (spark.ml) and probe nearest
centroids; the LSH form avoids a training pass and stays deterministic,
which the correctness harness needs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _as_double(col):
    return F.transform(col, lambda x: x.cast("double"))


def _dot(a, b):
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda s, x: s + x)


def _norm(a):
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda s, x: s + x * x))


def brute_force_knn(
    corpus: DataFrame,
    queries: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 10,
    round_to: int | None = 4,
) -> DataFrame:
    """Exact cosine top-k of each query against the corpus."""
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), _as_double(F.col(vec_col)).alias("cv")
    )
    q = queries.select(
        F.col(id_col).alias("query_id"), _as_double(F.col(vec_col)).alias("qv")
    )
    cos = _dot(F.col("qv"), F.col("cv")) / (_norm(F.col("qv")) * _norm(F.col("cv")))
    if round_to is not None:
        cos = F.round(cos, round_to)
    pairs = (
        q.crossJoin(c)
        .where(F.col("neighbor_id") != F.col("query_id"))
        .withColumn("cos", cos)
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cos").desc(), F.col("neighbor_id"))
    return (
        pairs.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cos", "rank")
    )


def _lsh_key(vec_col, dim: int, bits: int, table: int, seed: int):
    """Sign-projection hash: hyperplane h_{t,b} has components
    derived from xxhash64(t, b, j) mapped to ±1 — deterministic, no
    stored model, cheap to compute in codegen."""
    keys = []
    for b in range(bits):
        # close over literals — extra lambda params would change the
        # higher-order function's arity dispatch
        seed_l, t_l, b_l = F.lit(seed), F.lit(table), F.lit(b)
        comp = F.aggregate(
            F.zip_with(
                vec_col,
                F.sequence(F.lit(0), F.lit(dim - 1)),
                lambda x, j: x
                * F.when(
                    F.pmod(F.xxhash64(seed_l, t_l, b_l, j), 2) == 0, F.lit(1.0)
                ).otherwise(F.lit(-1.0)),
            ),
            F.lit(0.0),
            lambda s, x: s + x,
        )
        keys.append(F.when(comp > 0, F.lit(1)).otherwise(F.lit(0)).cast("string"))
    return F.concat_ws("", *keys)


def lsh_bucket_knn(
    corpus: DataFrame,
    queries: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int,
    k: int = 10,
    hash_bits: int = 6,
    num_tables: int = 4,
    seed: int = 42,
    round_to: int | None = 4,
) -> DataFrame:
    """Approximate cosine top-k: join query and corpus rows that share
    an LSH bucket in ANY of ``num_tables`` tables, rank exact cosine
    within the candidate set."""
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), _as_double(F.col(vec_col)).alias("cv")
    )
    q = queries.select(
        F.col(id_col).alias("query_id"), _as_double(F.col(vec_col)).alias("qv")
    )
    c_k = c.select(
        "*",
        F.explode(
            F.array(
                *[
                    F.concat_ws("#", F.lit(str(t)), _lsh_key(F.col("cv"), dim, hash_bits, t, seed))
                    for t in range(num_tables)
                ]
            )
        ).alias("bucket"),
    )
    q_k = q.select(
        "*",
        F.explode(
            F.array(
                *[
                    F.concat_ws("#", F.lit(str(t)), _lsh_key(F.col("qv"), dim, hash_bits, t, seed))
                    for t in range(num_tables)
                ]
            )
        ).alias("bucket"),
    )
    cand = (
        q_k.join(c_k, "bucket")
        .where(F.col("neighbor_id") != F.col("query_id"))
        .dropDuplicates(["query_id", "neighbor_id"])
    )
    cos = _dot(F.col("qv"), F.col("cv")) / (_norm(F.col("qv")) * _norm(F.col("cv")))
    if round_to is not None:
        cos = F.round(cos, round_to)
    w = Window.partitionBy("query_id").orderBy(F.col("cos").desc(), F.col("neighbor_id"))
    return (
        cand.withColumn("cos", cos)
        .withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cos", "rank")
    )
