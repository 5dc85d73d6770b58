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

* lsh_near_dup_pairs — near-dup PAIRS at scale: LSH buckets as the
  candidate generator, exact cosine verify on candidates only — the
  embedding twin of the MinHash→verify text-dedup chain. The all-pairs
  ``cosine_near_dup_blocked`` stays as the exact baseline/oracle.
* ivf_knn — the trained scale path: KMeans (spark.ml) coarse quantizer;
  corpus rows are assigned to their nearest centroid cell, queries probe
  the ``n_probe`` nearest cells only — O(Q·N·probe/cells) instead of
  O(Q·N), the standard IVF-flat layout. LSH needs no training pass and
  is fully deterministic; IVF adapts to the data distribution.
"""

from __future__ import annotations

import pandas as pd
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


def cosine_near_dup_blocked(
    df: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.9,
    n_blocks: int | None = None,
    block_budget_bytes: int = 64 << 20,
    round_to: int | None = 4,
) -> DataFrame:
    """All pairs with cosine >= threshold, exact, via block nested-loop
    with a vectorized numpy kernel.

    ``n_blocks=None`` (default) derives the block count from corpus
    count × dim so one block's vectors stay under ``block_budget_bytes``
    — blocks are materialized via collect_list into single rows, and a
    fixed block count would cross the 2 GB JVM array ceiling at a 100×
    corpus (VERDICT r01 #8). The result is identical for any block
    count; only the parallelism/row-size tradeoff moves.

    The naive formulation (crossJoin + per-pair ``zip_with``/``aggregate``
    fold) evaluates an interpreted lambda per vector element per pair —
    O(n²·d) lambda dispatches. Here vectors are hashed into ``n_blocks``
    groups, the (i ≤ j) block pairs are enumerated (n_blocks² / 2 rows,
    each carrying two sub-matrices), and each pair is resolved with one
    BLAS matmul inside ``applyInPandas`` — the same O(n²·d) flops but at
    memory bandwidth instead of expression-interpreter speed. At cluster
    scale this is the standard exact all-pairs layout: block size is
    chosen so a block pair fits executor memory, and the block-pair join
    is an even n_blocks²-way parallelism source. (For 100 TB one runs
    the LSH candidate pass first — ``lsh_bucket_knn`` — and this kernel
    only inside buckets.)
    """
    import pandas as pd

    if n_blocks is None:
        import math

        # ONE job for both (n, dim) — not first()+count(), which would
        # execute a non-trivial upstream plan twice
        n, dim = df.agg(
            F.count(F.lit(1)), F.first(F.size(F.col(vec_col)), ignorenulls=True)
        ).first()
        n, dim = int(n or 0), int(dim or 1)
        n_blocks = max(
            df.sparkSession.sparkContext.defaultParallelism // 2 or 1,
            math.ceil(n * dim * 8 / block_budget_bytes),
        )

    # raw vectors into the blocks; the kernel normalizes its own batch
    # in numpy (a transform(v, x / norm) column would have the norm
    # fold inlined into the lambda by CollapseProject and re-evaluated
    # PER ELEMENT — O(dim²)/row, the HOF-invariant gotcha)
    vecs = df.select(
        F.col(id_col).alias("_id"),
        _as_double(F.col(vec_col)).alias("_v"),
        F.pmod(F.xxhash64(F.col(id_col).cast("string")), F.lit(n_blocks)).alias("_blk"),
    )
    blocks = vecs.groupBy("_blk").agg(
        F.collect_list("_id").alias("ids"), F.collect_list("_v").alias("vs")
    )
    a = blocks.select(
        F.col("_blk").alias("blk_a"), F.col("ids").alias("ids_a"), F.col("vs").alias("vs_a")
    )
    b = blocks.select(
        F.col("_blk").alias("blk_b"), F.col("ids").alias("ids_b"), F.col("vs").alias("vs_b")
    )
    n_pairs = n_blocks * (n_blocks + 1) // 2
    pairs = a.join(b, F.col("blk_a") <= F.col("blk_b")).repartition(
        min(n_pairs, df.sparkSession.sparkContext.defaultParallelism)
    )

    out_schema = "id_a long, id_b long, cos double"

    def _kernel(pdf_iter):
        import numpy as np

        for pdf in pdf_iter:
            for row in pdf.itertuples(index=False):
                ids_a = np.asarray(row.ids_a, dtype=np.int64)
                ids_b = np.asarray(row.ids_b, dtype=np.int64)
                ma = np.asarray([np.asarray(v) for v in row.vs_a])
                mb = np.asarray([np.asarray(v) for v in row.vs_b])
                ma = ma / np.sqrt((ma * ma).sum(axis=1, keepdims=True))
                mb = mb / np.sqrt((mb * mb).sum(axis=1, keepdims=True))
                cos = ma @ mb.T
                if round_to is not None:
                    cos = np.round(cos, round_to)
                ia, ib = np.nonzero(cos >= threshold)
                if len(ia) == 0:
                    continue
                ra, rb = ids_a[ia], ids_b[ib]
                if row.blk_a == row.blk_b:
                    # same block: each unordered pair appears twice (and
                    # as self-pairs on the diagonal) — keep the a<b half
                    keep = ra < rb
                    if not keep.any():
                        continue
                    ra, rb, c = ra[keep], rb[keep], cos[ia, ib][keep]
                else:
                    # distinct blocks: each unordered pair appears exactly
                    # once — normalize (min, max), drop nothing
                    c = cos[ia, ib]
                    ra, rb = np.minimum(ra, rb), np.maximum(ra, rb)
                yield pd.DataFrame({"id_a": ra, "id_b": rb, "cos": c})

    return pairs.mapInPandas(_kernel, schema=out_schema)


def _lsh_keys_udf(dim: int, bits: int, num_tables: int, seed: int):
    """All tables' sign-projection keys in ONE vectorized kernel.

    The hyperplane matrix (dim × bits·tables, ±1 entries) is derived
    deterministically from the seed; each Arrow batch of vectors is one
    matmul against it, signs packed into per-table integer bucket keys.
    Replaces bits·tables interpreted ``aggregate`` folds per row
    (hash_bits=4 × tables=6 × dim lambda dispatches each) with BLAS.
    """
    import numpy as np
    from pyspark.sql.functions import pandas_udf

    rng = np.random.default_rng(seed)
    planes = rng.choice([-1.0, 1.0], size=(dim, bits * num_tables))
    weights = np.tile(1 << np.arange(bits, dtype=np.int64), num_tables)
    table_of = np.repeat(np.arange(num_tables, dtype=np.int64), bits)

    @pandas_udf("array<long>")
    def _keys(vecs: pd.Series) -> pd.Series:
        m = np.asarray([np.asarray(v, dtype=np.float64) for v in vecs])
        if m.size == 0:
            return pd.Series([], dtype=object)
        # Round the projection to a fixed grid before the sign: BLAS
        # summation order varies with the batch's matrix shape, so an
        # EXACTLY-zero projection (e.g. an all-equal vector against a
        # sign-balanced plane) would otherwise flip its bit per batch —
        # identical vectors must hash identically or an exact-dup pile
        # splits buckets nondeterministically (test_incremental_embed).
        signs = np.round(m @ planes, 9) > 0  # (n, bits·tables)
        packed = np.zeros((len(m), num_tables), dtype=np.int64)
        for t in range(num_tables):
            sel = table_of == t
            # table id in the high bits so keys never collide across tables
            packed[:, t] = (signs[:, sel] * weights[sel]).sum(axis=1) | (t << bits)
        return pd.Series(list(packed))

    return _keys


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
    keys = _lsh_keys_udf(dim, hash_bits, num_tables, seed)
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), _as_double(F.col(vec_col)).alias("cv")
    )
    q = queries.select(
        F.col(id_col).alias("query_id"), _as_double(F.col(vec_col)).alias("qv")
    )
    c_k = c.select("*", F.explode(keys(F.col("cv"))).alias("bucket"))
    q_k = q.select("*", F.explode(keys(F.col("qv"))).alias("bucket"))
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


def lsh_near_dup_pairs(
    df: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int,
    threshold: float = 0.9,
    hash_bits: int = 8,
    num_tables: int = 8,
    seed: int = 42,
    round_to: int | None = 4,
    max_bucket: int = 200,
    refine_bits: int = 8,
    max_refine_rounds: int = 4,
    stats_out: dict | None = None,
) -> DataFrame:
    """Embedding near-dup PAIRS via the composed scale path (VERDICT
    r03 #3): sign-projection LSH buckets generate candidates — O(n·T)
    bucket rows, one shuffle — and only candidate pairs get an exact
    cosine verify. This replaces the corpus-wide all-pairs O(n²) shape
    for dedup duty; ``cosine_near_dup_blocked`` remains the exact
    baseline/oracle.

    Oversized buckets are handled by *refinement*, not star edges: a
    sign-projection bucket holds ~n/2^bits of a near-orthogonal corpus
    — random neighbors, NOT a dup family — so the MinHash star-edge
    rationale (bucket-min is in the family) does not transfer; star
    edges here would verify ~nothing and silently zero out recall at
    scale (review r4 #1). Instead, each vector carries a refinement
    sign-projection key per (table, round) (``refine_bits`` each,
    independent seeds), and a bucket larger than ``max_bucket`` is
    re-split by its table's next refinement key — two near-identical
    vectors agree on EVERY projection with high probability, so
    refinement preserves dup pairs while cutting random co-occupants by
    ~2^refine_bits per round. The keys differ per TABLE so a noisy
    near-dup pair split apart by one table's refinement stays together
    in another's — per-table splits are independent trials, exactly
    like the primary banding. A bucket still oversized after all
    rounds (≥ 2^40 effective agreeing bits: an exact-duplicate pile)
    falls back to star edges, which ARE sound for exact piles — and
    the pile is counted, never silently dropped: pass ``stats_out``
    (a dict) to receive per-round oversized-bucket counts and the
    final star-fallback pile count ("no silent caps").

    Returns (id_a, id_b, cos) with id_a < id_b and cos ≥ threshold.
    Recall is tunable via ``hash_bits``/``num_tables`` — at the dup end
    (cos ≳ 0.99) the per-pair miss probability is
    (1 − p^bits)^tables with p = 1 − θ/π ≈ 0.97, i.e. ~1e-5 at the
    8/8 defaults."""
    from pyspark.sql import Window

    from .dedup_text import bucket_candidate_pairs

    keys = _lsh_keys_udf(dim, hash_bits, num_tables, seed)
    # refinement keys: one per (table, round), generated as extra
    # "tables" from an independent seed so they are uncorrelated with
    # the primary keys AND with each other across tables
    rkeys = _lsh_keys_udf(
        dim, refine_bits, num_tables * max_refine_rounds, seed + 7919
    )
    # normalized vector copies ride the bucket rows (r6): each small
    # bucket resolves its own pairwise cosines in one BLAS matmul, so
    # the margin pre-cut below replaces the explode-every-pair →
    # distinct → join-vectors-per-pair pipeline (O(n·bucket) pair rows
    # — ~10⁸ at sf1.0 — each paying an interpreted d-element fold) with
    # per-bucket kernels whose survivors are a near-dup-sized sliver.
    # Keys and the exact verify keep seeing the RAW vectors — bucketing
    # (incl. its 9-dp zero-projection rounding) and the emitted cos stay
    # bit-identical to the pre-kernel form.
    # raw vectors only — the bucket kernel normalizes its own batch in
    # numpy (an `_nv` column via transform(v, x / norm) looks cheaper
    # but Catalyst inlines the norm fold into the lambda and re-runs it
    # PER ELEMENT: O(dim²)/row, measured 8 s alone at sf1.0 — the
    # HOF-invariant gotcha documented at dedup_text.bucket_candidate_pairs)
    v = df.select(
        F.col(id_col).alias("_id"),
        _as_double(F.col(vec_col)).alias("_v"),
    ).withColumn("_rk", rkeys(F.col("_v")))
    # primary keys carry their table id in the high bits; keep it as a
    # column so each refinement round can pick the table's own key
    bucketed = v.select(
        "_id", "_v", "_rk", F.explode(keys(F.col("_v"))).alias("bucket")
    ).withColumn(
        "_tbl",
        F.shiftrightunsigned(F.col("bucket"), hash_bits).cast("int"),
    )

    def _sized(b: DataFrame) -> DataFrame:
        # vectors are collected only for small buckets (the window and
        # the groupBy share one exchange): an oversized exact-dup pile
        # takes the star path off its ids alone, so its bucket row must
        # not materialize a pile-sized vector list (the 2 GB array
        # ceiling — VERDICT r01 #8)
        w = Window.partitionBy("bucket")
        return (
            b.withColumn("_n", F.count(F.lit(1)).over(w))
            .groupBy("bucket")
            .agg(
                F.collect_list("_id").alias("ids"),
                F.collect_list(
                    F.when(F.col("_n") <= max_bucket, F.col("_v"))
                ).alias("vs"),
                F.count(F.lit(1)).alias("n"),
            )
        )

    # candidates from a small bucket: normalize in-kernel, one matmul,
    # pairs clearing the pre-cut. The cut sits BELOW threshold:
    # the exact verify at the end re-computes every survivor with the
    # sequential-fold expression the oracle mirrors, so kernel summation
    # order can never change the result — the kernel only must not MISS
    # a pair, which the 1e-3 margin guarantees against ulp-level spread.
    cut = threshold - 1e-3

    def _bucket_kernel(pdf_iter):
        import numpy as np

        for pdf in pdf_iter:
            for row in pdf.itertuples(index=False):
                ids = np.asarray(row.ids, dtype=np.int64)
                m = np.asarray([np.asarray(x) for x in row.vs])
                m = m / np.sqrt((m * m).sum(axis=1, keepdims=True))
                cos = m @ m.T
                ia, ib = np.nonzero(cos >= cut)
                keep = ids[ia] < ids[ib]
                if not keep.any():
                    continue
                yield pd.DataFrame(
                    {"id_a": ids[ia][keep], "id_b": ids[ib][keep]}
                )

    def _small_pairs(sized: DataFrame) -> DataFrame:
        return (
            sized.where((F.col("n") >= 2) & (F.col("n") <= max_bucket))
            .select("ids", "vs")
            .mapInPandas(_bucket_kernel, schema="id_a long, id_b long")
        )

    cands = None
    for rnd in range(max_refine_rounds + 1):
        # checkpoint each round's bucket frame: it feeds the pair
        # kernel, the oversized probe, AND (round > 0 only when
        # needed) the refinement join — without this the corpus-wide
        # projection UDF + banding shuffle would execute 2-3× per call
        # (review r4 second pass #2)
        sized = _sized(bucketed).localCheckpoint(eager=True)
        last = rnd == max_refine_rounds
        if last and stats_out is not None:
            stats_out["final_star_buckets"] = sized.where(
                F.col("n") > max_bucket
            ).count()
        part = _small_pairs(sized)
        if last:
            # the final fallback star is only reached by exact piles
            # that survived every refinement split — O(n) edges off the
            # ids alone, uncut (they go through the same exact verify)
            part = part.unionByName(
                bucket_candidate_pairs(
                    sized.where(F.col("n") > max_bucket).select(
                        "bucket", "ids", "n"
                    ),
                    max_bucket=max_bucket,
                    oversized="star",
                )
            )
        cands = part if cands is None else cands.unionByName(part)
        if last:
            break
        over = sized.where(F.col("n") > max_bucket).select(
            F.col("bucket").alias("_ob")
        )
        n_over = over.count()
        if stats_out is not None:
            stats_out[f"round_{rnd}_oversized_buckets"] = n_over
        if not n_over:
            break  # nothing oversized — the common case exits round 0
        # re-split oversized buckets by each table's key for this
        # round. NO broadcast hint: the oversized-id side is usually
        # tiny but is unbounded in the worst case (review r4 second
        # pass #5) — left-semi lets the planner degrade to a shuffle
        # join gracefully.
        bucketed = (
            bucketed.join(
                over, bucketed["bucket"] == over["_ob"], "left_semi"
            )
            .select(
                "_id",
                "_v",
                "_rk",
                "_tbl",
                F.concat_ws(
                    ":", F.col("bucket").cast("string"),
                    F.element_at(
                        F.col("_rk"),
                        (F.col("_tbl") * max_refine_rounds + rnd + 1),
                    ).cast("string"),
                ).alias("bucket"),
            )
            .localCheckpoint(eager=True)
        )
    a = v.select(F.col("_id").alias("id_a"), F.col("_v").alias("va"))
    b = v.select(F.col("_id").alias("id_b"), F.col("_v").alias("vb"))
    cos = _dot(F.col("va"), F.col("vb")) / (_norm(F.col("va")) * _norm(F.col("vb")))
    if round_to is not None:
        cos = F.round(cos, round_to)
    return (
        cands.distinct()
        .join(a, "id_a")
        .join(b, "id_b")
        .withColumn("cos", cos)
        .where(F.col("cos") >= threshold)
        .select("id_a", "id_b", "cos")
    )


def ivf_knn(
    corpus: DataFrame,
    queries: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 10,
    n_centroids: int = 16,
    n_probe: int = 4,
    seed: int = 42,
    round_to: int | None = 4,
    train_fraction: float | None = None,
) -> DataFrame:
    """Approximate cosine top-k via an IVF-flat index.

    Train a KMeans coarse quantizer (spark.ml — one pass over the
    corpus, tiny model), assign each corpus row to its centroid cell,
    and have each query probe only its ``n_probe`` nearest cells —
    the candidate join is an equi-join on cell id, exactly like the LSH
    form but with data-adaptive partitions. Query→cell routing runs as
    one Arrow-batch matmul against the centroid matrix (driver-side
    model, executor-side kernel).

    ``train_fraction``: train the quantizer on a deterministic sample of
    the corpus instead of all of it — the 100-TB path (a coarse
    quantizer needs ~100–1000 points per centroid, not the corpus; IVF
    assignment of the FULL corpus still happens, that's the one cheap
    pass). None trains on everything (small-corpus default).
    """
    import numpy as np
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector
    from pyspark.sql.functions import pandas_udf

    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), _as_double(F.col(vec_col)).alias("cv")
    )
    q = queries.select(
        F.col(id_col).alias("query_id"), _as_double(F.col(vec_col)).alias("qv")
    )

    full = c.withColumn("_fv", array_to_vector(F.col("cv")))
    train = (
        full.sample(fraction=train_fraction, seed=seed)
        if train_fraction is not None
        else full
    )
    model = KMeans(
        k=n_centroids, seed=seed, featuresCol="_fv", predictionCol="_cell"
    ).fit(train)
    assigned = model.transform(full).select("neighbor_id", "cv", "_cell")
    cents = np.asarray([np.asarray(ct) for ct in model.clusterCenters()])

    probe = min(n_probe, len(cents))

    @pandas_udf("array<int>")
    def _probe_cells(vs: pd.Series) -> pd.Series:
        m = np.asarray([np.asarray(v, dtype=np.float64) for v in vs])
        if m.size == 0:
            return pd.Series([], dtype=object)
        # squared euclidean to every centroid: |x|^2 - 2x·c + |c|^2
        d = (
            (m * m).sum(axis=1, keepdims=True)
            - 2.0 * (m @ cents.T)
            + (cents * cents).sum(axis=1)
        )
        idx = np.argsort(d, axis=1)[:, :probe].astype(np.int32)
        return pd.Series(list(idx))

    q_k = q.withColumn("_cell", F.explode(_probe_cells(F.col("qv"))))
    cand = q_k.join(assigned, "_cell").where(
        F.col("neighbor_id") != F.col("query_id")
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
