"""Incremental embedding near-dup detection over lake-table state.

The vector twin of ``ops/incremental_dedup``: a standing corpus of
embeddings, batches arriving in id order, and the question "which new
vectors near-duplicate something already seen" answered WITHOUT
re-deduping the corpus. Two LakeTables under one root compose the
index:

* ``<root>/vectors`` — (vec_id, v): the normalized vectors, stored
  ONCE, keyed on vec_id. The verify stage joins candidates against
  this table; storage is O(n·dim), never duplicated per band.
* ``<root>/bands`` — (band_key, vec_id, rk1..rk4): one row per
  sign-projection table per vector (``num_tables`` rows/vec), keyed
  (band_key, vec_id) and hash-bucketed on band_key. ``rk*`` are the
  per-(table, round) refinement keys, precomputed at index time so an
  oversized join group can be re-split WITHOUT re-reading vectors.

Candidates follow the online policy of the MinHash index, adapted to
the embedding regime where star edges are unsound (a sign-projection
bucket of a near-orthogonal corpus is random space — the bucket min
is NOT a family canonical; CLAUDE.md invariant): a new vector's
"earlier" bucket co-occupants are

    ≤ max_bucket                → verify all of them
    oversized                   → require refinement-key agreement,
                                  level by level (rk1, then rk1+rk2,
                                  …): two near-duplicates agree on
                                  every projection w.h.p., random
                                  co-occupants halve per refine bit
    still oversized after rk4   → an exact-duplicate pile (≥ the
                                  combined projection bits agree):
                                  ONE star probe to the pile minimum
                                  — sound exactly there, and the only
                                  place a star is used

and every surviving candidate gets an exact cosine verify against the
vectors table — the emitted pairs are VERIFIED near-dups (cos ≥ tau),
not candidates, unlike the MinHash index whose banding is itself the
similarity contract.

Exactly-once: both tables ride their batch ledgers; vectors commit
BEFORE bands, so the replay check on the bands ledger implies both
(a crash between the two merges replays the vectors merge as a
ledger no-op and completes the bands merge). The arrival-order
contract and its loud guard are inherited unchanged.

100-TB shape: per batch O(batch × tables) band rows + O(batch) vector
rows appended through ordinary mor merges; the candidate join
shuffles on band_key; the nested-cap window is keyed (band_key,
new_id) — bounded per new vector by its bucket overlap; the verify
joins are id-keyed hash joins against the vectors table pruned to
candidate ids. ``run_embed_index_stream`` is the Structured-Streaming
wrapper (same wiring + crash-gap recovery as
``incremental_dedup.run_dedup_index_stream``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..laketable import LakeTable
from .similarity import _as_double, _dot, _lsh_keys_udf

N_REFINE = 4

BANDS_SCHEMA = T.StructType(
    [
        T.StructField("band_key", T.LongType()),
        T.StructField("vec_id", T.LongType()),
        *[T.StructField(f"rk{r + 1}", T.LongType()) for r in range(N_REFINE)],
    ]
)

VECTORS_SCHEMA = T.StructType(
    [
        T.StructField("vec_id", T.LongType()),
        T.StructField("v", T.ArrayType(T.DoubleType())),
    ]
)


class EmbeddingIndex:
    """Sign-projection LSH index over embeddings, persisted as two
    LakeTables. ``add_batch`` appends one id-ordered batch and returns
    its VERIFIED near-dup pairs (id_a < id_b, cos ≥ tau) against
    everything indexed so far, same-batch members included."""

    def __init__(
        self,
        spark: SparkSession,
        root: str,
        *,
        dim: int,
        hash_bits: int = 8,
        num_tables: int = 8,
        refine_bits: int = 8,
        seed: int = 42,
        tau: float = 0.95,
        max_bucket: int = 200,
        round_to: int = 4,
    ):
        self.spark = spark
        self.root = root
        self.bands = LakeTable(spark, f"{root}/bands")
        self.vectors = LakeTable(spark, f"{root}/vectors")
        self.dim = dim
        self.hash_bits = hash_bits
        self.num_tables = num_tables
        self.refine_bits = refine_bits
        self.seed = seed
        self.tau = tau
        self.max_bucket = max_bucket
        self.round_to = round_to
        self._keys = _lsh_keys_udf(dim, hash_bits, num_tables, seed)
        # refinement keys: independent seed, one extra "table" per
        # (table, round) — same derivation as similarity.lsh_near_dup_pairs
        self._rkeys = _lsh_keys_udf(
            dim, refine_bits, num_tables * N_REFINE, seed + 7919
        )

    def create(self, num_buckets: int = 32) -> "EmbeddingIndex":
        self.bands.create(
            BANDS_SCHEMA, num_buckets=num_buckets, key_cols=("band_key", "vec_id")
        )
        self.vectors.create(
            VECTORS_SCHEMA, num_buckets=num_buckets, key_cols=("vec_id",)
        )
        return self

    def exists(self) -> bool:
        return self.bands.exists() and self.vectors.exists()

    def _prepared(self, df: DataFrame, id_col: str, vec_col: str) -> DataFrame:
        """(vec_id, v normalized, band_key exploded, rk1..rk4) rows."""
        norm = F.sqrt(_dot(F.col("v"), F.col("v")))
        base = df.select(
            F.col(id_col).cast("long").alias("vec_id"),
            _as_double(F.col(vec_col)).alias("v"),
        ).select(
            "vec_id", F.transform("v", lambda x: x / norm).alias("v")
        )
        keyed = base.select(
            "vec_id", "v",
            self._keys(F.col("v")).alias("_bk"),
            self._rkeys(F.col("v")).alias("_rk"),
        )
        banded = keyed.select(
            "vec_id",
            "v",
            F.posexplode("_bk").alias("_tbl", "band_key"),
            "_rk",
        )
        rks = [
            F.element_at(
                F.col("_rk"), F.col("_tbl") * N_REFINE + r + 1
            ).alias(f"rk{r + 1}")
            for r in range(N_REFINE)
        ]
        return banded.select("band_key", "vec_id", "v", *rks)

    def add_batch(
        self,
        vecs: DataFrame,
        batch_key: str,
        *,
        id_col: str = "vec_id",
        vec_col: str = "embedding",
    ) -> DataFrame | None:
        """Index one id-ordered batch; return its verified near-dup
        pairs, or None when the bands ledger says the batch already
        committed (vectors commit first, so bands-committed ⇒ both)."""
        if self.bands.is_committed(batch_key) is not None:
            return None
        prepared = self._prepared(vecs, id_col, vec_col).localCheckpoint(
            eager=True
        )
        prior_hi = (self.bands._snap().props or {}).get("max_seq")
        batch_lo = prepared.agg(F.min("vec_id")).first()[0]
        if prior_hi is not None and batch_lo is not None and batch_lo <= prior_hi:
            raise ValueError(
                f"batch {batch_key!r} is out of arrival order: min vec_id "
                f"{batch_lo} <= max indexed id {prior_hi}"
            )
        self.vectors.merge(
            prepared.select("vec_id", "v")
            .dropDuplicates(["vec_id"])
            .select(
                "vec_id", "v",
                F.col("vec_id").alias("seq"), F.lit("upsert").alias("op"),
            ),
            batch_key,
            mode="mor",
        )
        rk_cols = [f"rk{r + 1}" for r in range(N_REFINE)]
        self.bands.merge(
            prepared.select(
                "band_key", "vec_id", *rk_cols,
                F.col("vec_id").alias("seq"), F.lit("upsert").alias("op"),
            ),
            batch_key,
            mode="mor",
        )
        return self._verified_pairs(prepared)

    def _verified_pairs(self, prepared: DataFrame) -> DataFrame:
        """Nested-cap candidate selection + exact cosine verify."""
        index = self.bands.read().select(
            "band_key",
            F.col("vec_id").alias("old_id"),
            *[F.col(f"rk{r + 1}").alias(f"ork{r + 1}") for r in range(N_REFINE)],
        )
        mine = prepared.select(
            "band_key",
            F.col("vec_id").alias("new_id"),
            *[f"rk{r + 1}" for r in range(N_REFINE)],
        )
        j = mine.join(index, "band_key").where(F.col("old_id") < F.col("new_id"))
        w = Window.partitionBy("band_key", "new_id")
        m = F.lit(True)
        levels = [(F.count(F.lit(1)).over(w), m)]
        for r in range(N_REFINE):
            m = m & (F.col(f"ork{r + 1}") == F.col(f"rk{r + 1}"))
            levels.append((F.sum(m.cast("int")).over(w), m))
        # first level whose candidate count fits the cap wins; a pile
        # that agrees on EVERY refinement (exact duplicates) falls back
        # to one probe against the pile minimum — the only star here.
        # Window exprs must land as columns BEFORE the filter (Spark
        # rejects window functions inside WHERE).
        deepest = levels[-1][1]
        keep = F.when(levels[0][0] <= self.max_bucket, F.lit(True))
        for n_k, m_k in levels[1:]:
            keep = keep.when(n_k <= self.max_bucket, m_k)
        keep = keep.otherwise(
            F.col("old_id")
            == F.min(F.when(deepest, F.col("old_id"))).over(w)
        )
        cand = (
            j.withColumn("_keep", keep)
            .where(F.col("_keep"))
            .select(F.col("old_id").alias("id_a"), F.col("new_id").alias("id_b"))
            .distinct()
        )
        va = self.vectors.read().select(
            F.col("vec_id").alias("id_a"), F.col("v").alias("va")
        )
        vb = self.vectors.read().select(
            F.col("vec_id").alias("id_b"), F.col("v").alias("vb")
        )
        cos = F.round(_dot(F.col("va"), F.col("vb")), self.round_to)
        return (
            cand.join(va, "id_a")
            .join(vb, "id_b")
            .withColumn("cos", cos)
            .where(F.col("cos") >= self.tau)
            .select("id_a", "id_b", "cos")
        )

    def pairs_for(
        self,
        vecs: DataFrame,
        *,
        id_col: str = "vec_id",
        vec_col: str = "embedding",
    ) -> DataFrame:
        """Recompute the verified pairs of ALREADY-INDEXED vectors
        without writing — the streaming crash-gap recovery path
        (see ``incremental_dedup.MinHashIndex.candidates_for``): valid
        while no later batch has merged, which the stream's offset WAL
        guarantees on replay."""
        return self._verified_pairs(self._prepared(vecs, id_col, vec_col))

    def stats(self) -> dict:
        snap = self.bands._snap()
        return {
            "bands_version": snap.version,
            "vectors_version": self.vectors._snap().version,
            "band_rows": self.bands.read().count(),
            "vectors": self.vectors.read().count(),
            "batches": len(snap.committed_batches),
        }


def run_embed_index_stream(
    spark: SparkSession,
    vecs_dir: str,
    index_root: str,
    checkpoint_dir: str,
    pairs_dir: str,
    *,
    dim: int,
    stream_name: str = "embed",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_files_per_trigger: int | None = 1,
    num_buckets: int = 32,
    **index_kw,
):
    """Structured-Streaming form of the embedding index — the same
    wiring as ``incremental_dedup.run_dedup_index_stream``: tail a
    partitioned vector feed (``batch_id=N`` dirs, one file per batch
    under rate limiting, ids ascending), maintain both index tables
    per micro-batch, land each batch's VERIFIED pairs under
    ``pairs_dir/batch_key=<k>``. The crash-gap between the merges and
    the pairs write recovers through ``pairs_for`` (identical result
    by WAL ordering). Returns the drain-and-stop streaming query."""
    idx = EmbeddingIndex(spark, index_root, dim=dim, **index_kw)
    if not idx.exists():
        idx.create(num_buckets=num_buckets)

    def _apply(batch_df, batch_id: int):
        key = f"{stream_name}-{batch_id}"
        pairs = idx.add_batch(batch_df, key, id_col=id_col, vec_col=vec_col)
        if pairs is None:
            pairs = idx.pairs_for(batch_df, id_col=id_col, vec_col=vec_col)
        pairs.write.mode("overwrite").parquet(f"{pairs_dir}/batch_key={key}")

    reader = spark.readStream.schema(
        T.StructType(
            [
                T.StructField(id_col, T.LongType()),
                T.StructField(vec_col, T.ArrayType(T.FloatType())),
                T.StructField("batch_id", T.IntegerType(), True),
            ]
        )
    )
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    reader = reader.parquet(vecs_dir)
    return (
        reader.writeStream.foreachBatch(_apply)
        .option("checkpointLocation", checkpoint_dir)
        .queryName(stream_name)
        .trigger(availableNow=True)
        .start()
    )


def replay_embeddings_incremental(
    spark: SparkSession,
    vecs: DataFrame,
    index_root: str,
    *,
    dim: int,
    n_batches: int = 3,
    splits: list[int] | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    stream_name: str = "vecs",
    num_buckets: int = 32,
    **index_kw,
) -> DataFrame:
    """Batch replay mirror of ``replay_documents_incremental`` for
    embeddings: contiguous id ranges through ``EmbeddingIndex``, pairs
    unioned (each batch eagerly materialized before the next mutates
    the index)."""
    idx = EmbeddingIndex(spark, index_root, dim=dim, **index_kw).create(
        num_buckets=num_buckets
    )
    lo, hi = vecs.agg(F.min(id_col), F.max(id_col)).first()
    if splits is None:
        width = (hi - lo) // n_batches + 1
        splits = [lo + (b + 1) * width for b in range(n_batches - 1)]
    bounds = [None, *sorted(splits), None]
    out = None
    for b in range(len(bounds) - 1):
        blo, bhi = bounds[b], bounds[b + 1]
        batch = vecs
        if blo is not None:
            batch = batch.where(F.col(id_col) >= blo)
        if bhi is not None:
            batch = batch.where(F.col(id_col) < bhi)
        pairs = idx.add_batch(
            batch, f"{stream_name}-{b}", id_col=id_col, vec_col=vec_col
        )
        if pairs is None:
            continue
        pairs = pairs.localCheckpoint(eager=True)
        out = pairs if out is None else out.unionByName(pairs)
    assert out is not None
    return out.distinct()
