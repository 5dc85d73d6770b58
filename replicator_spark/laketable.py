"""Iceberg-style lake table with key-partitioned MERGE (copy-on-write).

This is the engine's sink — the concrete implementation of everything the
reference *declared* but never built in its v2 estuary interface:
``DatabaseDestination{Write, WriteBatch, CreateTable, GetSchema,
UpdateSchema, BeginTransaction}`` and ``DestinationRecord.Operation ∈
{INSERT, UPDATE, DELETE, UPSERT}`` (``pkg/estuary/interface.go:12-88``),
plus the schema-evolution interface (``interface.go:239-280``) and the
exactly-once commit its research notes aspired to
(``specs/001-replicator-is-a/research.md:110-117``).

Physical layout::

    <root>/metadata/v{N}.json, version-hint.text   (commitlog.py)
    <root>/data/v{N}/repo_bucket=K/part-*.parquet

* Rows are hash-bucketed on ``repo`` into ``num_buckets`` buckets —
  MERGE rewrites only the buckets the batch touches (partition-pruned
  copy-on-write), so per-batch write cost is O(touched data), not
  O(table), which is what makes 10^10-event replay feasible.
* Each row carries engine columns ``_last_seq`` (per-key LWW high-water
  mark) and ``_deleted`` (tombstone). Tombstones are retained so that a
  late-arriving update with seq < a previously applied delete's seq is
  correctly rejected even across micro-batches — without them, LWW under
  out-of-order delivery silently resurrects deleted keys. ``read()``
  filters tombstones unless asked not to.
* MERGE semantics (one full-outer join on the key):
  source wins iff ``s.seq > t._last_seq`` (or no target row);
  winning delete → tombstone; winning insert/update/replace → source
  image; stale source row → skipped (counted).
* Additive schema evolution: payload columns present in the batch but
  not in the table widen the logical schema; pre-existing rows read the
  new columns as null (the MODIFY/DROP paths the reference declared are
  intentionally out of scope, matching its "no schema change
  replication" stance — ``README.md:48``).
"""

from __future__ import annotations

from collections.abc import Sequence
from dataclasses import dataclass

from pyspark.sql import DataFrame, Observation, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from . import commitlog as cl
from .model import BUCKET_COL, KEY_COLS, LAST_SEQ_COL, OP_DELETE

ENGINE_COLS = [LAST_SEQ_COL, "_deleted"]


@dataclass
class MergeStats:
    batch_key: str
    version: int | None  # committed snapshot version (None if skipped replay)
    applied: int = 0
    skipped_stale: int = 0
    deduped: int = 0
    deleted: int = 0
    schema_evolved: int = 0
    touched_buckets: int = 0
    replayed: bool = False  # batch_key already committed → no-op


def bucket_expr(num_buckets: int, repo_col: str = "repo") -> F.Column:
    return F.pmod(F.xxhash64(F.col(repo_col)), F.lit(num_buckets)).cast("int")


class LakeTable:
    """Narrow table API: create / read / merge / schema / time-travel.

    Kept deliberately small so a real Iceberg catalog can be swapped in
    where the runtime jar exists — the pipeline only uses this surface.
    """

    def __init__(self, spark: SparkSession, root: str):
        self.spark = spark
        self.root = root

    # -- DDL -----------------------------------------------------------
    def create(self, schema: T.StructType, num_buckets: int = 32) -> None:
        """CREATE TABLE — snapshot 0, no data files."""
        if cl.current_version(self.root) is not None:
            raise ValueError(f"table already exists at {self.root}")
        snap = cl.Snapshot(
            version=0,
            parent=None,
            schema_json=schema.json(),
            num_buckets=num_buckets,
            files={},
        )
        cl.commit_snapshot(self.root, snap)

    def exists(self) -> bool:
        return cl.current_version(self.root) is not None

    def schema(self, version: int | None = None) -> T.StructType:
        snap = self._snap(version)
        return T.StructType.fromJson(__import__("json").loads(snap.schema_json))

    def _snap(self, version: int | None = None) -> cl.Snapshot:
        snap = cl.load_snapshot(self.root, version)
        if snap is None:
            raise ValueError(f"no table at {self.root}")
        return snap

    def committed_batches(self) -> dict[str, int]:
        return dict(self._snap().committed_batches)

    # -- read ----------------------------------------------------------
    def _physical_schema(self, snap: cl.Snapshot) -> T.StructType:
        logical = T.StructType.fromJson(__import__("json").loads(snap.schema_json))
        fields = list(logical.fields)
        fields.append(T.StructField(LAST_SEQ_COL, T.LongType(), True))
        fields.append(T.StructField("_deleted", T.BooleanType(), True))
        return T.StructType(fields)

    def read(
        self,
        version: int | None = None,
        buckets: Sequence[int] | None = None,
        include_deleted: bool = False,
        include_engine_cols: bool = False,
    ) -> DataFrame:
        """Read a snapshot (time travel via ``version``), optionally
        pruned to a bucket list — the file-level partition pruning that
        MERGE relies on."""
        snap = self._snap(version)
        phys = self._physical_schema(snap)
        if buckets is None:
            files = [f for fs in snap.files.values() for f in fs]
        else:
            files = [f for b in buckets for f in snap.files.get(str(b), [])]
        if not files:
            df = self.spark.createDataFrame([], phys)
        else:
            # Explicit schema: old files may predate evolved columns —
            # parquet reader fills missing columns with null.
            df = self.spark.read.schema(phys).parquet(*files)
        if not include_deleted:
            df = df.where(~F.coalesce(F.col("_deleted"), F.lit(False)))
        if not include_engine_cols:
            df = df.drop(*ENGINE_COLS)
        return df

    # -- MERGE ---------------------------------------------------------
    def merge(
        self,
        batch: DataFrame,
        batch_key: str,
        *,
        key_cols: Sequence[str] = tuple(KEY_COLS),
        seq_col: str = "seq",
        op_col: str = "op",
        files_per_bucket: int = 1,
        props: dict | None = None,
    ) -> MergeStats:
        """Apply one micro-batch as MERGE INTO. Idempotent on batch_key.

        ``batch`` columns: key cols + payload cols + seq + op, already
        LWW-deduped to ONE row per key (pipeline.prepare_batch does
        that; enforced here only by assertion-free contract for speed).
        """
        snap = self._snap()
        if batch_key in snap.committed_batches:
            return MergeStats(batch_key, snap.committed_batches[batch_key], replayed=True)

        key_cols = list(key_cols)
        logical = self.schema()
        payload_in_table = [f.name for f in logical.fields if f.name not in key_cols]
        batch_payload = [
            c for c in batch.columns if c not in key_cols + [seq_col, op_col, "event_id"]
        ]

        # additive schema evolution: new payload columns widen the table
        new_cols = [c for c in batch_payload if c not in payload_in_table]
        new_fields = []
        if new_cols:
            bschema = {f.name: f for f in batch.schema.fields}
            for c in new_cols:
                new_fields.append(T.StructField(c, bschema[c].dataType, True))
        evolved_schema = T.StructType(list(logical.fields) + new_fields)
        all_payload = payload_in_table + new_cols

        nb = snap.num_buckets
        src = batch.withColumn(BUCKET_COL, bucket_expr(nb))
        # columns the table has that this batch lacks (full-image
        # replace semantics: absent → null, see module docstring)
        for c in payload_in_table:
            if c not in batch.columns:
                dt = next(f.dataType for f in logical.fields if f.name == c)
                src = src.withColumn(c, F.lit(None).cast(dt))

        touched = [r[0] for r in src.select(BUCKET_COL).distinct().collect()]
        tgt = self.read(
            buckets=touched, include_deleted=True, include_engine_cols=True
        )
        for f_ in new_fields:
            tgt = tgt.withColumn(f_.name, F.lit(None).cast(f_.dataType))

        s = src.alias("s")
        t = tgt.alias("t")
        cond = [F.col(f"s.{k}") == F.col(f"t.{k}") for k in key_cols]
        j = t.join(s, cond, "full_outer")

        win = F.col(f"s.{seq_col}").isNotNull() & (
            F.col(f"t.{LAST_SEQ_COL}").isNull()
            | (F.col(f"s.{seq_col}") > F.col(f"t.{LAST_SEQ_COL}"))
        )
        is_src = F.col(f"s.{seq_col}").isNotNull()
        src_del = F.col(f"s.{op_col}") == OP_DELETE

        obs = Observation(f"merge-{batch_key}")
        j = j.observe(
            obs,
            F.sum(F.when(win, 1).otherwise(0)).alias("applied"),
            F.sum(F.when(is_src & ~win, 1).otherwise(0)).alias("skipped_stale"),
            F.sum(F.when(win & src_del, 1).otherwise(0)).alias("deleted"),
        )
        proj = [
            F.coalesce(F.col(f"s.{k}"), F.col(f"t.{k}")).alias(k) for k in key_cols
        ]
        proj += [
            F.when(win, F.col(f"s.{c}")).otherwise(F.col(f"t.{c}")).alias(c)
            for c in all_payload
        ]
        proj += [
            F.when(win, F.col(f"s.{seq_col}"))
            .otherwise(F.col(f"t.{LAST_SEQ_COL}"))
            .alias(LAST_SEQ_COL),
            F.when(win, src_del)
            .otherwise(F.coalesce(F.col("t._deleted"), F.lit(False)))
            .alias("_deleted"),
            F.coalesce(F.col(f"s.{BUCKET_COL}"), bucket_expr(nb, f"t.repo")).alias(
                BUCKET_COL
            ),
        ]
        result = j.select(*proj)

        # copy-on-write: rewrite touched buckets into a fresh versioned dir
        new_version = snap.version + 1
        out_dir = f"{self.root}/data/v{new_version}"
        nparts = max(len(touched) * files_per_bucket, 1)
        salt = F.pmod(F.xxhash64(*[F.col(k) for k in key_cols]), F.lit(files_per_bucket))
        (
            result.repartition(nparts, F.col(BUCKET_COL), salt)
            .sortWithinPartitions(*key_cols)
            .write.mode("overwrite")
            .partitionBy(BUCKET_COL)
            .parquet(out_dir)
        )
        m = obs.get

        # stitch new snapshot: touched buckets → new files, rest carried
        files = dict(snap.files)
        new_files = self._list_bucket_files(out_dir)
        for b in touched:
            files[str(b)] = new_files.get(str(b), [])
        committed = dict(snap.committed_batches)
        committed[batch_key] = new_version
        nsnap = cl.Snapshot(
            version=new_version,
            parent=snap.version,
            schema_json=evolved_schema.json(),
            num_buckets=nb,
            files=files,
            committed_batches=committed,
            props={**(props or {}), "batch_key": batch_key},
        )
        cl.commit_snapshot(self.root, nsnap)
        return MergeStats(
            batch_key,
            new_version,
            applied=int(m["applied"] or 0),
            skipped_stale=int(m["skipped_stale"] or 0),
            deleted=int(m["deleted"] or 0),
            schema_evolved=len(new_cols),
            touched_buckets=len(touched),
        )

    def _list_bucket_files(self, out_dir: str) -> dict[str, list[str]]:
        import os

        out: dict[str, list[str]] = {}
        for entry in os.listdir(out_dir):
            if not entry.startswith(f"{BUCKET_COL}="):
                continue
            b = entry.split("=", 1)[1]
            d = os.path.join(out_dir, entry)
            out[b] = sorted(
                os.path.join(d, f)
                for f in os.listdir(d)
                if f.endswith(".parquet")
            )
        return out
