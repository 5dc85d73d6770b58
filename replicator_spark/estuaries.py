"""Estuaries — sink fan-out (SURVEY §2.3).

The reference writes every event to every registered estuary
(``pkg/estuary/estuary.go:72-85``; v2 loop ``pkg/replicator/
service.go:507-519``, continue-on-error). Here a micro-batch is
prepared once (normalize + LWW dedup), persisted, and fanned out to N
sinks — one pass over the data per sink, no per-event loop.

Sinks:

* LakeSink     — the MERGE path (laketable); the primary estuary
  (subsumes the reference's MySQL/Mongo/Elasticsearch apply operators,
  all of which reduce to upsert-by-key + delete).
* KeyedLogSink — Kafka-producer analogue: rows serialized to
  (key, value JSON) and appended partitioned by key hash. DIVERGENCE
  (deliberate, SURVEY §7.4): the reference produces *keyless* messages
  → random partition → ordering loss (``pkg/estuary/kafka.go:28-38``);
  we key by hash(repo,path) so per-key order is preserved. With a real
  broker this becomes ``df.write.format("kafka")`` with the same key
  expression.
* ConsoleSink  — stdout estuary (``pkg/estuary/estuary.go:95-103``),
  debug only.

Error policy matches the reference's continue-on-error fan-out: a sink
failure is recorded and the remaining sinks still run; the lake sink is
authoritative for exactly-once (its batch ledger), secondary sinks are
at-least-once exactly as in the reference.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .laketable import LakeTable, MergeStats
from .model import KEY_COLS


class Sink:
    name: str = "sink"

    def write(self, prepared: DataFrame, batch_key: str):  # pragma: no cover
        raise NotImplementedError


class LakeSink(Sink):
    def __init__(self, table: LakeTable, *, mode: str = "mor", **merge_kw):
        self.table = table
        self.mode = mode
        self.merge_kw = merge_kw
        self.name = f"lake:{table.root}"

    def write(self, prepared: DataFrame, batch_key: str) -> MergeStats:
        return self.table.merge(
            prepared, batch_key, mode=self.mode, **self.merge_kw
        )


class KeyedLogSink(Sink):
    def __init__(self, out_dir: str, *, num_partitions: int = 16):
        self.out_dir = out_dir
        self.num_partitions = num_partitions
        self.name = f"keyedlog:{out_dir}"

    def write(self, prepared: DataFrame, batch_key: str) -> None:
        payload_cols = [c for c in prepared.columns]
        out = prepared.select(
            F.concat_ws("/", *[F.col(k) for k in KEY_COLS if k in prepared.columns]).alias(
                "key"
            ),
            F.to_json(F.struct(*[F.col(c) for c in payload_cols])).alias("value"),
            F.pmod(
                F.xxhash64(*[F.col(k) for k in KEY_COLS if k in prepared.columns]),
                F.lit(self.num_partitions),
            ).cast("int").alias("partition"),
        )
        (
            out.repartition(self.num_partitions, F.col("partition"))
            .write.mode("append")
            .partitionBy("partition")
            .parquet(f"{self.out_dir}/batch={batch_key}")
        )


class ConsoleSink(Sink):
    name = "console"

    def __init__(self, limit: int = 20):
        self.limit = limit

    def write(self, prepared: DataFrame, batch_key: str) -> None:
        prepared.show(self.limit, truncate=40)


@dataclass
class FanoutResult:
    batch_key: str
    results: dict
    errors: dict


def fan_out(prepared: DataFrame, batch_key: str, sinks: list[Sink]) -> FanoutResult:
    """Write one prepared batch to every sink, continue-on-error."""
    prepared = prepared.persist()
    results, errors = {}, {}
    try:
        for s in sinks:
            try:
                results[s.name] = s.write(prepared, batch_key)
            except Exception as ex:  # noqa: BLE001 — reference semantics
                errors[s.name] = repr(ex)
    finally:
        prepared.unpersist()
    return FanoutResult(batch_key, results, errors)
