"""Metrics + lineage tables (FIXTURES.md F5).

The Spark form of the reference's Prometheus/OTel counters
(``replicator_recieved_records_total`` ``pkg/streams/stream.go:25-30``,
``replicator_processed_records_total`` ``pkg/replicator/replicator.go:23-28``,
skipped/failed counters ``pkg/metrics/telemetry.go:196-258``): per-batch
applied/skipped/deduped counts come from ``Observation`` metrics attached
to the MERGE plan (zero extra passes), and are appended here as parquet
tables under the lake-table root. Writes are driver-side pyarrow —
metadata-scale data, no Spark job needed.
"""

from __future__ import annotations

import os
import time

import pyarrow as pa
import pyarrow.parquet as pq

METRICS_SCHEMA = pa.schema(
    [
        ("batch_key", pa.string()),
        ("snapshot_version", pa.int64()),
        ("received", pa.int64()),
        ("applied", pa.int64()),
        ("skipped_stale", pa.int64()),
        ("deduped", pa.int64()),
        ("deleted", pa.int64()),
        ("schema_evolved", pa.int64()),
        ("schema_retries", pa.int64()),
        ("touched_buckets", pa.int64()),
        ("wall_ms", pa.int64()),
        ("ts_ms", pa.int64()),
    ]
)

LINEAGE_SCHEMA = pa.schema(
    [
        ("batch_key", pa.string()),
        ("snapshot_version", pa.int64()),
        ("seq_min", pa.int64()),
        ("seq_max", pa.int64()),
        ("n_files_written", pa.int64()),
        ("buckets", pa.list_(pa.int32())),
        ("ts_ms", pa.int64()),
    ]
)


def _append(dirpath: str, schema: pa.Schema, row: dict) -> None:
    os.makedirs(dirpath, exist_ok=True)
    row = {**row, "ts_ms": int(time.time() * 1000)}
    table = pa.Table.from_pylist([row], schema=schema)
    name = f"part-{row['ts_ms']}-{row['batch_key'].replace('/', '_')}.parquet"
    pq.write_table(table, os.path.join(dirpath, name))


def append_metrics(table_root: str, row: dict) -> None:
    _append(os.path.join(table_root, "_metrics"), METRICS_SCHEMA, row)


def append_lineage(table_root: str, row: dict) -> None:
    _append(os.path.join(table_root, "_lineage"), LINEAGE_SCHEMA, row)


def read_metrics(spark, table_root: str):
    return spark.read.parquet(os.path.join(table_root, "_metrics"))


def read_lineage(spark, table_root: str):
    return spark.read.parquet(os.path.join(table_root, "_lineage"))


def to_prometheus_text(table_root: str) -> str:
    """Render cumulative counters in Prometheus exposition format — the
    observable replacement for the reference's ``/metrics`` endpoint
    (``pkg/api/metrics.go``; counter names match
    ``pkg/streams/stream.go:25-30``, ``pkg/replicator/replicator.go:23-28``
    modulo the reference's 'recieved' typo, which we do not reproduce).
    Driver-side pyarrow scan of the metrics table — no Spark job."""
    import pyarrow.dataset as ds

    path = os.path.join(table_root, "_metrics")
    totals = {
        "received": 0, "applied": 0, "skipped_stale": 0,
        "deduped": 0, "deleted": 0,
    }
    n_batches = 0
    if os.path.isdir(path):
        t = ds.dataset(path).to_table(columns=list(totals))
        n_batches = t.num_rows
        for c in totals:
            s = t.column(c).to_pylist()
            totals[c] = sum(v for v in s if v is not None)
    lines = [
        "# HELP replicator_received_records_total Events received across batches",
        "# TYPE replicator_received_records_total counter",
        f"replicator_received_records_total {totals['received']}",
        "# HELP replicator_processed_records_total Events applied to the lake table",
        "# TYPE replicator_processed_records_total counter",
        f"replicator_processed_records_total {totals['applied']}",
        "# HELP replicator_skipped_records_total LWW-stale events rejected",
        "# TYPE replicator_skipped_records_total counter",
        f"replicator_skipped_records_total {totals['skipped_stale']}",
        "# HELP replicator_deduped_records_total Redelivered/superseded duplicates collapsed",
        "# TYPE replicator_deduped_records_total counter",
        f"replicator_deduped_records_total {totals['deduped']}",
        "# HELP replicator_deleted_records_total Delete events applied",
        "# TYPE replicator_deleted_records_total counter",
        f"replicator_deleted_records_total {totals['deleted']}",
        "# HELP replicator_batches_total Micro-batches committed",
        "# TYPE replicator_batches_total counter",
        f"replicator_batches_total {n_batches}",
    ]
    return "\n".join(lines) + "\n"
