"""replicator_spark — a PySpark-native CDC / incremental-ingest engine.

A from-scratch re-expression of the semantics of cohenjo/replicator
(reference surveyed in SURVEY.md): tail a binlog/WAL-style change-event
feed, normalize heterogeneous source events into one canonical change
record, optionally transform (rule engine), last-writer-wins dedup on the
event sequence (LSN), and apply as key-partitioned MERGE upserts into an
Iceberg-style lake table with exactly-once idempotent micro-batch commits,
additive schema evolution, per-partition lineage and metrics.

Execution is idiomatic Spark: DataFrame/SQL plans optimized by Catalyst,
vectorized pandas/Arrow UDFs for the few non-relational kernels (sha256,
extended-JSON decode), Structured Streaming for the streaming path.
"""

__version__ = "0.1.0"
