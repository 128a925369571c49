"""PySpark-native CDC / incremental-ingest engine.

A from-scratch re-creation of the semantics of
debezium/debezium-connector-spanner (reference: /root/reference, a Java
Kafka Connect source connector) as an idiomatic Spark engine:

- a change-event log (Spanner change-stream shaped envelope) is tailed in
  incremental micro-batches,
- the partition DAG (parent->child splits/merges) gates which partitions
  may stream (reference: task/operation/FindPartitionForStreamingOperation.java:32-76),
- events are decoded vectorized (from_json / Arrow pandas UDFs),
- per-key last-writer-wins folds + bucketed copy-on-write MERGE upserts
  into a snapshot-versioned lake table keyed by (repo, path),
- per-partition offsets + low watermark are checkpointed for
  exactly-once resume (reference: context/offset/PartitionOffset.java,
  task/LowWatermarkCalculator.java:47-169).

Everything is DataFrame-level PySpark; no per-row Python in the hot path.
"""

__version__ = "0.1.0"

from debezium_connector_spanner_spark.session import get_spark  # noqa: F401
