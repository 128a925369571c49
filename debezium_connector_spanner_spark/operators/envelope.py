"""Debezium envelope construction (D8/D9, SURVEY.md §2.2).

Builds the change-record stream a downstream consumer would read from
Kafka in the reference: op c/u/d, before/after row images, 17-field-ish
source lineage struct, low watermark stamp.

Reference: /root/reference processor/SpannerChangeRecordEmitter.java:42-129
(op mapping, before only for d, after for c/u),
context/source/SourceInfo.java:16-110 and
SpannerSourceInfoStructMaker.java:25-123 (source fields),
processor/SpannerEventDispatcher.java:89-152 (low_watermark stamping).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from debezium_connector_spanner_spark.operators.decode import dedup_identity


def to_envelope(
    decoded: DataFrame,
    connector_name: str = "spanner-cdc-spark",
    table_name: str = "repos",
    low_watermark_us: int | None = None,
) -> DataFrame:
    """decoded (from decode_mods) -> deduped Debezium-envelope stream.

    Exactly-once delivery of the *stream* (as opposed to the table MERGE,
    which absorbs duplicates in its fold) needs the identity dedup here.
    """
    d = dedup_identity(decoded)
    return d.select(
        F.col("op"),
        F.col("keys").alias("key"),
        F.when(F.col("op") != "c", F.col("olds")).alias("before"),
        F.when(F.col("op") != "d", F.col("vals")).alias("after"),
        F.struct(
            F.lit(connector_name).alias("connector"),
            F.lit(table_name).alias("table"),
            F.unix_micros("commit_ts").alias("commit_timestamp_us"),
            F.col("server_txn_id").alias("server_transaction_id"),
            F.col("record_sequence"),
            F.col("partition_token"),
            F.col("mod_number"),
            F.lit(low_watermark_us).cast("long").alias("low_watermark_us"),
        ).alias("source"),
        F.unix_micros("commit_ts").alias("ts_us"),
    )
