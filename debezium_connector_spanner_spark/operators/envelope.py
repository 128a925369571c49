"""Debezium envelope construction (D8/D9, SURVEY.md §2.2).

Builds the change-record stream a downstream consumer would read from
Kafka in the reference: op c/u/d, before/after row images, the FULL
source lineage struct (all 17 Spanner fields + the common Debezium
fields), and the low-watermark stamp (a per-record column supplied by
the engine's watermark tracker — see CdcReplayEngine.envelope_stream).

Reference: /root/reference processor/SpannerChangeRecordEmitter.java:42-129
(op mapping, before only for d, after for c/u),
context/source/SourceInfo.java:16-110 and
SpannerSourceInfoStructMaker.java:25-123 (source fields; timestamps here
are epoch MICROS end-to-end where the reference emits millis),
processor/SpannerEventDispatcher.java:89-152 +
task/LowWatermarkStampPublisher.java:23-126 (low_watermark stamping).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from debezium_connector_spanner_spark.operators.decode import dedup_identity

ENVELOPE_VERSION = "1.0-spark"


def to_envelope(
    decoded: DataFrame,
    connector_name: str = "spanner-cdc-spark",
    table_name: str | None = None,
    project_id: str = "local-project",
    instance_id: str = "local-instance",
    database_id: str = "local-database",
    change_stream_name: str = "changeStreamAll",
    low_watermark_us: int | Column | None = None,
    read_at_timestamp_us: int | Column | None = None,
) -> DataFrame:
    """decoded (from decode_mods) -> deduped Debezium-envelope stream.

    Exactly-once delivery of the *stream* (as opposed to the table MERGE,
    which absorbs duplicates in its fold) needs the identity dedup here.

    ``low_watermark_us`` may be a Column (the engine stamps each record
    with the watermark current when its batch was emitted) or a constant.
    """
    d = dedup_identity(decoded)
    cols = set(d.columns)

    def opt(name: str, typ: str) -> F.Column:
        return (F.col(name) if name in cols else F.lit(None)).cast(typ).alias(name)

    wm = (
        low_watermark_us
        if isinstance(low_watermark_us, Column)
        else F.lit(low_watermark_us)
    )
    rat = (
        read_at_timestamp_us
        if isinstance(read_at_timestamp_us, Column)
        else F.lit(read_at_timestamp_us)
    )
    tbl = (
        F.col("table_name")
        if table_name is None and "table_name" in cols
        else F.lit(table_name or "repos")
    )
    source = F.struct(
        # common Debezium fields (AbstractSourceInfoStructMaker.commonSchema)
        F.lit(ENVELOPE_VERSION).alias("version"),
        F.lit(connector_name).alias("connector"),
        F.lit(change_stream_name).alias("name"),
        F.unix_micros("commit_ts").alias("ts_us"),
        F.lit(database_id).alias("db"),
        F.col("record_sequence").alias("sequence"),
        # Spanner source fields (SpannerSourceInfoStructMaker.java:25-123)
        F.lit(project_id).alias("project_id"),
        F.lit(instance_id).alias("instance_id"),
        F.lit(database_id).alias("database_id"),
        F.lit(change_stream_name).alias("change_stream_name"),
        tbl.alias("table"),
        F.col("server_txn_id").alias("server_transaction_id"),
        wm.cast("long").alias("low_watermark_us"),
        rat.cast("long").alias("read_at_timestamp_us"),
        opt("number_of_records_in_transaction", "long").alias(
            "number_records_in_transaction"
        ),
        opt("transaction_tag", "string").alias("transaction_tag"),
        opt("is_system_transaction", "boolean").alias("system_transaction"),
        opt("value_capture_type", "string").alias("value_capture_type"),
        F.col("partition_token").alias("partition_token"),
        F.col("mod_number").cast("int").alias("mod_number"),
        opt("is_last_in_txn_in_partition", "boolean").alias(
            "is_last_record_in_transaction_in_partition"
        ),
        opt("number_of_partitions_in_transaction", "long").alias(
            "number_of_partitions_in_transaction"
        ),
        # kept for offset parity (SpannerOffsetContextFactory identity)
        F.col("record_sequence"),
        F.unix_micros("commit_ts").alias("commit_timestamp_us"),
    )
    return d.select(
        F.col("op"),
        F.col("keys").alias("key"),
        F.when(F.col("op") != "c", F.col("olds")).alias("before"),
        F.when(F.col("op") != "d", F.col("vals")).alias("after"),
        source.alias("source"),
        F.unix_micros("commit_ts").alias("ts_us"),
    )


def format_events(envelope: DataFrame, col_name: str = "event_str") -> DataFrame:
    """D11 debug event formatter: envelope -> one human-readable string
    per record (reference processor/metadata/EventFormatter.java:17-104).

    Catalyst-native — concat/to_json inside whole-stage codegen, no UDF.
    Segments appear only when present and are joined with ", "
    (concat_ws skips nulls, which is exactly the reference's
    addDelimiter/removeDelimiter dance); struct images render as JSON,
    the Spark equivalent of SchemaUtil.asDetailedString's struct dump.
    Logging/debug projection only — never on the data hot path.
    """
    position = F.concat(
        F.lit("position: {partition_token: "),
        F.col("source.partition_token"),
        F.lit(", commit_timestamp_us: "),
        F.col("source.commit_timestamp_us").cast("string"),
        F.lit(", record_sequence: "),
        F.col("source.record_sequence"),
        F.lit("}"),
    )
    segments = [
        F.concat(F.lit("operation: "), F.col("op")),
        position,
        F.when(
            F.col("key").isNotNull(),
            F.concat(F.lit("key: "), F.to_json(F.col("key"))),
        ),
        F.when(
            F.col("before").isNotNull(),
            F.concat(F.lit("before: "), F.to_json(F.col("before"))),
        ),
        F.when(
            F.col("after").isNotNull(),
            F.concat(F.lit("after: "), F.to_json(F.col("after"))),
        ),
    ]
    return envelope.withColumn(col_name, F.concat_ws(", ", *segments))
