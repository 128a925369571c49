"""Envelope + low-watermark stamp invariants (mirrors the reference's
LowWatermarkRecordIT.java:49-88 and SpannerSourceInfoStructMakerTest):

- every record's low_watermark stamp <= its commit_ts
- stamps are monotone non-decreasing in emission (batch) order
- the source struct carries the full Spanner field set
"""

import os

from pyspark.sql import functions as F

from debezium_connector_spanner_spark.fixtures.generator import (
    EPOCH_MICROS,
    GeneratorConfig,
    write_fixture,
)
from debezium_connector_spanner_spark.sources.event_schema import REPOS_SCHEMA_V1
from debezium_connector_spanner_spark.streaming.engine import CdcReplayEngine

EXPECTED_SOURCE_FIELDS = {
    # common Debezium fields
    "version", "connector", "name", "ts_us", "db", "sequence",
    # SpannerSourceInfoStructMaker.java:25-123
    "project_id", "instance_id", "database_id", "change_stream_name",
    "table", "server_transaction_id", "low_watermark_us",
    "read_at_timestamp_us", "number_records_in_transaction",
    "transaction_tag", "system_transaction", "value_capture_type",
    "partition_token", "mod_number",
    "is_last_record_in_transaction_in_partition",
    "number_of_partitions_in_transaction",
    # offset identity extras
    "record_sequence", "commit_timestamp_us",
}


def test_envelope_watermark_stamp(spark, tmp_root):
    cfg = GeneratorConfig(n_repos=5, paths_per_repo=3, events_per_key_mean=4)
    fx = os.path.join(tmp_root, "fx")
    write_fixture(fx, cfg)
    eng = CdcReplayEngine(
        spark,
        fx,
        os.path.join(tmp_root, "t"),
        os.path.join(tmp_root, "c"),
        start_us=EPOCH_MICROS,
        end_us=EPOCH_MICROS + cfg.duration_s * 1_000_000,
        n_batches=5,
        initial_schema=REPOS_SCHEMA_V1,
        base_df=spark.read.parquet(os.path.join(fx, "base_repos.parquet")),
        n_buckets=4,
    )
    eng.run()
    env = eng.envelope_stream("repos")

    # full source struct
    got_fields = {f.name for f in env.schema["source"].dataType.fields}
    assert got_fields == EXPECTED_SOURCE_FIELDS

    rows = env.select(
        F.col("source.low_watermark_us").alias("wm"),
        F.col("source.read_at_timestamp_us").alias("read_at"),
        "ts_us",
    ).collect()
    assert rows, "empty envelope stream"
    # stamp <= commit_ts per record; every record stamped
    for r in rows:
        assert r["wm"] is not None and r["wm"] <= r["ts_us"], r
        assert r["read_at"] is not None and r["ts_us"] <= r["read_at"], r
    # stamps monotone in emission order (read_at == batch end == emit order)
    by_batch = sorted({(r["read_at"], r["wm"]) for r in rows})
    stamps = [wm for _, wm in by_batch]
    assert stamps == sorted(stamps)
    # the stamp actually advances over the run (not a constant)
    assert stamps[-1] > stamps[0]


def test_envelope_before_after_shape(spark, tmp_root):
    """SpannerChangeRecordEmitter.java:42-129: before only for u/d,
    after only for c/u."""
    cfg = GeneratorConfig(n_repos=4, paths_per_repo=2, events_per_key_mean=4)
    fx = os.path.join(tmp_root, "fx")
    write_fixture(fx, cfg)
    from debezium_connector_spanner_spark.operators.decode import decode_mods
    from debezium_connector_spanner_spark.operators.envelope import to_envelope
    from debezium_connector_spanner_spark.sources.event_schema import EVENT_LOG_SCHEMA

    ev = (
        spark.read.schema(EVENT_LOG_SCHEMA)
        .parquet(os.path.join(fx, "events"))
        .where(F.col("table_name") == "repos")
    )
    env = to_envelope(decode_mods(ev, REPOS_SCHEMA_V1, include_old=True))
    bad = env.where(
        ((F.col("op") == "c") & F.col("before").isNotNull())
        | ((F.col("op") == "d") & F.col("after").isNotNull())
        | ((F.col("op") != "d") & F.col("after").isNull())
    ).count()
    assert bad == 0


def test_event_formatter(spark, tmp_root):
    """D11 debug formatter (EventFormatter.java:17-104): operation +
    position always present; before/after segments appear exactly when
    the images do; nulls never leave dangling ', ' delimiters; the whole
    projection stays codegen'd (no python UDF in the plan)."""
    cfg = GeneratorConfig(n_repos=4, paths_per_repo=2, events_per_key_mean=4)
    fx = os.path.join(tmp_root, "fx")
    write_fixture(fx, cfg)
    from debezium_connector_spanner_spark.operators.decode import decode_mods
    from debezium_connector_spanner_spark.operators.envelope import (
        format_events,
        to_envelope,
    )
    from debezium_connector_spanner_spark.sources.event_schema import EVENT_LOG_SCHEMA

    ev = (
        spark.read.schema(EVENT_LOG_SCHEMA)
        .parquet(os.path.join(fx, "events"))
        .where(F.col("table_name") == "repos")
    )
    env = to_envelope(decode_mods(ev, REPOS_SCHEMA_V1, include_old=True))
    fmt = format_events(env)
    assert "BatchEvalPython" not in fmt._jdf.queryExecution().toString()
    rows = fmt.select("op", "before", "after", "event_str").collect()
    assert rows
    for r in rows:
        s = r["event_str"]
        assert s.startswith(f"operation: {r['op']}, position: {{partition_token: ")
        assert ("before: " in s) == (r["before"] is not None)
        assert ("after: " in s) == (r["after"] is not None)
        assert ", ," not in s and not s.endswith(", ")
