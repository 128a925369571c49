"""Structured Streaming tail (readStream -> foreachBatch -> MERGE)."""

import os

import pandas as pd

from debezium_connector_spanner_spark.fixtures.generator import (
    GeneratorConfig,
    write_fixture,
)
from debezium_connector_spanner_spark.fixtures.oracle import fold_final_state
from debezium_connector_spanner_spark.operators.merge import CDC_TS_COL
from debezium_connector_spanner_spark.sources.event_schema import REPOS_SCHEMA_V1
from debezium_connector_spanner_spark.sources.lake import LakeTable
from debezium_connector_spanner_spark.streaming.stream_tail import (
    stream_events_into_table,
)

CFG = GeneratorConfig(n_repos=6, paths_per_repo=4, hot_repos=1, events_per_key_mean=3)


def test_stream_tail_availablenow(spark, tmp_root):
    fx = os.path.join(tmp_root, "fx")
    write_fixture(fx, CFG)
    base = spark.read.parquet(os.path.join(fx, "base_repos.parquet"))
    table = LakeTable.create(
        spark,
        os.path.join(tmp_root, "t"),
        REPOS_SCHEMA_V1.spark_struct(),
        REPOS_SCHEMA_V1.key_columns,
        n_buckets=4,
        initial_df=base,
    )
    stream_events_into_table(
        spark,
        os.path.join(fx, "events"),
        table,
        REPOS_SCHEMA_V1,
        os.path.join(tmp_root, "stream-ckpt"),
    )
    got = (
        table.read()
        .drop(CDC_TS_COL)
        .toPandas()
        .sort_values(["repo", "path"])
        .reset_index(drop=True)
    )
    want = fold_final_state(fx).sort_values(["repo", "path"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(got[want.columns.tolist()], want)


def test_stream_tail_is_incremental(spark, tmp_root):
    """Second availableNow pass with no new files is a no-op (source
    offsets checkpointed by Structured Streaming)."""
    fx = os.path.join(tmp_root, "fx")
    write_fixture(fx, CFG)
    base = spark.read.parquet(os.path.join(fx, "base_repos.parquet"))
    table = LakeTable.create(
        spark,
        os.path.join(tmp_root, "t"),
        REPOS_SCHEMA_V1.spark_struct(),
        REPOS_SCHEMA_V1.key_columns,
        n_buckets=4,
        initial_df=base,
    )
    ckpt = os.path.join(tmp_root, "stream-ckpt")
    stream_events_into_table(spark, os.path.join(fx, "events"), table, REPOS_SCHEMA_V1, ckpt)
    sid = table.current_snapshot_id()
    stream_events_into_table(spark, os.path.join(fx, "events"), table, REPOS_SCHEMA_V1, ckpt)
    assert table.current_snapshot_id() == sid, "no new files -> no new snapshot"


def test_stream_tail_wire_dialects(spark, tmp_root):
    """The always-on streaming shape over the proto and PG wire logs:
    an availableNow pass through the dialect decoders must land the
    same final state as the canonical struct log / pandas oracle."""
    from debezium_connector_spanner_spark.fixtures.generator import (
        write_pg_json_log,
        write_proto_log,
    )

    fx = os.path.join(tmp_root, "fx-wire")
    write_fixture(fx, CFG)
    write_proto_log(fx)
    write_pg_json_log(fx)
    base = spark.read.parquet(os.path.join(fx, "base_repos.parquet"))
    want = fold_final_state(fx).sort_values(["repo", "path"]).reset_index(drop=True)
    for wire, subdir in (("proto", "events_proto"), ("pg_json", "events_pg")):
        table = LakeTable.create(
            spark,
            os.path.join(tmp_root, f"t-{wire}"),
            REPOS_SCHEMA_V1.spark_struct(),
            REPOS_SCHEMA_V1.key_columns,
            n_buckets=4,
            initial_df=base,
        )
        stream_events_into_table(
            spark,
            os.path.join(fx, subdir),
            table,
            REPOS_SCHEMA_V1,
            os.path.join(tmp_root, f"ckpt-{wire}"),
            wire_format=wire,
        )
        got = (
            table.read()
            .drop(CDC_TS_COL)
            .toPandas()
            .sort_values(["repo", "path"])
            .reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(got[want.columns.tolist()], want, obj=wire)
