"""PG-dialect wire format (D1/D2 second decode shape).

- decode_pg_json(events_pg) must produce the SAME decoded mod rows as the
  canonical struct-wire decode (field-level equivalence incl. explicit
  JSON nulls and DELETE null new_values)
- a full replay over the pg_json log must reproduce the pandas oracle's
  final state exactly (wire format is transparent to the engine)
"""

import os

import pandas as pd
from pyspark.sql import functions as F

from debezium_connector_spanner_spark.fixtures.generator import (
    EPOCH_MICROS,
    GeneratorConfig,
    write_fixture,
    write_pg_json_log,
)
from debezium_connector_spanner_spark.fixtures.oracle import fold_final_state
from debezium_connector_spanner_spark.operators.decode import decode_mods
from debezium_connector_spanner_spark.sources.event_schema import (
    EVENT_LOG_SCHEMA,
    REPOS_SCHEMA_V1,
)
from debezium_connector_spanner_spark.sources.pg_json import (
    PG_LOG_SCHEMA,
    decode_pg_json,
)
from debezium_connector_spanner_spark.streaming.engine import CdcReplayEngine

CFG = GeneratorConfig(n_repos=6, paths_per_repo=4, hot_repos=1, events_per_key_mean=4)


def _fixture(tmp_root):
    fx = os.path.join(tmp_root, "fx")
    write_fixture(fx, CFG)
    write_pg_json_log(fx)
    return fx


def test_pg_json_decode_matches_struct_wire(spark, tmp_root):
    fx = _fixture(tmp_root)
    canon = spark.read.schema(EVENT_LOG_SCHEMA).parquet(os.path.join(fx, "events"))
    pg = decode_pg_json(
        spark.read.schema(PG_LOG_SCHEMA).parquet(os.path.join(fx, "events_pg"))
    )

    def decoded_rows(events):
        df = decode_mods(events, REPOS_SCHEMA_V1, include_old=True)
        pdf = df.select(
            "partition_token",
            "record_sequence",
            "server_txn_id",
            "mod_number",
            "op",
            "repo",
            "path",
            F.col("vals.commit").alias("v_commit"),
            F.col("vals.lang").alias("v_lang"),
            F.col("vals.content").alias("v_content"),
            F.col("olds.commit").alias("o_commit"),
        ).toPandas()
        return pdf.sort_values(pdf.columns.tolist()).reset_index(drop=True)

    pd.testing.assert_frame_equal(decoded_rows(canon), decoded_rows(pg))
    # control records demux identically too
    for rt in ("heartbeat", "child_partitions", "partition_end"):
        assert (
            canon.where(f"record_type = '{rt}'").count()
            == pg.where(f"record_type = '{rt}'").count()
        )


def test_pg_json_replay_matches_oracle(spark, tmp_root):
    fx = _fixture(tmp_root)
    eng = CdcReplayEngine(
        spark,
        fx,
        os.path.join(tmp_root, "t"),
        os.path.join(tmp_root, "c"),
        start_us=EPOCH_MICROS,
        end_us=EPOCH_MICROS + CFG.duration_s * 1_000_000,
        n_batches=5,
        initial_schema=REPOS_SCHEMA_V1,
        base_df=spark.read.parquet(os.path.join(fx, "base_repos.parquet")),
        n_buckets=8,
        wire_format="pg_json",
    )
    totals = eng.run()
    assert totals["events"] > 0
    got = (
        eng.final_state().toPandas().sort_values(["repo", "path"]).reset_index(drop=True)
    )
    want = fold_final_state(fx).sort_values(["repo", "path"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(got[want.columns.tolist()], want)
