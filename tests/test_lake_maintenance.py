"""Lake/engine maintenance semantics:

- compact_apply must REFUSE to rebase a prepared compaction over a base
  rewrite that committed after the prepare snapshot (silent-data-loss
  guard; the async lane's single-writer precondition made detectable)
- rate-model batch sizing (K3): after the cold-start probe, windows are
  sized from the observed events/µs rate with zero extra Spark jobs, and
  the replay still matches the oracle exactly
"""

import json
import os

import pandas as pd
import pytest

from debezium_connector_spanner_spark.fixtures.generator import (
    EPOCH_MICROS,
    GeneratorConfig,
    write_fixture,
)
from debezium_connector_spanner_spark.fixtures.oracle import fold_final_state
from debezium_connector_spanner_spark.operators.decode import decode_mods
from debezium_connector_spanner_spark.operators.merge import fold_changes, merge_into
from debezium_connector_spanner_spark.sources.event_schema import (
    EVENT_LOG_SCHEMA,
    REPOS_SCHEMA_V1,
)
from debezium_connector_spanner_spark.sources.lake import LakeTable
from debezium_connector_spanner_spark.streaming.engine import CdcReplayEngine


def _event(token, ts_us, rs, txn, mods, mod_type="UPDATE"):
    return {
        "record_type": "data_change",
        "partition_token": token,
        "commit_ts": ts_us,
        "record_sequence": rs,
        "server_txn_id": txn,
        "is_last_in_txn_in_partition": True,
        "table_name": "repos",
        "column_types": REPOS_SCHEMA_V1.column_types_json(),
        "mods": mods,
        "mod_type": mod_type,
        "value_capture_type": "OLD_AND_NEW_VALUES",
        "number_of_records_in_transaction": 1,
        "number_of_partitions_in_transaction": 1,
        "transaction_tag": "",
        "is_system_transaction": False,
        "child_partitions": None,
    }


def _mod(key, new):
    return {
        "keys": json.dumps(key, sort_keys=True),
        "new_values": json.dumps(new, sort_keys=True),
        "old_values": None,
    }


def _folded_batch(spark, ts_us, commit):
    rows = [
        _event(
            "t",
            ts_us,
            "1",
            f"x{ts_us}",
            [_mod({"repo": "r1", "path": "p1"}, {"commit": commit, "lang": "go", "content": "c"})],
            "INSERT",
        )
    ]
    pdf = pd.DataFrame(rows)
    pdf["commit_ts"] = pd.to_datetime(pdf["commit_ts"], unit="us")
    decoded = decode_mods(spark.createDataFrame(pdf, EVENT_LOG_SCHEMA), REPOS_SCHEMA_V1)
    return fold_changes(decoded, ["repo", "path"], ["commit", "lang", "content"])


def test_compact_apply_guards_newer_base(spark, tmp_root):
    t = LakeTable.create(
        spark, os.path.join(tmp_root, "tbl"), REPOS_SCHEMA_V1.spark_struct(), ["repo", "path"], 1
    )
    schema = REPOS_SCHEMA_V1.spark_struct()
    merge_into(t, _folded_batch(spark, 1_000, "a"), target_schema=schema, mode="mor")
    merge_into(t, _folded_batch(spark, 2_000, "b"), target_schema=schema, mode="mor")
    prep = t.compact_prepare(t.current_snapshot_id())
    assert prep is not None
    # a base rewrite lands between prepare and apply (violates the async
    # lane's precondition): apply must raise, not silently drop it
    merge_into(t, _folded_batch(spark, 3_000, "c"), target_schema=schema, mode="cow")
    with pytest.raises(RuntimeError, match="compact_apply"):
        t.compact_apply(prep)
    # state is untouched by the refused apply and newest write survives
    assert t.read().collect()[0]["commit"] == "c"
    # delta-only commits after prepare remain rebase-able (normal MOR path)
    merge_into(t, _folded_batch(spark, 4_000, "d"), target_schema=schema, mode="mor")
    prep2 = t.compact_prepare(t.current_snapshot_id())
    merge_into(t, _folded_batch(spark, 5_000, "e"), target_schema=schema, mode="mor")
    t.compact_apply(prep2)
    assert t.read().collect()[0]["commit"] == "e"


def test_rate_sized_batches_match_oracle(spark, tmp_root):
    cfg = GeneratorConfig(n_repos=8, paths_per_repo=5, hot_repos=2, events_per_key_mean=4)
    fx = os.path.join(tmp_root, "fx")
    m = write_fixture(fx, cfg)
    base = spark.read.parquet(os.path.join(fx, "base_repos.parquet"))
    cap = max(50, m["events"] // 12)
    eng = CdcReplayEngine(
        spark,
        fx,
        os.path.join(tmp_root, "tbl"),
        os.path.join(tmp_root, "ckpt"),
        start_us=EPOCH_MICROS,
        end_us=EPOCH_MICROS + cfg.duration_s * 1_000_000,
        n_batches=2,  # coarse boundaries: sizing must subdivide them
        initial_schema=REPOS_SCHEMA_V1,
        base_df=base,
        n_buckets=8,
        max_events_per_batch=cap,
    )
    totals = eng.run()
    assert totals["events"] == m["events"]
    # the cap subdivided the 2 scheduled boundaries into more windows
    assert totals["batches"] > 2
    # once calibrated (2 observed batches; traffic at this tiny scale is
    # bursty while child partitions open) windows stay near the cap
    sized = [x["events"] for x in eng.metrics() if x["events"]]
    assert max(sized[2:], default=0) <= 4 * cap
    # rate survives the checkpoint -> a resumed engine skips cold start
    eng2 = CdcReplayEngine(
        spark,
        fx,
        os.path.join(tmp_root, "tbl"),
        os.path.join(tmp_root, "ckpt"),
        start_us=EPOCH_MICROS,
        end_us=EPOCH_MICROS + cfg.duration_s * 1_000_000,
        n_batches=2,
        initial_schema=REPOS_SCHEMA_V1,
        max_events_per_batch=cap,
    )
    assert eng2._rate_ev_per_us is not None
    got = (
        eng.final_state().toPandas().sort_values(["repo", "path"]).reset_index(drop=True)
    )
    want = fold_final_state(fx).sort_values(["repo", "path"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(got[want.columns.tolist()], want)
