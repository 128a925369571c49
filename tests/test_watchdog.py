"""O7/O8 watchdog actions (PartitionQueryingMonitor.java:33-120,
FinishPartitionWatchDog): a READY partition that never emits anything is
flagged stuck; 'requery' holds its offset (re-scans the window) then
escalate-advances so the run stays bounded; 'fail' raises.
"""

import json
import os

import pandas as pd
import pytest

from debezium_connector_spanner_spark.sources.event_schema import (
    EVENT_LOG_SCHEMA,
    INITIAL_PARTITION_TOKEN,
    REPOS_SCHEMA_V1,
)
from debezium_connector_spanner_spark.streaming.engine import CdcReplayEngine

US = 1_000_000


def _write_quiet_fixture(spark, root: str) -> str:
    """Parent0 announces child 't-quiet' and ends; t-quiet never emits."""
    rows = []

    def ev(**kw):
        base = {c: None for c in EVENT_LOG_SCHEMA.fieldNames()}
        base.update(kw)
        rows.append(base)

    ev(
        record_type="data_change",
        partition_token=INITIAL_PARTITION_TOKEN,
        commit_ts=1 * US,
        record_sequence="1",
        server_txn_id="x1",
        table_name="repos",
        column_types=REPOS_SCHEMA_V1.column_types_json(),
        mods=[
            {
                "keys": json.dumps({"repo": "r", "path": "p"}),
                "new_values": json.dumps({"commit": "c0", "lang": "go", "content": "b"}),
                "old_values": None,
            }
        ],
        mod_type="INSERT",
        value_capture_type="OLD_AND_NEW_VALUES",
    )
    ev(
        record_type="child_partitions",
        partition_token=INITIAL_PARTITION_TOKEN,
        commit_ts=2 * US,
        record_sequence="2",
        child_partitions=[
            {"token": "t-quiet", "parent_partition_tokens": [INITIAL_PARTITION_TOKEN]}
        ],
    )
    ev(
        record_type="partition_end",
        partition_token=INITIAL_PARTITION_TOKEN,
        commit_ts=3 * US,
        record_sequence="3",
    )
    pdf = pd.DataFrame(rows)
    pdf["commit_ts"] = pd.to_datetime(pdf["commit_ts"], unit="us")
    df = spark.createDataFrame(pdf, EVENT_LOG_SCHEMA)
    out = os.path.join(root, "events")
    df.write.partitionBy("partition_token").parquet(out)
    return root


def _engine(spark, fx, tmp_root, tag, **kw):
    return CdcReplayEngine(
        spark,
        fx,
        os.path.join(tmp_root, f"t-{tag}"),
        os.path.join(tmp_root, f"c-{tag}"),
        start_us=0,
        end_us=100 * US,
        n_batches=kw.pop("n_batches", 4),
        initial_schema=REPOS_SCHEMA_V1,
        n_buckets=2,
        **kw,
    )


def test_requery_holds_then_escalates(spark, tmp_root):
    fx = _write_quiet_fixture(spark, os.path.join(tmp_root, "fx"))
    eng = _engine(spark, fx, tmp_root, "rq", stuck_policy="requery")
    eng.run()  # must terminate (escalate-advance bounds the drain loop)
    ms = eng.metrics()
    stuck = [m for m in ms if "t-quiet" in m.get("stuck_tokens", [])]
    requeried = [m for m in ms if "t-quiet" in m.get("requeried_tokens", [])]
    assert stuck and requeried, "watchdog never flagged/re-queried the quiet token"
    # while held, the low watermark must not advance past the stuck
    # token's held offset (it lags the batch end)
    held = requeried[0]
    assert held["watermark_us"] < held["batch_end_us"]
    assert eng.final_state().count() == 1  # Parent0's row landed
    # the meter surface (M3) mirrors the watchdog activity
    assert eng.meter.stuck_heartbeat_intervals >= len(stuck)
    assert eng.meter.requeried_tokens_total >= len(requeried)
    assert eng.meter.error_count == 0  # requery is recovery, not an error


def test_fail_policy_raises(spark, tmp_root):
    # enough scheduled batches for the stale counter to reach the 2x
    # escalation threshold while the stream is still mid-window
    fx = _write_quiet_fixture(spark, os.path.join(tmp_root, "fx"))
    eng = _engine(spark, fx, tmp_root, "fl", stuck_policy="fail", n_batches=10)
    with pytest.raises(RuntimeError, match="stuck partitions"):
        eng.run()
    assert eng.meter.error_count == 1  # the watchdog escalation is counted
