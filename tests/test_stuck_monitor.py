"""Streaming stuck-partition monitor (applyInPandasWithState, O8)."""

import os
import time

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from debezium_connector_spanner_spark.streaming.stuck_monitor import monitor_stream

EPOCH_US = 1_767_225_600_000_000  # 2026-01-01T00:00:00Z


def _write_log(root: str) -> None:
    """6 files, one per minute of event time; t-quiet only in the first.
    File names sort chronologically and mtimes increase so the file
    source's trigger order follows event time."""
    os.makedirs(root, exist_ok=True)
    for i in range(6):
        ts0 = EPOCH_US + i * 60_000_000
        rows = [("t-live", ts0 + k * 1_000_000) for k in range(10)]
        if i == 0:
            rows += [("t-quiet", ts0 + k * 1_000_000) for k in range(5)]
        tbl = pa.table(
            {
                "partition_token": pa.array([r[0] for r in rows]),
                "commit_ts": pa.array(
                    pd.to_datetime([r[1] for r in rows], unit="us", utc=True),
                    type=pa.timestamp("us", tz="UTC"),
                ),
            }
        )
        path = os.path.join(root, f"part-{i:02d}.parquet")
        pq.write_table(tbl, path)
        os.utime(path, (time.time() + i, time.time() + i))


def test_stuck_monitor_alerts_quiet_token(spark, tmp_root):
    log = os.path.join(tmp_root, "monlog")
    _write_log(log)
    src = (
        spark.readStream.schema("partition_token string, commit_ts timestamp")
        .option("maxFilesPerTrigger", 1)
        .parquet(log)
    )
    # threshold 90s: t-quiet (last event at +4s) must alert once the
    # watermark passes +94s; t-live's re-armed deadline is never passed
    out = monitor_stream(src, threshold_us=90_000_000)
    q = (
        out.writeStream.outputMode("append")
        .format("memory")
        .queryName("mon_out")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    rows = spark.sql("SELECT * FROM mon_out").collect()
    assert rows, "monitor emitted nothing"

    stuck = [r for r in rows if r["status"] == "stuck"]
    assert [r["partition_token"] for r in stuck] == ["t-quiet"]
    assert stuck[0]["n_events"] == 5
    assert stuck[0]["last_seen_us"] == EPOCH_US + 4_000_000
    assert stuck[0]["deadline_us"] == EPOCH_US + 94_000_000

    live = [r for r in rows if r["partition_token"] == "t-live"]
    assert all(r["status"] == "progress" for r in live)
    # per-token progress is monotone in event time and counts all records
    seen = [r["last_seen_us"] for r in live]
    assert seen == sorted(seen)
    assert max(r["n_events"] for r in live) == 60
    assert all(r["deadline_us"] == r["last_seen_us"] + 90_000_000 for r in rows)
