"""Streaming stuck-partition monitor (O8 in its Structured-Streaming shape).

The replay engine detects stuck partitions inside its batch loop
(engine.py stuck_policy); this module is the same semantics as an
always-on `applyInPandasWithState` operator over the event stream —
the shape a 1000-executor deployment would run next to the ingest tail.

Per partition_token the state holds (last event-time seen, total events).
Liveness is judged in EVENT time against the stream's watermark, so the
detector is deterministic and replayable (no wall clock):

- every trigger in which a token receives records emits a `progress` row
  and re-arms an event-time timeout at last_seen + threshold;
- if the watermark passes that deadline with no new records, Spark fires
  the timeout for the (now input-less) group and the monitor emits a
  `stuck` row — exactly the reference's missed-heartbeat escalation
  (/root/reference task/MonitorPartitionsWithoutRecordsTask,
  BaseSpannerConnectorConfig.java:313-321 max.missed.heartbeats: a
  partition is stuck when heartbeat-quiet for N intervals).

State is O(active tokens) per executor — partition-token cardinality,
not key cardinality — and each group's pandas batch is one token's
records for one trigger, so the operator holds at 10^5 tokens/executor.

Scale note: the groupBy(partition_token) shuffle is the SAME key the
log is already partitioned by, so with a co-partitioned source this is
a local exchange; the alert stream is a trickle (one row per token per
trigger at most).
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = (
    "partition_token string, status string, last_seen_us long, "
    "n_events long, deadline_us long"
)
STATE_SCHEMA = "last_seen_us long, n_events long"


def _monitor_fn(threshold_us: int):
    def fn(
        key: tuple,
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        token = key[0]
        if state.hasTimedOut:
            last_seen, n = state.get
            # one alert, then drop the state: a token silent past its
            # deadline stays silent until new records re-create it
            # (mirrors the engine's escalate-once bound)
            state.remove()
            yield pd.DataFrame(
                {
                    "partition_token": [token],
                    "status": ["stuck"],
                    "last_seen_us": [last_seen],
                    "n_events": [n],
                    "deadline_us": [last_seen + threshold_us],
                }
            )
            return
        last_seen, n = state.get if state.exists else (0, 0)
        for pdf in pdfs:
            if len(pdf):
                n += len(pdf)
                last_seen = max(last_seen, int(pdf["ts_us"].max()))
        state.update((last_seen, n))
        deadline = last_seen + threshold_us
        state.setTimeoutTimestamp(deadline // 1000)  # ms epoch
        yield pd.DataFrame(
            {
                "partition_token": [token],
                "status": ["progress"],
                "last_seen_us": [last_seen],
                "n_events": [n],
                "deadline_us": [deadline],
            }
        )

    return fn


def monitor_stream(
    events: DataFrame,
    threshold_us: int,
    watermark_delay: str = "0 seconds",
) -> DataFrame:
    """Attach the stuck monitor to a STREAMING events DataFrame
    (EVENT_LOG_SCHEMA). Returns the alert/progress stream."""
    return (
        events.select(
            "partition_token",
            F.col("commit_ts").alias("event_time"),
            F.unix_micros("commit_ts").alias("ts_us"),
        )
        .withWatermark("event_time", watermark_delay)
        .groupBy("partition_token")
        .applyInPandasWithState(
            _monitor_fn(threshold_us),
            OUTPUT_SCHEMA,
            STATE_SCHEMA,
            "append",
            GroupStateTimeout.EventTimeTimeout,
        )
    )
