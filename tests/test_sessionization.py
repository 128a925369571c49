"""Gap-based sessionization + streaming-vs-batch rollup parity.

Reference semantics anchor: the connector guarantees the same event set
whether polled live or replayed (SpannerStreamingChangeEventSource);
events_hourly_stream surfaces that as streaming/batch agg equality.
"""

import pandas as pd

from debezium_connector_spanner_spark.plans.analytics_queries import (
    q_events_hourly,
    q_events_hourly_stream,
    q_events_sessions,
)

SF_DIR = "/root/testdata/sf0.001"
GAP_US = 30 * 60 * 1_000_000


def test_sessions_match_pandas_recompute(spark):
    got = (
        q_events_sessions(spark, SF_DIR)
        .toPandas()
        .sort_values(["user_id", "session_id"])
        .reset_index(drop=True)
    )
    ev = pd.read_parquet(SF_DIR + "/events.parquet")[["user_id", "ts", "value"]]
    ev["ts_us"] = ev["ts"].astype("int64")
    ev = ev.sort_values(["user_id", "ts_us"], kind="mergesort")
    new = (ev.groupby("user_id")["ts_us"].diff().fillna(GAP_US + 1) > GAP_US).astype(
        "int64"
    )
    ev["session_id"] = new.groupby(ev["user_id"]).cumsum()
    ev["value_e6"] = (ev["value"] * 1_000_000).round().astype("int64")
    want = (
        ev.groupby(["user_id", "session_id"])
        .agg(
            session_start_us=("ts_us", "min"),
            session_end_us=("ts_us", "max"),
            n_events=("ts_us", "size"),
            sum_value_e6=("value_e6", "sum"),
        )
        .reset_index()
        .sort_values(["user_id", "session_id"])
        .reset_index(drop=True)
    )
    assert len(got) == len(want)
    cols = list(want.columns)
    pd.testing.assert_frame_equal(
        got[cols], want[cols], check_dtype=False, check_like=True
    )
    # invariants: sessions don't overlap and inter-session gaps exceed GAP
    for _, g in got.groupby("user_id"):
        g = g.sort_values("session_id")
        prev_end = None
        for _, r in g.iterrows():
            assert r.session_start_us <= r.session_end_us
            if prev_end is not None:
                assert r.session_start_us - prev_end > GAP_US
            prev_end = r.session_end_us


def test_streaming_hourly_equals_batch(spark):
    stream = (
        q_events_hourly_stream(spark, SF_DIR)
        .toPandas()
        .sort_values(["hour_us", "event_type"])
        .reset_index(drop=True)
    )
    batch = (
        q_events_hourly(spark, SF_DIR)
        .toPandas()
        .sort_values(["hour_us", "event_type"])
        .reset_index(drop=True)
    )
    cols = ["hour_us", "event_type", "n_events", "sum_value_e6"]
    pd.testing.assert_frame_equal(stream[cols], batch[cols], check_dtype=False)
