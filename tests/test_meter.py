"""M1-M3 metrics depth (SpannerMeter.java:298-384 field list,
QuantileMeter.java:30-60 sketch semantics).

- QuantileSketch: DDSketch-style relative-error guarantee against exact
  quantiles, None-when-empty, reset-on-read, clear-interval expiry,
  mergeability.
- EngineMeter end-to-end: every FIELDS key rides each metrics jsonl
  line and metrics_summary(); deterministic counters match the run.
"""

import json
import os
import random

from debezium_connector_spanner_spark.fixtures.generator import (
    EPOCH_MICROS,
    GeneratorConfig,
    write_fixture,
)
from debezium_connector_spanner_spark.sources.event_schema import REPOS_SCHEMA_V1
from debezium_connector_spanner_spark.streaming.engine import CdcReplayEngine
from debezium_connector_spanner_spark.streaming.meter import (
    EngineMeter,
    QuantileSketch,
)


def test_sketch_relative_error_guarantee():
    rng = random.Random(7)
    for dist in (
        lambda: rng.lognormvariate(0, 2),
        lambda: rng.uniform(0.001, 1000),
        lambda: rng.expovariate(0.1),
    ):
        alpha = 0.01
        sk = QuantileSketch(alpha=alpha)
        vals = [dist() for _ in range(5000)]
        for v in vals:
            sk.add(v)
        svals = sorted(vals)
        for q in (0.5, 0.95, 0.99):
            exact = svals[int(q * (len(svals) - 1))]
            est = sk.value_at(q)
            assert abs(est - exact) <= alpha * exact + 1e-12, (q, est, exact)


def test_sketch_empty_and_zero_handling():
    sk = QuantileSketch()
    assert sk.value_at(0.5) is None  # QuantileMeter returns null if empty
    assert sk.values_at_quantiles() == [None, None, None]
    sk.add(0.0)
    sk.add(0.0)
    for _ in range(8):
        sk.add(10.0)
    assert sk.value_at(0.1) == 0.0  # zero bucket serves the low ranks
    assert abs(sk.value_at(0.99) - 10.0) <= 0.01 * 10.0


def test_sketch_reset_on_read_and_merge():
    m = EngineMeter()
    for v in (1.0, 2.0, 3.0):
        m.batch_wall_s.add(v)
    snap = m.snapshot(reset_sketches=True)
    assert snap["batch_wall_quantiles_s"][0] is not None
    assert m.batch_wall_s.count == 0  # read-and-clear (QuantileMeter.reset)
    assert m.snapshot()["batch_wall_quantiles_s"] == [None, None, None]

    a, b = QuantileSketch(), QuantileSketch()
    for v in (1, 2, 3, 4):
        a.add(v)
    for v in (100, 200):
        b.add(v)
    a.merge(b)
    assert a.count == 6
    assert a.value_at(0.99) >= 99  # merged tail visible


def test_sketch_clear_interval_expiry():
    t = [0.0]
    sk = QuantileSketch(clear_interval_s=10.0, _clock=lambda: t[0])
    sk.add(5.0)
    t[0] = 9.0
    sk.add(6.0)
    assert sk.count == 2
    t[0] = 11.0  # past the window: sketch self-expires, new window opens
    sk.add(7.0)
    assert sk.count == 1


def test_engine_meter_surface_end_to_end(spark, tmp_root):
    cfg = GeneratorConfig(
        n_repos=6, paths_per_repo=3, hot_repos=1, events_per_key_mean=3
    )
    fx = os.path.join(tmp_root, "fx")
    write_fixture(fx, cfg)
    eng = CdcReplayEngine(
        spark,
        fx,
        os.path.join(tmp_root, "t"),
        os.path.join(tmp_root, "c"),
        start_us=EPOCH_MICROS,
        end_us=EPOCH_MICROS + cfg.duration_s * 1_000_000,
        n_batches=4,
        initial_schema=REPOS_SCHEMA_V1,
        base_df=spark.read.parquet(os.path.join(fx, "base_repos.parquet")),
        n_buckets=8,
        max_events_per_batch=1_000_000,
    )
    eng.run()

    # every jsonl line carries the full field set
    with open(eng.metrics_path) as f:
        lines = [json.loads(l) for l in f if l.strip()]
    assert lines
    for line in lines:
        assert set(EngineMeter.FIELDS) <= set(line["meter"])

    summ = eng.metrics_summary()
    meter = summ["meter"]
    assert set(EngineMeter.FIELDS) <= set(meter)
    # deterministic counters: one change-stream query per batch that had
    # active tokens; nothing failed, nothing stuck, nothing retried
    batches_with_scan = sum(1 for l in lines if l["active_tokens"] > 0)
    assert meter["queries_issued_total"] == batches_with_scan
    assert meter["active_queries"] == 0
    assert meter["error_count"] == 0
    assert meter["schema_retries_total"] == 0
    assert meter["requeried_tokens_total"] == 0
    # the child partitions the fixture's DAG announced were all detected
    assert meter["detected_partition_count"] == sum(
        len(l["new_tokens"]) for l in lines
    )
    # queue gauges reflect the admission budget
    assert meter["event_queue_total_capacity"] == 1_000_000
    assert meter["event_queue_remaining_capacity"] <= 1_000_000
    # latency sketches populated (p50 <= p95 <= p99)
    p50, p95, p99 = meter["batch_wall_quantiles_s"]
    assert p50 is not None and p50 <= p95 <= p99
    assert meter["watermark_lag_quantiles_s"][0] is not None
    assert meter["delay_change_stream_events_s"][0] is not None
