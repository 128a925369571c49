"""M1-M3 metrics depth: counters, queue gauges, quantile sketches.

Reference parity (/root/reference):
- metrics/SpannerMeter.java:298-384 — the JMX field list: latency
  Statistics, error count, detected partitions, queries
  issued/active, stuck heartbeat intervals, event-queue total/remaining
  capacity.
- metrics/latency/QuantileMeter.java:30-60 — DDSketch quantiles at
  {0.5, 0.95, 0.99}, optional clear-interval expiry, reset-on-demand,
  None when empty.
- metrics/SpannerStreamingChangeEventSourceMetrics.java — the bean
  surface; here the snapshot() dict IS the surface, emitted into the
  metrics jsonl per batch and summarized by
  CdcReplayEngine.metrics_summary().

``QuantileSketch`` is a from-scratch DDSketch-style sketch (log-spaced
buckets with fixed relative accuracy; published algorithm — Masson,
Rim & Lee, "DDSketch: A Fast and Fully-Mergeable Quantile Sketch with
Relative-Error Guarantees", VLDB 2019): O(1) insert, bounded memory,
mergeable, guaranteed |q_est - q_true| <= alpha * q_true. The driver
observes only per-batch scalars (bounded work), so the sketch is
driver-side state — no Spark job carries it.
"""

from __future__ import annotations

import math
import time

QUANTILES = (0.5, 0.95, 0.99)


class QuantileSketch:
    """DDSketch-style relative-error quantile sketch.

    Values are binned at index ceil(log_gamma(v)) with
    gamma = (1+alpha)/(1-alpha); any value in a bucket is within alpha
    relative error of the bucket's representative 2*gamma^i/(gamma+1).
    Non-positive values land in a dedicated zero bucket (latencies are
    >= 0 here; DDSketch's negative store is not needed).

    ``clear_interval_s`` mirrors QuantileMeter's TimeoutMeter: the
    sketch self-expires that long after its first post-clear insert, so
    long-running engines report recent-window quantiles, not
    since-forever ones.
    """

    def __init__(
        self,
        alpha: float = 0.01,
        clear_interval_s: float | None = None,
        _clock=time.monotonic,
    ):
        if not 0 < alpha < 1:
            raise ValueError("alpha must be in (0, 1)")
        self.alpha = alpha
        self._gamma = (1 + alpha) / (1 - alpha)
        self._log_gamma = math.log(self._gamma)
        self._clear_interval_s = clear_interval_s
        self._clock = _clock
        self._buckets: dict[int, int] = {}
        self._zero = 0
        self._count = 0
        self._deadline: float | None = None

    # ---------------------------------------------------------- inserts
    def add(self, value: float) -> None:
        if self._clear_interval_s is not None:
            now = self._clock()
            if self._deadline is not None and now >= self._deadline:
                self.reset()
            if self._deadline is None:
                self._deadline = now + self._clear_interval_s
        if value <= 0:
            self._zero += 1
        else:
            i = math.ceil(math.log(value) / self._log_gamma)
            self._buckets[i] = self._buckets.get(i, 0) + 1
        self._count += 1

    # ----------------------------------------------------------- reads
    @property
    def count(self) -> int:
        return self._count

    def value_at(self, q: float) -> float | None:
        """Value at quantile q, or None when empty (QuantileMeter
        returns null for an empty sketch)."""
        if self._count == 0:
            return None
        rank = q * (self._count - 1)
        seen = self._zero
        if rank < seen or not self._buckets:
            return 0.0
        for i in sorted(self._buckets):
            seen += self._buckets[i]
            if rank < seen:
                return 2 * self._gamma**i / (self._gamma + 1)
        i = max(self._buckets)
        return 2 * self._gamma**i / (self._gamma + 1)

    def values_at_quantiles(self, qs=QUANTILES) -> list[float | None]:
        return [self.value_at(q) for q in qs]

    def reset(self) -> None:
        self._buckets.clear()
        self._zero = 0
        self._count = 0
        self._deadline = None

    def merge(self, other: "QuantileSketch") -> None:
        if other._gamma != self._gamma:
            raise ValueError("cannot merge sketches with different alpha")
        for i, c in other._buckets.items():
            self._buckets[i] = self._buckets.get(i, 0) + c
        self._zero += other._zero
        self._count += other._count


class EngineMeter:
    """The SpannerMeter counter/gauge/sketch surface for the Spark
    engine. One instance per engine; snapshot() is the JMX-bean
    analogue and rides the per-batch metrics jsonl."""

    #: SpannerMeter.java:298-384 getters -> snapshot keys
    FIELDS = (
        "error_count",
        "detected_partition_count",
        "queries_issued_total",
        "active_queries",
        "stuck_heartbeat_intervals",
        "schema_retries_total",
        "requeried_tokens_total",
        "event_queue_total_capacity",
        "event_queue_remaining_capacity",
        "maintenance_queue_remaining_capacity",
        "batch_wall_quantiles_s",
        "watermark_lag_quantiles_s",
        "delay_change_stream_events_s",
    )

    def __init__(self, clear_interval_s: float | None = None):
        self.error_count = 0
        self.detected_partition_count = 0
        self.queries_issued_total = 0
        self.active_queries = 0
        self.stuck_heartbeat_intervals = 0
        self.schema_retries_total = 0
        self.requeried_tokens_total = 0
        # queue-capacity analogue: the micro-batch admission budget.
        # total = max_events_per_batch (None -> unbounded), remaining =
        # budget minus the events the last sized window actually carried
        self.event_queue_total_capacity: int | None = None
        self.event_queue_remaining_capacity: int | None = None
        # maintenance lane: 1-slot async-compaction queue per table
        self.maintenance_queue_remaining_capacity: int | None = None
        self.batch_wall_s = QuantileSketch(clear_interval_s=clear_interval_s)
        self.watermark_lag_s = QuantileSketch(clear_interval_s=clear_interval_s)
        # SpannerMeter.getDelayChangeStreamEvents: commit-to-observe delay
        self.delay_change_stream_events_s = QuantileSketch(
            clear_interval_s=clear_interval_s
        )

    # ------------------------------------------------------ increments
    def on_error(self) -> None:
        self.error_count += 1

    def on_query(self) -> None:
        self.queries_issued_total += 1
        self.active_queries += 1

    def on_query_done(self) -> None:
        self.active_queries = max(0, self.active_queries - 1)

    def snapshot(self, reset_sketches: bool = False) -> dict:
        """One flat dict per the FIELDS list. ``reset_sketches=True`` is
        QuantileMeter.reset()'s read-and-clear usage."""
        out = {
            "error_count": self.error_count,
            "detected_partition_count": self.detected_partition_count,
            "queries_issued_total": self.queries_issued_total,
            "active_queries": self.active_queries,
            "stuck_heartbeat_intervals": self.stuck_heartbeat_intervals,
            "schema_retries_total": self.schema_retries_total,
            "requeried_tokens_total": self.requeried_tokens_total,
            "event_queue_total_capacity": self.event_queue_total_capacity,
            "event_queue_remaining_capacity": self.event_queue_remaining_capacity,
            "maintenance_queue_remaining_capacity": (
                self.maintenance_queue_remaining_capacity
            ),
            "batch_wall_quantiles_s": self.batch_wall_s.values_at_quantiles(),
            "watermark_lag_quantiles_s": self.watermark_lag_s.values_at_quantiles(),
            "delay_change_stream_events_s": (
                self.delay_change_stream_events_s.values_at_quantiles()
            ),
        }
        if reset_sketches:
            self.batch_wall_s.reset()
            self.watermark_lag_s.reset()
            self.delay_change_stream_events_s.reset()
        return out
