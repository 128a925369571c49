"""C5 — task auto-scaler (reference parity: task/scaler/TaskScaleCalculator.java:20-47,
TaskScaler.java, TaskScalerUtil.java).

The reference grows the Kafka-Connect task count in +20% steps while the
partitions-per-task ratio exceeds the configured desire, and halves it when
the ratio is comfortably below desire AND more than half the tasks sit idle,
bounded by [tasks.min, tasks.max] (BaseSpannerConnectorConfig.java:510-536:
tasks.min=2, tasks.max=10, desired=2).

Spark analog: the "task count" is the per-batch *worker width* the engine
grants to variable-width work — concretely the salt spread of the hot-key
fold (operators/merge.py:fold_changes_salted), where each salt IS one
reducer working one shard of a mega-key. Fixed-width work (the fused fold)
is already sized by the sink's bucket count, and reducer counts for uniform
shuffles are AQE's job; the scaler owns the one knob Spark does not size
for us: how many ways to split a single hot key. Inputs mirror the
reference's: partitions_in_work = change-stream tokens currently active,
idling = granted workers beyond the active token count last batch.

The decision trace lands in each batch metric (``tasks``) so a replay shows
scale-out on DAG splits and scale-in as partitions finish — the same
observable the reference exports through TaskScaler's logging/JMX.
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field

SCALE_OUT_STEP = 0.2  # grow by ceil(20%) per iteration while overloaded
SCALE_IN_THRESHOLD = 0.5  # shrink to 50% when >50% of workers idle


def new_tasks_count(
    current: int,
    desired_partitions_per_task: int,
    tasks_max: int,
    tasks_min: int,
    partitions_in_work: int,
    idling: int,
) -> int:
    """Pure scaling decision, reference semantics.

    Scale OUT in +20% (ceil) steps while partitions/task > desired, capped
    at tasks_max. Scale IN to half (floored at tasks_min) only when the
    ratio is strictly below desired AND idling workers exceed half the
    fleet — the two-signal guard keeps the count from flapping on a
    single quiet batch.
    """
    n = min(max(current, tasks_min), tasks_max)
    while _ratio(n, partitions_in_work) > desired_partitions_per_task and n < tasks_max:
        n += min(math.ceil(n * SCALE_OUT_STEP), tasks_max - n)
    if (
        n > tasks_min
        and _ratio(n, partitions_in_work) < desired_partitions_per_task
        and idling > n * SCALE_IN_THRESHOLD
    ):
        n = max(int(n * SCALE_IN_THRESHOLD), tasks_min)
    return n


def _ratio(tasks: int, partitions_in_work: int) -> float:
    return 0.0 if tasks == 0 else partitions_in_work / tasks


@dataclass
class TaskScaler:
    """Stateful wrapper: one ``step`` per micro-batch.

    ``step(active_tokens)`` derives idling from its own previous grant
    (workers beyond the tokens that existed last batch had nothing to do)
    and returns the new width; ``history`` keeps the full decision trace
    for tests/metrics.
    """

    tasks_min: int = 2
    tasks_max: int = 32
    desired_partitions_per_task: int = 2
    current: int = 2
    _prev_active: int | None = None
    history: list[int] = field(default_factory=list)

    def __post_init__(self) -> None:
        self.current = min(max(self.current, self.tasks_min), self.tasks_max)

    def step(self, active_tokens: int) -> int:
        idling = max(
            0,
            self.current
            - (active_tokens if self._prev_active is None else self._prev_active),
        )
        self.current = new_tasks_count(
            self.current,
            self.desired_partitions_per_task,
            self.tasks_max,
            self.tasks_min,
            active_tokens,
            idling,
        )
        self._prev_active = active_tokens
        self.history.append(self.current)
        return self.current
