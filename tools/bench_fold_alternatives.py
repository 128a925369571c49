"""LWW-fold strategy microbench: max-of-struct agg vs window functions.

The engine's fold (operators/merge.py:_fold) aggregates
``max(struct(seq, value))`` per column — column-level last-writer-wins
with a delete barrier. Struct-typed max has no mutable hash-agg buffer in
Spark, so the plan is SortAggregate (an extra per-partition sort in the
hottest operator). This tool measures whether the obvious alternative —
window functions over a seq-ordered partition — would be faster:

  A. current agg fold: ONE shuffle, SortAggregate (spill-safe),
     map-side partial aggregation shrinks the shuffle.
  B. window fold: ONE shuffle + in-partition sort, then per column
     ``last(value, ignorenulls) OVER (... ROWS UNBOUNDED)`` on rows where
     the column was written, plus max(delete seq) — but NO partial
     aggregation (every event row crosses the shuffle) and the full
     window frame materializes per key.

A hash-aggregate variant is structurally unavailable: per-column winners
carry arbitrary-width values (strings), which cannot live in the
fixed-size unsafe-row hash buffer; packing only the seq into a numeric
and joining back would need one join per column (column-level LWW), i.e.
strictly more shuffles.

Usage: python tools/bench_fold_alternatives.py [reps]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from bench import bench_fixture_config
from debezium_connector_spanner_spark.fixtures.generator import write_fixture
from debezium_connector_spanner_spark.operators.decode import decode_mods
from debezium_connector_spanner_spark.operators.merge import fold_changes
from debezium_connector_spanner_spark.session import get_spark
from debezium_connector_spanner_spark.sources.event_schema import (
    EVENT_LOG_SCHEMA,
    REPOS_SCHEMA_V1,
)

KEYS = ["repo", "path"]
VALS = ["commit", "lang", "content"]


def window_fold(decoded: DataFrame) -> DataFrame:
    """Window-function equivalent of _fold (row- and column-level LWW)."""
    w = Window.partitionBy(*KEYS).orderBy("seq").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    cols = [F.col(c) for c in KEYS]
    seln = [
        F.max(F.struct("seq", "op")).over(w).alias("_last"),
        F.max(F.when(F.col("op") == "d", F.col("seq"))).over(w).alias("_del"),
    ]
    for c in VALS:
        seln.append(
            F.max(
                F.when(
                    F.col(f"wrt.{c}"),
                    F.struct(F.col("seq").alias("s"), F.col(f"vals.{c}").alias("v")),
                )
            )
            .over(w)
            .alias(f"_m_{c}")
        )
    ranked = decoded.select(
        *cols,
        F.row_number()
        .over(Window.partitionBy(*KEYS).orderBy(F.col("seq").desc()))
        .alias("_rn"),
        *seln,
    ).where(F.col("_rn") == 1)
    out = [F.col(c) for c in KEYS]
    for c in VALS:
        survives = F.col(f"_m_{c}").isNotNull() & (
            F.col("_del").isNull() | (F.col(f"_m_{c}.s") > F.col("_del"))
        )
        out.append(F.when(survives, F.col(f"_m_{c}.v")).alias(c))
    out.append((F.col("_last.op") == "d").alias("_is_delete"))
    return ranked.select(*out)


def main() -> None:
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    fx = os.environ.get("BENCH_FIXTURE")
    if not fx:
        from debezium_connector_spanner_spark.fixtures.generator import FIXTURE_ROOT

        fx = os.path.join(FIXTURE_ROOT, "bench-sf0.1")
        write_fixture(fx, bench_fixture_config(0.1))
    spark = get_spark(master="local[32]", shuffle_partitions=32)
    ev = (
        spark.read.schema(EVENT_LOG_SCHEMA)
        .parquet(os.path.join(fx, "events"))
        .where(F.col("table_name") == "repos")
    )
    decoded = decode_mods(ev, REPOS_SCHEMA_V1)

    variants = {
        "agg_fold(SortAggregate)": lambda: fold_changes(decoded, KEYS, VALS, n_buckets=64),
        "window_fold": lambda: window_fold(decoded),
    }
    # correctness cross-check before timing (row count + surviving rows)
    na = variants["agg_fold(SortAggregate)"]().count()
    nb = variants["window_fold"]().count()
    assert na == nb, (na, nb)
    print(f"keys folded: {na}")
    for name, make in variants.items():
        times = []
        for _ in range(reps):
            t0 = time.monotonic()
            make().write.format("noop").mode("overwrite").save()
            times.append(time.monotonic() - t0)
        print(f"{name:28s} best={min(times):.2f}s all={[round(t,2) for t in times]}")


if __name__ == "__main__":
    main()
