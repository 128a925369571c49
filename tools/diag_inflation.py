"""Controlled diagnosis of per-task time inflation at high parallelism.

Runs ONE representative decode+fold+write job (the CDC hot path) at a
given local[N], isolated from the engine loop, and reports wall,
sum(executorRunTime), sum(executorCpuTime) and JVM GC time — the numbers
that tell CPU starvation apart from GC stall apart from genuine work
inflation (memory bandwidth/cache contention).

Usage: python tools/diag_inflation.py N [heap] [extra_java_opts]
e.g.   python tools/diag_inflation.py 32 8g
       python tools/diag_inflation.py 32 16g "-XX:+UseParallelGC"
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from debezium_connector_spanner_spark.session import get_spark
from debezium_connector_spanner_spark.operators.decode import decode_mods
from debezium_connector_spanner_spark.operators.merge import fold_changes
from debezium_connector_spanner_spark.sources.event_schema import (
    EVENT_LOG_SCHEMA,
    REPOS_SCHEMA_V1,
)


def rest(spark, path):
    base = spark.sparkContext.uiWebUrl + "/api/v1/applications"
    apps = json.load(urllib.request.urlopen(base))
    return json.load(urllib.request.urlopen(f"{base}/{apps[0]['id']}{path}"))


def gc_ms(spark) -> int:
    return sum(e.get("totalGCTime", 0) for e in rest(spark, "/executors"))


def run_once(spark, events_path: str, out: str) -> float:
    ev = (
        spark.read.schema(EVENT_LOG_SCHEMA)
        .parquet(events_path)
        .where("record_type = 'data_change'")
    )
    decoded = decode_mods(ev, REPOS_SCHEMA_V1)
    folded = fold_changes(
        decoded,
        ["repo", "path"],
        ["commit", "lang", "content"],
        n_buckets=int(os.environ.get("DIAG_BUCKETS", "64")),
    )
    if os.path.exists(out):
        shutil.rmtree(out)
    t0 = time.monotonic()
    folded.write.mode("overwrite").parquet(out)
    return time.monotonic() - t0


def main():
    par = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    heap = sys.argv[2] if len(sys.argv) > 2 else "8g"
    jopts = sys.argv[3] if len(sys.argv) > 3 else ""
    os.environ["SPARK_DRIVER_MEMORY"] = heap
    extra = {"spark.ui.enabled": "true", "spark.ui.retainedStages": "5000"}
    if jopts:
        extra["spark.driver.extraJavaOptions"] = jopts
    if os.environ.get("DIAG_CONF"):  # e.g. '{"spark.sql.files.maxPartitionBytes":"2097152"}'
        extra.update(json.loads(os.environ["DIAG_CONF"]))
    spark = get_spark(
        master=f"local[{par}]", shuffle_partitions=max(8, par), extra_conf=extra
    )
    fx = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ".fixtures",
        "bench-sf0.1",
        "events",
    )
    out = f"/tmp/diag-fold-{par}"
    run_once(spark, fx, out)  # warm JIT/codegen
    stages0 = {s["stageId"] for s in rest(spark, "/stages")}
    g0 = gc_ms(spark)
    wall = run_once(spark, fx, out)
    g1 = gc_ms(spark)
    stages = [
        s
        for s in rest(spark, "/stages?status=COMPLETE")
        if s["stageId"] not in stages0
    ]
    run_s = sum(s["executorRunTime"] for s in stages) / 1000
    cpu_s = sum(s.get("executorCpuTime", 0) for s in stages) / 1e9
    print(
        json.dumps(
            {
                "par": par,
                "heap": heap,
                "java_opts": jopts,
                "wall_s": round(wall, 2),
                "sum_run_s": round(run_s, 1),
                "sum_cpu_s": round(cpu_s, 1),
                "gc_s": round((g1 - g0) / 1000, 1),
                "tasks": sum(s["numCompleteTasks"] for s in stages),
                "run_per_core_s": round(run_s / par, 2),
                "cpu_util_of_run": round(cpu_s / run_s, 2) if run_s else None,
            }
        )
    )


if __name__ == "__main__":
    main()
