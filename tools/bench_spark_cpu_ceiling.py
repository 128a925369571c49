"""Measure the host's SPARK-JVM pure-CPU scaling ceiling.

Runs an embarrassingly parallel, shuffle-free, IO-free, Python-free
codegen'd aggregation (range -> xxhash64 -> max) at several local[N]
levels, each in a fresh JVM. This bounds what ANY Spark job can show for
N->4N scaling on this host (one JVM, shared memory bus, SMT, vCPU steal):
the CDC job's measured efficiency should be read against THIS ceiling,
not against an ideal 1.0 — a real N-executor vs 4N-executor cluster has
4x the memory bandwidth and 4x the JVM heaps, which a single sandbox VM
cannot emulate.

Usage: python tools/bench_spark_cpu_ceiling.py [levels...] (default 4 8 16 32)
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

ROWS = 8_000_000_000

CHILD = """
import sys, time
sys.path.insert(0, {repo!r})
from debezium_connector_spanner_spark.session import get_spark
from pyspark.sql import functions as F
spark = get_spark(master='local[{par}]', shuffle_partitions={par})
spark.range(100_000_000, numPartitions={par} * 4).select(
    F.max(F.xxhash64('id'))).collect()  # warm JIT/codegen
t0 = time.monotonic()
spark.range({rows}, numPartitions={par} * 8).select(
    F.max(F.xxhash64(F.col('id'), F.col('id') + 1, F.col('id') * 3))).collect()
print('T', time.monotonic() - t0)
"""


def measure(par: int) -> float:
    code = CHILD.format(repo=REPO, par=par, rows=ROWS)
    out = subprocess.run(
        [sys.executable, "-c", code], capture_output=True, text=True, timeout=900
    )
    for line in out.stdout.splitlines():
        if line.startswith("T "):
            return float(line.split()[1])
    raise RuntimeError(f"no result at local[{par}]: {out.stderr[-800:]}")


def main() -> None:
    # levels on argv; optional reps via CEILING_REPS (best-of, matching the
    # best-of policy of bench_scaling.py on this ±30%-variance host)
    levels = [int(a) for a in sys.argv[1:]] or [4, 8, 16, 32]
    reps = int(os.environ.get("CEILING_REPS", "1"))
    wall = {}
    for _ in range(reps):
        for par in levels:
            t = measure(par)
            wall[par] = min(wall.get(par, t), t)
            print(f"local[{par}] {t:.2f}s  ({ROWS/t/1e6:.0f}M rows/s)")
    pairs = {}
    for n in levels:
        if 4 * n in wall:
            pairs[f"{n}->{4*n}"] = round(wall[n] / (4 * wall[4 * n]), 3)
            print(f"spark-cpu ceiling {n}->{4*n}: {pairs[f'{n}->{4*n}']}")
    print(json.dumps({"wall_s": wall, "ceiling": pairs}))


if __name__ == "__main__":
    main()
