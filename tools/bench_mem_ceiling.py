"""Measure the host's MEMORY-BANDWIDTH scaling ceiling.

The CDC replay is memory-bound, not register-bound: decode/fold/write
stream multi-GB of JSON strings and shuffle rows through the cache
hierarchy every batch. On a single box, aggregate DRAM bandwidth is
shared by all threads, so a memory-bound job's N->4N scaling is bounded
by how aggregate bandwidth scales with thread count — NOT by the
pure-compute (register/ALU) ceiling that tools/bench_spark_cpu_ceiling.py
measures. A real N-executor vs 4N-executor cluster multiplies memory
bandwidth with node count, which one VM cannot emulate; this tool
quantifies that gap for the honest ceiling-normalized reading of
BENCH_SCALING.md.

Method: N worker processes, each repeatedly summing a 256 MB float64
array (far out of cache -> pure DRAM streaming). Aggregate GB/s per
level; ceiling(N->4N) = agg_4N / (4 * agg_N). A value near 0.25 means
aggregate bandwidth was already saturated at N threads.

Usage: python tools/bench_mem_ceiling.py [levels...] (default 2 8 32)
"""

from __future__ import annotations

import json
import multiprocessing as mp
import sys
import time

import numpy as np

ARR_MB = 256
SECONDS = 8.0


def _worker(q, barrier):
    a = np.ones(ARR_MB * 1024 * 1024 // 8, dtype=np.float64)
    # warm
    a.sum()
    # synchronized measurement window: without the barrier, early-started
    # workers measure part of their window under reduced contention and
    # inflate the aggregate at high parallelism
    barrier.wait()
    n = 0
    t0 = time.monotonic()
    while time.monotonic() - t0 < SECONDS:
        a.sum()
        n += 1
    dt = time.monotonic() - t0
    q.put(n * ARR_MB / 1024.0 / dt)  # GB/s this worker


def measure(par: int) -> float:
    ctx = mp.get_context("fork")
    q = ctx.Queue()
    barrier = ctx.Barrier(par)
    ps = [ctx.Process(target=_worker, args=(q, barrier)) for _ in range(par)]
    for p in ps:
        p.start()
    total = sum(q.get() for _ in ps)
    for p in ps:
        p.join()
    return total


def main():
    levels = [int(x) for x in sys.argv[1:]] or [2, 8, 32]
    agg = {}
    for lv in levels:
        agg[lv] = round(measure(lv), 2)
        print(f"{lv} streams: {agg[lv]} GB/s aggregate")
    effs = {}
    for a in levels:
        for b in levels:
            if b == 4 * a:
                effs[f"{a}->{b}"] = round(agg[b] / agg[a] / 4.0, 3)
                print(f"mem-bandwidth ceiling {a}->{b}: {effs[f'{a}->{b}']}")
    print(json.dumps({"agg_gb_s": agg, "ceiling": effs}))


if __name__ == "__main__":
    main()
