"""Measure the HOST's raw CPU scaling ceiling (context for BENCH_SCALING.md).

Spins P worker processes, each doing an identical fixed chunk of pure-Python
integer work; reports aggregate throughput per parallelism level and the
N->4N efficiency ceiling implied by the host (vCPU topology / SMT / steal).
Any job measured on this host should be read against this ceiling: e.g. if
raw CPU itself only scales 0.74x from 1->32, a data job cannot do better.

Usage: python tools/bench_cpu_ceiling.py [levels...]   (default 1 2 4 8 16 32)
"""

from __future__ import annotations

import json
import sys
import time
from multiprocessing import Process, Queue

CHUNK = 2_000_000  # loop iterations per unit of work


def _spin(q: Queue, units: int) -> None:
    t0 = time.monotonic()
    for _ in range(units):
        acc = 0
        for i in range(CHUNK):
            acc += i ^ (i >> 3)
    q.put(time.monotonic() - t0)


def measure(par: int, units_per_proc: int = 8) -> float:
    """Aggregate work-units/sec with `par` concurrent spinner processes."""
    q: Queue = Queue()
    ps = [Process(target=_spin, args=(q, units_per_proc)) for _ in range(par)]
    t0 = time.monotonic()
    for p in ps:
        p.start()
    for p in ps:
        p.join()
    wall = time.monotonic() - t0
    return par * units_per_proc / wall


def main() -> None:
    levels = [int(a) for a in sys.argv[1:]] or [1, 2, 4, 8, 16, 32]
    tput = {}
    for par in levels:
        tput[par] = measure(par)
        print(f"par={par:3d}  {tput[par]:.2f} units/s")
    out = {"throughput": tput, "pairs": {}}
    for n in levels:
        if 4 * n in tput:
            eff = tput[4 * n] / (4 * tput[n])
            out["pairs"][f"{n}->{4*n}"] = round(eff, 3)
            print(f"ceiling {n}->{4*n}: {eff:.3f}")
    print(json.dumps(out))


if __name__ == "__main__":
    main()
