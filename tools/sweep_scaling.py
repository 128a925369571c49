"""Config sweep for the fold-job scaling bottleneck.

Runs tools/diag_inflation.py over a matrix of (parallelism, scan split
size, fold bucket count), interleaving configs across repeats so host
noise hits all configs equally. Each cell runs in a fresh JVM; per-run
steal% is sampled so contaminated runs are visible. Prints a summary
table of best-wall per cell and the implied 8->32 efficiency per config.

Usage: python tools/sweep_scaling.py [reps]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import threading
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

CONFIGS = {
    "split8m_b64": ({"spark.sql.files.maxPartitionBytes": str(8 * 2**20)}, 64),
    "split2m_b64": ({"spark.sql.files.maxPartitionBytes": str(2 * 2**20)}, 64),
    "split8m_b160": ({"spark.sql.files.maxPartitionBytes": str(8 * 2**20)}, 160),
    "split2m_b160": ({"spark.sql.files.maxPartitionBytes": str(2 * 2**20)}, 160),
}


def _ticks():
    with open("/proc/stat") as f:
        v = [int(x) for x in f.readline().split()[1:]]
    return sum(v), v[7], v[3]


def run_cell(par: int, conf: dict, buckets: int) -> dict:
    env = dict(os.environ)
    env["DIAG_CONF"] = json.dumps(conf)
    env["DIAG_BUCKETS"] = str(buckets)
    t0 = _ticks()
    out = subprocess.run(
        [sys.executable, "tools/diag_inflation.py", str(par), "8g"],
        capture_output=True, text=True, cwd=REPO, env=env, timeout=900,
    )
    t1 = _ticks()
    line = [l for l in out.stdout.splitlines() if l.startswith("{")]
    if not line:
        raise RuntimeError(out.stdout[-1000:] + out.stderr[-1000:])
    r = json.loads(line[-1])
    dt = t1[0] - t0[0]
    r["steal_pct"] = round(100 * (t1[1] - t0[1]) / dt, 1) if dt else None
    return r


def main():
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    results: dict[tuple, list] = {}
    for rep in range(reps):
        for name, (conf, buckets) in CONFIGS.items():
            for par in (8, 32):
                r = run_cell(par, conf, buckets)
                results.setdefault((name, par), []).append(r)
                print(
                    f"rep{rep} {name} local[{par}]: wall={r['wall_s']}s "
                    f"run={r['sum_run_s']} cpu={r['sum_cpu_s']} gc={r['gc_s']} "
                    f"tasks={r['tasks']} steal={r['steal_pct']}%",
                    flush=True,
                )
    print("\n== best-wall summary ==")
    for name in CONFIGS:
        w8 = min(r["wall_s"] for r in results[(name, 8)])
        w32 = min(r["wall_s"] for r in results[(name, 32)])
        print(f"{name:14s} local[8]={w8:6.2f}s local[32]={w32:6.2f}s "
              f"speedup={w8 / w32:4.2f} eff={(w8 / w32) / 4:4.2f}")
    with open(os.path.join(REPO, ".fixtures", "sweep_scaling.json"), "w") as f:
        json.dump({f"{k[0]}|{k[1]}": v for k, v in results.items()}, f, indent=1)


if __name__ == "__main__":
    main()
