"""Two-cluster-size scaling evidence (BASELINE.json north rule).

No real cluster in the sandbox, so the same job runs at two parallelism
levels (local[N] vs local[4N]) on the same input; we report throughput at
both plus scaling_efficiency = tput_4N / (4 * tput_N). Each level runs in
a fresh JVM (subprocess) so thread pools/heaps are sized per level.

Usage: python tools/bench_scaling.py [N] [repeats]   (default N=8 rep=1)
Writes results to stdout and appends a markdown row block to BENCH_SCALING.md.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

CHILD = r"""
import json, os, sys
sys.path.insert(0, {repo!r})
from debezium_connector_spanner_spark.session import get_spark
from bench import run_cdc_replay
if os.environ.get("BENCH_MASTER_MODE") == "cluster":
    # N separate executor JVMs x C cores each — the faithful
    # "N executors vs 4N executors" shape from the north rule
    cores = int(os.environ.get("BENCH_CLUSTER_CORES", "4"))
    spark = get_spark(
        master="local-cluster[{par},%d,4096]" % cores,
        shuffle_partitions=max(8, cores * {par}),
        extra_conf={{"spark.executor.memory": "3g"}},
    )
else:
    spark = get_spark(master="local[{par}]", shuffle_partitions=max(8, {par}))
# Steady-state measurement: a CDC tail is a LONG-RUNNING streaming job, so
# the representative throughput is the warm one. Replay once to warm the
# JVM (JIT, codegen cache, buffer pools), then measure; report the best.
inner = int(os.environ.get("BENCH_INNER_REPS", "2"))
best = None
for i in range(inner):
    r = run_cdc_replay(spark, "{sf_name}", {sf})
    r["inner_rep"] = i
    if best is None or r["events_per_sec"] > best["events_per_sec"]:
        best = r
print("RESULT " + json.dumps(best))
"""


def _cpu_ticks() -> tuple[int, int]:
    """(busy+steal total, steal) aggregate ticks from /proc/stat."""
    with open("/proc/stat") as f:
        parts = f.readline().split()[1:]
    vals = [int(x) for x in parts]
    return sum(vals), vals[7] if len(vals) > 7 else 0


def run_level(par: int, sf_name: str, sf: float) -> dict:
    code = CHILD.format(repo=REPO, par=par, sf_name=sf_name, sf=sf)
    t_all0, t_steal0 = _cpu_ticks()
    out = subprocess.run(
        [sys.executable, "-c", code],
        capture_output=True,
        text=True,
        cwd=REPO,
        timeout=3600,
    )
    t_all1, t_steal1 = _cpu_ticks()
    for line in out.stdout.splitlines():
        if line.startswith("RESULT "):
            r = json.loads(line[len("RESULT "):])
            # hypervisor steal over the whole level run: the fraction of
            # this VM's cycle entitlement the oversubscribed host withheld
            # (ceiling-normalization evidence for the N vs 4N criterion)
            dt = t_all1 - t_all0
            r["steal_pct"] = round(100.0 * (t_steal1 - t_steal0) / dt, 1) if dt else None
            return r
    raise RuntimeError(f"no RESULT from local[{par}]:\n{out.stdout[-2000:]}\n{out.stderr[-2000:]}")


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 1
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf_name = os.path.basename(sf_dir.rstrip("/"))
    sf = float(sf_name.replace("sf", "")) if sf_name.startswith("sf") else 0.1

    results = {n: [], 4 * n: []}
    for _ in range(reps):
        for par in (n, 4 * n):
            r = run_level(par, sf_name, sf)
            results[par].append(r)
            print(
                f"local[{par}] wall={r['wall_s']}s tput={r['events_per_sec']}/s"
                f" steal={r.get('steal_pct')}%"
            )

    best = {p: max(r["events_per_sec"] for r in rs) for p, rs in results.items()}
    eff = best[4 * n] / (4 * best[n])
    summary = {
        "parallelism_N": n,
        "throughput_N": best[n],
        "parallelism_4N": 4 * n,
        "throughput_4N": best[4 * n],
        "scaling_efficiency": round(eff, 3),
        "events": results[n][0]["events"],
        "runs": results,
    }
    print(json.dumps(summary))
    if os.environ.get("BENCH_MASTER_MODE") == "cluster":
        c = os.environ.get("BENCH_CLUSTER_CORES", "4")
        lo, hi = f"local-cluster[{n},{c}]", f"local-cluster[{4*n},{c}]"
    else:
        lo, hi = f"local[{n}]", f"local[{4*n}]"
    with open(os.path.join(REPO, "BENCH_SCALING.md"), "a") as f:
        f.write(
            f"\n| {lo} | {best[n]:.0f} ev/s | {hi} | "
            f"{best[4*n]:.0f} ev/s | {eff:.2f} | {results[n][0]['events']} events |"
        )


if __name__ == "__main__":
    main()
