"""Skew proof: fused vs salted fold on a mega-hot-key fixture.

North rule: "hot-key repos are salted before the merge-apply shuffle".
This benchmark makes the claim measurable: a fixture where ONE (repo,
path) key carries ~half of all change events, replayed twice with the
same engine — skew_mode='fused' (fold shuffle keyed by bucket; the hot
key's events all land on one reducer) vs skew_mode='salted' (two-phase
(key, salt) pre-combine, then per-key merge).

Each mode runs in a fresh JVM. Usage:

    python tools/bench_skew.py [hot_events] [reps]   (default 1000000 1)

Appends a row block to BENCH_SCALING.md.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

CHILD = r"""
import json, os, shutil, sys, time
sys.path.insert(0, {repo!r})
from debezium_connector_spanner_spark.session import get_spark
from debezium_connector_spanner_spark.fixtures.generator import EPOCH_MICROS
from debezium_connector_spanner_spark.sources.event_schema import REPOS_SCHEMA_V1
from debezium_connector_spanner_spark.streaming.engine import CdcReplayEngine

spark = get_spark(master="local[{par}]", shuffle_partitions=max(8, {par}))
fx = {fx!r}
run_root = os.path.join(fx, "skew-run-{mode}")
if os.path.exists(run_root):
    shutil.rmtree(run_root)
base = spark.read.parquet(os.path.join(fx, "base_repos.parquet"))
t0 = time.monotonic()
eng = CdcReplayEngine(
    spark, fx, os.path.join(run_root, "table"), os.path.join(run_root, "ckpt"),
    start_us=EPOCH_MICROS, end_us=EPOCH_MICROS + {dur} * 1_000_000,
    n_batches=8, initial_schema=REPOS_SCHEMA_V1, base_df=base,
    n_buckets=64, skew_mode={mode!r},
)
totals = eng.run()
wall = time.monotonic() - t0
rows = eng.final_state().count()
print("RESULT " + json.dumps({{
    "mode": {mode!r}, "wall_s": round(wall, 2),
    "events": totals["events"],
    "events_per_sec": round(totals["events"] / wall, 1),
    "final_rows": rows,
}}))
"""


def run_mode(fx: str, mode: str, par: int, dur: int) -> dict:
    code = CHILD.format(repo=REPO, fx=fx, mode=mode, par=par, dur=dur)
    out = subprocess.run(
        [sys.executable, "-c", code], capture_output=True, text=True, cwd=REPO,
        timeout=3600,
    )
    for line in out.stdout.splitlines():
        if line.startswith("RESULT "):
            return json.loads(line[len("RESULT "):])
    raise RuntimeError(f"no RESULT ({mode}):\n{out.stdout[-2000:]}\n{out.stderr[-2000:]}")


def main():
    from debezium_connector_spanner_spark.fixtures.generator import (
        FIXTURE_ROOT,
        GeneratorConfig,
        write_fixture,
    )

    hot = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 1
    par = int(os.environ.get("BENCH_PARALLELISM", "16"))
    cfg = GeneratorConfig(
        n_repos=16000,
        paths_per_repo=8,
        hot_repos=0,
        events_per_key_mean=8,
        duration_s=3600,
        heartbeats_per_token=16,
        hot_key_events=hot,
    )
    fx = os.path.join(FIXTURE_ROOT, f"bench-skew-{hot}")
    m = write_fixture(fx, cfg)
    print(f"fixture: {m['events']} events ({hot} on the hot key)")

    results = {"fused": [], "salted": [], "adaptive": []}
    for _ in range(reps):
        for mode in ("fused", "salted", "adaptive"):
            r = run_mode(fx, mode, par, cfg.duration_s)
            results[mode].append(r)
            print(f"{mode:7s} wall={r['wall_s']}s tput={r['events_per_sec']}/s rows={r['final_rows']}")

    best = {mode: max(r["events_per_sec"] for r in rs) for mode, rs in results.items()}
    summary = {
        "hot_key_events": hot,
        "total_events": m["events"],
        "parallelism": par,
        "fused_best_tput": best["fused"],
        "salted_best_tput": best["salted"],
        "adaptive_best_tput": best["adaptive"],
        "salted_speedup": round(best["salted"] / best["fused"], 3),
        "adaptive_speedup": round(best["adaptive"] / best["fused"], 3),
        "runs": results,
    }
    print(json.dumps(summary))
    # appended under the dedicated skew-mode table at the end of the doc
    with open(os.path.join(REPO, "BENCH_SCALING.md"), "a") as f:
        f.write(
            f"\n| {m['events']} events, {hot} on one key "
            f"(~{100 * hot // m['events']}%), local[{par}] | {best['fused']:.0f} "
            f"| {best['salted']:.0f} | {best['salted']/best['fused']:.2f} "
            f"| {best['adaptive']:.0f} ({best['adaptive']/best['fused']:.2f}x) |"
        )


if __name__ == "__main__":
    main()
