"""Stage-level profile of the CDC replay at two parallelism levels.

Answers WHERE the local[N] -> local[4N] scaling efficiency is lost:
pulls per-stage and per-job metrics from the Spark UI REST API after a
warm replay at each level and reports, per level:

- replay wall vs sum of executorRunTime (the parallelizable work)
- per-stage executorRunTime / duration / task count (which stages floor)
- inter-job driver gaps (serial time no stage accounts for)

Usage: python tools/profile_scaling.py [N] [4N] (default 8 32)
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

CHILD = r"""
import json, os, sys, time, urllib.request
sys.path.insert(0, {repo!r})
from debezium_connector_spanner_spark.session import get_spark
from bench import run_cdc_replay

spark = get_spark(
    master="local[{par}]",
    shuffle_partitions=max(8, {par}),
    extra_conf={{"spark.ui.enabled": "true", "spark.ui.retainedStages": "5000",
                 "spark.ui.retainedJobs": "5000"}},
)
r0 = run_cdc_replay(spark, "{sf_name}", {sf})  # warm the JVM
t0 = time.monotonic()
r = run_cdc_replay(spark, "{sf_name}", {sf})
wall = time.monotonic() - t0

base = spark.sparkContext.uiWebUrl + "/api/v1/applications"
apps = json.load(urllib.request.urlopen(base))
app_id = apps[0]["id"]

stages = json.load(urllib.request.urlopen(f"{{base}}/{{app_id}}/stages?status=COMPLETE"))
jobs = json.load(urllib.request.urlopen(f"{{base}}/{{app_id}}/jobs?status=succeeded"))

def ts(s):
    import datetime
    return datetime.datetime.strptime(s[:23], "%Y-%m-%dT%H:%M:%S.%f").timestamp()

# keep only the measured (second) replay: stages submitted in the last `wall` s
now = max(ts(s["completionTime"]) for s in stages if "completionTime" in s)
cut = now - wall - 1.0
sel = [s for s in stages if "submissionTime" in s and ts(s["submissionTime"]) >= cut]
out_stages = []
for s in sel:
    out_stages.append({{
        "id": s["stageId"],
        "name": s["name"].split(" at ")[0][:40] + "@" + s["name"].split(":")[-1],
        "tasks": s["numCompleteTasks"],
        "run_ms": s["executorRunTime"],
        "cpu_ms": s.get("executorCpuTime", 0) // 1_000_000,
        "dur_ms": int(1000 * (ts(s["completionTime"]) - ts(s["firstTaskLaunchedTime"]))) if "firstTaskLaunchedTime" in s else None,
        "sched_delay_ms": int(1000 * (ts(s["firstTaskLaunchedTime"]) - ts(s["submissionTime"]))) if "firstTaskLaunchedTime" in s else None,
        "input_mb": round(s.get("inputBytes", 0) / 1e6, 1),
        "shuf_w_mb": round(s.get("shuffleWriteBytes", 0) / 1e6, 1),
        "shuf_r_mb": round(s.get("shuffleReadBytes", 0) / 1e6, 1),
    }})

jsel = sorted(
    [j for j in jobs if "submissionTime" in j and ts(j["submissionTime"]) >= cut],
    key=lambda j: ts(j["submissionTime"]),
)
# serial gaps: time not covered by ANY running job (driver-only segments)
ivals = sorted((ts(j["submissionTime"]), ts(j["completionTime"])) for j in jsel if "completionTime" in j)
merged = []
for lo, hi in ivals:
    if merged and lo <= merged[-1][1]:
        merged[-1][1] = max(merged[-1][1], hi)
    else:
        merged.append([lo, hi])
covered = sum(hi - lo for lo, hi in merged)
span = merged[-1][1] - merged[0][0] if merged else 0.0

print("PROFILE " + json.dumps({{
    "par": {par},
    "wall_s": round(wall, 2),
    "events_per_sec": r["events_per_sec"],
    "n_jobs": len(jsel),
    "job_span_s": round(span, 2),
    "job_covered_s": round(covered, 2),
    "driver_gap_s": round(span - covered, 2),
    "sum_run_s": round(sum(s["run_ms"] for s in out_stages) / 1000, 1),
    "sum_cpu_s": round(sum(s["cpu_ms"] for s in out_stages) / 1000, 1),
    "stages": out_stages,
}}))
"""


def run_level(par: int, sf_name: str, sf: float) -> dict:
    code = CHILD.format(repo=REPO, par=par, sf_name=sf_name, sf=sf)
    out = subprocess.run(
        [sys.executable, "-c", code], capture_output=True, text=True, cwd=REPO, timeout=3600
    )
    for line in out.stdout.splitlines():
        if line.startswith("PROFILE "):
            return json.loads(line[len("PROFILE "):])
    raise RuntimeError(f"no PROFILE from local[{par}]:\n{out.stdout[-3000:]}\n{out.stderr[-3000:]}")


def main():
    a = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    b = int(sys.argv[2]) if len(sys.argv) > 2 else 32
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf_name = os.path.basename(sf_dir.rstrip("/"))
    sf = float(sf_name.replace("sf", "")) if sf_name.startswith("sf") else 0.1

    profs = {}
    for par in (a, b):
        p = run_level(par, sf_name, sf)
        profs[par] = p
        print(
            f"local[{par}]: wall={p['wall_s']}s tput={p['events_per_sec']}/s "
            f"jobs={p['n_jobs']} driver_gap={p['driver_gap_s']}s "
            f"sum_run={p['sum_run_s']}s sum_cpu={p['sum_cpu_s']}s"
        )

    # aggregate stages by name across batches
    for par, p in profs.items():
        agg = {}
        for s in p["stages"]:
            k = s["name"]
            d = agg.setdefault(k, {"n": 0, "tasks": 0, "run_s": 0.0, "dur_s": 0.0, "in_mb": 0.0})
            d["n"] += 1
            d["tasks"] += s["tasks"]
            d["run_s"] += s["run_ms"] / 1000
            d["dur_s"] += (s["dur_ms"] or 0) / 1000
            d["in_mb"] += s["input_mb"]
        print(f"\n== local[{par}] stages by name (sum over batches) ==")
        for k, d in sorted(agg.items(), key=lambda kv: -kv[1]["dur_s"]):
            print(
                f"  {k:45s} x{d['n']:3d} tasks={d['tasks']:5d} "
                f"run={d['run_s']:8.1f}s walldur={d['dur_s']:7.1f}s in={d['in_mb']:8.1f}MB"
            )
    out_path = os.path.join(REPO, ".fixtures", f"profile_{a}_{b}.json")
    with open(out_path, "w") as f:
        json.dump(profs, f, indent=1)
    print("\nwrote", out_path)


if __name__ == "__main__":
    main()
