"""Driver-parity replay of the sf1 bench fixture: exactly the code path
the round-end measurement takes (bench.py main at SPARK_GRAFT_SF_DIR=
/root/testdata/sf1.0 with run_sf1=False) — n_batches=8, NO event cap,
session defaults (no extra driver-memory conf). Use for A/B of engine /
layout changes against BENCH_r05.json's 454.1 s cdc_replay.

    python tools/bench_replay_parity.py [fixture-name]
"""

from __future__ import annotations

import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from bench import run_cdc_replay
from debezium_connector_spanner_spark.session import get_spark


def main() -> None:
    fx_name = sys.argv[1] if len(sys.argv) > 1 else "bench-sf1.0"
    par = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark(
        app_name="cdc-bench-parity",
        master=f"local[{par}]",
        shuffle_partitions=max(8, int(par)),
    )
    os.environ["BENCH_FIXTURE"] = os.path.join(REPO, ".fixtures", fx_name)
    r = run_cdc_replay(spark, "sf1.0", 1.0)
    spark.stop()
    print(json.dumps({k: r[k] for k in ("wall_s", "events", "events_per_sec", "final_rows", "batches")}))
    print(json.dumps(r["quantiles"]))


if __name__ == "__main__":
    main()
