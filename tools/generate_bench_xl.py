"""Generate the 16.4M-event scaling fixture (.fixtures/bench-xl).

One-time (~25 min, multiprocess, disk-cached; rerun is a no-op when the
manifest matches). Used by the N-vs-4N scaling evidence:

    python tools/generate_bench_xl.py
    BENCH_FIXTURE=.fixtures/bench-xl python tools/bench_scaling.py 4 2
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from debezium_connector_spanner_spark.fixtures.generator import (
    FIXTURE_ROOT,
    GeneratorConfig,
    write_fixture,
)

XL_CONFIG = GeneratorConfig(
    n_repos=240000,
    paths_per_repo=8,
    hot_repos=2400,
    events_per_key_mean=8,
    duration_s=3600,
    heartbeats_per_token=16,
    # keep each row group's TIME span near one batch window. The 4096-row
    # default (tuned for sf<=0.1 pruning granularity) bloats footers at
    # this size: a 1GB hot-token file gets 1200+ row groups, and every
    # 2-8MB scan split re-parses that footer (~0.3s) — a parallelism-
    # neutral ~15s/batch tax that floors absolute throughput. Realistic
    # row groups (16k rows ~ a few hundred seconds per token) keep both
    # the pruning granularity and a flat footer.
    row_group_size=16384,
)

if __name__ == "__main__":
    t0 = time.time()
    m = write_fixture(os.path.join(FIXTURE_ROOT, "bench-xl"), XL_CONFIG)
    print(f"done in {time.time()-t0:.0f}s: {m['events']} events, {m['keys']} keys")
