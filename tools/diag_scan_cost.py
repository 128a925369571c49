"""Diagnose the sf1 batch-scan cost on the driver-shaped fixture
(bench-sf1.0, row_group_size=4096): time a pruned window scan + the
ctrl-style aggregate at several spark.sql.files.maxPartitionBytes
settings, with the noop sink so only the computation is timed.

Hypothesis (r5 note in tools/bench_sf1.py): with 4096-row row groups the
2MB splits re-parse a multi-thousand-entry footer per task, so the scan
pays O(n_splits x footer) regardless of row-group pruning.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F

from debezium_connector_spanner_spark.session import get_spark
from debezium_connector_spanner_spark.sources.event_schema import EVENT_LOG_SCHEMA

FX = os.path.join(REPO, ".fixtures", sys.argv[1] if len(sys.argv) > 1 else "bench-sf1.0")
EPOCH = 1767225600000000
SPAN = 3600 * 1_000_000


def main() -> None:
    spark = get_spark(app_name="diag-scan")
    results = {}
    # batch-2-like window: (1/8, 2/8] of the hour
    lo = EPOCH + SPAN * 1 // 8
    hi = EPOCH + SPAN * 2 // 8
    for mpb_mb in (2, 8, 32, 128):
        spark.conf.set("spark.sql.files.maxPartitionBytes", str(mpb_mb * 1024 * 1024))
        for name, cols in (
            ("ctrl_like", ["partition_token", "commit_ts", "record_type", "table_name", "column_types"]),
            ("full_width", None),
        ):
            df = spark.read.schema(EVENT_LOG_SCHEMA).parquet(os.path.join(FX, "events"))
            df = df.where(
                (F.col("commit_ts") > F.timestamp_micros(F.lit(lo)))
                & (F.col("commit_ts") <= F.timestamp_micros(F.lit(hi)))
            )
            if cols:
                df = df.select(*cols)
            spark.sparkContext.setJobDescription(f"scan mpb={mpb_mb}MB {name}")
            t0 = time.monotonic()
            df.write.format("noop").mode("overwrite").save()
            results[f"{name}_mpb{mpb_mb}"] = round(time.monotonic() - t0, 2)
            print(json.dumps({f"{name}_mpb{mpb_mb}": results[f"{name}_mpb{mpb_mb}"]}), flush=True)
    print(json.dumps(results, indent=1))
    spark.stop()


if __name__ == "__main__":
    main()
