"""Capture .explain('formatted') for round-6 optimization targets into
plans/r06/<query>_<tag>.txt (tag = before/after).

Usage: python tools/capture_plans_r06.py <tag> [query ...]
Defaults to every bench query + the extras ops examined this round, at
the sf dir in $SPARK_GRAFT_SF_DIR (driver parity: sf1.0 when present).
"""

from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from debezium_connector_spanner_spark.session import get_spark

QUERIES = [
    "tpch_q1",
    "tpch_q3",
    "tpch_q5",
    "events_lww_latest",
    "events_hourly",
    "docs_exact_dedup",
    "docs_token_stats",
    "events_asof_attribution",
    "events_purchases_in_click_sessions",
    "tpch_q7",
    "tpch_q10",
    "tpch_q18",
    "docs_fingerprint_dups",
    "docs_dataset_split",
    "docs_decontaminate",
    "docs_pack_sequences",
    "docs_pii_scrub",
    "docs_repetition",
    "emb_topk_lsh_recall",
    "docs_minhash_lsh_pairs",
    "events_value_quantiles",
]


def plan_of(df) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue().replace("\x00", "\\x00")


def main() -> None:
    tag = sys.argv[1] if len(sys.argv) > 1 else "before"
    names = sys.argv[2:] or QUERIES
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR")
    if not sf_dir:
        sf_dir = (
            "/root/testdata/sf1.0"
            if os.path.exists("/root/testdata/sf1.0")
            else "/root/testdata/sf0.1"
        )
    out_dir = os.path.join(REPO, "plans", "r06")
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark(app_name="capture-plans-r06")

    from debezium_connector_spanner_spark.plans.analytics_queries import (
        ANALYTIC_QUERIES,
    )
    from debezium_connector_spanner_spark.plans.pipeline_queries import (
        PIPELINE_QUERIES,
    )

    all_q = {**ANALYTIC_QUERIES, **PIPELINE_QUERIES}
    for name in names:
        fn = all_q[name]
        p = plan_of(fn(spark, sf_dir))
        path = os.path.join(out_dir, f"{name}_{tag}.txt")
        with open(path, "w") as f:
            f.write(f"# {name} [{tag}] sf_dir={sf_dir}\n{p}")
        print(f"wrote {path} ({len(p)} chars)")
    spark.stop()


if __name__ == "__main__":
    main()
