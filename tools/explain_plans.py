"""Capture physical plans for the headline queries -> PLANS.md.

Greps each plan for the properties that matter at 100 TB: parquet
PushedFilters / partition pruning, broadcast joins on dim tables,
WholeStageCodegen coverage, and the single-exchange fold in the CDC
merge path. Run: python tools/explain_plans.py
"""

from __future__ import annotations

import io
import os
import re
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from debezium_connector_spanner_spark.session import get_spark

SF = "/root/testdata/sf0.01"


def plan_of(df) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    # the bucket hash uses a NUL key separator that would make the output
    # file binary — escape control chars
    return buf.getvalue().replace("\x00", "\\x00")


def summarize(name: str, plan: str) -> str:
    pushed = re.findall(r"PushedFilters: \[([^\]]*)\]", plan)
    pushed = [p for p in pushed if p.strip()]
    # count node headers in the details section: "(N) Exchange" — the tree
    # and details each mention a node once, so raw substring counts double
    n_exchanges = len(re.findall(r"^\(\d+\) Exchange", plan, re.M))
    n_bcast = len(re.findall(r"^\(\d+\) Broadcast(HashJoin|Exchange)", plan, re.M))
    n_wscg = len(set(re.findall(r"\[codegen id : (\d+)\]", plan)))
    partf = re.findall(r"PartitionFilters: \[([^\]]*)\]", plan)
    partf = [p for p in partf if p.strip()]
    lines = [
        f"### {name}",
        f"- exchanges: {n_exchanges}, broadcast joins/exchanges: {n_bcast}, "
        f"whole-stage-codegen spans: {n_wscg}",
    ]
    if pushed:
        lines.append(f"- pushed filters: {len(pushed)} scan(s), e.g. `{pushed[0][:160]}`")
    if partf:
        lines.append(f"- partition filters: e.g. `{partf[0][:160]}`")
    return "\n".join(lines) + "\n"


def main():
    spark = get_spark(master="local[8]", shuffle_partitions=8)
    out = ["# PLANS — physical-plan evidence (auto-generated)\n"]
    out.append(
        "Each section summarizes `.explain('formatted')` of a headline query at "
        "sf0.01: exchange count (shuffles), broadcast usage, codegen spans, and "
        "parquet pushdown. Regenerate: `python tools/explain_plans.py`.\n"
    )

    from debezium_connector_spanner_spark.plans.analytics_queries import ANALYTIC_QUERIES
    from debezium_connector_spanner_spark.plans.pipeline_queries import PIPELINE_QUERIES

    for name in ["tpch_q1", "tpch_q3", "tpch_q4", "tpch_q5", "tpch_q6",
                 "tpch_q7", "tpch_q10", "tpch_q12", "tpch_q13", "tpch_q14",
                 "tpch_q15", "tpch_q16", "tpch_q17", "tpch_q18",
                 "tpch_q19", "tpch_q22", "events_lww_latest", "events_user_rank",
                 "events_sessions", "events_value_quantiles",
                 "events_asof_attribution",
                 "events_purchases_in_click_sessions",
                 "orders_cube", "parts_never_ordered", "events_funnel"]:
        out.append(summarize(name, plan_of(ANALYTIC_QUERIES[name](spark, SF))))
    for name in ["docs_jaccard_pairs", "docs_minhash_lsh_pairs", "docs_fingerprint",
                 "emb_topk_bruteforce", "emb_topk_lsh", "emb_near_dup_pairs",
                 "emb_topk_lsh_recall", "docs_pii_scrub", "docs_repetition"]:
        out.append(summarize(name, plan_of(PIPELINE_QUERIES[name](spark, SF))))

    # CDC merge path: decode -> fold (the one exchange) on a batch slice
    from debezium_connector_spanner_spark.fixtures.generator import (
        EPOCH_MICROS,
        ensure_fixture,
    )
    from debezium_connector_spanner_spark.operators.decode import decode_mods
    from debezium_connector_spanner_spark.operators.merge import fold_changes
    from debezium_connector_spanner_spark.sources.event_schema import (
        EVENT_LOG_SCHEMA,
        REPOS_SCHEMA_V1,
    )
    from pyspark.sql import functions as F

    fx = ensure_fixture(SF)
    ev = spark.read.schema(EVENT_LOG_SCHEMA).parquet(os.path.join(fx, "events"))
    lo = EPOCH_MICROS + 450_000_000
    hi = EPOCH_MICROS + 900_000_000
    sl = ev.where(F.col("partition_token").isin(["t-A", "t-B"])).where(
        (F.col("commit_ts") > F.timestamp_micros(F.lit(lo)))
        & (F.col("commit_ts") <= F.timestamp_micros(F.lit(hi)))
    )
    folded = fold_changes(
        decode_mods(sl, REPOS_SCHEMA_V1), ["repo", "path"], ["commit", "lang", "content"],
        n_buckets=16,
    )
    plan = plan_of(folded)
    out.append(summarize("cdc_decode_fold (one batch slice)", plan))
    out.append(
        "Full formatted plan of the CDC fold (scan pruning + single exchange):\n\n"
        "```\n" + plan[:4000] + "\n```\n"
    )
    out.append(
        "### SortAggregate fold: measured against the window alternative\n\n"
        "Struct-typed `max` has no mutable hash-agg buffer, so the fold plans\n"
        "as SortAggregate (the per-partition Sort above). Measured alternative\n"
        "(`tools/bench_fold_alternatives.py`, 4.1M events / 504k keys folded,\n"
        "local[32], noop sink, 3 reps):\n\n"
        "| strategy | best | all reps |\n|---|---|---|\n"
        "| agg fold (current, SortAggregate) | 8.83 s | 10.22 / 8.83 / 9.23 |\n"
        "| window fold (`last OVER` + row_number) | 8.51 s | 9.45 / 8.51 / 12.0 |\n\n"
        "A wash at this scale — but the agg fold admits map-side partial\n"
        "aggregation when input is not pre-bucketed (shuffle shrinks by the\n"
        "intra-batch key-repeat factor), while a window always ships every raw\n"
        "event across the shuffle and materializes the full frame per key. At\n"
        "100 TB the agg fold's shuffle is strictly smaller; kept.\n"
    )

    with open(os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "PLANS.md"), "w") as f:
        f.write("\n".join(out))
    print("wrote PLANS.md")


if __name__ == "__main__":
    main()
