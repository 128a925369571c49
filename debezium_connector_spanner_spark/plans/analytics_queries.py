"""Analytics + training-data-pipeline queries over the driver testdata
tables (region nation customer supplier part orders lineitem events
documents embeddings), each paired with a DuckDB oracle.

Hash-stability rules (the driver compares order-insensitive value hashes):
- no raw TIMESTAMP columns in output — surface epoch micros (BIGINT)
- no float aggregates — money/quantity sums are computed in exact integer
  space (cents / basis points) in BOTH engines
- every computed column aliased identically in Spark and SQL
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _us(col) -> F.Column:
    """epoch micros from a (possibly NTZ) timestamp column; session tz is
    UTC so NTZ->LTZ cast matches DuckDB's epoch_us on naive timestamps."""
    c = col if not isinstance(col, str) else F.col(col)
    return F.unix_micros(c.cast("timestamp"))


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


# ----------------------------------------------------------------- TPC-H
def q_tpch_q1(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 pricing summary (integer-exact money math)."""
    li = _t(spark, sf_dir, "lineitem")
    price_c = F.round(F.col("l_extendedprice") * 100).cast("long")
    disc_e2 = F.round(F.col("l_discount") * 100).cast("long")
    tax_e2 = F.round(F.col("l_tax") * 100).cast("long")
    return (
        li.where(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(F.col("l_quantity").cast("long")).alias("sum_qty"),
            F.sum(price_c).alias("sum_base_price_cents"),
            F.sum(price_c * (100 - disc_e2)).alias("sum_disc_price_e4"),
            F.sum(price_c * (100 - disc_e2) * (100 + tax_e2)).alias("sum_charge_e6"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


SQL_TPCH_Q1 = """
SELECT l_returnflag, l_linestatus,
  CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
  CAST(sum(CAST(round(l_extendedprice*100) AS BIGINT)) AS BIGINT) AS sum_base_price_cents,
  CAST(sum(CAST(round(l_extendedprice*100) AS BIGINT)
      * (100 - CAST(round(l_discount*100) AS BIGINT))) AS BIGINT) AS sum_disc_price_e4,
  CAST(sum(CAST(round(l_extendedprice*100) AS BIGINT)
      * (100 - CAST(round(l_discount*100) AS BIGINT))
      * (100 + CAST(round(l_tax*100) AS BIGINT))) AS BIGINT) AS sum_charge_e6,
  count(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02'
GROUP BY l_returnflag, l_linestatus
"""


def q_tpch_q3(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shipping priority (broadcast dim join; no LIMIT so the
    compare is order-insensitive)."""
    cust = _t(spark, sf_dir, "customer").where(F.col("c_mktsegment") == "BUILDING")
    orders = _t(spark, sf_dir, "orders").where(
        F.col("o_orderdate") < F.lit("1995-03-15").cast("timestamp")
    )
    li = _t(spark, sf_dir, "lineitem").where(
        F.col("l_shipdate") > F.lit("1995-03-15").cast("timestamp")
    )
    price_c = F.round(F.col("l_extendedprice") * 100).cast("long")
    disc_e2 = F.round(F.col("l_discount") * 100).cast("long")
    # no broadcast hint on orders: it's fact-sized at high SF — let AQE
    # pick broadcast when the filtered side is actually small
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .groupBy("l_orderkey", _us("o_orderdate").alias("o_orderdate_us"))
        .agg(F.sum(price_c * (100 - disc_e2)).alias("revenue_e4"))
    )


SQL_TPCH_Q3 = """
SELECT l_orderkey, epoch_us(o_orderdate) AS o_orderdate_us,
  CAST(sum(CAST(round(l_extendedprice*100) AS BIGINT)
      * (100 - CAST(round(l_discount*100) AS BIGINT))) AS BIGINT) AS revenue_e4
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1995-03-15'
  AND l_shipdate  > TIMESTAMP '1995-03-15'
GROUP BY l_orderkey, o_orderdate_us
"""


def q_tpch_q5(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5-style local-supplier revenue by nation (multi-way join
    with broadcast dims + shuffled fact-fact join).

    Join strategy pinned (guide §3.1): without hints the planner's
    post-pruning size estimate for LINEITEM (4 of 16 columns) slips under
    the session's 64MB broadcast threshold and it broadcasts the FACT
    table — measured 5.9 s at sf1 (vs ~1 s shape-correct), a
    single-threaded driver build of a multi-hundred-MB hash relation
    that only grows with SF. The hints broadcast the true dims and
    shuffle-hash the orders<->lineitem equi-join (orders projects to two
    narrow columns — cheap per-partition build side), the shape that
    holds at 100x. Results identical; oracle unchanged."""
    for n in ("customer", "orders", "lineitem", "supplier", "nation", "region"):
        _t(spark, sf_dir, n).createOrReplaceTempView(f"_v_{n}")
    # lineitem FIRST so the fact-fact join is the first join node and the
    # SHUFFLE_HASH hint binds to IT (a hint binds to the join whose side
    # contains the hinted relation — listed last, orders' hint was
    # consumed by the customer join and lineitem auto-broadcast anyway)
    return spark.sql(
        """
        SELECT /*+ BROADCAST(_v_customer), BROADCAST(_v_supplier),
                   BROADCAST(_v_nation), BROADCAST(_v_region),
                   SHUFFLE_HASH(_v_orders) */
               n_name,
               sum(CAST(round(l_extendedprice*100) AS BIGINT)
                   * (100 - CAST(round(l_discount*100) AS BIGINT))) AS revenue_e4
        FROM _v_lineitem
        JOIN _v_orders   ON l_orderkey = o_orderkey
        JOIN _v_customer ON c_custkey = o_custkey
        JOIN _v_supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
        JOIN _v_nation   ON s_nationkey = n_nationkey
        JOIN _v_region   ON n_regionkey = r_regionkey
        WHERE r_name = 'ASIA'
        GROUP BY n_name
        """
    )


SQL_TPCH_Q5 = """
SELECT n_name,
  CAST(sum(CAST(round(l_extendedprice*100) AS BIGINT)
      * (100 - CAST(round(l_discount*100) AS BIGINT))) AS BIGINT) AS revenue_e4
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
JOIN nation   ON s_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA'
GROUP BY n_name
"""


# ----------------------------------------------------------- events (CDC-ish)
def q_events_lww_latest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Last-writer-wins latest event per user — the same max-of-struct
    fold the CDC merge uses (O5/O12), on the driver's events table."""
    ev = _t(spark, sf_dir, "events")
    latest = F.max(
        F.struct(
            _us("ts").alias("ts_us"),
            F.col("event_id").alias("event_id"),
            F.col("event_type").alias("event_type"),
            F.col("value").alias("value"),
        )
    ).alias("_m")
    return (
        ev.groupBy("user_id")
        .agg(latest)
        .select(
            "user_id",
            F.col("_m.ts_us").alias("last_ts_us"),
            F.col("_m.event_id").alias("last_event_id"),
            F.col("_m.event_type").alias("last_event_type"),
            F.col("_m.value").alias("last_value"),
        )
    )


SQL_EVENTS_LWW = """
SELECT user_id,
  m['ts_us'] AS last_ts_us,
  m['event_id'] AS last_event_id,
  m['event_type'] AS last_event_type,
  m['value'] AS last_value
FROM (
  SELECT user_id,
    max(struct_pack(ts_us := epoch_us(ts), event_id := event_id,
                    event_type := event_type, value := value)) AS m
  FROM events GROUP BY user_id
)
"""


def q_events_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling-window aggregation (watermark-style hourly rollup)."""
    ev = _t(spark, sf_dir, "events")
    return ev.groupBy(
        _us(F.date_trunc("hour", F.col("ts"))).alias("hour_us"),
        "event_type",
    ).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.countDistinct("user_id").alias("n_users"),
        F.sum(F.round(F.col("value") * 1000000).cast("long")).alias("sum_value_e6"),
    )


SQL_EVENTS_HOURLY = """
SELECT epoch_us(date_trunc('hour', ts)) AS hour_us, event_type,
  count(*) AS n_events,
  count(DISTINCT user_id) AS n_users,
  CAST(sum(CAST(round(value*1000000) AS BIGINT)) AS BIGINT) AS sum_value_e6
FROM events GROUP BY 1, 2
"""


def q_events_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-duplicate detection on (user_id, event_type, value): the
    hash-groupBy dedup pattern at pipeline scale."""
    ev = _t(spark, sf_dir, "events")
    return (
        ev.groupBy("user_id", "event_type", F.round(F.col("value") * 1000000).cast("long").alias("value_e6"))
        .agg(F.count(F.lit(1)).alias("n"))
        .where(F.col("n") > 1)
    )


SQL_EVENTS_DEDUP = """
SELECT user_id, event_type, CAST(round(value*1000000) AS BIGINT) AS value_e6, count(*) AS n
FROM events GROUP BY 1,2,3 HAVING count(*) > 1
"""


# ------------------------------------------------------- documents pipeline
def q_docs_exact_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact text dedup via content hash (hash-groupBy)."""
    d = _t(spark, sf_dir, "documents")
    return (
        d.groupBy(F.md5(F.col("text")).alias("text_md5"))
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.min("doc_id").alias("keep_doc_id"),
        )
    )


SQL_DOCS_EXACT_DEDUP = """
SELECT md5(text) AS text_md5, count(*) AS n_docs, min(doc_id) AS keep_doc_id
FROM documents GROUP BY 1
"""


def q_docs_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting + quality scoring (length / punctuation ratios) —
    whitespace tokenizer AND a BPE-ish regex tokenizer (letter runs as one
    token, digits one per token, other marks one per char — the shape a
    byte-pair pretokenizer produces), both expressed identically in both
    engines and fully Catalyst-native (regexp inside codegen)."""
    d = _t(spark, sf_dir, "documents")
    toks = F.size(F.split(F.trim(F.col("text")), "\\s+"))
    bpe_pat = "[A-Za-z]+|[0-9]|[^A-Za-z0-9\\s]"
    n_chars = F.length("text")
    return d.select(
        "doc_id",
        "lang",
        F.when(F.length(F.trim(F.col("text"))) == 0, F.lit(0))
        .otherwise(toks)
        .cast("long")
        .alias("n_tokens"),
        F.size(F.regexp_extract_all(F.col("text"), F.lit(bpe_pat), 0))
        .cast("long")
        .alias("n_bpe_tokens"),
        n_chars.cast("long").alias("n_chars_computed"),
        F.length(F.regexp_replace(F.col("text"), "[^.!?,;:]", "")).cast("long").alias("n_punct"),
        F.length(F.regexp_replace(F.col("text"), "[^0-9]", "")).cast("long").alias("n_digits"),
    )


SQL_DOCS_TOKEN_STATS = """
SELECT doc_id, lang,
  CASE WHEN length(trim(text)) = 0 THEN 0
       ELSE len(regexp_split_to_array(trim(text), '\\s+')) END AS n_tokens,
  len(regexp_extract_all(text, '[A-Za-z]+|[0-9]|[^A-Za-z0-9\\s]')) AS n_bpe_tokens,
  length(text) AS n_chars_computed,
  length(regexp_replace(text, '[^.!?,;:]', '', 'g')) AS n_punct,
  length(regexp_replace(text, '[^0-9]', '', 'g')) AS n_digits
FROM documents
"""


def q_docs_lang_breakdown(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents")
    return d.groupBy("lang", "source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").alias("total_chars"),
        F.max("n_chars").alias("max_chars"),
    )


SQL_DOCS_LANG_BREAKDOWN = """
SELECT lang, source, count(*) AS n_docs,
       CAST(sum(n_chars) AS BIGINT) AS total_chars, max(n_chars) AS max_chars
FROM documents GROUP BY 1,2
"""


ANALYTIC_QUERIES = {
    "tpch_q1": q_tpch_q1,
    "tpch_q3": q_tpch_q3,
    "tpch_q5": q_tpch_q5,
    "events_lww_latest": q_events_lww_latest,
    "events_hourly": q_events_hourly,
    "events_dedup_exact": q_events_dedup_exact,
    "docs_exact_dedup": q_docs_exact_dedup,
    "docs_token_stats": q_docs_token_stats,
    "docs_lang_breakdown": q_docs_lang_breakdown,
}

ANALYTIC_ORACLES = {
    "tpch_q1": SQL_TPCH_Q1,
    "tpch_q3": SQL_TPCH_Q3,
    "tpch_q5": SQL_TPCH_Q5,
    "events_lww_latest": SQL_EVENTS_LWW,
    "events_hourly": SQL_EVENTS_HOURLY,
    "events_dedup_exact": SQL_EVENTS_DEDUP,
    "docs_exact_dedup": SQL_DOCS_EXACT_DEDUP,
    "docs_token_stats": SQL_DOCS_TOKEN_STATS,
    "docs_lang_breakdown": SQL_DOCS_LANG_BREAKDOWN,
}


# ---------------------------------------------------- extra relational ops
def q_tpch_q6(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 forecasting revenue (pure filter+agg -> full predicate
    pushdown; the .explain PushedFilters list is the point)."""
    li = _t(spark, sf_dir, "lineitem")
    price_c = F.round(F.col("l_extendedprice") * 100).cast("long")
    disc_e2 = F.round(F.col("l_discount") * 100).cast("long")
    return (
        li.where(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_discount") >= 0.05)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.sum(price_c * disc_e2).alias("revenue_e4"),
            F.count(F.lit(1)).alias("n_rows"),
        )
    )


SQL_TPCH_Q6 = """
SELECT
  CAST(sum(CAST(round(l_extendedprice*100) AS BIGINT)
      * CAST(round(l_discount*100) AS BIGINT)) AS BIGINT) AS revenue_e4,
  count(*) AS n_rows
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
  AND l_discount >= 0.05 AND l_discount <= 0.07 AND l_quantity < 24
"""


def q_orders_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP aggregation (grouping-set operator coverage)."""
    o = _t(spark, sf_dir, "orders")
    return (
        o.rollup("o_orderstatus", "o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(F.round(F.col("o_totalprice") * 100).cast("long")).alias("total_cents"),
        )
        .select(
            F.coalesce("o_orderstatus", F.lit("<all>")).alias("o_orderstatus"),
            F.coalesce("o_orderpriority", F.lit("<all>")).alias("o_orderpriority"),
            "n_orders",
            "total_cents",
        )
    )


SQL_ORDERS_ROLLUP = """
SELECT coalesce(o_orderstatus, '<all>') AS o_orderstatus,
       coalesce(o_orderpriority, '<all>') AS o_orderpriority,
       count(*) AS n_orders,
       CAST(sum(CAST(round(o_totalprice*100) AS BIGINT)) AS BIGINT) AS total_cents
FROM orders GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
"""


def q_events_user_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Window-function coverage: per-event-type top-5 users by activity."""
    from pyspark.sql import Window

    ev = _t(spark, sf_dir, "events")
    counts = ev.groupBy("event_type", "user_id").agg(F.count(F.lit(1)).alias("n"))
    w = Window.partitionBy("event_type").orderBy(F.col("n").desc(), F.col("user_id"))
    return (
        counts.withColumn("rnk", F.row_number().over(w))
        .where(F.col("rnk") <= 5)
        .select("event_type", "user_id", "n", F.col("rnk").cast("long").alias("rnk"))
    )


SQL_EVENTS_USER_RANK = """
WITH counts AS (
  SELECT event_type, user_id, count(*) AS n FROM events GROUP BY 1,2
)
SELECT event_type, user_id, n,
       row_number() OVER (PARTITION BY event_type ORDER BY n DESC, user_id) AS rnk
FROM counts QUALIFY rnk <= 5
"""


def q_parts_never_ordered(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Anti-join coverage: parts never ordered in bulk (qty >= 45)."""
    p = _t(spark, sf_dir, "part")
    li = _t(spark, sf_dir, "lineitem").where(F.col("l_quantity") >= 45)
    return (
        p.join(li, p.p_partkey == li.l_partkey, "left_anti")
        .groupBy("p_brand")
        .agg(F.count(F.lit(1)).alias("n_parts"), F.min("p_partkey").alias("min_partkey"))
    )


SQL_PARTS_NEVER_ORDERED = """
SELECT p_brand, count(*) AS n_parts, min(p_partkey) AS min_partkey
FROM part
WHERE p_partkey NOT IN (SELECT l_partkey FROM lineitem WHERE l_quantity >= 45)
GROUP BY p_brand
"""

ANALYTIC_QUERIES.update(
    {
        "tpch_q6": q_tpch_q6,
        "orders_rollup": q_orders_rollup,
        "events_user_rank": q_events_user_rank,
        "parts_never_ordered": q_parts_never_ordered,
    }
)
ANALYTIC_ORACLES.update(
    {
        "tpch_q6": SQL_TPCH_Q6,
        "orders_rollup": SQL_ORDERS_ROLLUP,
        "events_user_rank": SQL_EVENTS_USER_RANK,
        "parts_never_ordered": SQL_PARTS_NEVER_ORDERED,
    }
)


# ------------------------------------------------ TPC-H shapes, 2nd wave
# The testdata tables are TPC-H-ish (TESTDATA.md): columns the classic
# queries need but the tables lack (l_shipmode, l_commitdate,
# p_container) are substituted with available ones, preserving each
# query's OPERATOR shape — that's what matters for plan/scale review.


def q_tpch_q4(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape: EXISTS semi-join + count by priority. Adapted
    predicate: lineitem returned ('R') stands in for commit<receipt.
    Plan shape at scale: the filtered lineitem side shuffles as a
    LEFT SEMI hash join on l_orderkey (no row multiplication), orders
    window filter pushed to the scan."""
    o = _t(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-07-01").cast("timestamp"))
    )
    li = _t(spark, sf_dir, "lineitem").where(F.col("l_returnflag") == "R")
    return (
        o.join(li, o.o_orderkey == li.l_orderkey, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
    )


SQL_TPCH_Q4 = """
SELECT o_orderpriority, count(*) AS order_count
FROM orders
WHERE o_orderdate >= TIMESTAMP '1996-01-01'
  AND o_orderdate < TIMESTAMP '1996-07-01'
  AND EXISTS (SELECT 1 FROM lineitem
              WHERE l_orderkey = o_orderkey AND l_returnflag = 'R')
GROUP BY o_orderpriority
"""


def q_tpch_q12(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape: join + conditional (CASE) aggregation. Adapted:
    l_linestatus stands in for l_shipmode buckets; the high/low split on
    o_orderpriority is verbatim Q12. One shuffle join on orderkey + one
    partial-aggregated groupBy."""
    o = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy("l_linestatus")
        .agg(
            F.sum(high.cast("long")).alias("high_line_count"),
            F.sum((~high).cast("long")).alias("low_line_count"),
        )
    )


SQL_TPCH_Q12 = """
SELECT l_linestatus,
  CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH')
                THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
  CAST(sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT','2-HIGH')
                THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
WHERE l_shipdate >= TIMESTAMP '1997-01-01'
  AND l_shipdate < TIMESTAMP '1998-01-01'
GROUP BY l_linestatus
"""


def q_tpch_q14(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape: promo revenue share for one month — broadcast
    dim join + two conditional sums in integer (e4) money space. part is
    the small side at every SF ratio -> explicit broadcast hint."""
    li = _t(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1997-03-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-04-01").cast("timestamp"))
    )
    p = _t(spark, sf_dir, "part").select("p_partkey", "p_type")
    price_c = F.round(F.col("l_extendedprice") * 100).cast("long")
    disc_e2 = F.round(F.col("l_discount") * 100).cast("long")
    rev_e4 = price_c * (100 - disc_e2)
    promo = F.col("p_type") == "PROMO"
    return li.join(F.broadcast(p), li.l_partkey == p.p_partkey).agg(
        F.sum(F.when(promo, rev_e4).otherwise(F.lit(0))).alias("promo_rev_e4"),
        F.sum(rev_e4).alias("total_rev_e4"),
    )


SQL_TPCH_Q14 = """
SELECT
  CAST(sum(CASE WHEN p_type = 'PROMO'
        THEN CAST(round(l_extendedprice*100) AS BIGINT)
             * (100 - CAST(round(l_discount*100) AS BIGINT))
        ELSE 0 END) AS BIGINT) AS promo_rev_e4,
  CAST(sum(CAST(round(l_extendedprice*100) AS BIGINT)
           * (100 - CAST(round(l_discount*100) AS BIGINT))) AS BIGINT)
    AS total_rev_e4
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE l_shipdate >= TIMESTAMP '1997-03-01'
  AND l_shipdate < TIMESTAMP '1997-04-01'
"""


def q_tpch_q19(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape: disjunctive multi-attribute predicate over a
    broadcast part join. Catalyst pushes the common l_quantity bounds
    to the scan and evaluates the OR-of-ANDs post-join in codegen;
    adapted to the testdata's p_brand/p_size domain (no p_container)."""
    li = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part").select("p_partkey", "p_brand", "p_size")
    price_c = F.round(F.col("l_extendedprice") * 100).cast("long")
    disc_e2 = F.round(F.col("l_discount") * 100).cast("long")
    rev_e4 = price_c * (100 - disc_e2)
    qty = F.col("l_quantity")
    cond = (
        (
            (F.col("p_brand") == "Brand#1")
            & F.col("p_size").between(1, 15)
            & qty.between(1, 11)
        )
        | (
            (F.col("p_brand") == "Brand#2")
            & F.col("p_size").between(1, 25)
            & qty.between(10, 20)
        )
        | (
            (F.col("p_brand") == "Brand#3")
            & F.col("p_size").between(1, 50)
            & qty.between(20, 30)
        )
    )
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .where(cond)
        .agg(
            F.sum(rev_e4).alias("revenue_e4"),
            F.count(F.lit(1)).alias("n_rows"),
        )
    )


SQL_TPCH_Q19 = """
SELECT
  CAST(sum(CAST(round(l_extendedprice*100) AS BIGINT)
           * (100 - CAST(round(l_discount*100) AS BIGINT))) AS BIGINT)
    AS revenue_e4,
  count(*) AS n_rows
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15
       AND l_quantity BETWEEN 1 AND 11)
   OR (p_brand = 'Brand#2' AND p_size BETWEEN 1 AND 25
       AND l_quantity BETWEEN 10 AND 20)
   OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 50
       AND l_quantity BETWEEN 20 AND 30)
"""

ANALYTIC_QUERIES.update(
    {
        "tpch_q4": q_tpch_q4,
        "tpch_q12": q_tpch_q12,
        "tpch_q14": q_tpch_q14,
        "tpch_q19": q_tpch_q19,
    }
)
ANALYTIC_ORACLES.update(
    {
        "tpch_q4": SQL_TPCH_Q4,
        "tpch_q12": SQL_TPCH_Q12,
        "tpch_q14": SQL_TPCH_Q14,
        "tpch_q19": SQL_TPCH_Q19,
    }
)


# ----------------------------------------------- sessionization + streaming
def q_events_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization (gaps-and-islands): per-user sessions
    split at >30 min inactivity — the classic training-data-pipeline
    shape (activity segmentation before per-session feature extraction).

    All Catalyst-native window functions (lag + running sum), one shuffle
    on user_id; the default RANGE frame makes tie rows (duplicate ts)
    land in the same session regardless of intra-tie order, so the
    result is deterministic and hash-comparable against DuckDB's
    identical window semantics. At 100 TB this is a single
    hash-partitioned sort per user shard — no UDFs, no driver state.
    """
    from pyspark.sql import Window

    gap_us = 30 * 60 * 1_000_000
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts")
    prev_us = F.unix_micros(F.lag("ts").over(w).cast("timestamp"))
    new_flag = (
        F.when(prev_us.isNull() | (_us("ts") - prev_us > gap_us), 1).otherwise(0)
    )
    sess = ev.withColumn("_new", new_flag).withColumn(
        "session_id", F.sum("_new").over(w).cast("long")
    )
    return sess.groupBy("user_id", "session_id").agg(
        F.min(_us("ts")).alias("session_start_us"),
        F.max(_us("ts")).alias("session_end_us"),
        F.count(F.lit(1)).alias("n_events"),
        F.sum(F.round(F.col("value") * 1000000).cast("long")).alias("sum_value_e6"),
    )


SQL_EVENTS_SESSIONS = """
SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
  min(epoch_us(ts)) AS session_start_us,
  max(epoch_us(ts)) AS session_end_us,
  count(*) AS n_events,
  CAST(sum(CAST(round(value*1000000) AS BIGINT)) AS BIGINT) AS sum_value_e6
FROM (
  SELECT user_id, ts, value,
    sum(new_flag) OVER (PARTITION BY user_id ORDER BY ts) AS session_id
  FROM (
    SELECT user_id, ts, value,
      CASE WHEN prev_ts IS NULL
                OR epoch_us(ts) - epoch_us(prev_ts) > 1800000000
           THEN 1 ELSE 0 END AS new_flag
    FROM (
      SELECT user_id, ts, value,
        lag(ts) OVER (PARTITION BY user_id ORDER BY ts) AS prev_ts
      FROM events
    )
  )
)
GROUP BY 1, 2
"""


def q_events_hourly_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The hourly rollup as a GENUINE Structured Streaming query: the
    events table is read as a file stream, aggregated with a tumbling
    event-time window, and drained with trigger(availableNow) into a
    memory sink in complete mode. The emitted table must hash-equal the
    batch/DuckDB rollup — streaming-vs-batch parity is the exactly-once
    guarantee surfaced as an oracle check (reference semantics:
    SpannerStreamingChangeEventSource drains the same events whether
    polled live or replayed).

    complete mode (not append) so the final emission covers every
    window independent of watermark cutoff — deterministic for a finite
    source. n_users (countDistinct) is omitted: distinct aggregates are
    unsupported in streaming; the batch variant (events_hourly) keeps it.
    """
    import uuid

    path = os.path.join(sf_dir, "events.parquet")
    schema = spark.read.parquet(path).schema
    # the testdata table is a single parquet FILE; FileStreamSource only
    # accepts a directory, so stream the parent dir with a leaf-name glob
    if os.path.isdir(path):
        sdf = spark.readStream.schema(schema).parquet(path)
    else:
        sdf = (
            spark.readStream.schema(schema)
            .option("pathGlobFilter", os.path.basename(path))
            .parquet(sf_dir)
        )
    agg = (
        sdf.groupBy(
            F.window(F.col("ts").cast("timestamp"), "1 hour").alias("w"),
            "event_type",
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.round(F.col("value") * 1000000).cast("long")).alias(
                "sum_value_e6"
            ),
        )
        .select(
            F.unix_micros(F.col("w.start").cast("timestamp")).alias("hour_us"),
            "event_type",
            "n_events",
            "sum_value_e6",
        )
    )
    name = "evh_stream_" + uuid.uuid4().hex[:8]
    q = (
        agg.writeStream.format("memory")
        .queryName(name)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(name)


SQL_EVENTS_HOURLY_STREAM = """
SELECT epoch_us(date_trunc('hour', ts)) AS hour_us, event_type,
  count(*) AS n_events,
  CAST(sum(CAST(round(value*1000000) AS BIGINT)) AS BIGINT) AS sum_value_e6
FROM events GROUP BY 1, 2
"""

ANALYTIC_QUERIES.update(
    {
        "events_sessions": q_events_sessions,
        "events_hourly_stream": q_events_hourly_stream,
    }
)
ANALYTIC_ORACLES.update(
    {
        "events_sessions": SQL_EVENTS_SESSIONS,
        "events_hourly_stream": SQL_EVENTS_HOURLY_STREAM,
    }
)


# ------------------------------------------------ metrics-style quantiles
def q_events_value_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact per-group value percentiles (p50/p90/p99) — the M2 metrics
    surface (reference SpannerMeter percentile gauges,
    metrics/SpannerMeter.java:298-384) exposed as an oracle-checked
    query. percentile_disc picks an existing element (no interpolation),
    so Spark and DuckDB agree bit-for-bit on doubles; at scale this is
    one shuffle + a per-group sort — swap to approx_percentile sketches
    when exactness isn't required (the engine's metrics lane already
    does, streaming/engine.py quantile extras)."""
    ev = _t(spark, sf_dir, "events")
    ev.createOrReplaceTempView("__ev_q")
    return spark.sql(
        """
        SELECT event_type,
          percentile_disc(0.5)  WITHIN GROUP (ORDER BY value) AS p50,
          percentile_disc(0.9)  WITHIN GROUP (ORDER BY value) AS p90,
          percentile_disc(0.99) WITHIN GROUP (ORDER BY value) AS p99,
          CAST(count(*) AS BIGINT) AS n
        FROM __ev_q GROUP BY event_type
        """
    )


SQL_EVENTS_VALUE_QUANTILES = """
SELECT event_type,
  quantile_disc(value, 0.5) AS p50,
  quantile_disc(value, 0.9) AS p90,
  quantile_disc(value, 0.99) AS p99,
  CAST(count(*) AS BIGINT) AS n
FROM events GROUP BY event_type
"""

ANALYTIC_QUERIES.update({"events_value_quantiles": q_events_value_quantiles})
ANALYTIC_ORACLES.update({"events_value_quantiles": SQL_EVENTS_VALUE_QUANTILES})


# ------------------------------------------------ TPC-H shapes, 3rd wave
def q_tpch_q10(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 returned-item revenue by customer (fact-fact join +
    two broadcast dims + wide groupBy). No LIMIT so the compare is
    order-insensitive; money in exact integer space per the module
    hash rules."""
    cust = _t(spark, sf_dir, "customer")
    nation = _t(spark, sf_dir, "nation")
    orders = _t(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1995-10-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-01-01").cast("timestamp"))
    )
    li = _t(spark, sf_dir, "lineitem").where(F.col("l_returnflag") == "R")
    price_c = F.round(F.col("l_extendedprice") * 100).cast("long")
    disc_e2 = F.round(F.col("l_discount") * 100).cast("long")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy(
            "c_custkey",
            "c_name",
            F.round(F.col("c_acctbal") * 100).cast("long").alias("acctbal_cents"),
            "n_name",
        )
        .agg(F.sum(price_c * (100 - disc_e2)).alias("revenue_e4"))
    )


SQL_TPCH_Q10 = """
SELECT c_custkey, c_name,
  CAST(round(c_acctbal*100) AS BIGINT) AS acctbal_cents, n_name,
  CAST(sum(CAST(round(l_extendedprice*100) AS BIGINT)
      * (100 - CAST(round(l_discount*100) AS BIGINT))) AS BIGINT) AS revenue_e4
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
WHERE l_returnflag = 'R'
  AND o_orderdate >= TIMESTAMP '1995-10-01'
  AND o_orderdate <  TIMESTAMP '1996-01-01'
GROUP BY 1, 2, 3, 4
"""


def q_tpch_q16(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape: distinct-supplier count per part attribute with a
    NOT-IN exclusion subquery. Adapted to the testdata schema (no
    partsupp: lineitem provides the part->supplier relation; the
    'complaints' exclusion is suppliers with negative balance). The
    exclusion is a broadcast LEFT ANTI join — never a shuffle of the
    fact side against a subquery."""
    part = _t(spark, sf_dir, "part")
    li = _t(spark, sf_dir, "lineitem")
    bad = (
        _t(spark, sf_dir, "supplier")
        .where(F.col("s_acctbal") < 0)
        .select("s_suppkey")
    )
    return (
        li.join(F.broadcast(bad), li.l_suppkey == bad.s_suppkey, "left_anti")
        .join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


SQL_TPCH_Q16 = """
SELECT p_brand, p_type, p_size,
  CAST(count(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
GROUP BY 1, 2, 3
"""


def q_tpch_q18(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 large-volume customers: pre-aggregate the fact table,
    then broadcast the tiny HAVING survivors back onto orders/customer —
    the aggregate-then-semi-join shape that avoids ever widening the
    fact table."""
    li = _t(spark, sf_dir, "lineitem")
    qty_e2 = F.round(F.col("l_quantity") * 100).cast("long")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum(qty_e2).alias("qty_e2"))
        .where(F.col("qty_e2") > 300 * 100)
    )
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")
    return (
        orders.join(F.broadcast(big), orders.o_orderkey == big.l_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .select(
            "c_custkey",
            "c_name",
            "o_orderkey",
            _us("o_orderdate").alias("o_orderdate_us"),
            F.round(F.col("o_totalprice") * 100).cast("long").alias("total_cents"),
            "qty_e2",
        )
    )


SQL_TPCH_Q18 = """
WITH big AS (
  SELECT l_orderkey,
         CAST(sum(CAST(round(l_quantity*100) AS BIGINT)) AS BIGINT) AS qty_e2
  FROM lineitem GROUP BY 1
  HAVING sum(CAST(round(l_quantity*100) AS BIGINT)) > 30000
)
SELECT c_custkey, c_name, o_orderkey,
  epoch_us(o_orderdate) AS o_orderdate_us,
  CAST(round(o_totalprice*100) AS BIGINT) AS total_cents, qty_e2
FROM orders JOIN big ON o_orderkey = l_orderkey
JOIN customer ON o_custkey = c_custkey
"""


def q_events_dedup_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stateful streaming dedup (O12 as a streaming operator): the events
    file stream deduplicated on the at-least-once identity
    (user_id, event_type, value_e6) with dropDuplicates, drained via
    trigger(availableNow) into an append-mode memory sink. The emitted
    distinct set must hash-equal batch DISTINCT — dedup parity between
    live-stream and replay paths. State is bounded by the key space; a
    production stream would add withWatermark +
    dropDuplicatesWithinWatermark to expire keys."""
    path = os.path.join(sf_dir, "events.parquet")
    schema = spark.read.parquet(path).schema
    if os.path.isdir(path):
        sdf = spark.readStream.schema(schema).parquet(path)
    else:
        sdf = (
            spark.readStream.schema(schema)
            .option("pathGlobFilter", os.path.basename(path))
            .parquet(sf_dir)
        )
    dd = sdf.select(
        "user_id",
        "event_type",
        F.round(F.col("value") * 1000000).cast("long").alias("value_e6"),
    ).dropDuplicates(["user_id", "event_type", "value_e6"])
    name = "events_dedup_stream_sink"
    q = (
        dd.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(name)


SQL_EVENTS_DEDUP_STREAM = """
SELECT DISTINCT user_id, event_type,
  CAST(round(value*1000000) AS BIGINT) AS value_e6
FROM events
"""

ANALYTIC_QUERIES.update(
    {
        "tpch_q10": q_tpch_q10,
        "tpch_q16": q_tpch_q16,
        "tpch_q18": q_tpch_q18,
        "events_dedup_stream": q_events_dedup_stream,
    }
)
ANALYTIC_ORACLES.update(
    {
        "tpch_q10": SQL_TPCH_Q10,
        "tpch_q16": SQL_TPCH_Q16,
        "tpch_q18": SQL_TPCH_Q18,
        "events_dedup_stream": SQL_EVENTS_DEDUP_STREAM,
    }
)


# ------------------------------------------------ as-of join
def q_events_asof_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Attribution via distributed as-of join (operators/asof.py): every
    click joined to the user's latest prior-or-simultaneous purchase.
    Ties (two purchases at one (user, ts)) resolve to the max event_id
    via the operator's tiebreak ordering — argmax semantics WITHOUT a
    separate dedup aggregation, so the whole query is ONE shuffle (the
    as-of window's); DuckDB's native ASOF LEFT JOIN over an arg_max
    pre-dedup is the oracle (equivalent by construction)."""
    from debezium_connector_spanner_spark.operators.asof import asof_join

    ev = _t(spark, sf_dir, "events")
    clicks = ev.where(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts"
    )
    pur = ev.where(F.col("event_type") == "purchase").select(
        "user_id",
        F.col("ts").alias("purchase_ts"),
        F.col("event_id").alias("purchase_event_id"),
        F.round(F.col("value") * 1000000).cast("long").alias("purchase_value_e6"),
    )
    j = asof_join(
        clicks,
        pur,
        on=["user_id"],
        left_ts="ts",
        right_ts="purchase_ts",
        tiebreak="purchase_event_id",
    )
    return j.select(
        "event_id",
        "user_id",
        _us("ts").alias("click_ts_us"),
        _us("purchase_ts").alias("purchase_ts_us"),
        "purchase_event_id",
        "purchase_value_e6",
    )


SQL_EVENTS_ASOF = """
WITH l AS (
  SELECT event_id, user_id, ts FROM events WHERE event_type = 'click'
), r AS (
  SELECT user_id, ts AS purchase_ts, max(event_id) AS purchase_event_id,
         arg_max(CAST(round(value*1000000) AS BIGINT), event_id)
           AS purchase_value_e6
  FROM events WHERE event_type = 'purchase' GROUP BY 1, 2
)
SELECT l.event_id, l.user_id, epoch_us(l.ts) AS click_ts_us,
       epoch_us(r.purchase_ts) AS purchase_ts_us,
       r.purchase_event_id, r.purchase_value_e6
FROM l ASOF LEFT JOIN r
  ON l.user_id = r.user_id AND l.ts >= r.purchase_ts
"""

ANALYTIC_QUERIES.update({"events_asof_attribution": q_events_asof_attribution})
ANALYTIC_ORACLES.update({"events_asof_attribution": SQL_EVENTS_ASOF})


# ------------------------------------------------ range join
def q_events_purchases_in_click_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range join (operators/rangejoin.py): purchases located inside the
    click-session attribution window [start, end + 30 min] of the same
    user — sessionize one event stream, then bucket-equi-join another
    stream into the intervals. The +30 min tail matches the session gap,
    so windows stay disjoint per user (next session starts STRICTLY more
    than one gap after the previous last click) and each purchase
    matches at most one; the DuckDB oracle is the plain inequality join
    (fine at oracle scale, cartesian at 100 TB — the bucketized shape is
    the point)."""
    from pyspark.sql import Window

    from debezium_connector_spanner_spark.operators.rangejoin import (
        point_in_interval_join,
    )

    gap_us = 30 * 60 * 1_000_000
    ev = _t(spark, sf_dir, "events")
    clicks = ev.where(F.col("event_type") == "click")
    w = Window.partitionBy("user_id").orderBy("ts")
    prev_us = F.unix_micros(F.lag("ts").over(w).cast("timestamp"))
    new_flag = (
        F.when(prev_us.isNull() | (_us("ts") - prev_us > gap_us), 1).otherwise(0)
    )
    sessions = (
        clicks.withColumn("_new", new_flag)
        .withColumn("session_id", F.sum("_new").over(w).cast("long"))
        .groupBy("user_id", "session_id")
        .agg(
            F.min(_us("ts")).alias("session_start_us"),
            (F.max(_us("ts")) + F.lit(gap_us)).alias("session_end_us"),
        )
    )
    purchases = ev.where(F.col("event_type") == "purchase").select(
        "event_id",
        "user_id",
        _us("ts").alias("purchase_ts_us"),
        F.round(F.col("value") * 1000000).cast("long").alias("purchase_value_e6"),
    )
    return point_in_interval_join(
        purchases,
        sessions,
        on=["user_id"],
        point_col="purchase_ts_us",
        start_col="session_start_us",
        end_col="session_end_us",
        bucket_width=gap_us,
    )


SQL_EVENTS_RANGE_SESSIONS = """
WITH c AS (
  SELECT user_id, ts,
    sum(new_flag) OVER (PARTITION BY user_id ORDER BY ts) AS session_id
  FROM (
    SELECT user_id, ts,
      CASE WHEN prev_ts IS NULL
                OR epoch_us(ts) - epoch_us(prev_ts) > 1800000000
           THEN 1 ELSE 0 END AS new_flag
    FROM (
      SELECT user_id, ts,
        lag(ts) OVER (PARTITION BY user_id ORDER BY ts) AS prev_ts
      FROM events WHERE event_type = 'click'
    )
  )
), s AS (
  SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
    min(epoch_us(ts)) AS session_start_us,
    max(epoch_us(ts)) + 1800000000 AS session_end_us
  FROM c GROUP BY 1, 2
), p AS (
  SELECT event_id, user_id, epoch_us(ts) AS purchase_ts_us,
    CAST(round(value*1000000) AS BIGINT) AS purchase_value_e6
  FROM events WHERE event_type = 'purchase'
)
SELECT p.user_id, p.event_id, p.purchase_ts_us, p.purchase_value_e6,
       s.session_id, s.session_start_us, s.session_end_us
FROM p JOIN s ON p.user_id = s.user_id
  AND p.purchase_ts_us BETWEEN s.session_start_us AND s.session_end_us
"""

ANALYTIC_QUERIES.update(
    {"events_purchases_in_click_sessions": q_events_purchases_in_click_sessions}
)
ANALYTIC_ORACLES.update(
    {"events_purchases_in_click_sessions": SQL_EVENTS_RANGE_SESSIONS}
)


# ------------------------------------------------ cube
def q_orders_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE over (status, priority) with grouping_id — all 4 grouping-set
    combinations in ONE pass (partial aggregation covers every set
    before the single shuffle); complements orders_rollup's ROLLUP."""
    o = _t(spark, sf_dir, "orders")
    return (
        o.cube("o_orderstatus", "o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(F.round(F.col("o_totalprice") * 100).cast("long")).alias(
                "total_cents"
            ),
            F.grouping_id().cast("long").alias("gid"),
        )
    )


SQL_ORDERS_CUBE = """
SELECT o_orderstatus, o_orderpriority,
  count(*) AS n_orders,
  CAST(sum(CAST(round(o_totalprice*100) AS BIGINT)) AS BIGINT) AS total_cents,
  CAST(grouping(o_orderstatus) * 2 + grouping(o_orderpriority) AS BIGINT) AS gid
FROM orders
GROUP BY CUBE (o_orderstatus, o_orderpriority)
"""

ANALYTIC_QUERIES.update({"orders_cube": q_orders_cube})
ANALYTIC_ORACLES.update({"orders_cube": SQL_ORDERS_CUBE})


# ------------------------------------------- round-4 relational breadth
def q_tpch_q7(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 volume shipping between two nations: the widest join
    breadth in the suite — ONE fact-fact shuffle (lineitem x orders on
    orderkey); customer/supplier/nation legs fold into two broadcast
    maps built dim-side BEFORE touching the fact table, so the 5-way
    join adds zero extra exchanges at 100x."""
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders")
    nat = _t(spark, sf_dir, "nation").where(
        F.col("n_name").isin("NATION_1", "NATION_2")
    )
    cust_n = (
        _t(spark, sf_dir, "customer")
        .join(nat, F.col("c_nationkey") == nat.n_nationkey)
        .select("c_custkey", F.col("n_name").alias("cust_nation"))
    )
    supp_n = (
        _t(spark, sf_dir, "supplier")
        .join(nat, F.col("s_nationkey") == nat.n_nationkey)
        .select("s_suppkey", F.col("n_name").alias("supp_nation"))
    )
    price_c = F.round(F.col("l_extendedprice") * 100).cast("long")
    disc_e2 = F.round(F.col("l_discount") * 100).cast("long")
    return (
        li.join(F.broadcast(supp_n), li.l_suppkey == supp_n.s_suppkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust_n), orders.o_custkey == cust_n.c_custkey)
        .where(F.col("supp_nation") != F.col("cust_nation"))
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").cast("long").alias("l_year"),
        )
        .agg(F.sum(price_c * (100 - disc_e2)).alias("revenue_e4"))
    )


SQL_TPCH_Q7 = """
SELECT supp_nation, cust_nation, l_year,
  CAST(sum(vol_e4) AS BIGINT) AS revenue_e4
FROM (
  SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
    CAST(year(l_shipdate) AS BIGINT) AS l_year,
    CAST(round(l_extendedprice*100) AS BIGINT)
      * (100 - CAST(round(l_discount*100) AS BIGINT)) AS vol_e4
  FROM lineitem
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN orders   ON l_orderkey = o_orderkey
  JOIN customer ON o_custkey = c_custkey
  JOIN nation n1 ON s_nationkey = n1.n_nationkey
  JOIN nation n2 ON c_nationkey = n2.n_nationkey
  WHERE n1.n_name IN ('NATION_1','NATION_2')
    AND n2.n_name IN ('NATION_1','NATION_2')
    AND n1.n_name <> n2.n_name
) GROUP BY 1, 2, 3
"""


def q_tpch_q13(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 customer order-count distribution: LEFT OUTER join with
    an ON-clause filter (kept customers with zero qualifying orders must
    surface as c_count=0), then a second aggregation over the first —
    the double-agg shape. The second groupBy is over ~100 distinct
    counts: its exchange is trivially small at any scale."""
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders").where(
        F.col("o_orderpriority") != "1-URGENT"
    )
    per_cust = (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left_outer")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))  # counts non-null only
    )
    return per_cust.groupBy("c_count").agg(
        F.count(F.lit(1)).alias("custdist")
    )


SQL_TPCH_Q13 = """
SELECT c_count, CAST(count(*) AS BIGINT) AS custdist
FROM (
  SELECT c_custkey, CAST(count(o_orderkey) AS BIGINT) AS c_count
  FROM customer LEFT OUTER JOIN orders
    ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
  GROUP BY c_custkey
) GROUP BY c_count
"""


def q_tpch_q15(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 top supplier: per-supplier revenue over a quarter, keep
    the max-revenue supplier(s). The max is a 1-row aggregate broadcast
    back onto the (already small) per-supplier rollup — no window over
    the full frame, no second scan of the fact table."""
    li = _t(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    price_c = F.round(F.col("l_extendedprice") * 100).cast("long")
    disc_e2 = F.round(F.col("l_discount") * 100).cast("long")
    revenue = li.groupBy("l_suppkey").agg(
        F.sum(price_c * (100 - disc_e2)).alias("total_revenue_e4")
    )
    top = revenue.agg(F.max("total_revenue_e4").alias("_max_rev"))
    supp = _t(spark, sf_dir, "supplier")
    return (
        revenue.join(
            F.broadcast(top), revenue.total_revenue_e4 == top._max_rev
        )
        .join(F.broadcast(supp), F.col("l_suppkey") == supp.s_suppkey)
        .select("s_suppkey", "s_name", "total_revenue_e4")
    )


SQL_TPCH_Q15 = """
WITH revenue AS (
  SELECT l_suppkey,
    CAST(sum(CAST(round(l_extendedprice*100) AS BIGINT)
        * (100 - CAST(round(l_discount*100) AS BIGINT))) AS BIGINT)
      AS total_revenue_e4
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1996-01-01'
    AND l_shipdate <  TIMESTAMP '1996-04-01'
  GROUP BY l_suppkey
)
SELECT s_suppkey, s_name, total_revenue_e4
FROM supplier JOIN revenue ON s_suppkey = l_suppkey
WHERE total_revenue_e4 = (SELECT max(total_revenue_e4) FROM revenue)
"""


def q_tpch_q17(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 small-quantity-order revenue: the correlated per-part
    AVG subquery decorrelated into an aggregate-then-broadcast-join
    (per-part sums are |parts|-sized — broadcastable at any SF since
    parts ~ fixed catalog). The 0.2*avg threshold compares in exact
    integer space (5*qty*cnt < sum_qty) — no float division drift."""
    li = _t(spark, sf_dir, "lineitem")
    qty_e2 = F.round(F.col("l_quantity") * 100).cast("long")
    per_part = li.groupBy("l_partkey").agg(
        F.sum(qty_e2).alias("_sum_qty_e2"),
        F.count(F.lit(1)).alias("_cnt"),
    )
    parts = _t(spark, sf_dir, "part").where(F.col("p_brand") == "Brand#3")
    price_c = F.round(F.col("l_extendedprice") * 100).cast("long")
    return (
        li.join(F.broadcast(parts), li.l_partkey == parts.p_partkey)
        .join(F.broadcast(per_part), "l_partkey")
        .where(qty_e2 * 5 * F.col("_cnt") < F.col("_sum_qty_e2"))
        .agg(
            F.sum(price_c).alias("total_price_cents"),
            F.count(F.lit(1)).alias("n_small_lines"),
        )
    )


SQL_TPCH_Q17 = """
SELECT
  CAST(sum(CAST(round(l_extendedprice*100) AS BIGINT)) AS BIGINT)
    AS total_price_cents,
  CAST(count(*) AS BIGINT) AS n_small_lines
FROM lineitem
JOIN part ON l_partkey = p_partkey
JOIN (
  SELECT l_partkey AS pk,
    CAST(sum(CAST(round(l_quantity*100) AS BIGINT)) AS BIGINT) AS sum_qty_e2,
    CAST(count(*) AS BIGINT) AS cnt
  FROM lineitem GROUP BY 1
) ON l_partkey = pk
WHERE p_brand = 'Brand#3'
  AND CAST(round(l_quantity*100) AS BIGINT) * 5 * cnt < sum_qty_e2
"""


def q_tpch_q22(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape (global sales opportunity): customers with
    above-average balance and NO urgent orders — a scalar aggregate
    broadcast as a threshold plus a LEFT ANTI join against the urgent
    order custkeys (every synthetic customer has SOME order, so the
    classic no-orders predicate would be vacuously empty), grouped
    by market segment (the schema's stand-in for the phone country
    code). The above-avg compare cross-multiplies in cents (bal*cnt >
    sum) so both engines decide identically."""
    cust = _t(spark, sf_dir, "customer")
    bal_c = F.round(F.col("c_acctbal") * 100).cast("long")
    pos = cust.where(F.col("c_acctbal") > 0)
    thresh = pos.agg(
        F.sum(bal_c).alias("_sum_bal"), F.count(F.lit(1)).alias("_cnt")
    )
    urgent = (
        _t(spark, sf_dir, "orders")
        .where(F.col("o_orderpriority") == "1-URGENT")
        .select("o_custkey")
    )
    return (
        cust.crossJoin(F.broadcast(thresh))  # 1-row scalar threshold
        .where(bal_c * F.col("_cnt") > F.col("_sum_bal"))
        .join(urgent, cust.c_custkey == urgent.o_custkey, "left_anti")
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            F.sum(bal_c).alias("totacctbal_cents"),
        )
    )


SQL_TPCH_Q22 = """
WITH t AS (
  SELECT CAST(sum(CAST(round(c_acctbal*100) AS BIGINT)) AS BIGINT) AS sum_bal,
         CAST(count(*) AS BIGINT) AS cnt
  FROM customer WHERE c_acctbal > 0
)
SELECT c_mktsegment,
  CAST(count(*) AS BIGINT) AS numcust,
  CAST(sum(CAST(round(c_acctbal*100) AS BIGINT)) AS BIGINT) AS totacctbal_cents
FROM customer, t
WHERE CAST(round(c_acctbal*100) AS BIGINT) * cnt > sum_bal
  AND c_custkey NOT IN (SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT')
GROUP BY c_mktsegment
"""

ANALYTIC_QUERIES.update(
    {
        "tpch_q7": q_tpch_q7,
        "tpch_q13": q_tpch_q13,
        "tpch_q15": q_tpch_q15,
        "tpch_q17": q_tpch_q17,
        "tpch_q22": q_tpch_q22,
    }
)
ANALYTIC_ORACLES.update(
    {
        "tpch_q7": SQL_TPCH_Q7,
        "tpch_q13": SQL_TPCH_Q13,
        "tpch_q15": SQL_TPCH_Q15,
        "tpch_q17": SQL_TPCH_Q17,
        "tpch_q22": SQL_TPCH_Q22,
    }
)


def q_events_sessions_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sessionization as a GENUINE Structured Streaming query: Spark's
    native session_window (gap-merging stateful operator) over the
    events file stream, drained with trigger(availableNow) into a
    complete-mode memory sink. Must hash-equal the batch gaps-and-islands
    rollup (events_sessions minus the ordinal session_id): streaming and
    replay paths segment identically.

    session_window's end is last_event_ts + gap, so the emitted
    session_end_us subtracts the gap back to the last event — making the
    output directly comparable with max(ts) in the batch/DuckDB fold.
    Boundary note: session_window merges strictly-closer-than-gap events
    while the batch query splits on diff > gap; the two differ only for
    a pair at EXACTLY the 30-minute mark, which the µs-resolution
    synthetic stream never produces (and the hash compare would catch).
    """
    gap_us = 30 * 60 * 1_000_000
    path = os.path.join(sf_dir, "events.parquet")
    schema = spark.read.parquet(path).schema
    if os.path.isdir(path):
        sdf = spark.readStream.schema(schema).parquet(path)
    else:
        sdf = (
            spark.readStream.schema(schema)
            .option("pathGlobFilter", os.path.basename(path))
            .parquet(sf_dir)
        )
    agg = (
        sdf.groupBy(
            "user_id",
            F.session_window(F.col("ts").cast("timestamp"), "30 minutes").alias(
                "sw"
            ),
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.round(F.col("value") * 1000000).cast("long")).alias(
                "sum_value_e6"
            ),
        )
        .select(
            "user_id",
            F.unix_micros("sw.start").alias("session_start_us"),
            (F.unix_micros("sw.end") - F.lit(gap_us)).alias("session_end_us"),
            "n_events",
            "sum_value_e6",
        )
    )
    name = "events_sessions_stream_sink"
    q = (
        agg.writeStream.format("memory")
        .queryName(name)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(name)


SQL_EVENTS_SESSIONS_STREAM = """
SELECT user_id,
  min(epoch_us(ts)) AS session_start_us,
  max(epoch_us(ts)) AS session_end_us,
  count(*) AS n_events,
  CAST(sum(CAST(round(value*1000000) AS BIGINT)) AS BIGINT) AS sum_value_e6
FROM (
  SELECT user_id, ts, value,
    sum(new_flag) OVER (PARTITION BY user_id ORDER BY ts) AS session_id
  FROM (
    SELECT user_id, ts, value,
      CASE WHEN prev_ts IS NULL
                OR epoch_us(ts) - epoch_us(prev_ts) > 1800000000
           THEN 1 ELSE 0 END AS new_flag
    FROM (
      SELECT user_id, ts, value,
        lag(ts) OVER (PARTITION BY user_id ORDER BY ts) AS prev_ts
      FROM events
    )
  )
) GROUP BY user_id, session_id
"""

ANALYTIC_QUERIES.update({"events_sessions_stream": q_events_sessions_stream})
ANALYTIC_ORACLES.update({"events_sessions_stream": SQL_EVENTS_SESSIONS_STREAM})


def q_tpch_q8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 national market share: the deepest dim chain in the
    suite (region -> nation -> customer on one leg, nation -> supplier
    on the other, part filter on a third), all folded into broadcast
    maps before the single lineitem x orders fact shuffle. The share is
    emitted as exact integer numerator/denominator (revenue_e4) per
    year — a float division would be the only drift risk, so it is left
    to the consumer."""
    nat = _t(spark, sf_dir, "nation")
    reg = _t(spark, sf_dir, "region").where(F.col("r_name") == "AMERICA")
    cust_in_region = (
        _t(spark, sf_dir, "customer")
        .join(nat, F.col("c_nationkey") == nat.n_nationkey)
        .join(reg, nat.n_regionkey == reg.r_regionkey)
        .select("c_custkey")
    )
    supp_n = (
        _t(spark, sf_dir, "supplier")
        .join(nat, F.col("s_nationkey") == nat.n_nationkey)
        .select("s_suppkey", F.col("n_name").alias("supp_nation"))
    )
    parts = _t(spark, sf_dir, "part").where(F.col("p_type") == "ECONOMY").select(
        "p_partkey"
    )
    orders = _t(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1995-01-01").cast("timestamp"))
        & (F.col("o_orderdate") <= F.lit("1996-12-31").cast("timestamp"))
    )
    li = _t(spark, sf_dir, "lineitem")
    vol = F.round(F.col("l_extendedprice") * 100).cast("long") * (
        100 - F.round(F.col("l_discount") * 100).cast("long")
    )
    return (
        li.join(F.broadcast(parts), li.l_partkey == parts.p_partkey)
        .join(F.broadcast(supp_n), li.l_suppkey == supp_n.s_suppkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust_in_region), orders.o_custkey == cust_in_region.c_custkey)
        .groupBy(F.year("o_orderdate").cast("long").alias("o_year"))
        .agg(
            F.sum(vol).alias("total_volume_e4"),
            F.sum(
                F.when(F.col("supp_nation") == "NATION_1", vol).otherwise(0)
            ).alias("nation1_volume_e4"),
        )
    )


SQL_TPCH_Q8 = """
SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year,
  CAST(sum(vol_e4) AS BIGINT) AS total_volume_e4,
  CAST(sum(CASE WHEN supp_nation = 'NATION_1' THEN vol_e4 ELSE 0 END) AS BIGINT)
    AS nation1_volume_e4
FROM (
  SELECT o_orderdate, n2.n_name AS supp_nation,
    CAST(round(l_extendedprice*100) AS BIGINT)
      * (100 - CAST(round(l_discount*100) AS BIGINT)) AS vol_e4
  FROM lineitem
  JOIN part     ON l_partkey = p_partkey
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN orders   ON l_orderkey = o_orderkey
  JOIN customer ON o_custkey = c_custkey
  JOIN nation n1 ON c_nationkey = n1.n_nationkey
  JOIN region   ON n1.n_regionkey = r_regionkey
  JOIN nation n2 ON s_nationkey = n2.n_nationkey
  WHERE r_name = 'AMERICA' AND p_type = 'ECONOMY'
    AND o_orderdate BETWEEN TIMESTAMP '1995-01-01' AND TIMESTAMP '1996-12-31'
) GROUP BY 1
"""

ANALYTIC_QUERIES.update({"tpch_q8": q_tpch_q8})
ANALYTIC_ORACLES.update({"tpch_q8": SQL_TPCH_Q8})


def q_events_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered-sequence funnel (view -> click -> purchase): per user, the
    first view, the first click strictly after it, and the first
    purchase strictly after that, plus the stage reached.

    Spill-safe min-filter cascade (r5, VERDICT r4 #3): the r4 version
    buffered each user's full event sequence in a sort_array(collect_list)
    fold — O(events-per-user) executor memory, an OOM hazard for a
    mega-user at 10^10 events. This shape carries O(1) aggregation state
    per key at every stage:

      v = min(t) over views                    (map-side combined: tiny)
      c = min(t) over clicks    joined v, t > v
      p = min(t) over purchases joined c, t > c

    Every aggregate is a plain HashAggregate min (no object buffers,
    guarded by tests/test_semantics.py::test_funnel_mega_user_plan);
    total shuffled volume matches the old single shuffle (each event
    type crosses the wire once) and the per-user cascades stay
    co-partitioned on user_id, so Catalyst reuses the exchanges. A
    mega-user costs one reducer linear TIME, never memory. Provably
    equivalent to the sequence fold because every stage comparison is
    strict (>) on both sides — the DuckDB oracle uses the identical
    min-filter CTE shape."""
    ev = _t(spark, sf_dir, "events").where(
        F.col("event_type").isin("view", "click", "purchase")
    )
    e = ev.select("user_id", _us("ts").alias("t"), "event_type")
    users = e.select("user_id").distinct()
    v = (
        e.where(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("t").alias("view_us"))
    )
    c = (
        e.where(F.col("event_type") == "click")
        .join(v, "user_id")
        .where(F.col("t") > F.col("view_us"))
        .groupBy("user_id")
        .agg(F.min("t").alias("click_us"))
    )
    p = (
        e.where(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .where(F.col("t") > F.col("click_us"))
        .groupBy("user_id")
        .agg(F.min("t").alias("purchase_us"))
    )
    out = (
        users.join(v, "user_id", "left")
        .join(c, "user_id", "left")
        .join(p, "user_id", "left")
    )
    stage = (
        F.col("view_us").isNotNull().cast("long")
        + F.col("click_us").isNotNull().cast("long")
        + F.col("purchase_us").isNotNull().cast("long")
    )
    return out.select(
        "user_id", "view_us", "click_us", "purchase_us", stage.alias("stage")
    )


SQL_EVENTS_FUNNEL = """
WITH e AS (
  SELECT user_id, epoch_us(ts) AS t, event_type
  FROM events WHERE event_type IN ('view','click','purchase')
),
v AS (SELECT user_id, min(t) AS view_us FROM e WHERE event_type='view' GROUP BY 1),
c AS (
  SELECT e.user_id, min(t) AS click_us
  FROM e JOIN v USING (user_id)
  WHERE event_type='click' AND t > view_us GROUP BY 1
),
p AS (
  SELECT e.user_id, min(t) AS purchase_us
  FROM e JOIN c USING (user_id)
  WHERE event_type='purchase' AND t > click_us GROUP BY 1
)
SELECT u.user_id, view_us, click_us, purchase_us,
  CAST(CASE WHEN view_us IS NULL THEN 0 ELSE 1 END
     + CASE WHEN click_us IS NULL THEN 0 ELSE 1 END
     + CASE WHEN purchase_us IS NULL THEN 0 ELSE 1 END AS BIGINT) AS stage
FROM (SELECT DISTINCT user_id FROM e) u
LEFT JOIN v USING (user_id)
LEFT JOIN c USING (user_id)
LEFT JOIN p USING (user_id)
"""

ANALYTIC_QUERIES.update({"events_funnel": q_events_funnel})
ANALYTIC_ORACLES.update({"events_funnel": SQL_EVENTS_FUNNEL})
