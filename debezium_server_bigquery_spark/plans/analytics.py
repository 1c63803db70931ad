"""Analytic query library over the replicated star schema.

The reference has no query engine — users query the replicated BigQuery
tables with SQL (SURVEY §2.3-§2.5: joins/aggregations/windows are
"BigQuery-side").  In this engine those queries are first-class: each entry
is a declarative DataFrame plan (Catalyst does join selection, pushdown,
pruning) with an ANSI-SQL twin for the DuckDB oracle.

Cross-engine determinism convention
-----------------------------------
Floating-point SUMs are order-dependent, and Spark's partial aggregation
order differs from DuckDB's.  Every aggregate therefore:

1. casts source doubles to DECIMAL **before** arithmetic (source values are
   2-decimal money/rate columns, so double->decimal rounding is unambiguous),
2. does products/sums in decimal (exact, order-independent),
3. casts the final value to DOUBLE (decimal->double is deterministic).

Join strategy notes (100 TB): region/nation/customer/supplier/part are
dimension tables — they are explicitly ``broadcast()`` so every fact join
is a broadcast hash join with no shuffle of ``lineitem``/``orders``.
At cluster scale only the groupBy aggregation exchanges data, and it
partial-aggregates map-side first.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast

from debezium_server_bigquery_spark.sources.tables import load_table

MONEY = "decimal(18,2)"  # money / quantity columns (2-decimal doubles)
RATE = "decimal(5,2)"  # discount / tax rates in [0,1]


def _dec(col, t=MONEY):
    return (col if isinstance(col, Column) else F.col(col)).cast(t)


# --------------------------------------------------------------------------
# Q1 — pricing summary (TPC-H Q1 shape): scan-heavy agg, no join.
# --------------------------------------------------------------------------
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    # spread=True: the 8 decimal aggregates dominate q1's cost, and the
    # driver testdata is a single-row-group file (one scan task).  The
    # round-robin rebalance fans the aggregation across cores; at real
    # scale (thousands of splits) the loader's partition-count guard makes
    # it a no-op.  Join-shaped plans must NOT do this — the extra exchange
    # breaks AQE's broadcast piggybacking (measured 1.5-2x slower on
    # q3/q5/q8/q9/q18/q21).
    li = load_table(spark, sf_dir, "lineitem", spread=True)
    disc_price = _dec("l_extendedprice") * (F.lit(1).cast(RATE) - _dec("l_discount", RATE))
    charge = disc_price * (F.lit(1).cast(RATE) + _dec("l_tax", RATE))
    sum_qty = F.sum(_dec("l_quantity"))
    sum_price = F.sum(_dec("l_extendedprice"))
    sum_disc = F.sum(_dec("l_discount", RATE))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("2001-09-01"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            sum_qty.cast("double").alias("sum_qty"),
            sum_price.cast("double").alias("sum_base_price"),
            F.sum(disc_price).cast("double").alias("sum_disc_price"),
            F.sum(charge).cast("double").alias("sum_charge"),
            (sum_qty.cast("double") / F.count("*")).alias("avg_qty"),
            (sum_price.cast("double") / F.count("*")).alias("avg_price"),
            (sum_disc.cast("double") / F.count("*")).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


Q1_SQL = """
SELECT l_returnflag, l_linestatus,
  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(5,2)) - CAST(l_discount AS DECIMAL(5,2)))) AS DOUBLE) AS sum_disc_price,
  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(5,2)) - CAST(l_discount AS DECIMAL(5,2))) * (CAST(1 AS DECIMAL(5,2)) + CAST(l_tax AS DECIMAL(5,2)))) AS DOUBLE) AS sum_charge,
  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_qty,
  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_price,
  CAST(SUM(CAST(l_discount AS DECIMAL(5,2))) AS DOUBLE) / COUNT(*) AS avg_disc,
  COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '2001-09-01'
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
"""


# --------------------------------------------------------------------------
# Q3 — shipping priority: 3-way join, broadcast the filtered customer dim.
# --------------------------------------------------------------------------
def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1998-03-15")
    )
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1998-03-15")
    )
    revenue = F.sum(
        _dec("l_extendedprice") * (F.lit(1).cast(RATE) - _dec("l_discount", RATE))
    )
    return (
        # orders is fact-sized: no broadcast hint — AQE converts the join
        # at runtime when the filtered side happens to be small, and the
        # plan survives a 100x scale-up (a forced hint would OOM).
        li.join(
            orders.join(broadcast(cust), orders.o_custkey == cust.c_custkey),
            li.l_orderkey == orders.o_orderkey,
        )
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(revenue.cast("double").alias("revenue"))
        .withColumn("o_orderdate", F.col("o_orderdate").cast("date"))
        .orderBy(F.desc("revenue"), "o_orderdate", "l_orderkey")
        .limit(10)
    )


Q3_SQL = """
SELECT l_orderkey, CAST(o_orderdate AS DATE) AS o_orderdate, o_orderpriority,
  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(5,2)) - CAST(l_discount AS DECIMAL(5,2)))) AS DOUBLE) AS revenue
FROM customer JOIN orders ON o_custkey = c_custkey
  JOIN lineitem ON l_orderkey = o_orderkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1998-03-15'
  AND l_shipdate > TIMESTAMP '1998-03-15'
GROUP BY l_orderkey, CAST(o_orderdate AS DATE), o_orderpriority
ORDER BY revenue DESC, o_orderdate, l_orderkey
LIMIT 10
"""


# --------------------------------------------------------------------------
# Q5 — local supplier volume: 6-way join; dims broadcast, the orders side
# left to AQE (fact-sized — a forced broadcast would OOM at scale).
# --------------------------------------------------------------------------
def q5_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    region = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    nation = load_table(spark, sf_dir, "nation")
    cust = load_table(spark, sf_dir, "customer")
    supp = load_table(spark, sf_dir, "supplier")
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01"))
        & (F.col("o_orderdate") < F.lit("1997-01-01"))
    )
    li = load_table(spark, sf_dir, "lineitem")
    revenue = F.sum(
        _dec("l_extendedprice") * (F.lit(1).cast(RATE) - _dec("l_discount", RATE))
    )
    nr = nation.join(broadcast(region), nation.n_regionkey == region.r_regionkey)
    return (
        # no hint on orders (fact-sized; AQE decides) — dims stay hinted
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(
            broadcast(cust),
            (orders.o_custkey == cust.c_custkey)
            & (cust.c_nationkey == supp.s_nationkey),
        )
        .join(broadcast(nr), supp.s_nationkey == nr.n_nationkey)
        .groupBy("n_name")
        .agg(revenue.cast("double").alias("revenue"))
        .orderBy(F.desc("revenue"), "n_name")
    )


Q5_SQL = """
SELECT n_name,
  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(5,2)) - CAST(l_discount AS DECIMAL(5,2)))) AS DOUBLE) AS revenue
FROM customer
  JOIN orders ON o_custkey = c_custkey
  JOIN lineitem ON l_orderkey = o_orderkey
  JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
  JOIN nation ON s_nationkey = n_nationkey
  JOIN region ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA'
  AND o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1997-01-01'
GROUP BY n_name
ORDER BY revenue DESC, n_name
"""


# --------------------------------------------------------------------------
# Q6 — forecasting revenue change: pure filter+agg, the predicate-pushdown
# showcase (filters reach the parquet scan as PushedFilters).
# --------------------------------------------------------------------------
def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01"))
        & (F.col("l_shipdate") < F.lit("1997-01-01"))
        & (F.col("l_discount") >= 0.02)
        & (F.col("l_discount") <= 0.04)
        & (F.col("l_quantity") < 24)
    ).agg(
        F.sum(_dec("l_extendedprice") * _dec("l_discount", RATE))
        .cast("double")
        .alias("revenue"),
        F.count("*").alias("n_rows"),
    )


Q6_SQL = """
SELECT
  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(l_discount AS DECIMAL(5,2))) AS DOUBLE) AS revenue,
  COUNT(*) AS n_rows
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
  AND l_discount >= 0.02 AND l_discount <= 0.04 AND l_quantity < 24
"""


# --------------------------------------------------------------------------
# Market-segment order stats — join + multi-agg + having.
# --------------------------------------------------------------------------
def q_segment_order_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.join(broadcast(cust), orders.o_custkey == cust.c_custkey)
        .groupBy("c_mktsegment", "o_orderstatus")
        .agg(
            F.count("*").alias("n_orders"),
            F.sum(_dec("o_totalprice")).cast("double").alias("total_price"),
            F.countDistinct("o_custkey").alias("n_customers"),
        )
        .filter(F.col("n_orders") > 5)
        .orderBy("c_mktsegment", "o_orderstatus")
    )


Q_SEGMENT_SQL = """
SELECT c_mktsegment, o_orderstatus, COUNT(*) AS n_orders,
  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price,
  COUNT(DISTINCT o_custkey) AS n_customers
FROM orders JOIN customer ON o_custkey = c_custkey
GROUP BY c_mktsegment, o_orderstatus
HAVING COUNT(*) > 5
ORDER BY c_mktsegment, o_orderstatus
"""


# --------------------------------------------------------------------------
# Top customers by revenue — window function (rank over aggregated join).
# --------------------------------------------------------------------------
def q_top_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    totals = (
        orders.groupBy("o_custkey")
        .agg(
            F.sum(_dec("o_totalprice")).cast("double").alias("total_spend"),
            F.count("*").alias("n_orders"),
        )
    )
    # orderBy().limit(10) compiles to TakeOrderedAndProject — per-partition
    # top-10 then a driver merge, O(n) scan with no global sort.  The
    # row_number window runs AFTER the limit, over exactly 10 rows, so its
    # single-partition exchange moves 10 rows, not ~15M customers at sf100
    # (the pre-round-6 shape ranked ALL customers in one task).
    top10 = totals.orderBy(F.desc("total_spend"), F.asc("o_custkey")).limit(10)
    w = Window.orderBy(F.desc("total_spend"), F.asc("o_custkey"))
    return (
        top10.withColumn("rnk", F.row_number().over(w))
        .join(broadcast(cust), F.col("o_custkey") == cust.c_custkey)
        .select("rnk", "o_custkey", "c_name", "c_mktsegment", "total_spend", "n_orders")
        .orderBy("rnk")
    )


Q_TOP_CUSTOMERS_SQL = """
WITH totals AS (
  SELECT o_custkey,
    CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_spend,
    COUNT(*) AS n_orders
  FROM orders GROUP BY o_custkey
), ranked AS (
  SELECT o_custkey, total_spend, n_orders,
    ROW_NUMBER() OVER (ORDER BY total_spend DESC, o_custkey ASC) AS rnk
  FROM totals
)
SELECT rnk, o_custkey, c_name, c_mktsegment, total_spend, n_orders
FROM ranked JOIN customer ON o_custkey = c_custkey
WHERE rnk <= 10 ORDER BY rnk
"""


# --------------------------------------------------------------------------
# Events: tumbling daily window aggregation (event-time grouping).
# --------------------------------------------------------------------------
def q_events_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(
            F.date_trunc("day", F.col("ts")).cast("date").alias("day"),
            "event_type",
        )
        .agg(
            F.count("*").alias("n_events"),
            F.sum(_dec("value")).cast("double").alias("total_value"),
            F.countDistinct("user_id").alias("n_users"),
        )
        .orderBy("day", "event_type")
    )


Q_EVENTS_DAILY_SQL = """
SELECT CAST(date_trunc('day', ts) AS DATE) AS day, event_type,
  COUNT(*) AS n_events,
  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value,
  COUNT(DISTINCT user_id) AS n_users
FROM events
GROUP BY CAST(date_trunc('day', ts) AS DATE), event_type
ORDER BY day, event_type
"""


# --------------------------------------------------------------------------
# Events: JSON props extraction (F4 surface — JSON columns stay queryable).
# --------------------------------------------------------------------------
def q_events_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    k = F.regexp_extract(F.col("props"), r'"k":\s*(\d+)', 1).cast("long")
    return (
        ev.withColumn("k", k)
        .groupBy("event_type")
        .agg(
            F.sum("k").alias("sum_k"),
            F.count("*").alias("n_rows"),
            F.max("k").alias("max_k"),
        )
        .orderBy("event_type")
    )


Q_EVENTS_PROPS_SQL = """
SELECT event_type,
  CAST(SUM(CAST(regexp_extract(props, '"k":\\s*(\\d+)', 1) AS BIGINT)) AS BIGINT) AS sum_k,
  COUNT(*) AS n_rows,
  MAX(CAST(regexp_extract(props, '"k":\\s*(\\d+)', 1) AS BIGINT)) AS max_k
FROM events GROUP BY event_type ORDER BY event_type
"""


QUERIES = {
    "q1_pricing_summary": q1_pricing_summary,
    "q3_shipping_priority": q3_shipping_priority,
    "q5_local_supplier_volume": q5_local_supplier_volume,
    "q6_forecast_revenue": q6_forecast_revenue,
    "q_segment_order_stats": q_segment_order_stats,
    "q_top_customers": q_top_customers,
    "q_events_daily": q_events_daily,
    "q_events_props": q_events_props,
}

ORACLES = {
    "q1_pricing_summary": Q1_SQL,
    "q3_shipping_priority": Q3_SQL,
    "q5_local_supplier_volume": Q5_SQL,
    "q6_forecast_revenue": Q6_SQL,
    "q_segment_order_stats": Q_SEGMENT_SQL,
    "q_top_customers": Q_TOP_CUSTOMERS_SQL,
    "q_events_daily": Q_EVENTS_DAILY_SQL,
    "q_events_props": Q_EVENTS_PROPS_SQL,
}
