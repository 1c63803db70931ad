"""Window-function, set-operation, and grouping-set query coverage.

SURVEY §2.5: the reference has no window/sort/set operators of its own —
they are BigQuery-side user SQL on the replicated tables.  For engine
completeness those shapes are first-class here, each with a DuckDB oracle:

- window frames (cumulative, moving average), lag/lead, ntile, dense_rank
- INTERSECT / EXCEPT on key sets
- ROLLUP / CUBE multi-level aggregation

Scale notes: every window below is partitioned (no global WindowExec move
to a single partition) except the final small-relation ranking steps that
run over already-aggregated data; ROLLUP/CUBE use Spark's native Expand
operator which partial-aggregates before the exchange.

Decimal convention follows plans/analytics.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast
from pyspark.sql.window import Window

from debezium_server_bigquery_spark.plans.analytics import _dec
from debezium_server_bigquery_spark.sources.tables import load_table


# --------------------------------------------------------------------------
# Cumulative spend per customer (running-total frame).
# --------------------------------------------------------------------------
def w_running_customer_spend(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_custkey") < 100
    )
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        orders.select(
            "o_custkey",
            "o_orderkey",
            F.col("o_orderdate").cast("date").alias("o_orderdate"),
            F.sum(_dec("o_totalprice")).over(w).cast("double").alias("running_spend"),
            F.row_number().over(w).alias("order_seq"),
        )
        .orderBy("o_custkey", "order_seq")
    )


W_RUNNING_SQL = """
SELECT o_custkey, o_orderkey, CAST(o_orderdate AS DATE) AS o_orderdate,
  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER (
    PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_spend,
  ROW_NUMBER() OVER (
    PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS order_seq
FROM orders WHERE o_custkey < 100
ORDER BY o_custkey, order_seq
"""


# --------------------------------------------------------------------------
# 7-day moving average of daily event volume (frame over aggregate).
# --------------------------------------------------------------------------
def w_moving_avg_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """7-row trailing avg/min/max over the daily series WITHOUT an
    unpartitioned window (``partitionBy(lit(1))`` still collapses the
    whole series into one task).  Distributed sliding-frame shape: rank
    the series with ``operators/rank.global_row_number``, explode each
    row's count to the 7 rank positions whose trailing frame it feeds,
    aggregate by position, join back on the rank — one bounded 7× fan-out
    and one hash shuffle on position, valid for a series of any length."""
    from debezium_server_bigquery_spark.operators.rank import global_row_number

    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        F.date_trunc("day", F.col("ts")).cast("date").alias("day")
    ).agg(F.count("*").alias("n_events"))
    ranked = global_row_number(daily, [F.asc("day")], out="rn")
    contrib = ranked.select(
        F.col("n_events").alias("c"),
        F.explode(F.expr("sequence(rn, rn + 6)")).alias("pos"),
    )
    stats = contrib.groupBy("pos").agg(
        F.round(F.avg("c"), 4).alias("ma7"),
        F.min("c").alias("min7"),
        F.max("c").alias("max7"),
    )
    return (
        ranked.join(stats, ranked.rn == stats.pos)
        .select("day", "n_events", "ma7", "min7", "max7")
        .orderBy("day")
    )


W_MOVING_AVG_SQL = """
WITH daily AS (
  SELECT CAST(date_trunc('day', ts) AS DATE) AS day, COUNT(*) AS n_events
  FROM events GROUP BY 1
)
SELECT day, n_events,
  round(AVG(n_events) OVER w, 4) AS ma7,
  MIN(n_events) OVER w AS min7,
  MAX(n_events) OVER w AS max7
FROM daily
WINDOW w AS (ORDER BY day ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)
ORDER BY day
"""


# --------------------------------------------------------------------------
# Days since previous order per customer (lag + date arithmetic).
# --------------------------------------------------------------------------
def w_order_gap_days(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders").filter(F.col("o_custkey") < 50)
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    prev = F.lag(F.col("o_orderdate").cast("date")).over(w)
    return (
        orders.select(
            "o_custkey",
            "o_orderkey",
            F.col("o_orderdate").cast("date").alias("o_orderdate"),
            # -1 = first order for the customer (kept NULL-free so value
            # hashing is engine-agnostic).
            F.coalesce(
                F.datediff(F.col("o_orderdate").cast("date"), prev), F.lit(-1)
            ).alias("gap_days"),
        )
        .orderBy("o_custkey", "o_orderdate", "o_orderkey")
    )


W_ORDER_GAP_SQL = """
SELECT o_custkey, o_orderkey, CAST(o_orderdate AS DATE) AS o_orderdate,
  COALESCE(date_diff('day',
    LAG(CAST(o_orderdate AS DATE)) OVER (
      PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey),
    CAST(o_orderdate AS DATE)), -1) AS gap_days
FROM orders WHERE o_custkey < 50
ORDER BY o_custkey, o_orderdate, o_orderkey
"""


# --------------------------------------------------------------------------
# Customer spend quartiles (ntile over aggregate, then per-quartile stats).
# --------------------------------------------------------------------------
def w_spend_quartiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NTILE(4) over ALL customers is an unpartitioned window — a single
    task ranking ~15M rows at sf100.  Instead: exact global rank via
    ``operators/rank.global_row_number`` (range partition + local rank +
    O(partitions) offsets) and the quantile bucket from rank arithmetic,
    ``((r-1)*4) div n + 1`` — the same distributed-tile shape as
    ``plans/segmentation.rfm_customer_segments``.  Bucket sizes differ
    from SQL NTILE's front-loaded remainder by at most one row; the
    oracle twin computes the identical formula."""
    from debezium_server_bigquery_spark.operators.rank import global_row_number

    orders = load_table(spark, sf_dir, "orders")
    spend = orders.groupBy("o_custkey").agg(
        F.sum(_dec("o_totalprice")).cast("double").alias("spend")
    )
    n = spend.agg(F.count("*").alias("n"))
    ranked = global_row_number(
        spend, [F.desc("spend"), F.asc("o_custkey")], out="rn"
    ).crossJoin(F.broadcast(n))
    return (
        ranked.withColumn("quartile", F.expr("((rn - 1) * 4) div n + 1"))
        .groupBy("quartile")
        .agg(
            F.count("*").alias("n_customers"),
            F.round(F.sum("spend"), 2).alias("total_spend"),
            F.round(F.min("spend"), 2).alias("min_spend"),
            F.round(F.max("spend"), 2).alias("max_spend"),
        )
        .orderBy("quartile")
    )


W_QUARTILES_SQL = """
WITH spend AS (
  SELECT o_custkey, CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS spend
  FROM orders GROUP BY o_custkey
), tiled AS (
  SELECT o_custkey, spend,
    ((ROW_NUMBER() OVER (ORDER BY spend DESC, o_custkey) - 1) * 4)
      // (SELECT COUNT(*) FROM spend) + 1 AS quartile
  FROM spend
)
SELECT quartile, COUNT(*) AS n_customers,
  round(SUM(spend), 2) AS total_spend,
  round(MIN(spend), 2) AS min_spend,
  round(MAX(spend), 2) AS max_spend
FROM tiled GROUP BY quartile ORDER BY quartile
"""


# --------------------------------------------------------------------------
# Open-order backlog over time — interval counting via the delta trick.
# --------------------------------------------------------------------------
def open_orders_over_time(spark: SparkSession, sf_dir: str) -> DataFrame:
    """How many orders are OPEN on each day (placed, not yet fully
    shipped — close = the order's last lineitem ship date; an order
    counts through the day before it closes).

    The classic interval-count shape done scale-right: never explode an
    order into its open days (an order open for a year would fan out
    365×) — emit +1 at open and −1 at close, aggregate deltas per day
    (O(days) rows), and turn them into the running count with
    ``operators/rank.global_prefix_sum`` (range partition + local cumsum
    + O(partitions) offsets), not a single-task window."""
    from debezium_server_bigquery_spark.operators.rank import global_prefix_sum

    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    li = load_table(spark, sf_dir, "lineitem")
    closes = li.groupBy("l_orderkey").agg(
        F.max(F.col("l_shipdate").cast("date")).alias("close_date")
    )
    o = orders.join(closes, orders.o_orderkey == closes.l_orderkey)
    deltas = (
        o.select(F.col("o_orderdate").cast("date").alias("day"), F.lit(1).alias("d"))
        .unionAll(o.select(F.col("close_date").alias("day"), F.lit(-1).alias("d")))
        .groupBy("day")
        .agg(F.sum("d").alias("net"))
    )
    return (
        global_prefix_sum(deltas, [F.asc("day")], "net", out="open_orders")
        .select("day", "net", "open_orders")
        .orderBy("day")
    )


OPEN_ORDERS_SQL = """
WITH closes AS (
  SELECT l_orderkey, MAX(CAST(l_shipdate AS DATE)) AS close_date
  FROM lineitem GROUP BY l_orderkey
), deltas AS (
  SELECT day, CAST(SUM(d) AS BIGINT) AS net FROM (
    SELECT CAST(o_orderdate AS DATE) AS day, 1 AS d
    FROM orders JOIN closes ON o_orderkey = l_orderkey
    UNION ALL
    SELECT close_date AS day, -1 AS d
    FROM orders JOIN closes ON o_orderkey = l_orderkey
  ) GROUP BY day
)
SELECT day, net, CAST(SUM(net) OVER (ORDER BY day) AS BIGINT) AS open_orders
FROM deltas ORDER BY day
"""


# --------------------------------------------------------------------------
# Top-3 parts per brand by revenue (dense_rank in a partitioned window).
# --------------------------------------------------------------------------
def w_top_parts_per_brand(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load_table(spark, sf_dir, "part")
    li = load_table(spark, sf_dir, "lineitem")
    rev = (
        li.join(broadcast(part.select("p_partkey", "p_brand")), li.l_partkey == F.col("p_partkey"))
        .groupBy("p_brand", "p_partkey")
        .agg(F.sum(_dec("l_extendedprice")).cast("double").alias("revenue"))
    )
    w = Window.partitionBy("p_brand").orderBy(F.desc("revenue"), "p_partkey")
    return (
        rev.withColumn("rk", F.dense_rank().over(w))
        .filter(F.col("rk") <= 3)
        .select("p_brand", "rk", "p_partkey", "revenue")
        .orderBy("p_brand", "rk", "p_partkey")
    )


W_TOP_PARTS_SQL = """
WITH rev AS (
  SELECT p_brand, p_partkey,
    CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
  FROM lineitem JOIN part ON p_partkey = l_partkey
  GROUP BY p_brand, p_partkey
)
SELECT p_brand, rk, p_partkey, revenue
FROM (
  SELECT p_brand, p_partkey, revenue,
    DENSE_RANK() OVER (PARTITION BY p_brand ORDER BY revenue DESC, p_partkey) AS rk
  FROM rev
)
WHERE rk <= 3
ORDER BY p_brand, rk, p_partkey
"""


# --------------------------------------------------------------------------
# Set operations: returned-order keys vs open-order keys.
# --------------------------------------------------------------------------
def set_returned_open_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    returned = li.filter(F.col("l_returnflag") == "R").select(
        F.col("l_orderkey").alias("okey")
    )
    open_orders = orders.filter(F.col("o_orderstatus") == "O").select(
        F.col("o_orderkey").alias("okey")
    )
    def _count_as(df: DataFrame, label: str) -> DataFrame:
        return df.agg(F.count("*").alias("n")).withColumn("which", F.lit(label))

    both = _count_as(returned.intersect(open_orders), "returned_and_open")
    only_ret = _count_as(
        returned.distinct().exceptAll(open_orders.distinct()), "returned_not_open"
    )
    only_open = _count_as(
        open_orders.distinct().exceptAll(returned.distinct()), "open_not_returned"
    )
    return both.unionByName(only_ret).unionByName(only_open).select("which", "n").orderBy("which")


SET_OPS_SQL = """
WITH returned AS (SELECT DISTINCT l_orderkey AS okey FROM lineitem WHERE l_returnflag = 'R'),
     open_o AS (SELECT DISTINCT o_orderkey AS okey FROM orders WHERE o_orderstatus = 'O')
SELECT 'returned_and_open' AS which, COUNT(*) AS n FROM (SELECT okey FROM returned INTERSECT SELECT okey FROM open_o)
UNION ALL
SELECT 'returned_not_open', COUNT(*) FROM (SELECT okey FROM returned EXCEPT SELECT okey FROM open_o)
UNION ALL
SELECT 'open_not_returned', COUNT(*) FROM (SELECT okey FROM open_o EXCEPT SELECT okey FROM returned)
ORDER BY which
"""


# --------------------------------------------------------------------------
# ROLLUP revenue by nation/year (multi-level totals in one pass).
# --------------------------------------------------------------------------
def rollup_nation_year_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    nation = load_table(spark, sf_dir, "nation")
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").filter(F.col("o_custkey") % 10 == 0)
    joined = (
        orders.join(broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .select(
            F.col("n_name"),
            F.year("o_orderdate").cast("long").alias("o_year"),
            F.col("o_totalprice"),
        )
    )
    return (
        joined.rollup("n_name", "o_year")
        .agg(
            F.sum(_dec("o_totalprice")).cast("double").alias("revenue"),
            F.count("*").alias("n_orders"),
        )
        .select(
            F.coalesce("n_name", F.lit("ALL")).alias("nation"),
            F.coalesce(F.col("o_year").cast("string"), F.lit("ALL")).alias("year"),
            "revenue",
            "n_orders",
        )
        .orderBy("nation", "year")
    )


ROLLUP_SQL = """
SELECT COALESCE(n_name, 'ALL') AS nation,
  COALESCE(CAST(o_year AS VARCHAR), 'ALL') AS year,
  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
  COUNT(*) AS n_orders
FROM (
  SELECT n_name, year(o_orderdate) AS o_year, o_totalprice
  FROM orders
    JOIN customer ON c_custkey = o_custkey
    JOIN nation ON n_nationkey = c_nationkey
  WHERE o_custkey % 10 = 0
)
GROUP BY ROLLUP (n_name, o_year)
ORDER BY nation, year
"""


# --------------------------------------------------------------------------
# CUBE order stats over (status, priority).
# --------------------------------------------------------------------------
def cube_status_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.cube("o_orderstatus", "o_orderpriority")
        .agg(
            F.count("*").alias("n_orders"),
            F.sum(_dec("o_totalprice")).cast("double").alias("revenue"),
        )
        .select(
            F.coalesce("o_orderstatus", F.lit("ALL")).alias("status"),
            F.coalesce("o_orderpriority", F.lit("ALL")).alias("priority"),
            "n_orders",
            "revenue",
        )
        .orderBy("status", "priority")
    )


CUBE_SQL = """
SELECT COALESCE(o_orderstatus, 'ALL') AS status,
  COALESCE(o_orderpriority, 'ALL') AS priority,
  COUNT(*) AS n_orders,
  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
FROM orders
GROUP BY CUBE (o_orderstatus, o_orderpriority)
ORDER BY status, priority
"""


def gsets_returnflag_year_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUP BY GROUPING SETS — the general form rollup/cube specialize.

    The set list ((flag, year), (flag), (year)) is neither a hierarchy
    (rollup would add the grand total) nor a power set (cube would too),
    so it exercises the planner's Expand operator with an explicit
    projection list.  Same single-shuffle shape as a plain groupBy: Expand
    multiplies rows map-side (3x here), then one partial+final aggregate.
    (The driver's synthetic lineitem has no l_shipmode column, so the
    categorical key is l_returnflag.)
    """
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") >= "1995-01-01"
    )
    keyed = li.select(
        "l_returnflag",
        F.year("l_shipdate").cast("long").alias("l_year"),
        "l_extendedprice",
    )
    return (
        keyed.groupingSets(
            [["l_returnflag", "l_year"], ["l_returnflag"], ["l_year"]],
            "l_returnflag",
            "l_year",
        )
        .agg(
            F.sum(_dec("l_extendedprice")).cast("double").alias("revenue"),
            F.count("*").alias("n_items"),
        )
        .select(
            F.coalesce("l_returnflag", F.lit("ALL")).alias("returnflag"),
            F.coalesce(F.col("l_year").cast("string"), F.lit("ALL")).alias("year"),
            "revenue",
            "n_items",
        )
        .orderBy("returnflag", "year")
    )


GSETS_SQL = """
SELECT COALESCE(l_returnflag, 'ALL') AS returnflag,
  COALESCE(CAST(EXTRACT(year FROM l_shipdate) AS VARCHAR), 'ALL') AS year,
  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
  COUNT(*) AS n_items
FROM lineitem
WHERE l_shipdate >= DATE '1995-01-01'
GROUP BY GROUPING SETS ((l_returnflag, EXTRACT(year FROM l_shipdate)),
                        (l_returnflag),
                        (EXTRACT(year FROM l_shipdate)))
ORDER BY returnflag, year
"""


PIVOT_TYPES = ("click", "error", "purchase", "signup", "view")


def pivot_event_type_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.5 PIVOT: one row per day, one count column per event type.

    The explicit value list keeps the output schema static (no extra
    distinct pass to discover columns — which at 100 TB would be a full
    shuffle before planning even finishes); absent combinations coalesce
    to 0.  Physically this is a single conditional-aggregation scan."""
    ev = load_table(spark, sf_dir, "events").select(
        F.col("ts").cast("date").alias("day"), "event_type"
    )
    pivoted = ev.groupBy("day").pivot("event_type", list(PIVOT_TYPES)).count()
    return pivoted.select(
        "day",
        *[F.coalesce(F.col(t), F.lit(0)).alias(f"n_{t}") for t in PIVOT_TYPES],
    ).orderBy("day")


PIVOT_SQL = (
    "SELECT CAST(ts AS DATE) AS day, "
    + ", ".join(
        f"CAST(SUM(CASE WHEN event_type = '{t}' THEN 1 ELSE 0 END) AS BIGINT) AS n_{t}"
        for t in PIVOT_TYPES
    )
    + " FROM events GROUP BY 1 ORDER BY day"
)


QUERIES = {
    "pivot_event_type_daily": pivot_event_type_daily,
    "w_running_customer_spend": w_running_customer_spend,
    "w_moving_avg_events": w_moving_avg_events,
    "open_orders_over_time": open_orders_over_time,
    "w_order_gap_days": w_order_gap_days,
    "w_spend_quartiles": w_spend_quartiles,
    "w_top_parts_per_brand": w_top_parts_per_brand,
    "set_returned_open_orders": set_returned_open_orders,
    "rollup_nation_year_revenue": rollup_nation_year_revenue,
    "cube_status_priority": cube_status_priority,
    "gsets_returnflag_year_revenue": gsets_returnflag_year_revenue,
}

ORACLES = {
    "pivot_event_type_daily": PIVOT_SQL,
    "w_running_customer_spend": W_RUNNING_SQL,
    "w_moving_avg_events": W_MOVING_AVG_SQL,
    "open_orders_over_time": OPEN_ORDERS_SQL,
    "w_order_gap_days": W_ORDER_GAP_SQL,
    "w_spend_quartiles": W_QUARTILES_SQL,
    "w_top_parts_per_brand": W_TOP_PARTS_SQL,
    "set_returned_open_orders": SET_OPS_SQL,
    "rollup_nation_year_revenue": ROLLUP_SQL,
    "cube_status_priority": CUBE_SQL,
    "gsets_returnflag_year_revenue": GSETS_SQL,
}
