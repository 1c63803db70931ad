"""Remaining TPC-H query shapes, adapted to the driver's star schema.

The reference delegates all user queries to BigQuery (SURVEY §2.3-§2.5);
this engine makes them first-class.  ``analytics.py`` / ``analytics_ext.py``
cover Q1/3/4/5/6/7/9/10/12/13/14/15/17/18/19/22; this module adds the six
remaining TPC-H shapes.  The driver schema has no ``partsupp`` table and no
receipt/commit dates, so each query keeps the *relational shape* of its
TPC-H namesake while sourcing part-supplier facts from ``lineitem``:

- **q2 shape** — correlated-min subquery: cheapest supplier per part,
  region-constrained (min-over-group as a window, not a self-join).
- **q8 shape** — market share: two independent nation roles (customer
  region vs supplier nation) + conditional-sum ratio per year.
- **q11 shape** — fraction-of-global-total HAVING: per-part value vs a
  scalar aggregate of the whole input (broadcast cross-join, one pass).
- **q16 shape** — NOT IN anti-join + multi-column COUNT DISTINCT.
- **q20 shape** — nested semi-join chain over a thresholded aggregate.
- **q21 shape** — the EXISTS / NOT EXISTS double self-join, expressed as
  one order-level aggregate instead of two extra joins (see docstring).

Determinism follows the decimal convention of ``plans/analytics.py``.
Scale notes per query in docstrings — every dim join is broadcast, the
fact table shuffles only for its aggregation keys.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast
from pyspark.sql.window import Window

from debezium_server_bigquery_spark.plans.analytics import MONEY, RATE, _dec
from debezium_server_bigquery_spark.sources.tables import load_table


def _disc_price():
    return _dec("l_extendedprice") * (F.lit(1).cast(RATE) - _dec("l_discount", RATE))


# --------------------------------------------------------------------------
# Q2 shape — minimum-cost supplier per part (correlated MIN subquery).
# --------------------------------------------------------------------------
def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 without ``partsupp``: supply cost of (part, supplier) =
    total extended price / total quantity over their lineitems.  The
    correlated ``MIN(ps_supplycost) WHERE ps_partkey = p_partkey`` becomes
    a ``min().over(Window.partitionBy(part))`` — one shuffle on partkey
    instead of a self-join, and the window input is the already-aggregated
    pair table (|pairs| << |lineitem|).

    Scale: lineitem aggregates map-side on (partkey, suppkey); supplier ⋈
    nation ⋈ region and part are broadcast; the only wide exchange is the
    pair table hashed by partkey for the window.
    """
    region = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    nation = load_table(spark, sf_dir, "nation")
    supp = load_table(spark, sf_dir, "supplier")
    part = load_table(spark, sf_dir, "part").filter(
        F.col("p_size").isin(15, 25, 35)
    )
    li = load_table(spark, sf_dir, "lineitem")

    euro_supp = (
        supp.join(broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .join(broadcast(region), nation.n_regionkey == region.r_regionkey)
        .select("s_suppkey", "s_name", "s_acctbal", "n_name")
    )
    pair_cost = (
        li.groupBy("l_partkey", "l_suppkey")
        .agg(
            (
                F.sum(_dec("l_extendedprice")).cast("double")
                / F.sum(_dec("l_quantity")).cast("double")
            ).alias("supply_cost")
        )
        .join(broadcast(euro_supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
    )
    w = Window.partitionBy("l_partkey")
    return (
        pair_cost.withColumn("min_cost", F.min("supply_cost").over(w))
        .filter(F.col("supply_cost") == F.col("min_cost"))
        .select(
            "s_acctbal",
            "s_name",
            "n_name",
            F.col("l_partkey").alias("p_partkey"),
            F.round("supply_cost", 6).alias("supply_cost"),
        )
        .orderBy(F.desc("s_acctbal"), "n_name", "s_name", "p_partkey")
        .limit(100)
    )


Q2_SQL = """
WITH euro_supp AS (
  SELECT s_suppkey, s_name, s_acctbal, n_name
  FROM supplier JOIN nation ON s_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
  WHERE r_name = 'EUROPE'
),
pair_cost AS (
  SELECT l_partkey, l_suppkey,
    CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
      / CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS supply_cost
  FROM lineitem GROUP BY l_partkey, l_suppkey
),
joined AS (
  SELECT s_acctbal, s_name, n_name, l_partkey AS p_partkey, supply_cost,
    MIN(supply_cost) OVER (PARTITION BY l_partkey) AS min_cost
  FROM pair_cost
    JOIN euro_supp ON l_suppkey = s_suppkey
    JOIN part ON l_partkey = p_partkey
  WHERE p_size IN (15, 25, 35)
)
SELECT s_acctbal, s_name, n_name, p_partkey, round(supply_cost, 6) AS supply_cost
FROM joined WHERE supply_cost = min_cost
ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
LIMIT 100
"""


# --------------------------------------------------------------------------
# Q8 shape — national market share (two nation roles + conditional ratio).
# --------------------------------------------------------------------------
def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customer side restricted to region AMERICA, supplier side tagged by
    nation; share = NATION_5's volume fraction per order year.  The two
    roles need ``nation`` twice with independent aliases — Catalyst handles
    the reuse; both dim chains broadcast, so lineitem joins are all
    broadcast-hash and the single shuffle is groupBy(year).
    """
    region = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "AMERICA")
    nation_c = load_table(spark, sf_dir, "nation").alias("nc")
    nation_s = load_table(spark, sf_dir, "nation").alias("ns")
    cust = load_table(spark, sf_dir, "customer")
    supp = load_table(spark, sf_dir, "supplier")
    part = load_table(spark, sf_dir, "part").filter(F.col("p_type") == "PROMO")
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01"))
        & (F.col("o_orderdate") < F.lit("1998-01-01"))
    )
    li = load_table(spark, sf_dir, "lineitem")

    amer_cust = (
        cust.join(
            broadcast(nation_c), cust.c_nationkey == F.col("nc.n_nationkey")
        )
        .join(broadcast(region), F.col("nc.n_regionkey") == region.r_regionkey)
        .select("c_custkey")
    )
    supp_nation = supp.join(
        broadcast(nation_s), supp.s_nationkey == F.col("ns.n_nationkey")
    ).select("s_suppkey", F.col("ns.n_name").alias("supp_nation"))

    vol = _disc_price()
    return (
        li.join(broadcast(part), li.l_partkey == part.p_partkey)
        # orders unhinted (fact-sized; AQE decides) — dims stay broadcast
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(broadcast(amer_cust), orders.o_custkey == F.col("c_custkey"))
        .join(broadcast(supp_nation), li.l_suppkey == F.col("s_suppkey"))
        .groupBy(F.year("o_orderdate").alias("o_year"))
        .agg(
            F.sum(F.when(F.col("supp_nation") == "NATION_5", vol).otherwise(F.lit(0).cast(MONEY)))
            .cast("double")
            .alias("nation_vol"),
            F.sum(vol).cast("double").alias("total_vol"),
        )
        .select(
            "o_year",
            F.round(F.col("nation_vol") / F.col("total_vol"), 6).alias("mkt_share"),
            "nation_vol",
            "total_vol",
        )
        .orderBy("o_year")
    )


Q8_SQL = """
SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year,
  round(
    CAST(SUM(CASE WHEN n2.n_name = 'NATION_5'
      THEN CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(5,2)) - CAST(l_discount AS DECIMAL(5,2)))
      ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE)
    / CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(5,2)) - CAST(l_discount AS DECIMAL(5,2)))) AS DOUBLE),
    6) AS mkt_share,
  CAST(SUM(CASE WHEN n2.n_name = 'NATION_5'
    THEN CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(5,2)) - CAST(l_discount AS DECIMAL(5,2)))
    ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE) AS nation_vol,
  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(5,2)) - CAST(l_discount AS DECIMAL(5,2)))) AS DOUBLE) AS total_vol
FROM lineitem
  JOIN part ON l_partkey = p_partkey
  JOIN orders ON l_orderkey = o_orderkey
  JOIN customer ON o_custkey = c_custkey
  JOIN nation n1 ON c_nationkey = n1.n_nationkey
  JOIN region ON n1.n_regionkey = r_regionkey
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation n2 ON s_nationkey = n2.n_nationkey
WHERE r_name = 'AMERICA' AND p_type = 'PROMO'
  AND o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1998-01-01'
GROUP BY year(o_orderdate)
ORDER BY o_year
"""


# --------------------------------------------------------------------------
# Q11 shape — important part values vs a global-total scalar subquery.
# --------------------------------------------------------------------------
def q11_important_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-part value (from NATION_3 suppliers' lineitems) kept only when
    above 0.1% of the global total.  The scalar subquery is a one-row
    aggregate of the *same* per-part table, broadcast cross-joined back —
    the base is computed once and reused, no second scan of lineitem.
    """
    nation = load_table(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_3")
    supp = load_table(spark, sf_dir, "supplier")
    li = load_table(spark, sf_dir, "lineitem")

    n3_supp = supp.join(broadcast(nation), supp.s_nationkey == nation.n_nationkey).select(
        "s_suppkey"
    )
    per_part = (
        li.join(broadcast(n3_supp), li.l_suppkey == F.col("s_suppkey"))
        .groupBy("l_partkey")
        .agg(F.sum(_disc_price()).alias("value_dec"))
    )
    total = per_part.agg(F.sum("value_dec").cast("double").alias("total_value"))
    return (
        per_part.crossJoin(broadcast(total))
        .filter(F.col("value_dec").cast("double") > 0.001 * F.col("total_value"))
        .select(
            F.col("l_partkey").alias("p_partkey"),
            F.col("value_dec").cast("double").alias("part_value"),
        )
        .orderBy(F.desc("part_value"), "p_partkey")
    )


Q11_SQL = """
WITH per_part AS (
  SELECT l_partkey,
    SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(5,2)) - CAST(l_discount AS DECIMAL(5,2)))) AS value_dec
  FROM lineitem
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN nation ON s_nationkey = n_nationkey
  WHERE n_name = 'NATION_3'
  GROUP BY l_partkey
)
SELECT l_partkey AS p_partkey, CAST(value_dec AS DOUBLE) AS part_value
FROM per_part
WHERE CAST(value_dec AS DOUBLE) > 0.001 * (SELECT CAST(SUM(value_dec) AS DOUBLE) FROM per_part)
ORDER BY part_value DESC, p_partkey
"""


# --------------------------------------------------------------------------
# Q16 shape — supplier count by part attrs, NOT IN excluded-supplier set.
# --------------------------------------------------------------------------
def q16_supplier_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct suppliers per (brand, type, size) for a size IN-list,
    excluding one brand, one type, and "complaint" suppliers (negative
    account balance — the schema has no comment column).  NOT IN over a
    non-null key == left-anti join; the anti side is tiny and broadcast.
    Part-supplier pairs come from lineitem, de-duplicated *before* the
    count-distinct shuffle to shrink the exchange.
    """
    part = load_table(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#5")
        & (~F.col("p_type").startswith("MEDIUM"))
        & (F.col("p_size").isin(1, 4, 9, 15, 22, 28, 35, 44))
    )
    supp = load_table(spark, sf_dir, "supplier")
    complaint = supp.filter(F.col("s_acctbal") < 0).select("s_suppkey")
    li = load_table(spark, sf_dir, "lineitem")

    pairs = li.select("l_partkey", "l_suppkey").distinct()
    return (
        pairs.join(broadcast(complaint), pairs.l_suppkey == complaint.s_suppkey, "left_anti")
        .join(broadcast(part), pairs.l_partkey == part.p_partkey)
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(F.desc("supplier_cnt"), "p_brand", "p_type", "p_size")
    )


Q16_SQL = """
SELECT p_brand, p_type, p_size, COUNT(DISTINCT l_suppkey) AS supplier_cnt
FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem) pairs
  JOIN part ON l_partkey = p_partkey
WHERE p_brand <> 'Brand#5'
  AND p_type NOT LIKE 'MEDIUM%'
  AND p_size IN (1, 4, 9, 15, 22, 28, 35, 44)
  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
GROUP BY p_brand, p_type, p_size
ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
"""


# --------------------------------------------------------------------------
# Q20 shape — nested semi-join chain over a thresholded aggregate.
# --------------------------------------------------------------------------
def q20_heavy_shippers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Suppliers in an ASIA nation that shipped > 40 units of some
    'small%' part during 1996.  Innermost: parts by name; middle: 1996
    shipped qty per (supp, part) with HAVING; outer: left-semi join onto
    supplier, then nation/region decoration.  Both subqueries reduce
    before any wide join — the semi join receives |qualifying pairs| rows.
    """
    region = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    nation = load_table(spark, sf_dir, "nation")
    supp = load_table(spark, sf_dir, "supplier")
    part = load_table(spark, sf_dir, "part").filter(F.col("p_name").startswith("small"))
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01"))
        & (F.col("l_shipdate") < F.lit("1997-01-01"))
    )

    heavy = (
        li.join(broadcast(part.select("p_partkey")), li.l_partkey == F.col("p_partkey"))
        .groupBy("l_suppkey", "l_partkey")
        .agg(F.sum(_dec("l_quantity")).cast("double").alias("qty"))
        .filter(F.col("qty") > 40)
        .select("l_suppkey")
        .distinct()
    )
    asia_nation = nation.join(
        broadcast(region), nation.n_regionkey == region.r_regionkey
    ).select("n_nationkey", "n_name")
    return (
        supp.join(broadcast(heavy), supp.s_suppkey == heavy.l_suppkey, "left_semi")
        .join(broadcast(asia_nation), supp.s_nationkey == F.col("n_nationkey"))
        .select("s_name", "n_name")
        .orderBy("s_name")
    )


Q20_SQL = """
SELECT s_name, n_name
FROM supplier
  JOIN nation ON s_nationkey = n_nationkey
  JOIN region ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA'
  AND s_suppkey IN (
    SELECT l_suppkey FROM lineitem
    WHERE l_partkey IN (SELECT p_partkey FROM part WHERE p_name LIKE 'small%')
      AND l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
    GROUP BY l_suppkey, l_partkey
    HAVING CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) > 40)
ORDER BY s_name
"""


# --------------------------------------------------------------------------
# Q21 shape — EXISTS / NOT EXISTS double self-join, as one aggregate.
# --------------------------------------------------------------------------
def q21_sole_return_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Suppliers who were the *only* supplier with returned ('R') lines on
    a multi-supplier finished order.  TPC-H Q21 writes this as EXISTS
    (another supplier on the order) AND NOT EXISTS (another supplier with
    a late line); both quantifiers collapse into one order-level aggregate
    — n_suppliers and n_return_suppliers per order — read off with a join.
    ONE lineitem pass replaces the four lineitem self-join passes of the
    literal formulation: aggregate per (orderkey, suppkey), then read both
    quantifiers off a window over the orderkey partition.
    """
    orders = load_table(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    supp = load_table(spark, sf_dir, "supplier")
    li = load_table(spark, sf_dir, "lineitem")

    # Two distinct-aggregates over the same input would make Catalyst
    # expand every lineitem row once per distinct group (2x shuffle bytes).
    # Aggregating per (orderkey, suppkey) first is map-side combinable and
    # everything downstream runs over ~|orders| * avg-suppliers rows.
    #
    # The order-level quantifiers (n_supp, n_ret_supp) come from a WINDOW
    # over per_supp, not a groupBy(orderkey)-and-join-back: a second
    # aggregate would make per_supp feed two plan branches, and Catalyst
    # duplicates shared subtrees — compiling to TWO full aggregates over
    # lineitem with no ReusedExchange (measured 2.2s vs 1.6s at sf0.1 in
    # round 11; the window form was A/B-verified result-identical and no
    # slower in round 13).  The window keeps ONE lineitem scan and drops
    # the old plan's second filtered scan + orderkey join: the sole
    # remaining full-table pass is the per_supp aggregation shuffle, and
    # the window's exchange carries only (orderkey, suppkey, has_ret).
    per_supp = li.groupBy("l_orderkey", "l_suppkey").agg(
        F.max((F.col("l_returnflag") == "R").cast("int")).alias("has_ret")
    )
    w = Window.partitionBy("l_orderkey")
    stats = per_supp.select(
        "l_orderkey",
        "l_suppkey",
        "has_ret",
        F.count("*").over(w).alias("n_supp"),
        F.sum("has_ret").over(w).alias("n_ret_supp"),
    )
    # has_ret=1 & n_ret_supp=1 leaves exactly one row per qualifying order
    # (the sole returning supplier), so the per-supplier count below equals
    # the old formulation's countDistinct(l_orderkey).
    sole = stats.filter(
        (F.col("has_ret") == 1) & (F.col("n_supp") > 1) & (F.col("n_ret_supp") == 1)
    ).join(orders.select("o_orderkey"), F.col("l_orderkey") == F.col("o_orderkey"))
    return (
        sole.groupBy("l_suppkey")
        .agg(F.count("*").alias("numwait"))
        .join(broadcast(supp), F.col("l_suppkey") == supp.s_suppkey)
        .select("s_name", "numwait")
        .orderBy(F.desc("numwait"), "s_name")
        .limit(20)
    )


Q21_SQL = """
WITH order_stats AS (
  SELECT l_orderkey,
    COUNT(DISTINCT l_suppkey) AS n_supp,
    COUNT(DISTINCT CASE WHEN l_returnflag = 'R' THEN l_suppkey END) AS n_ret_supp
  FROM lineitem GROUP BY l_orderkey
)
SELECT s_name, COUNT(DISTINCT l.l_orderkey) AS numwait
FROM lineitem l
  JOIN orders ON l.l_orderkey = o_orderkey AND o_orderstatus = 'F'
  JOIN order_stats os ON l.l_orderkey = os.l_orderkey
  JOIN supplier ON l.l_suppkey = s_suppkey
WHERE l.l_returnflag = 'R' AND os.n_supp > 1 AND os.n_ret_supp = 1
GROUP BY s_name
ORDER BY numwait DESC, s_name
LIMIT 20
"""


QUERIES = {
    "q2_min_cost_supplier": q2_min_cost_supplier,
    "q8_market_share": q8_market_share,
    "q11_important_values": q11_important_values,
    "q16_supplier_count": q16_supplier_count,
    "q20_heavy_shippers": q20_heavy_shippers,
    "q21_sole_return_supplier": q21_sole_return_supplier,
}

ORACLES = {
    "q2_min_cost_supplier": Q2_SQL,
    "q8_market_share": Q8_SQL,
    "q11_important_values": Q11_SQL,
    "q16_supplier_count": Q16_SQL,
    "q20_heavy_shippers": Q20_SQL,
    "q21_sole_return_supplier": Q21_SQL,
}
