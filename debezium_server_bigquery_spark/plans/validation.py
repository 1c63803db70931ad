"""Replication-validation operators: cross-engine table checksums.

A CDC engine needs a way to prove source and destination agree without
shipping either table anywhere: per-bucket row counts + an order-
independent content checksum that any engine can recompute (the
replication-audit analog of the reference's row-count assertions in
BaseBigqueryTest; here strengthened to content hashes).

Design for 100 TB: one codegen'd scan computing a 60-bit md5-derived row
hash, bucketed by key hash — a map-side-combinable (COUNT, BIT_XOR)
aggregate whose shuffle carries ``N_BUCKETS`` rows total.  XOR is the
checksum combiner because it is order- and partitioning-independent and
never overflows, so the result is identical however either engine
parallelizes.  Bucketing localizes a mismatch to 1/N of the keyspace for
drill-down instead of one opaque global hash.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from debezium_server_bigquery_spark.functions.dedup_fuzzy import _hash60_sql, hash60
from debezium_server_bigquery_spark.sources.tables import TABLE_NAMES, load_table

N_BUCKETS = 16

# Canonical per-column text renderings that Spark and DuckDB produce
# byte-identically: integers plain, money via DECIMAL(12,2), timestamps
# second-resolution ISO.  Doubles are NEVER stringified directly — the two
# engines' float formatting differs.
_ORDERS_RENDER = "o_orderkey o_custkey o_orderstatus price_s date_s o_orderpriority"


def validate_orders_checksum(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    canon = o.select(
        F.col("o_orderkey"),
        F.col("o_orderkey").cast("string").alias("key_s"),
        F.col("o_custkey").cast("string").alias("cust_s"),
        "o_orderstatus",
        F.col("o_totalprice").cast("decimal(12,2)").cast("string").alias("price_s"),
        F.date_format("o_orderdate", "yyyy-MM-dd HH:mm:ss").alias("date_s"),
        "o_orderpriority",
    )
    h = hash60(
        F.concat_ws(
            "|",
            "key_s",
            "cust_s",
            "o_orderstatus",
            "price_s",
            "date_s",
            "o_orderpriority",
        )
    )
    rows = canon.select(
        F.pmod(hash60(F.col("key_s")), F.lit(N_BUCKETS)).alias("bucket"),
        h.alias("h"),
        "o_orderkey",
    )
    return (
        rows.groupBy("bucket")
        .agg(
            F.count("*").alias("n_rows"),
            F.expr("bit_xor(h)").alias("checksum"),
            F.min("o_orderkey").alias("min_key"),
            F.max("o_orderkey").alias("max_key"),
        )
        .orderBy("bucket")
    )


_ROW_CONCAT_SQL = (
    "o_orderkey::VARCHAR || '|' || o_custkey::VARCHAR || '|' || o_orderstatus "
    "|| '|' || o_totalprice::DECIMAL(12,2)::VARCHAR "
    "|| '|' || strftime(o_orderdate, '%Y-%m-%d %H:%M:%S') || '|' || o_orderpriority"
)

VALIDATE_ORDERS_SQL = f"""
WITH rows_h AS (
  SELECT
    {_hash60_sql("o_orderkey::VARCHAR")} % {N_BUCKETS} AS bucket,
    {_hash60_sql(_ROW_CONCAT_SQL)} AS h,
    o_orderkey
  FROM orders
)
SELECT bucket, COUNT(*) AS n_rows, bit_xor(h) AS checksum,
       MIN(o_orderkey) AS min_key, MAX(o_orderkey) AS max_key
FROM rows_h GROUP BY bucket ORDER BY bucket
"""


def validate_rowcounts_all_tables(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row count per replicated table in one result — the first-line
    source/destination reconciliation (parquet answers each COUNT from
    footer metadata; no data read)."""
    from functools import reduce

    frames = [
        load_table(spark, sf_dir, name)
        .agg(F.count("*").alias("n_rows"))
        .select(F.lit(name).alias("table_name"), "n_rows")
        for name in TABLE_NAMES
    ]
    return reduce(lambda a, b: a.union(b), frames).orderBy("table_name")


VALIDATE_ROWCOUNTS_SQL = (
    "SELECT * FROM ("
    + " UNION ALL ".join(
        f"SELECT '{name}' AS table_name, COUNT(*) AS n_rows FROM {name}"
        for name in TABLE_NAMES
    )
    + ") ORDER BY table_name"
)


# (child_table, fk_col, parent_table, pk_col, broadcast_parent)
# broadcast_parent marks true dimension tables (nation/region/supplier are
# bounded); orders/part keysets grow with the fact data, so those joins are
# left to Catalyst/AQE rather than forced resident in every executor.
_FK_RELATIONS = [
    ("lineitem", "l_orderkey", "orders", "o_orderkey", False),
    ("lineitem", "l_partkey", "part", "p_partkey", False),
    ("lineitem", "l_suppkey", "supplier", "s_suppkey", True),
    ("orders", "o_custkey", "customer", "c_custkey", False),
    ("customer", "c_nationkey", "nation", "n_nationkey", True),
    ("supplier", "s_nationkey", "nation", "n_nationkey", True),
    ("nation", "n_regionkey", "region", "r_regionkey", True),
]


def validate_referential_integrity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Orphan audit across every star-schema FK edge in one result: rows
    whose foreign key has no parent — the corruption a partial replication
    or out-of-order delete leaves behind.

    Each relation is one left join on the key + a null-count aggregate
    (map-side combinable); parents marked as dimensions are broadcast, the
    fact-sized ones shuffle on the key like any equi-join.  The union is
    7 one-row aggregates — O(relations) output regardless of data size.
    """
    from functools import reduce

    frames = []
    for child, fk, parent, pk, bcast in _FK_RELATIONS:
        c = load_table(spark, sf_dir, child).select(F.col(fk))
        p = load_table(spark, sf_dir, parent).select(F.col(pk))
        if bcast:
            p = F.broadcast(p)
        joined = c.join(p, c[fk] == p[pk], "left_outer")
        frames.append(
            joined.agg(
                F.count("*").alias("n_rows"),
                F.sum(F.when(F.col(pk).isNull(), 1).otherwise(0)).alias("n_orphans"),
            ).select(
                F.lit(f"{child}.{fk} -> {parent}.{pk}").alias("relation"),
                "n_rows",
                "n_orphans",
                (F.col("n_orphans") == 0).alias("fk_ok"),
            )
        )
    return reduce(lambda a, b: a.union(b), frames).orderBy("relation")


# CAST(SUM(..) AS BIGINT): DuckDB sums integers into HUGEINT, which the
# driver's type-aware hash distinguishes from Spark's bigint.
VALIDATE_FK_SQL = (
    "SELECT * FROM ("
    + " UNION ALL ".join(
        f"""SELECT '{child}.{fk} -> {parent}.{pk}' AS relation,
       COUNT(*) AS n_rows,
       CAST(SUM(CASE WHEN p.{pk} IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_orphans,
       CAST(SUM(CASE WHEN p.{pk} IS NULL THEN 1 ELSE 0 END) AS BIGINT) = 0 AS fk_ok
FROM {child} c LEFT JOIN {parent} p ON c.{fk} = p.{pk}"""
        for child, fk, parent, pk, _ in _FK_RELATIONS
    )
    + ") ORDER BY relation"
)


QUERIES = {
    "validate_orders_checksum": validate_orders_checksum,
    "validate_rowcounts_all_tables": validate_rowcounts_all_tables,
    "validate_referential_integrity": validate_referential_integrity,
}

ORACLES = {
    "validate_orders_checksum": VALIDATE_ORDERS_SQL,
    "validate_rowcounts_all_tables": VALIDATE_ROWCOUNTS_SQL,
    "validate_referential_integrity": VALIDATE_FK_SQL,
}


# --------------------------------------------------------------------------
# orders_lineitem_consistency — cross-table derived-field audit.
# --------------------------------------------------------------------------


def orders_lineitem_consistency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-field business-rule audit: TPC-H defines
    ``o_totalprice = Σ l_extendedprice·(1+l_tax)·(1−l_discount)`` over
    the order's line items — the denormalized header field the fact rows
    must re-derive.  After replication this is the strongest cheap
    corruption probe there is: a single dropped/duplicated/garbled line
    item breaks its order's equality.  Reported per order status so a
    drift localizes.

    Scale/exactness design: the line side is ONE fact-sized
    shuffle-join-free aggregate keyed on l_orderkey (map-side
    combinable) that then equi-joins the orders header — the canonical
    fact→header shape; the derived sum runs entirely in DECIMAL
    (18,2 × 5,2 × 5,2 products, exact), the header price is cast to
    DECIMAL(18,2) once, and the match predicate compares |diff| to a
    half-cent in DECIMAL — no float enters the decision."""
    li = load_table(spark, sf_dir, "lineitem")
    derived = li.groupBy("l_orderkey").agg(
        F.sum(
            F.col("l_extendedprice").cast("decimal(18,2)")
            * (
                F.lit(1).cast("decimal(5,2)")
                + F.col("l_tax").cast("decimal(5,2)")
            )
            * (
                F.lit(1).cast("decimal(5,2)")
                - F.col("l_discount").cast("decimal(5,2)")
            )
        ).alias("derived_total")
    )
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    j = orders.join(derived, orders["o_orderkey"] == derived["l_orderkey"])
    diff = F.abs(
        F.col("derived_total")
        - F.col("o_totalprice").cast("decimal(18,2)").cast(
            "decimal(38,6)"
        )
    )
    tol = F.lit("0.005").cast("decimal(38,6)")
    return (
        j.groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_orders"),
            F.sum((diff <= tol).cast("long")).cast("long").alias("n_consistent"),
            F.sum((diff > tol).cast("long")).cast("long").alias("n_inconsistent"),
            F.round(F.max(diff).cast("double"), 6).alias("max_abs_diff"),
        )
        .orderBy("o_orderstatus")
    )


ORDERS_CONSISTENCY_SQL = """
WITH derived AS (
  SELECT l_orderkey,
    CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
             * (CAST(1 AS DECIMAL(5,2)) + CAST(l_tax AS DECIMAL(5,2)))
             * (CAST(1 AS DECIMAL(5,2)) - CAST(l_discount AS DECIMAL(5,2))))
      AS DECIMAL(38,6)) AS derived_total
  FROM lineitem GROUP BY l_orderkey
),
j AS (
  SELECT o.o_orderstatus,
    abs(d.derived_total
        - CAST(CAST(o.o_totalprice AS DECIMAL(18,2)) AS DECIMAL(38,6)))
      AS diff
  FROM orders o JOIN derived d ON o.o_orderkey = d.l_orderkey
)
SELECT o_orderstatus,
  CAST(COUNT(*) AS BIGINT) AS n_orders,
  CAST(SUM(CASE WHEN diff <= CAST('0.005' AS DECIMAL(38,6))
           THEN 1 ELSE 0 END) AS BIGINT) AS n_consistent,
  CAST(SUM(CASE WHEN diff > CAST('0.005' AS DECIMAL(38,6))
           THEN 1 ELSE 0 END) AS BIGINT) AS n_inconsistent,
  round(CAST(MAX(diff) AS DOUBLE), 6) AS max_abs_diff
FROM j GROUP BY o_orderstatus ORDER BY o_orderstatus
"""

QUERIES["orders_lineitem_consistency"] = orders_lineitem_consistency
ORACLES["orders_lineitem_consistency"] = ORDERS_CONSISTENCY_SQL
