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


QUERIES = {
    "validate_orders_checksum": validate_orders_checksum,
    "validate_rowcounts_all_tables": validate_rowcounts_all_tables,
}

ORACLES = {
    "validate_orders_checksum": VALIDATE_ORDERS_SQL,
    "validate_rowcounts_all_tables": VALIDATE_ROWCOUNTS_SQL,
}
