"""Bucketed table layout: shuffle-free co-located joins.

The reference's BigQuery tables are clustered, which co-locates a key's
rows for *scans*; Spark's bucketed tables go further and co-locate rows
for *joins*: two tables bucketed by the same key into the same bucket
count join with NO exchange on either side — at 100 TB that removes the
single most expensive shuffle in the fact-fact workload (orders x
lineitem on orderkey).  Bucketing is a write-once cost amortized over
every subsequent join/aggregation on the bucket key; the engine pairs it
with the key-bucket partitioning the upsert MERGE already uses
(operators/table.py).

Spark's bucket metadata lives in the session catalog, so ``write_bucketed``
registers an external table (data at ``path``) — the local analog of a
metastore entry.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table_name: str,
    path: str,
    bucket_cols: Sequence[str],
    n_buckets: int = 16,
    sort_cols: Sequence[str] | None = None,
) -> None:
    """Write ``df`` as an external bucketed parquet table.

    ``sort_cols`` additionally sorts within each bucket file, which lets a
    sort-merge join over two co-bucketed, co-sorted tables skip its sort
    as well as its shuffle.
    """
    spark = df.sparkSession
    spark.sql(f"DROP TABLE IF EXISTS {table_name}")
    writer = (
        df.write.format("parquet")
        .mode("overwrite")
        .option("path", path)
        .bucketBy(n_buckets, *bucket_cols)
    )
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    writer.saveAsTable(table_name)


def read_bucketed(spark: SparkSession, table_name: str) -> DataFrame:
    """Catalog read — Spark attaches the bucket spec so joins/aggregations
    on the bucket key plan without an exchange."""
    return spark.table(table_name)


# --------------------------------------------------------------------------
# Registered gate query: bucketed co-located join, exchange-free by layout.
# --------------------------------------------------------------------------
def bucketed_join_e2e(spark, sf_dir: str):
    """The fact-fact join (orders ⋈ lineitem on orderkey) through REAL
    bucketed tables: both sides are physically written ``bucketBy`` the
    join key into the session catalog, read back, joined, and rolled up
    to revenue per order priority.  At 100 TB this layout removes the
    single biggest shuffle in the workload — the whole point of the
    write-once bucket cost — and the companion test asserts the plan
    contains NO Exchange on either join input (the co-location is
    verified from the plan text, not assumed).

    The batch oracle is the plain join + GROUP BY: bucketing is a pure
    LAYOUT change, so any result drift versus the unbucketed twin is a
    correctness bug in the layout path (bucket pruning, bucket hashing).
    Decimal revenue per the repo convention."""
    from pyspark.sql import functions as F

    from debezium_server_bigquery_spark.sources.tables import (
        load_table,
        scratch_dir,
    )

    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority"
    )
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_extendedprice", "l_discount"
    )
    base = scratch_dir("dsbq_bktjoin_")
    write_bucketed(orders, "bkt_orders", base + "/orders", ["o_orderkey"], 8)
    write_bucketed(li, "bkt_lineitem", base + "/lineitem", ["l_orderkey"], 8)
    o = read_bucketed(spark, "bkt_orders")
    l = read_bucketed(spark, "bkt_lineitem")
    dec = lambda c: F.col(c).cast("decimal(18,2)")  # noqa: E731
    revenue = F.sum(
        dec("l_extendedprice")
        * (F.lit(1).cast("decimal(5,2)") - F.col("l_discount").cast("decimal(5,2)"))
    )
    return (
        o.join(l, o["o_orderkey"] == l["l_orderkey"])
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_items"),
            revenue.cast("double").alias("revenue"),
        )
        .orderBy("o_orderpriority")
    )


BUCKETED_JOIN_SQL = """
SELECT o.o_orderpriority,
  CAST(COUNT(*) AS BIGINT) AS n_items,
  CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))
           * (CAST(1 AS DECIMAL(5,2)) - CAST(l.l_discount AS DECIMAL(5,2))))
    AS DOUBLE) AS revenue
FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
GROUP BY o.o_orderpriority ORDER BY o.o_orderpriority
"""


QUERIES = {"bucketed_join_e2e": bucketed_join_e2e}
ORACLES = {"bucketed_join_e2e": BUCKETED_JOIN_SQL}
