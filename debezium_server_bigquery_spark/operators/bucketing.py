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
