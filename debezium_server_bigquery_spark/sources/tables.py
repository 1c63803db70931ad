"""Loaders for the driver-generated star-schema parquet tables.

Scans are plain ``spark.read.parquet`` so Catalyst keeps predicate pushdown
and column pruning; never ``collect`` here.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLE_NAMES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def load_table(
    spark: SparkSession, sf_dir: str, name: str, spread: bool = False
) -> DataFrame:
    """Read one star-schema table.

    ``spread=True`` round-robins the scan across the cluster before a
    CPU-heavy narrow stage (shingling, hashing, vector math).  The file
    layout at test SF is a single small parquet file — one input split —
    which would pin all downstream per-row compute to one core.  At 100 TB
    the source has thousands of splits and the repartition collapses to a
    cheap rebalance; the flag exists so *selective* operators opt in and
    pure scan/agg plans keep their no-exchange path.
    """
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    if spread:
        target = spark.sparkContext.defaultParallelism
        if df.rdd.getNumPartitions() < target:
            df = df.repartition(target)
    # events.ts is parquet TIMESTAMP(NANOS), surfaced as a nanos long via
    # spark.sql.legacy.parquet.nanosAsLong. Normalize: keep the exact nanos
    # in ts_ns (the CDC dedup column must not lose precision — SURVEY §7
    # risk register) and expose ts as a micros timestamp.  Integer `div`,
    # not `/`: double division loses bits above 2^53 (~1e18 ns epoch).
    if name == "events":
        from pyspark.sql import types as T

        if isinstance(df.schema["ts"].dataType, T.LongType):
            df = df.withColumn("ts_ns", F.col("ts")).withColumn(
                "ts", F.timestamp_micros(F.expr("ts div 1000"))
            )
    return df


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in TABLE_NAMES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register each table as a temp view so plans can be written in SQL."""
    for name in TABLE_NAMES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
