"""Sketch-based approximate aggregation — the 100 TB cardinality path.

Exact COUNT(DISTINCT) over billions of keys shuffles every distinct value;
the sketch forms aggregate a fixed-size summary map-side and merge it, so
the exchange is O(sketch size * groups) regardless of data volume:

- ``sketch_distinct_users`` — HyperLogLog++ (`approx_count_distinct`,
  default rsd 5%) per day x event_type, alongside the group row count.
- ``sketch_value_quantiles`` — t-digest-style `percentile_approx` of the
  value column per event type (p50/p90/p99).

Sketch outputs are approximate and engine-specific, so these two entries
intentionally carry **no DuckDB oracle** (the driver records a rows-only
check); their accuracy contract is pinned by tests/test_sketches.py, which
bounds the error against the exact answers (HLL within 5 x rsd, quantiles
within the documented 1/accuracy rank error).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from debezium_server_bigquery_spark.sources.tables import load_table

HLL_RSD = 0.05
PCT_ACCURACY = 10_000  # percentile_approx accuracy parameter


def sketch_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(
            F.date_trunc("day", F.col("ts")).cast("date").alias("day"),
            "event_type",
        )
        .agg(
            F.approx_count_distinct("user_id", rsd=HLL_RSD).alias("approx_users"),
            F.count("*").alias("n_events"),
        )
        .orderBy("day", "event_type")
    )


def sketch_value_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    pct = F.percentile_approx(
        "value", [0.5, 0.9, 0.99], F.lit(PCT_ACCURACY)
    )
    return (
        ev.groupBy("event_type")
        .agg(
            pct.getItem(0).alias("p50"),
            pct.getItem(1).alias("p90"),
            pct.getItem(2).alias("p99"),
            F.count("*").alias("n_rows"),
        )
        .orderBy("event_type")
    )


QUERIES = {
    "sketch_distinct_users": sketch_distinct_users,
    "sketch_value_quantiles": sketch_value_quantiles,
}

# Intentionally no ORACLES — approximate, engine-specific results; accuracy
# is test-bounded instead (see module docstring).
ORACLES: dict[str, str] = {}
