"""Operational diagnostics queries: join-key skew and value histograms.

- **skew_report_lineitem_suppkey** — the report an operator runs BEFORE
  choosing a join strategy: per-key frequency profile of a fact-table
  join key (top heavy hitters, skew factor = max/mean, share of the top
  key).  One map-side-combinable count aggregate; heavy hitters via
  TakeOrderedAndProject.  This is the measurement that justifies
  operators/skewjoin.py's salting and the AQE skew-split defaults.
- **events_value_histogram** — fixed equi-width value buckets per event
  type (width_bucket semantics): one conditional-aggregation scan,
  O(types × buckets) output.

All floats are rounded ratios of exact integer counts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from debezium_server_bigquery_spark.sources.tables import load_table

SKEW_TOP = 10
HIST_LO, HIST_HI, HIST_BUCKETS = 0.0, 500.0, 10


def skew_report_lineitem_suppkey(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").select("l_suppkey")
    counts = li.groupBy("l_suppkey").agg(F.count("*").alias("n_rows"))
    stats = counts.agg(
        F.count("*").alias("n_keys"),
        F.sum("n_rows").alias("total_rows"),
        F.max("n_rows").alias("max_rows"),
    )
    top = counts.orderBy(F.desc("n_rows"), F.asc("l_suppkey")).limit(SKEW_TOP)
    return (
        top.crossJoin(F.broadcast(stats))
        .select(
            "l_suppkey",
            "n_rows",
            # skew factor vs the mean key: max would be 1.0 under uniform
            F.round(
                F.col("n_rows")
                / (F.col("total_rows").cast("double") / F.col("n_keys")),
                6,
            ).alias("x_mean"),
            F.round(
                F.col("n_rows") / F.col("total_rows").cast("double"), 6
            ).alias("share"),
        )
        .orderBy(F.desc("n_rows"), F.asc("l_suppkey"))
    )


SKEW_REPORT_SQL = f"""
WITH counts AS (
  SELECT l_suppkey, COUNT(*) AS n_rows FROM lineitem GROUP BY l_suppkey
),
stats AS (
  SELECT COUNT(*) AS n_keys,
    CAST(SUM(n_rows) AS BIGINT) AS total_rows
  FROM counts
),
top AS (
  SELECT l_suppkey, n_rows FROM counts
  ORDER BY n_rows DESC, l_suppkey ASC LIMIT {SKEW_TOP}
)
SELECT t.l_suppkey, t.n_rows,
  round(t.n_rows / (CAST(s.total_rows AS DOUBLE) / s.n_keys), 6) AS x_mean,
  round(t.n_rows / CAST(s.total_rows AS DOUBLE), 6) AS share
FROM top t CROSS JOIN stats s
ORDER BY t.n_rows DESC, t.l_suppkey ASC
"""


_HIST_STEP = (HIST_HI - HIST_LO) / HIST_BUCKETS  # literal, same in both twins


def events_value_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """width_bucket-style equi-width bins per event type: bucket 0 holds
    underflow, bucket n+1 overflow.  The bucket arithmetic is written out
    explicitly (floor((v - lo) / step)) and mirrored verbatim in the
    DuckDB twin, so boundary rows land identically in both engines."""
    ev = load_table(spark, sf_dir, "events").select("event_type", "value")
    v = F.col("value")
    bucket = (
        F.when(v < HIST_LO, F.lit(0))
        .when(v >= HIST_HI, F.lit(HIST_BUCKETS + 1))
        .otherwise(F.floor((v - HIST_LO) / F.lit(_HIST_STEP)) + 1)
        .cast("long")
    )
    return (
        ev.groupBy("event_type", bucket.alias("bucket"))
        .agg(F.count("*").alias("n"))
        .orderBy("event_type", "bucket")
    )


HISTOGRAM_SQL = f"""
SELECT event_type,
  CAST(CASE WHEN value < {HIST_LO} THEN 0
            WHEN value >= {HIST_HI} THEN {HIST_BUCKETS + 1}
            ELSE CAST(FLOOR((value - {HIST_LO}) / {_HIST_STEP}) AS BIGINT) + 1
       END AS BIGINT) AS bucket,
  COUNT(*) AS n
FROM events
GROUP BY 1, 2 ORDER BY event_type, bucket
"""


QUERIES = {
    "skew_report_lineitem_suppkey": skew_report_lineitem_suppkey,
    "events_value_histogram": events_value_histogram,
}
ORACLES = {
    "skew_report_lineitem_suppkey": SKEW_REPORT_SQL,
    "events_value_histogram": HISTOGRAM_SQL,
}
