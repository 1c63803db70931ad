"""Distributed time-series similarity search (PAPERS.md: EDBT'19 streaming
time-series similarity, EDBT'20 incremental top-k similarity).

Per-entity event streams become fixed-dimension activity profiles — the
sum of (decimal) event value per day-of-week, a 7-dim "weekly rhythm"
vector — and similarity search is exact euclidean top-k against a target
entity.  Plan shape at 100 TB:

- profile stage: ONE map-side-combinable ``groupBy(user_id)`` of 7
  conditional decimal sums (no pivot shuffle, no data-dependent columns);
- search stage: the 1-row target profile broadcasts (joined on a constant
  key so Catalyst plans a broadcast *hash* join, not a nested-loop) and
  the distance scan is embarrassingly parallel — no shuffle at all after
  the profile aggregation; top-k is a global sort of ``|users|`` rows.
- composition: for all-pairs or repeated-query workloads the profiles are
  just 7-dim embeddings — route them through the existing ANN operators
  (functions/similarity.py LSH/IVF) instead of scanning per query.

Determinism follows the repo's decimal convention (plans/analytics.py):
sums run in DECIMAL (exact, order-independent), the final distance casts
to DOUBLE once, ties break on user_id.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from debezium_server_bigquery_spark.sources.tables import load_table

N_DOW = 7  # Spark dayofweek(): 1=Sunday .. 7=Saturday
TOPK = 10


def weekly_profile(events: DataFrame) -> DataFrame:
    """(user_id, s1..s7): decimal value sums per day-of-week."""
    dow = F.dayofweek("ts")
    dec = F.col("value").cast("decimal(18,2)")
    aggs = [
        F.coalesce(
            F.sum(F.when(dow == i, dec)), F.lit(0).cast("decimal(18,2)")
        )
        .cast("decimal(18,2)")
        .alias(f"s{i}")
        for i in range(1, N_DOW + 1)
    ]
    return events.groupBy("user_id").agg(*aggs)


def ts_similarity_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-10 users whose weekly activity rhythm is nearest (euclidean)
    to the lowest-numbered user's — exact search over the profiles."""
    prof = weekly_profile(load_table(spark, sf_dir, "events", spread=True))
    target = (
        prof.join(
            F.broadcast(prof.groupBy().agg(F.min("user_id").alias("user_id"))),
            "user_id",
        )
        .select(
            F.lit(1).alias("__j"),
            F.col("user_id").alias("target_user"),
            *[F.col(f"s{i}").alias(f"t{i}") for i in range(1, N_DOW + 1)],
        )
    )
    dist2 = None
    for i in range(1, N_DOW + 1):
        d = (F.col(f"s{i}") - F.col(f"t{i}")).cast("decimal(18,2)")
        term = (d * d).cast("decimal(38,4)")
        dist2 = term if dist2 is None else (dist2 + term).cast("decimal(38,4)")
    return (
        prof.withColumn("__j", F.lit(1))
        .join(F.broadcast(target), "__j")
        .filter(F.col("user_id") != F.col("target_user"))
        .select(
            "user_id",
            F.sqrt(dist2.cast("double")).alias("distance"),
        )
        .orderBy("distance", "user_id")
        .limit(TOPK)
    )


TS_SIMILARITY_SQL = f"""
WITH prof AS (
  SELECT user_id,
    {", ".join(
        "COALESCE(SUM(CASE WHEN dayofweek(ts) + 1 = " + str(i)
        + " THEN CAST(value AS DECIMAL(18,2)) END), 0)::DECIMAL(18,2) AS s" + str(i)
        for i in range(1, N_DOW + 1)
    )}
  FROM events GROUP BY user_id
),
target AS (
  SELECT user_id AS target_user,
    {", ".join(f"s{i} AS t{i}" for i in range(1, N_DOW + 1))}
  FROM prof WHERE user_id = (SELECT MIN(user_id) FROM prof)
)
SELECT p.user_id,
  sqrt(CAST({" + ".join(
      f"CAST(CAST(p.s{i} - t.t{i} AS DECIMAL(18,2)) * CAST(p.s{i} - t.t{i} AS DECIMAL(18,2)) AS DECIMAL(38,4))"
      for i in range(1, N_DOW + 1)
  )} AS DOUBLE)) AS distance
FROM prof p CROSS JOIN target t
WHERE p.user_id <> t.target_user
ORDER BY distance, p.user_id
LIMIT {TOPK}
"""


QUERIES = {
    "ts_similarity_topk": ts_similarity_topk,
}

ORACLES = {
    "ts_similarity_topk": TS_SIMILARITY_SQL,
}
