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


ACF_MAX_LAG = 7


def events_autocorrelation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily-volume autocorrelation per event type at lags 1..7 days —
    the periodicity probe behind seasonality-aware anomaly baselines
    (is this stream weekly-periodic, daily-sticky, or white noise?).

    Scale design: one map-side-combinable daily count (the natural
    partitioning of an events table), then each daily row explodes into
    ≤ 7 (lag, date) probes that hash-join back to the SAME daily
    aggregate on (event_type, date − lag) — an equi-join on a derived
    key, never a window over the full series, so no per-type
    single-partition sort exists and the series length can grow without
    bound.  Pearson r is computed from exact integer moments
    (n, Σx, Σy, Σxy, Σx², Σy² — counts are integers, so every sum is
    exact and order-independent) and cast to DOUBLE once at the end:
    bit-identical across engines and partitionings.  Zero-variance
    series (a constant daily count) yield NULL, not a division error.
    """
    daily = (
        load_table(spark, sf_dir, "events")
        .groupBy("event_type", F.to_date("ts").alias("d"))
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )
    probes = daily.withColumn(
        "lag_d", F.explode(F.array(*[F.lit(i) for i in range(1, ACF_MAX_LAG + 1)]))
    )
    past = daily.select(
        F.col("event_type"),
        F.col("d").alias("d_past"),
        F.col("n").alias("n_past"),
    )
    joined = probes.join(
        past,
        (probes["event_type"] == past["event_type"])
        & (F.expr("date_sub(d, lag_d)") == past["d_past"]),
    ).select(probes["event_type"], "lag_d", "n", "n_past")
    m = joined.groupBy("event_type", "lag_d").agg(
        F.count(F.lit(1)).cast("long").alias("n_pairs"),
        F.sum("n").alias("sx"),
        F.sum("n_past").alias("sy"),
        F.sum(F.col("n") * F.col("n_past")).alias("sxy"),
        F.sum(F.col("n") * F.col("n")).alias("sxx"),
        F.sum(F.col("n_past") * F.col("n_past")).alias("syy"),
    )
    varx = m["n_pairs"] * m["sxx"] - m["sx"] * m["sx"]
    vary = m["n_pairs"] * m["syy"] - m["sy"] * m["sy"]
    cov = m["n_pairs"] * m["sxy"] - m["sx"] * m["sy"]
    return m.select(
        "event_type",
        F.col("lag_d").cast("int").alias("lag_d"),
        "n_pairs",
        F.when(
            (varx > 0) & (vary > 0),
            F.round(
                cov.cast("double")
                / F.sqrt(varx.cast("double") * vary.cast("double")),
                6,
            ),
        ).alias("acf"),
    ).orderBy("event_type", "lag_d")


EVENTS_ACF_SQL = f"""
WITH daily AS (
  SELECT event_type, CAST(CAST(ts AS TIMESTAMP) AS DATE) AS d,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM events GROUP BY 1, 2
),
probes AS (
  SELECT d.*, l.lag_d
  FROM daily d, unnest(range(1, {ACF_MAX_LAG + 1})) AS l(lag_d)
),
joined AS (
  SELECT p.event_type, p.lag_d, p.n, b.n AS n_past
  FROM probes p
  JOIN daily b
    ON b.event_type = p.event_type AND b.d = p.d - CAST(p.lag_d AS INTEGER)
),
m AS (
  SELECT event_type, lag_d,
    CAST(COUNT(*) AS BIGINT) AS n_pairs,
    SUM(n) AS sx, SUM(n_past) AS sy,
    SUM(n * n_past) AS sxy, SUM(n * n) AS sxx, SUM(n_past * n_past) AS syy
  FROM joined GROUP BY 1, 2
)
SELECT event_type, CAST(lag_d AS INTEGER) AS lag_d, n_pairs,
  CASE WHEN (n_pairs * sxx - sx * sx) > 0 AND (n_pairs * syy - sy * sy) > 0
    THEN round(
      CAST(n_pairs * sxy - sx * sy AS DOUBLE)
      / sqrt(CAST(n_pairs * sxx - sx * sx AS DOUBLE)
             * CAST(n_pairs * syy - sy * sy AS DOUBLE)), 6)
  END AS acf
FROM m
ORDER BY event_type, lag_d
"""


QUERIES = {
    "ts_similarity_topk": ts_similarity_topk,
    "events_autocorrelation": events_autocorrelation,
}

ORACLES = {
    "ts_similarity_topk": TS_SIMILARITY_SQL,
    "events_autocorrelation": EVENTS_ACF_SQL,
}
