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


def events_seasonal_strength(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STL-lite seasonal-strength per event type: how much of the
    detrended daily-volume variance the day-of-week explains (the ANOVA
    R² of DOW groups on the trend-removed series).  ~1 means the stream
    is a pure weekly rhythm; ~0 means the weekday label carries nothing
    once trend is gone.  Complements ``events_autocorrelation`` (which
    sees periodicity but not its share of variance) and the weekday
    index (means without trend removal).

    Scale + determinism design: daily counts are one map-side aggregate;
    the 7-observation centered rolling sum runs in a TYPE-partitioned
    window (never a global one) and a row only enters the analysis when
    its window holds exactly 7 CONSECUTIVE days (count = 7 and
    max-min = 6 days — gap-aware, so sparse streams don't fake a
    trend).  The detrended value 7·n − rollsum is an exact integer; all
    seven DOW groups pivot into ONE aggregate row of exact integer
    moments (counts, sums, decimal squares), and the variance
    decomposition is evaluated in a FIXED written term order on both
    engines — the only floats are the final seven divisions and the
    ratio, bit-identical cross-engine."""
    from pyspark.sql.window import Window

    daily = (
        load_table(spark, sf_dir, "events")
        .groupBy("event_type", F.to_date("ts").alias("d"))
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )
    w = Window.partitionBy("event_type").orderBy("d").rowsBetween(-3, 3)
    win = daily.select(
        "event_type",
        "d",
        "n",
        F.sum("n").over(w).alias("roll"),
        F.count(F.lit(1)).over(w).alias("cnt"),
        F.min("d").over(w).alias("dmin"),
        F.max("d").over(w).alias("dmax"),
    )
    det = win.filter(
        (F.col("cnt") == 7) & (F.datediff("dmax", "dmin") == 6)
    ).select(
        "event_type",
        F.expr("weekday(d)").alias("dow"),
        (F.lit(7) * F.col("n") - F.col("roll")).cast("long").alias("det"),
    )
    dec = F.col("det").cast("decimal(38,0)")
    aggs = [
        F.count(F.lit(1)).cast("long").alias("n_days"),
        F.sum("det").cast("long").alias("s_all"),
        F.sum(dec * dec).cast("decimal(38,0)").alias("ss_all"),
    ]
    for i in range(7):
        hit = F.col("dow") == i
        aggs.append(
            F.sum(F.when(hit, F.lit(1)).otherwise(F.lit(0)))
            .cast("long")
            .alias(f"c{i}")
        )
        aggs.append(
            F.sum(F.when(hit, F.col("det")).otherwise(F.lit(0)))
            .cast("long")
            .alias(f"s{i}")
        )
    g = det.groupBy("event_type").agg(*aggs)
    ssb = None
    for i in range(7):
        term = F.when(
            F.col(f"c{i}") > 0,
            (F.col(f"s{i}").cast("double") * F.col(f"s{i}"))
            / F.col(f"c{i}"),
        ).otherwise(F.lit(0.0))
        ssb = term if ssb is None else ssb + term
    mean_sq = (
        F.col("s_all").cast("double") * F.col("s_all") / F.col("n_days")
    )
    sst = F.col("ss_all").cast("double") - mean_sq
    return g.select(
        "event_type",
        "n_days",
        F.when(sst > 0, F.round((ssb - mean_sq) / sst, 6)).alias(
            "seasonal_strength"
        ),
    ).orderBy("event_type")


SEASONAL_STRENGTH_SQL = """
WITH daily AS (
  SELECT event_type, CAST(CAST(ts AS TIMESTAMP) AS DATE) AS d,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM events GROUP BY 1, 2
),
win AS (
  SELECT event_type, d, n,
    SUM(n) OVER w AS roll, COUNT(*) OVER w AS cnt,
    MIN(d) OVER w AS dmin, MAX(d) OVER w AS dmax
  FROM daily
  WINDOW w AS (PARTITION BY event_type ORDER BY d
               ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)
),
det AS (
  SELECT event_type, isodow(d) - 1 AS dow,
         CAST(7 * n - roll AS BIGINT) AS det
  FROM win WHERE cnt = 7 AND dmax - dmin = 6
),
g AS (
  SELECT event_type,
    CAST(COUNT(*) AS BIGINT) AS n_days,
    CAST(SUM(det) AS BIGINT) AS s_all,
    SUM(CAST(det AS DECIMAL(38,0)) * det) AS ss_all,
    CAST(SUM(CASE WHEN dow = 0 THEN 1 ELSE 0 END) AS BIGINT) AS c0,
    CAST(SUM(CASE WHEN dow = 0 THEN det ELSE 0 END) AS BIGINT) AS s0,
    CAST(SUM(CASE WHEN dow = 1 THEN 1 ELSE 0 END) AS BIGINT) AS c1,
    CAST(SUM(CASE WHEN dow = 1 THEN det ELSE 0 END) AS BIGINT) AS s1,
    CAST(SUM(CASE WHEN dow = 2 THEN 1 ELSE 0 END) AS BIGINT) AS c2,
    CAST(SUM(CASE WHEN dow = 2 THEN det ELSE 0 END) AS BIGINT) AS s2,
    CAST(SUM(CASE WHEN dow = 3 THEN 1 ELSE 0 END) AS BIGINT) AS c3,
    CAST(SUM(CASE WHEN dow = 3 THEN det ELSE 0 END) AS BIGINT) AS s3,
    CAST(SUM(CASE WHEN dow = 4 THEN 1 ELSE 0 END) AS BIGINT) AS c4,
    CAST(SUM(CASE WHEN dow = 4 THEN det ELSE 0 END) AS BIGINT) AS s4,
    CAST(SUM(CASE WHEN dow = 5 THEN 1 ELSE 0 END) AS BIGINT) AS c5,
    CAST(SUM(CASE WHEN dow = 5 THEN det ELSE 0 END) AS BIGINT) AS s5,
    CAST(SUM(CASE WHEN dow = 6 THEN 1 ELSE 0 END) AS BIGINT) AS c6,
    CAST(SUM(CASE WHEN dow = 6 THEN det ELSE 0 END) AS BIGINT) AS s6
  FROM det GROUP BY event_type
)
SELECT event_type, n_days,
  CASE WHEN (CAST(ss_all AS DOUBLE)
             - CAST(s_all AS DOUBLE) * s_all / n_days) > 0
    THEN round(
      ((CASE WHEN c0 > 0 THEN CAST(s0 AS DOUBLE) * s0 / c0 ELSE 0.0 END
        + CASE WHEN c1 > 0 THEN CAST(s1 AS DOUBLE) * s1 / c1 ELSE 0.0 END
        + CASE WHEN c2 > 0 THEN CAST(s2 AS DOUBLE) * s2 / c2 ELSE 0.0 END
        + CASE WHEN c3 > 0 THEN CAST(s3 AS DOUBLE) * s3 / c3 ELSE 0.0 END
        + CASE WHEN c4 > 0 THEN CAST(s4 AS DOUBLE) * s4 / c4 ELSE 0.0 END
        + CASE WHEN c5 > 0 THEN CAST(s5 AS DOUBLE) * s5 / c5 ELSE 0.0 END
        + CASE WHEN c6 > 0 THEN CAST(s6 AS DOUBLE) * s6 / c6 ELSE 0.0 END)
       - CAST(s_all AS DOUBLE) * s_all / n_days)
      / (CAST(ss_all AS DOUBLE)
         - CAST(s_all AS DOUBLE) * s_all / n_days), 6)
  END AS seasonal_strength
FROM g
ORDER BY event_type
"""


def events_crosscorrelation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lead-lag cross-correlation between event-type pairs: does type A's
    daily volume at day t predict type B's at day t+lag?  (the classic
    "views lead purchases by two days" read, and the input to any
    Granger-style causal screen).  Directional: (type_a, type_b, lag)
    correlates A today with B ``lag`` days LATER; lag 0 is emitted once
    per unordered pair.

    Scale design mirrors ``events_autocorrelation``: lagged pairs come
    from an equi-join of the daily aggregate with itself on the derived
    date key (per-date fan-out bounded by |types|², a fixed domain) —
    never an ordered window — and Pearson r derives from exact integer
    moments cast to DOUBLE once.  Zero-variance series yield NULL."""
    daily = (
        load_table(spark, sf_dir, "events")
        .groupBy("event_type", F.to_date("ts").alias("d"))
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )
    probes = daily.select(
        F.col("event_type").alias("type_a"),
        F.col("d"),
        F.col("n").alias("n_a"),
    ).withColumn(
        "lag_d",
        F.explode(F.array(*[F.lit(i) for i in range(0, ACF_MAX_LAG + 1)])),
    )
    b = daily.select(
        F.col("event_type").alias("type_b"),
        F.col("d").alias("d_b"),
        F.col("n").alias("n_b"),
    )
    joined = probes.join(
        b, F.expr("date_add(d, lag_d)") == b["d_b"]
    ).filter(
        (F.col("type_a") != F.col("type_b"))
        & ((F.col("lag_d") > 0) | (F.col("type_a") < F.col("type_b")))
    )
    m = joined.groupBy("type_a", "type_b", "lag_d").agg(
        F.count(F.lit(1)).cast("long").alias("n_pairs"),
        F.sum("n_a").alias("sx"),
        F.sum("n_b").alias("sy"),
        F.sum(F.col("n_a") * F.col("n_b")).alias("sxy"),
        F.sum(F.col("n_a") * F.col("n_a")).alias("sxx"),
        F.sum(F.col("n_b") * F.col("n_b")).alias("syy"),
    )
    varx = m["n_pairs"] * m["sxx"] - m["sx"] * m["sx"]
    vary = m["n_pairs"] * m["syy"] - m["sy"] * m["sy"]
    cov = m["n_pairs"] * m["sxy"] - m["sx"] * m["sy"]
    return m.select(
        "type_a",
        "type_b",
        F.col("lag_d").cast("int").alias("lag_d"),
        "n_pairs",
        F.when(
            (varx > 0) & (vary > 0),
            F.round(
                cov.cast("double")
                / F.sqrt(varx.cast("double") * vary.cast("double")),
                6,
            ),
        ).alias("xcorr"),
    ).orderBy("type_a", "type_b", "lag_d")


EVENTS_XCORR_SQL = f"""
WITH daily AS (
  SELECT event_type, CAST(CAST(ts AS TIMESTAMP) AS DATE) AS d,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM events GROUP BY 1, 2
),
probes AS (
  SELECT d.event_type AS type_a, d.d, d.n AS n_a, l.lag_d
  FROM daily d, unnest(range(0, {ACF_MAX_LAG + 1})) AS l(lag_d)
),
joined AS (
  SELECT p.type_a, b.event_type AS type_b, p.lag_d, p.n_a, b.n AS n_b
  FROM probes p
  JOIN daily b ON b.d = p.d + CAST(p.lag_d AS INTEGER)
  WHERE p.type_a <> b.event_type
    AND (p.lag_d > 0 OR p.type_a < b.event_type)
),
m AS (
  SELECT type_a, type_b, lag_d,
    CAST(COUNT(*) AS BIGINT) AS n_pairs,
    SUM(n_a) AS sx, SUM(n_b) AS sy,
    SUM(n_a * n_b) AS sxy, SUM(n_a * n_a) AS sxx, SUM(n_b * n_b) AS syy
  FROM joined GROUP BY 1, 2, 3
)
SELECT type_a, type_b, CAST(lag_d AS INTEGER) AS lag_d, n_pairs,
  CASE WHEN (n_pairs * sxx - sx * sx) > 0 AND (n_pairs * syy - sy * sy) > 0
    THEN round(
      CAST(n_pairs * sxy - sx * sy AS DOUBLE)
      / sqrt(CAST(n_pairs * sxx - sx * sx AS DOUBLE)
             * CAST(n_pairs * syy - sy * sy AS DOUBLE)), 6)
  END AS xcorr
FROM m
ORDER BY type_a, type_b, lag_d
"""


QUERIES = {
    "ts_similarity_topk": ts_similarity_topk,
    "events_autocorrelation": events_autocorrelation,
    "events_seasonal_strength": events_seasonal_strength,
    "events_crosscorrelation": events_crosscorrelation,
}

ORACLES = {
    "ts_similarity_topk": TS_SIMILARITY_SQL,
    "events_autocorrelation": EVENTS_ACF_SQL,
    "events_seasonal_strength": SEASONAL_STRENGTH_SQL,
    "events_crosscorrelation": EVENTS_XCORR_SQL,
}


def events_dispersion_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Poisson overdispersion index of daily volume per event type —
    variance-to-mean ratio of the daily counts (D ≈ 1 for a Poisson
    arrival stream, D ≫ 1 for bursty/machine traffic, D < 1 for
    rate-limited schedulers).  The one-number companion to the per-user
    burstiness audit and the calibration input CUSUM thresholds assume.

    Scale/exactness: one map-side daily count, one O(types) aggregate of
    exact integer moments (n, Σx, Σx² — counts are integers, sums exact
    and order-independent); the variance/mean assemble in DECIMAL and
    divide once at the end.  n < 2 or a zero mean yields NULL."""
    daily = (
        load_table(spark, sf_dir, "events")
        .groupBy("event_type", F.to_date("ts").alias("d"))
        .agg(F.count(F.lit(1)).cast("long").alias("x"))
    )
    dec = lambda c: F.col(c).cast("decimal(38,0)")  # noqa: E731
    m = daily.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n_days"),
        F.sum("x").cast("long").alias("sx"),
        F.sum(F.col("x") * F.col("x")).cast("long").alias("sxx"),
    )
    var_num = dec("n_days") * dec("sxx") - dec("sx") * dec("sx")
    # D = var/mean = [n·Σx² − (Σx)²] / (n−1) / (Σx/n) ·(1/n) — written as
    # one fixed expression: var_num · n / ((n−1) · n · Σx) = var_num / ((n−1)·Σx)
    return m.select(
        "event_type",
        "n_days",
        F.round(F.col("sx").cast("double") / F.col("n_days").cast("double"), 6)
        .alias("mean_daily"),
        F.when(
            (F.col("n_days") > 1) & (F.col("sx") > 0),
            F.round(
                var_num.cast("double")
                / ((F.col("n_days") - 1).cast("double") * F.col("sx").cast("double")),
                6,
            ),
        ).alias("dispersion"),
    ).orderBy("event_type")


EVENTS_DISPERSION_SQL = """
WITH daily AS (
  SELECT event_type, CAST(CAST(ts AS TIMESTAMP) AS DATE) AS d,
         CAST(COUNT(*) AS BIGINT) AS x
  FROM events GROUP BY 1, 2
),
m AS (
  SELECT event_type,
    CAST(COUNT(*) AS BIGINT) AS n_days,
    CAST(SUM(x) AS BIGINT) AS sx,
    CAST(SUM(x * x) AS BIGINT) AS sxx
  FROM daily GROUP BY event_type
)
SELECT event_type, n_days,
  round(CAST(sx AS DOUBLE) / CAST(n_days AS DOUBLE), 6) AS mean_daily,
  CASE WHEN n_days > 1 AND sx > 0 THEN
    round(CAST(CAST(n_days AS DECIMAL(38,0)) * sxx
               - CAST(sx AS DECIMAL(38,0)) * sx AS DOUBLE)
          / (CAST(n_days - 1 AS DOUBLE) * CAST(sx AS DOUBLE)), 6)
  END AS dispersion
FROM m ORDER BY event_type
"""

QUERIES["events_dispersion_index"] = events_dispersion_index
ORACLES["events_dispersion_index"] = EVENTS_DISPERSION_SQL


CONFORMAL_SPLIT = "2024-01-22"  # 3 calibration weeks, then test days
CONFORMAL_ALPHA_NUM = 9  # 1 - alpha = 9/10 target coverage


def conformal_volume_intervals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Split-conformal prediction intervals for daily volume per event
    type, evaluated: a day-of-week mean forecaster fits on the
    calibration window, q̂ is the ⌈0.9·(n+1)⌉-th smallest absolute
    calibration residual (the finite-sample-valid conformal quantile),
    and the row reports the realized TEST coverage of pred ± q̂ — the
    distribution-free uncertainty readout (Vovk et al.; Angelopoulos &
    Bates survey) that anomaly SLOs should quote instead of Gaussian
    bands.  Days are the OBSERVED daily lattice (these streams have no
    gaps; a gapped stream would need the filled lattice first).

    Scale/exactness: daily counts are one map-side aggregate; the
    forecaster is an O(types × 7) broadcast; residual ranking runs in a
    TYPE-partitioned window over ≤ calibration-days rows with a date
    tiebreak; every float derives from exact integers through the same
    written expressions on both engines, so comparisons agree exactly."""
    daily = (
        load_table(spark, sf_dir, "events")
        .groupBy("event_type", F.to_date("ts").alias("d"))
        .agg(F.count(F.lit(1)).cast("long").alias("x"))
    )
    cal = daily.filter(F.col("d") < F.lit(CONFORMAL_SPLIT))
    test = daily.filter(F.col("d") >= F.lit(CONFORMAL_SPLIT))
    pred = cal.groupBy("event_type", F.dayofweek("d").alias("dow")).agg(
        (F.sum("x").cast("double") / F.count(F.lit(1)).cast("double")).alias(
            "pred"
        )
    )
    cal_r = (
        cal.withColumn("dow", F.dayofweek("d"))
        .join(F.broadcast(pred), ["event_type", "dow"])
        .select(
            "event_type",
            "d",
            F.abs(F.col("x").cast("double") - F.col("pred")).alias("r"),
        )
    )
    from pyspark.sql.window import Window

    w = Window.partitionBy("event_type").orderBy("r", "d")
    ranked = cal_r.select(
        "event_type",
        "r",
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1))
        .over(Window.partitionBy("event_type"))
        .alias("n_cal"),
    )
    k = F.least(
        F.ceil(
            (F.col("n_cal") + 1).cast("double")
            * F.lit(CONFORMAL_ALPHA_NUM)
            / F.lit(10.0)
        ).cast("long"),
        F.col("n_cal"),
    )
    qhat = ranked.filter(F.col("rn") == k).select(
        "event_type", F.col("r").alias("q_hat"), "n_cal"
    )
    scored = (
        test.withColumn("dow", F.dayofweek("d"))
        .join(F.broadcast(pred), ["event_type", "dow"])
        .join(F.broadcast(qhat), "event_type")
        .select(
            "event_type",
            "n_cal",
            "q_hat",
            (
                F.abs(F.col("x").cast("double") - F.col("pred"))
                <= F.col("q_hat")
            )
            .cast("long")
            .alias("covered"),
        )
    )
    return (
        scored.groupBy("event_type", "n_cal", "q_hat")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_test"),
            F.sum("covered").cast("long").alias("n_covered"),
        )
        .select(
            "event_type",
            "n_cal",
            "n_test",
            (F.round("q_hat", 6) + F.lit(0.0)).alias("q_hat"),
            F.round(
                F.col("n_covered").cast("double") / F.col("n_test").cast("double"),
                6,
            ).alias("coverage"),
        )
        .orderBy("event_type")
    )


CONFORMAL_SQL = f"""
WITH daily AS (
  SELECT event_type, CAST(CAST(ts AS TIMESTAMP) AS DATE) AS d,
         CAST(COUNT(*) AS BIGINT) AS x
  FROM events GROUP BY 1, 2
),
cal AS (SELECT * FROM daily WHERE d < DATE '{CONFORMAL_SPLIT}'),
test AS (SELECT * FROM daily WHERE d >= DATE '{CONFORMAL_SPLIT}'),
pred AS (
  SELECT event_type, dayofweek(d) + 1 AS dow,
    CAST(SUM(x) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS pred
  FROM cal GROUP BY 1, 2
),
cal_r AS (
  SELECT c.event_type, c.d,
    abs(CAST(c.x AS DOUBLE) - p.pred) AS r
  FROM cal c JOIN pred p
    ON c.event_type = p.event_type AND dayofweek(c.d) + 1 = p.dow
),
ranked AS (
  SELECT event_type, r,
    ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY r, d) AS rn,
    CAST(COUNT(*) OVER (PARTITION BY event_type) AS BIGINT) AS n_cal
  FROM cal_r
),
qhat AS (
  SELECT event_type, r AS q_hat, n_cal FROM ranked
  WHERE rn = least(CAST(ceil(CAST(n_cal + 1 AS DOUBLE)
                             * {CONFORMAL_ALPHA_NUM} / 10.0) AS BIGINT), n_cal)
),
scored AS (
  SELECT t.event_type, q.n_cal, q.q_hat,
    CASE WHEN abs(CAST(t.x AS DOUBLE) - p.pred) <= q.q_hat
         THEN 1 ELSE 0 END AS covered
  FROM test t
  JOIN pred p ON t.event_type = p.event_type AND dayofweek(t.d) + 1 = p.dow
  JOIN qhat q ON t.event_type = q.event_type
)
SELECT event_type, n_cal,
  CAST(COUNT(*) AS BIGINT) AS n_test,
  round(q_hat, 6) + 0.0 AS q_hat,
  round(CAST(SUM(covered) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE), 6)
    AS coverage
FROM scored GROUP BY event_type, n_cal, q_hat
ORDER BY event_type
"""

QUERIES["conformal_volume_intervals"] = conformal_volume_intervals
ORACLES["conformal_volume_intervals"] = CONFORMAL_SQL


def forecast_mase_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MASE (mean absolute scaled error, Hyndman & Koehler 2006) of the
    day-of-week mean forecaster on the conformal split: model MAE on
    test days divided by the in-sample MAE of the seasonal-naive
    (lag-7) baseline — the scale-free forecast-accuracy number that
    lets event types of very different volumes share one leaderboard
    (MASE < 1 = beats naive).

    Scale/exactness: reuses the conformal operator's daily-count and
    dow-mean shapes (one aggregate each, O(types×7) broadcast); the
    lag-7 baseline is a self-join of the daily table on (type, d−7) —
    an equi-join on a derived key, never a window over the series.
    Numerators/denominators are sums of |integer − deterministic
    double| accumulated per type and divided once."""
    daily = (
        load_table(spark, sf_dir, "events")
        .groupBy("event_type", F.to_date("ts").alias("d"))
        .agg(F.count(F.lit(1)).cast("long").alias("x"))
    )
    cal = daily.filter(F.col("d") < F.lit(CONFORMAL_SPLIT))
    test = daily.filter(F.col("d") >= F.lit(CONFORMAL_SPLIT))
    pred = cal.groupBy("event_type", F.dayofweek("d").alias("dow")).agg(
        (F.sum("x").cast("double") / F.count(F.lit(1)).cast("double")).alias(
            "pred"
        )
    )
    model_err = (
        test.withColumn("dow", F.dayofweek("d"))
        .join(F.broadcast(pred), ["event_type", "dow"])
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_test"),
            F.sum(
                F.round(
                    F.abs(F.col("x").cast("double") - F.col("pred")), 9
                ).cast("decimal(38,9)")
            ).alias("sae_model"),
        )
    )
    a = cal.select(
        F.col("event_type").alias("et_a"), F.col("d").alias("d_a"),
        F.col("x").alias("x_a"),
    )
    past = cal.select(
        F.col("event_type").alias("et_b"), F.col("d").alias("d7"),
        F.col("x").alias("x7"),
    )
    naive_err = (
        a.join(
            past,
            (F.col("et_a") == F.col("et_b"))
            & (F.expr("date_sub(d_a, 7)") == F.col("d7")),
        )
        .select(F.col("et_a").alias("event_type"), F.col("x_a").alias("x"), "x7")
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_naive"),
            F.sum(F.abs(F.col("x") - F.col("x7")).cast("decimal(38,0)")).alias(
                "sae_naive"
            ),
        )
    )
    mae_model = F.col("sae_model").cast("double") / F.col("n_test").cast(
        "double"
    )
    mae_naive = F.col("sae_naive").cast("double") / F.col("n_naive").cast(
        "double"
    )
    return (
        model_err.join(naive_err, "event_type")
        .select(
            "event_type",
            "n_test",
            (F.round(mae_model, 6) + F.lit(0.0)).alias("mae_model"),
            (F.round(mae_naive, 6) + F.lit(0.0)).alias("mae_naive"),
            F.when(
                F.col("sae_naive") > 0,
                F.round(mae_model / mae_naive, 6) + F.lit(0.0),
            ).alias("mase"),
        )
        .orderBy("event_type")
    )


FORECAST_MASE_SQL = f"""
WITH daily AS (
  SELECT event_type, CAST(CAST(ts AS TIMESTAMP) AS DATE) AS d,
         CAST(COUNT(*) AS BIGINT) AS x
  FROM events GROUP BY 1, 2
),
cal AS (SELECT * FROM daily WHERE d < DATE '{CONFORMAL_SPLIT}'),
test AS (SELECT * FROM daily WHERE d >= DATE '{CONFORMAL_SPLIT}'),
pred AS (
  SELECT event_type, dayofweek(d) + 1 AS dow,
    CAST(SUM(x) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS pred
  FROM cal GROUP BY 1, 2
),
model_err AS (
  SELECT t.event_type,
    CAST(COUNT(*) AS BIGINT) AS n_test,
    CAST(SUM(CAST(round(abs(CAST(t.x AS DOUBLE) - p.pred), 9)
                  AS DECIMAL(38,9))) AS DECIMAL(38,9)) AS sae_model
  FROM test t JOIN pred p
    ON t.event_type = p.event_type AND dayofweek(t.d) + 1 = p.dow
  GROUP BY t.event_type
),
naive_err AS (
  SELECT a.event_type,
    CAST(COUNT(*) AS BIGINT) AS n_naive,
    CAST(SUM(abs(a.x - b.x)) AS DECIMAL(38,0)) AS sae_naive
  FROM cal a JOIN cal b
    ON a.event_type = b.event_type AND b.d = a.d - 7
  GROUP BY a.event_type
)
SELECT m.event_type, m.n_test,
  round(CAST(m.sae_model AS DOUBLE) / CAST(m.n_test AS DOUBLE), 6) + 0.0
    AS mae_model,
  round(CAST(n.sae_naive AS DOUBLE) / CAST(n.n_naive AS DOUBLE), 6) + 0.0
    AS mae_naive,
  CASE WHEN n.sae_naive > 0 THEN
    round((CAST(m.sae_model AS DOUBLE) / CAST(m.n_test AS DOUBLE))
          / (CAST(n.sae_naive AS DOUBLE) / CAST(n.n_naive AS DOUBLE)), 6) + 0.0
  END AS mase
FROM model_err m JOIN naive_err n ON m.event_type = n.event_type
ORDER BY m.event_type
"""

QUERIES["forecast_mase_by_type"] = forecast_mase_by_type
ORACLES["forecast_mase_by_type"] = FORECAST_MASE_SQL
