"""User-behavior analytics beyond the funnel: retention cohorts and
volume-anomaly detection over the events stream.

- **retention_cohorts** — classic cohort retention: users grouped by
  first-activity week, then the share still active k weeks later.  Two
  aggregations: per-user first week (one shuffle on user_id), then
  distinct (cohort, k, user) activity rolled up per (cohort, k).  Both are
  map-side combinable; no window, no self-join.  At 100 TB the user-keyed
  aggregate is the natural partitioning the events table would already be
  bucketed on.
- **events_volume_anomaly** — daily event-type volume z-scored against a
  trailing 7-day baseline.  The baseline moments are windowed sums of
  INTEGER counts (count, Σn, Σn²) — integer arithmetic is exact and
  associative, so the moments are bit-identical across engines no matter
  how either parallelizes the window frame, and the z-score is one
  deterministic double expression over them (the same determinism trick
  as PageRank's decimal contributions, here free because volumes are
  already integers).  One shuffle on event_type for the window; daily
  pre-aggregation shrinks the stream to O(types × days) rows first.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from debezium_server_bigquery_spark.sources.tables import load_table

BASELINE_DAYS = 7
Z_THRESHOLD = 3.0


def retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", F.date_trunc("week", F.col("ts")).cast("date").alias("week")
    )
    # cohort derives FROM the distinct activity set (min over distinct
    # weeks == min over all weeks), so the stream is scanned once and the
    # follow-up aggregate reuses the distinct's user partitioning
    active = ev.distinct()
    cohort = active.groupBy("user_id").agg(F.min("week").alias("cohort_week"))
    joined = active.join(cohort, "user_id").select(
        "user_id",
        "cohort_week",
        # both dates are Monday-truncated, so the diff is an exact multiple
        # of 7 — integer division keeps it integer in both engines
        F.expr("datediff(week, cohort_week) div 7").cast("long").alias("k"),
    )
    per_cell = joined.groupBy("cohort_week", "k").agg(
        F.countDistinct("user_id").alias("n_active")
    )
    sizes = cohort.groupBy("cohort_week").agg(
        F.countDistinct("user_id").alias("cohort_size")
    )
    return (
        per_cell.join(sizes, "cohort_week")
        .select(
            "cohort_week",
            "k",
            "n_active",
            "cohort_size",
            F.round(F.col("n_active") / F.col("cohort_size"), 6).alias("retention"),
        )
        .orderBy("cohort_week", "k")
    )


RETENTION_SQL = """
WITH ev AS (
  SELECT user_id, CAST(date_trunc('week', CAST(ts AS TIMESTAMP)) AS DATE) AS week
  FROM events
),
active AS (SELECT DISTINCT user_id, week FROM ev),
cohort AS (SELECT user_id, MIN(week) AS cohort_week FROM active GROUP BY user_id),
joined AS (
  SELECT a.user_id, c.cohort_week,
    CAST(datediff('day', c.cohort_week, a.week) // 7 AS BIGINT) AS k
  FROM active a JOIN cohort c ON a.user_id = c.user_id
),
per_cell AS (
  SELECT cohort_week, k, COUNT(DISTINCT user_id) AS n_active
  FROM joined GROUP BY cohort_week, k
),
sizes AS (
  SELECT cohort_week, COUNT(DISTINCT user_id) AS cohort_size
  FROM cohort GROUP BY cohort_week
)
SELECT p.cohort_week, p.k, p.n_active, s.cohort_size,
  round(p.n_active / CAST(s.cohort_size AS DOUBLE), 6) AS retention
FROM per_cell p JOIN sizes s ON p.cohort_week = s.cohort_week
ORDER BY p.cohort_week, p.k
"""


def events_volume_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select(
        "event_type", F.col("ts").cast("date").alias("day")
    )
    return volume_anomaly_frame(ev)


def volume_anomaly_frame(ev: DataFrame) -> DataFrame:
    """Core of the anomaly query over an (event_type, day) frame —
    factored out so outage scenarios are unit-testable on synthetic data."""
    sparse = ev.groupBy("event_type", "day").agg(F.count("*").alias("n_events"))
    # Densify to the full (event_type × calendar-day) grid with 0-fills:
    # a type that goes SILENT is the canonical volume anomaly, and without
    # explicit zero days the window would skip the outage entirely and
    # treat pre-gap days as adjacent.  The grid is types × days — O(metadata)
    # rows at any corpus size; bounds are a broadcast one-row aggregate.
    # bounds and the type set derive from the SPARSE aggregate (every
    # (type, day) in the stream appears there), not the raw events — the
    # O(types × days) table replaces two more full scans of the stream
    bounds = sparse.agg(F.min("day").alias("lo"), F.max("day").alias("hi"))
    grid = (
        sparse.select("event_type")
        .distinct()
        .crossJoin(F.broadcast(bounds))
        .select(
            "event_type", F.explode(F.expr("sequence(lo, hi)")).alias("day")
        )
    )
    daily = grid.join(sparse, ["event_type", "day"], "left").select(
        "event_type", "day", F.coalesce("n_events", F.lit(0)).alias("n_events")
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("day")
        .rowsBetween(-BASELINE_DAYS, -1)
    )
    based = daily.select(
        "event_type",
        "day",
        "n_events",
        F.count("n_events").over(w).alias("base_n"),
        F.sum("n_events").over(w).alias("s1"),
        F.sum(F.col("n_events") * F.col("n_events")).over(w).alias("s2"),
    )
    # try_divide, not `/`: ANSI mode raises DIVIDE_BY_ZERO, and codegen's
    # common-subexpression elimination hoists `var` OUT of the CASE
    # branches, so the 0- and 1-row baseline frames evaluate the division
    # even though every guard excludes them.  try_divide yields NULL
    # there, which the base_n >= 3 guards already treat as false; for
    # base_n >= 3 the denominators are provably nonzero, so the guarded
    # outputs are identical to plain division (and to the DuckDB twin).
    mean = F.try_divide(F.col("s1").cast("double"), F.col("base_n"))
    var = F.try_divide(
        F.col("s2").cast("double")
        - F.try_divide((F.col("s1") * F.col("s1")).cast("double"), F.col("base_n")),
        F.col("base_n") - 1,
    )
    z = F.try_divide(F.col("n_events") - mean, F.sqrt(var))
    enough = F.col("base_n") >= 3
    usable = enough & (var > 0)
    return based.select(
        "event_type",
        "day",
        "n_events",
        "base_n",
        F.when(usable, F.round(z, 6)).alias("z"),
        # var == 0 (perfectly constant baseline) leaves z undefined, but
        # ANY deviation from a constant history is an anomaly — the total
        # outage against a steady feed must not slip through the z guard
        F.when(usable, F.abs(z) > Z_THRESHOLD)
        .when(enough & (var <= 0), F.col("n_events") != mean)
        .otherwise(F.lit(False))
        .alias("is_anomaly"),
    ).orderBy("event_type", "day")


ANOMALY_SQL = f"""
WITH sparse AS (
  SELECT event_type, CAST(ts AS DATE) AS day, COUNT(*) AS n_events
  FROM events GROUP BY event_type, CAST(ts AS DATE)
),
bounds AS (
  SELECT MIN(CAST(ts AS DATE)) AS lo, MAX(CAST(ts AS DATE)) AS hi FROM events
),
grid AS (
  SELECT t.event_type, CAST(unnest(generate_series(b.lo, b.hi, INTERVAL 1 DAY)) AS DATE) AS day
  FROM (SELECT DISTINCT event_type FROM events) t CROSS JOIN bounds b
),
daily AS (
  SELECT g.event_type, g.day, COALESCE(s.n_events, 0) AS n_events
  FROM grid g LEFT JOIN sparse s
    ON g.event_type = s.event_type AND g.day = s.day
),
based AS (
  SELECT event_type, day, n_events,
    COUNT(n_events) OVER w AS base_n,
    CAST(SUM(n_events) OVER w AS BIGINT) AS s1,
    CAST(SUM(n_events * n_events) OVER w AS BIGINT) AS s2
  FROM daily
  WINDOW w AS (PARTITION BY event_type ORDER BY day
               ROWS BETWEEN {BASELINE_DAYS} PRECEDING AND 1 PRECEDING)
)
SELECT event_type, day, n_events, base_n,
  CASE WHEN base_n >= 3
        AND (CAST(s2 AS DOUBLE) - (s1 * s1) / CAST(base_n AS DOUBLE)) / (base_n - 1) > 0
       THEN round(
         (n_events - s1 / CAST(base_n AS DOUBLE))
         / sqrt((CAST(s2 AS DOUBLE) - (s1 * s1) / CAST(base_n AS DOUBLE)) / (base_n - 1)),
         6)
       END AS z,
  CASE WHEN base_n >= 3
        AND (CAST(s2 AS DOUBLE) - (s1 * s1) / CAST(base_n AS DOUBLE)) / (base_n - 1) > 0
       THEN abs(
         (n_events - s1 / CAST(base_n AS DOUBLE))
         / sqrt((CAST(s2 AS DOUBLE) - (s1 * s1) / CAST(base_n AS DOUBLE)) / (base_n - 1))
       ) > {Z_THRESHOLD}
       WHEN base_n >= 3
        AND (CAST(s2 AS DOUBLE) - (s1 * s1) / CAST(base_n AS DOUBLE)) / (base_n - 1) <= 0
       THEN n_events <> s1 / CAST(base_n AS DOUBLE)
       ELSE FALSE END AS is_anomaly
FROM based
ORDER BY event_type, day
"""


CONV_WINDOW_NS = 24 * 3600 * 1_000_000_000  # purchase within 24h of first view


def funnel_conversion_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-bound conversion: did the user purchase within 24h of their
    FIRST view?  Complements the unbounded staged funnel (plans/funnel.py)
    with the windowed form growth analytics actually reports.

    Same one-exchange shape as the funnel: both anchors are unordered
    full-partition window aggregates over the user key (first-view time,
    then the in-window purchase flag over it), stacked on one shuffle;
    the per-user reduction is a distinct on three columns.  The cohort
    day derives from integer ns-epoch division — tz-free, so the result
    is identical under any session time zone (the --tz gate)."""
    # micros truncation mirrors the oracle's epoch_us * 1000 derivation
    # (sub-micro digits are unobservable cross-engine — cdc.py convention)
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "event_type", F.expr("(ts_ns div 1000) * 1000").alias("ts_ns")
    )
    w = Window.partitionBy("user_id")
    fv = F.min(F.when(F.col("event_type") == "view", F.col("ts_ns"))).over(w)
    flagged = ev.withColumn("fv", fv).withColumn(
        "conv",
        F.max(
            F.when(
                (F.col("event_type") == "purchase")
                & (F.col("ts_ns") > F.col("fv"))
                & (F.col("ts_ns") <= F.col("fv") + CONV_WINDOW_NS),
                1,
            ).otherwise(0)
        ).over(w),
    )
    per_user = (
        flagged.filter(F.col("fv").isNotNull())
        .select("user_id", "fv", "conv")
        .distinct()
    )
    out = per_user.groupBy(
        F.expr(
            "date_add(DATE'1970-01-01', CAST(fv div 86400000000000 AS INT))"
        ).alias("cohort_day")
    ).agg(F.count("*").alias("n_first_views"), F.sum("conv").alias("n_converted"))
    return out.select(
        "cohort_day",
        "n_first_views",
        "n_converted",
        F.round(F.col("n_converted") / F.col("n_first_views"), 6).alias(
            "conversion_rate"
        ),
    ).orderBy("cohort_day")


CONV_FUNNEL_SQL = f"""
WITH ev AS (
  SELECT user_id, event_type,
    epoch_us(CAST(ts AS TIMESTAMP)) * 1000 AS ts_ns
  FROM events
),
fl AS (
  SELECT user_id, event_type, ts_ns,
    MIN(CASE WHEN event_type = 'view' THEN ts_ns END)
      OVER (PARTITION BY user_id) AS fv
  FROM ev
),
fl2 AS (
  SELECT *, MAX(CASE WHEN event_type = 'purchase'
                      AND ts_ns > fv AND ts_ns <= fv + {CONV_WINDOW_NS}
                     THEN 1 ELSE 0 END)
      OVER (PARTITION BY user_id) AS conv
  FROM fl
),
per_user AS (
  SELECT DISTINCT user_id, fv, conv FROM fl2 WHERE fv IS NOT NULL
)
SELECT DATE '1970-01-01' + CAST(fv // 86400000000000 AS INT) AS cohort_day,
  COUNT(*) AS n_first_views,
  CAST(SUM(conv) AS BIGINT) AS n_converted,
  round(CAST(SUM(conv) AS BIGINT) / CAST(COUNT(*) AS DOUBLE), 6) AS conversion_rate
FROM per_user
GROUP BY 1 ORDER BY 1
"""


def dau_wau_stickiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily/weekly active users and the DAU/WAU stickiness ratio.

    Exact rolling-7-day distinct users WITHOUT a window over sets: each
    distinct (user, active-day) pair fans out to the 7 window-end days it
    belongs to (bounded explode, the same positional trick as
    w_moving_avg_events), and a countDistinct per window-end day gives
    WAU — two hash aggregates, no unpartitioned window, no HLL needed for
    exactness.  Output keyed to days that actually have events."""
    ev = load_table(spark, sf_dir, "events")
    ud = ev.select(
        "user_id", F.col("ts").cast("date").alias("day")
    ).distinct()
    dau = ud.groupBy("day").agg(F.countDistinct("user_id").alias("dau"))
    contrib = ud.select(
        "user_id",
        F.explode(F.expr("sequence(day, date_add(day, 6))")).alias("wday"),
    )
    wau = contrib.groupBy("wday").agg(F.countDistinct("user_id").alias("wau"))
    return (
        dau.join(wau, dau.day == wau.wday)
        .select(
            "day",
            "dau",
            "wau",
            F.round(F.col("dau").cast("double") / F.col("wau"), 6).alias(
                "stickiness"
            ),
        )
        .orderBy("day")
    )


DAU_WAU_SQL = """
WITH ud AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events),
dau AS (SELECT day, COUNT(DISTINCT user_id) AS dau FROM ud GROUP BY day),
contrib AS (
  SELECT user_id, day + i::INTEGER AS wday FROM ud, UNNEST(range(0, 7)) r(i)
),
wau AS (SELECT wday, COUNT(DISTINCT user_id) AS wau FROM contrib GROUP BY wday)
SELECT day, dau, wau, round(dau::DOUBLE / wau, 6) AS stickiness
FROM dau JOIN wau ON day = wday ORDER BY day
"""


# Recency decay: half-life of one week, exponent capped so the exact
# integer encoding below never overflows (weight 2^-20 < 1e-6 ~ zero).
DECAY_CAP_WEEKS = 20
_DECAY_DENOM = float(100 * (1 << DECAY_CAP_WEEKS))  # cents scale x 2^cap


def user_recency_weighted_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user engagement score with exponential recency decay: each
    event contributes ``value x 2^-age_weeks`` (half-life = 1 week,
    measured back from the stream's max timestamp) — the feature a churn
    model or ranking pipeline derives from raw events.

    Exact cross-engine arithmetic: floats can't sum 2^-k terms
    deterministically (order-dependent) and pow() is transcendental, so
    each term is encoded as the INTEGER ``value_cents x 2^(cap - k)``
    (k = capped age in weeks) and summed as DECIMAL(38,0) — exact and
    associative; one final IEEE division by ``100 x 2^cap`` rescales.
    Scale: one-row max-ts broadcast + one user-keyed combinable aggregate.
    """
    ev = load_table(spark, sf_dir, "events").select("user_id", "value", "ts_ns")
    bounds = ev.agg(F.max("ts_ns").alias("hi"))
    week_ns = 7 * 86400 * 1_000_000_000
    term = F.expr(
        f"cast(cast(round(value * 100) as bigint)"
        f" * shiftleft(cast(1 as bigint), {DECAY_CAP_WEEKS}"
        f"     - cast(least((hi - ts_ns) div {week_ns}, {DECAY_CAP_WEEKS}) as int))"
        f" as decimal(38,0))"
    )
    return (
        ev.crossJoin(F.broadcast(bounds))
        .select("user_id", term.alias("term"))
        .groupBy("user_id")
        .agg(F.count("*").alias("n_events"), F.sum("term").alias("wsum"))
        .select(
            "user_id",
            "n_events",
            F.round(
                F.col("wsum").cast("double") / F.lit(_DECAY_DENOM), 6
            ).alias("recency_value"),
        )
        .orderBy("user_id")
    )


RECENCY_VALUE_SQL = f"""
WITH ev AS (
  SELECT user_id, value, epoch_us(ts) * 1000 AS ts_ns FROM events
), b AS (SELECT MAX(ts_ns) AS hi FROM ev),
terms AS (
  SELECT user_id,
    CAST(CAST(round(value * 100) AS BIGINT)
      * (1::BIGINT << ({DECAY_CAP_WEEKS} - least(
          (hi - ts_ns) // {7 * 86400 * 1_000_000_000}, {DECAY_CAP_WEEKS})))
      AS DECIMAL(38,0)) AS term
  FROM ev, b
)
SELECT user_id, COUNT(*) AS n_events,
  round(CAST(SUM(term) AS DOUBLE) / {_DECAY_DENOM}, 6) AS recency_value
FROM terms GROUP BY user_id ORDER BY user_id
"""


BURST_MIN_GAPS = 20  # users with fewer inter-event gaps are not scored
BURST_TOP = 50


def user_interarrival_burstiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Machine-traffic detector: per user, the coefficient of variation
    (CV = std/mean) of inter-event time gaps.  Human activity is bursty
    (CV around or above 1); schedulers, monitors, and scripted bots are
    metronomic (CV near 0) — the top of this report is the drop list a
    behavioral-training-data curation pass applies before machine streams
    dominate the corpus.

    Scale design (100 TB): one lag window partitioned by user_id
    (key-cardinality partitions — never a single-task window), then exact
    integer moments per user: gap sums as BIGINT, squared gaps as
    DECIMAL(19,0) x DECIMAL(19,0) products summed at DECIMAL(38,0) (ns^2
    reaches 1e30 — no double accumulation anywhere).  Variance and CV are
    formed from the exact moments with a fixed expression tree (two
    divisions, one sqrt), so the output hash-compares cross-engine."""
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "ts_ns", "event_id"
    )
    w = Window.partitionBy("user_id").orderBy("ts_ns", "event_id")
    gaps = ev.withColumn("gap", F.col("ts_ns") - F.lag("ts_ns").over(w)).filter(
        F.col("gap").isNotNull()
    )
    agg = (
        gaps.groupBy("user_id")
        .agg(
            F.count("*").alias("n_gaps"),
            F.sum("gap").alias("s1"),
            F.sum(
                F.col("gap").cast("decimal(19,0)")
                * F.col("gap").cast("decimal(19,0)")
            ).alias("s2"),
        )
        .filter((F.col("n_gaps") >= BURST_MIN_GAPS) & (F.col("s1") > 0))
    )
    s1d = F.col("s1").cast("double")
    mean = s1d / F.col("n_gaps")
    var = (F.col("s2").cast("double") - s1d * F.col("s1") / F.col("n_gaps")) / F.col(
        "n_gaps"
    )
    return (
        agg.select(
            "user_id",
            "n_gaps",
            F.round(mean / 1000000, 6).alias("mean_gap_ms"),
            F.round(F.sqrt(var) / mean, 6).alias("cv"),
        )
        .orderBy("cv", "user_id")
        .limit(BURST_TOP)
    )


BURSTINESS_SQL = f"""
WITH ev AS (
  SELECT user_id, CAST(epoch_us(ts) * 1000 AS BIGINT) AS ts_ns, event_id
  FROM events
), g AS (
  SELECT user_id,
    ts_ns - LAG(ts_ns) OVER (
      PARTITION BY user_id ORDER BY ts_ns, event_id) AS gap
  FROM ev
), agg AS (
  SELECT user_id, COUNT(*) AS n_gaps,
    CAST(SUM(gap) AS BIGINT) AS s1,
    SUM(CAST(gap AS DECIMAL(19,0)) * CAST(gap AS DECIMAL(19,0))) AS s2
  FROM g WHERE gap IS NOT NULL GROUP BY user_id
  HAVING COUNT(*) >= {BURST_MIN_GAPS} AND SUM(gap) > 0
)
SELECT user_id, n_gaps,
  round(CAST(s1 AS DOUBLE) / n_gaps / 1000000, 6) AS mean_gap_ms,
  round(sqrt((CAST(s2 AS DOUBLE) - CAST(s1 AS DOUBLE) * s1 / n_gaps) / n_gaps)
        / (CAST(s1 AS DOUBLE) / n_gaps), 6) AS cv
FROM agg ORDER BY cv, user_id LIMIT {BURST_TOP}
"""


def session_event_affinity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket affinity between event types: LIFT of two types
    co-occurring in the same (user, day) activity basket — which
    behaviors travel together (view+click vs view+purchase), the signal
    behind next-action recommendations and funnel design.  Log-free PMI
    ordering, the term_collocations_lift statistic applied to behavioral
    baskets instead of documents.

    Scale design (100 TB): baskets are the DISTINCT (user, day, type)
    triples — map-side combinable; the pair join is an aliased self-join
    on the basket key whose identical subtrees share one exchange
    (ReusedExchange), and each basket contributes at most C(|types|, 2)
    pairs, a constant.  Basket total and per-type marginals enter as
    one-row / type-cardinality broadcasts."""
    ev = load_table(spark, sf_dir, "events").select(
        "user_id",
        F.expr("ts_ns div 86400000000000").alias("day"),
        "event_type",
    )
    baskets = ev.distinct()  # (user, day, type)
    n = (
        baskets.select("user_id", "day")
        .distinct()
        .agg(F.count("*").alias("n_baskets"))
    )
    marg = baskets.groupBy("event_type").agg(F.count("*").alias("n_t"))
    a, b = baskets.alias("a"), baskets.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.user_id") == F.col("b.user_id"))
            & (F.col("a.day") == F.col("b.day"))
            & (F.col("a.event_type") < F.col("b.event_type")),
        )
        .groupBy(
            F.col("a.event_type").alias("type_a"),
            F.col("b.event_type").alias("type_b"),
        )
        .agg(F.count("*").alias("n_ab"))
    )
    ma = marg.select(F.col("event_type").alias("type_a"), F.col("n_t").alias("n_a"))
    mb = marg.select(F.col("event_type").alias("type_b"), F.col("n_t").alias("n_b"))
    return (
        pairs.join(F.broadcast(ma), "type_a")
        .join(F.broadcast(mb), "type_b")
        .crossJoin(F.broadcast(n))
        .select(
            "type_a",
            "type_b",
            "n_ab",
            "n_a",
            "n_b",
            F.round(
                (F.col("n_ab") * F.col("n_baskets")).cast("double")
                / (F.col("n_a") * F.col("n_b")),
                6,
            ).alias("lift"),
        )
        .orderBy(F.desc("lift"), F.asc("type_a"), F.asc("type_b"))
    )


SESSION_AFFINITY_SQL = """
WITH ev AS (
  SELECT user_id,
    CAST(epoch_us(ts) * 1000 AS BIGINT) // 86400000000000 AS day,
    event_type
  FROM events
), baskets AS (
  SELECT DISTINCT user_id, day, event_type FROM ev
), n AS (
  SELECT COUNT(*) AS n_baskets FROM (SELECT DISTINCT user_id, day FROM baskets)
), marg AS (
  SELECT event_type, COUNT(*) AS n_t FROM baskets GROUP BY event_type
), pairs AS (
  SELECT a.event_type AS type_a, b.event_type AS type_b, COUNT(*) AS n_ab
  FROM baskets a JOIN baskets b
    ON a.user_id = b.user_id AND a.day = b.day
    AND a.event_type < b.event_type
  GROUP BY 1, 2
)
SELECT type_a, type_b, n_ab, ma.n_t AS n_a, mb.n_t AS n_b,
  round(CAST(n_ab * n_baskets AS DOUBLE) / (ma.n_t * mb.n_t), 6) AS lift
FROM pairs
JOIN marg ma ON ma.event_type = type_a
JOIN marg mb ON mb.event_type = type_b
CROSS JOIN n
ORDER BY lift DESC, type_a ASC, type_b ASC
"""


PATH_GAP_NS = 30 * 60 * 1_000_000_000  # streaming/sessions.py SESSION_GAP_MIN
PATH_TOP = 25


def session_path_trigrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top 3-step behavioral paths WITHIN sessions: the most common
    (step1 -> step2 -> step3) event-type sequences among consecutive
    events of one session — the sequence-mining view behind funnel design
    and next-action models (the transition MATRIX only sees pairs; paths
    of three distinguish view->click->purchase from view->click->view).

    Scale design (100 TB): sessionization and both leads share ONE
    ``partitionBy(user_id)`` exchange (the sessionize plan shape); paths
    never leave their user partition until the final tiny
    (types^3)-cardinality count aggregate, which is map-side combinable.
    Gap logic uses the exact integer ts_ns column — no timestamp
    arithmetic, no timezone surface."""
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "event_id", "ts_ns", "event_type"
    )
    w = Window.partitionBy("user_id").orderBy("ts_ns", "event_id")
    is_new = F.when(
        F.col("ts_ns") - F.lag("ts_ns").over(w) > PATH_GAP_NS, 1
    ).otherwise(0)
    sess = ev.withColumn(
        "session_seq",
        F.sum(is_new).over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    w2 = Window.partitionBy("user_id", "session_seq").orderBy(
        "ts_ns", "event_id"
    )
    tri = sess.select(
        F.col("event_type").alias("step1"),
        F.lead("event_type", 1).over(w2).alias("step2"),
        F.lead("event_type", 2).over(w2).alias("step3"),
    ).filter(F.col("step3").isNotNull())
    return (
        tri.groupBy("step1", "step2", "step3")
        .agg(F.count("*").alias("n_paths"))
        .orderBy(
            F.desc("n_paths"), F.asc("step1"), F.asc("step2"), F.asc("step3")
        )
        .limit(PATH_TOP)
    )


SESSION_PATH_SQL = f"""
WITH ev AS (
  SELECT user_id, event_id, CAST(epoch_us(ts) * 1000 AS BIGINT) AS ts_ns,
    event_type
  FROM events
), marked AS (
  SELECT user_id, event_id, ts_ns, event_type,
    CASE WHEN ts_ns - LAG(ts_ns) OVER (
        PARTITION BY user_id ORDER BY ts_ns, event_id) > {PATH_GAP_NS}
      THEN 1 ELSE 0 END AS is_new
  FROM ev
), sess AS (
  SELECT user_id, event_id, ts_ns, event_type,
    SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts_ns, event_id
                      ROWS UNBOUNDED PRECEDING) AS session_seq
  FROM marked
), tri AS (
  SELECT event_type AS step1,
    LEAD(event_type, 1) OVER (PARTITION BY user_id, session_seq
                              ORDER BY ts_ns, event_id) AS step2,
    LEAD(event_type, 2) OVER (PARTITION BY user_id, session_seq
                              ORDER BY ts_ns, event_id) AS step3
  FROM sess
)
SELECT step1, step2, step3, COUNT(*) AS n_paths
FROM tri WHERE step3 IS NOT NULL
GROUP BY step1, step2, step3
ORDER BY n_paths DESC, step1 ASC, step2 ASC, step3 ASC
LIMIT {PATH_TOP}
"""


def events_cusum_changepoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUSUM change-point detection on daily event volume, per type: the
    day where the cumulative deviation from the type's mean daily volume
    peaks — the classic "WHEN did the regime change" follow-up to the
    z-score anomaly query (which only says THAT a day is unusual).  A
    volume step (deploy, outage, bot onset) makes |CUSUM| a tent function
    peaking exactly at the step.

    Determinism at any scale: the textbook CUSUM accumulates
    ``count - mean`` in floats; this one accumulates the integer-SCALED
    deviation ``n_days * count - total`` (mean scaled by n_days), so every
    partial sum is an exact BIGINT — associative, engine-identical, no
    accumulation drift over any history length.  Scale design (100 TB):
    the stream collapses to O(types x days) daily rows first (map-side
    combinable); per-type stats join back as a type-cardinality
    broadcast; the running sum and the argmax are windows PARTITIONED BY
    TYPE over day-count-sized partitions — never single-partition."""
    ev = load_table(spark, sf_dir, "events").select(
        "event_type", F.expr("ts_ns div 86400000000000").alias("day")
    )
    daily = ev.groupBy("event_type", "day").agg(F.count("*").alias("n"))
    stats = daily.groupBy("event_type").agg(
        F.count("*").alias("n_days"), F.sum("n").alias("total")
    )
    w = Window.partitionBy("event_type").orderBy("day")
    dev = daily.join(F.broadcast(stats), "event_type").withColumn(
        "cusum",
        F.sum(F.col("n_days") * F.col("n") - F.col("total")).over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    pick = Window.partitionBy("event_type").orderBy(
        F.desc(F.abs(F.col("cusum"))), F.asc("day")
    )
    return (
        dev.withColumn("rn", F.row_number().over(pick))
        .filter(F.col("rn") == 1)
        .select(
            "event_type",
            F.col("day").alias("change_day"),
            F.abs(F.col("cusum")).cast("long").alias("max_abs_cusum"),
            F.signum(F.col("cusum")).cast("int").alias("direction"),
            "n_days",
        )
        .orderBy("event_type")
    )


EVENTS_CUSUM_SQL = """
WITH daily AS (
  SELECT event_type,
    CAST(epoch_us(ts) * 1000 AS BIGINT) // 86400000000000 AS day,
    COUNT(*) AS n
  FROM events GROUP BY 1, 2
), stats AS (
  SELECT event_type, COUNT(*) AS n_days, SUM(n) AS total
  FROM daily GROUP BY 1
), dev AS (
  SELECT d.event_type, d.day,
    s.n_days,
    SUM(s.n_days * d.n - s.total) OVER (
      PARTITION BY d.event_type ORDER BY d.day
      ROWS UNBOUNDED PRECEDING) AS cusum
  FROM daily d JOIN stats s USING (event_type)
), picked AS (
  SELECT event_type, day, n_days, cusum,
    ROW_NUMBER() OVER (PARTITION BY event_type
                       ORDER BY abs(cusum) DESC, day ASC) AS rn
  FROM dev
)
SELECT event_type, day AS change_day,
  CAST(abs(cusum) AS BIGINT) AS max_abs_cusum,
  CAST(CASE WHEN cusum > 0 THEN 1 WHEN cusum < 0 THEN -1 ELSE 0 END AS INTEGER)
    AS direction,
  n_days
FROM picked WHERE rn = 1 ORDER BY event_type
"""


QUERIES = {
    "retention_cohorts": retention_cohorts,
    "events_volume_anomaly": events_volume_anomaly,
    "funnel_conversion_window": funnel_conversion_window,
    "dau_wau_stickiness": dau_wau_stickiness,
    "user_recency_weighted_value": user_recency_weighted_value,
    "user_interarrival_burstiness": user_interarrival_burstiness,
    "session_event_affinity": session_event_affinity,
    "session_path_trigrams": session_path_trigrams,
    "events_cusum_changepoint": events_cusum_changepoint,
}
ORACLES = {
    "retention_cohorts": RETENTION_SQL,
    "events_volume_anomaly": ANOMALY_SQL,
    "funnel_conversion_window": CONV_FUNNEL_SQL,
    "dau_wau_stickiness": DAU_WAU_SQL,
    "user_recency_weighted_value": RECENCY_VALUE_SQL,
    "user_interarrival_burstiness": BURSTINESS_SQL,
    "session_event_affinity": SESSION_AFFINITY_SQL,
    "session_path_trigrams": SESSION_PATH_SQL,
    "events_cusum_changepoint": EVENTS_CUSUM_SQL,
}


def user_active_streaks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Longest consecutive-active-day streak per user, reported as the
    corpus-wide streak distribution — the engagement signal behind
    "X-day streak" product mechanics, and the canonical gaps-and-islands
    exercise: a user's active days split into islands where
    day − dense_rank(day) is constant.

    Scale design (100 TB): distinct (user, day) is one combinable
    aggregate; the dense-rank window partitions BY USER (bounded by a
    user's active days, never global); islands collapse with two more
    keyed aggregates; the output is a histogram over streak lengths
    (O(max streak) rows)."""
    from pyspark.sql.window import Window

    ev = load_table(spark, sf_dir, "events")
    days = ev.select("user_id", F.to_date("ts").alias("d")).distinct()
    w = Window.partitionBy("user_id").orderBy("d")
    islands = days.withColumn(
        "grp", F.date_sub(F.col("d"), F.row_number().over(w))
    )
    streaks = islands.groupBy("user_id", "grp").agg(
        F.count(F.lit(1)).cast("long").alias("len")
    )
    max_streak = streaks.groupBy("user_id").agg(
        F.max("len").alias("max_streak")
    )
    return (
        max_streak.groupBy("max_streak")
        .agg(F.count(F.lit(1)).cast("long").alias("n_users"))
        .orderBy("max_streak")
    )


USER_STREAKS_SQL = """
WITH days AS (
  SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events
),
islands AS (
  SELECT user_id, d,
    d - CAST(ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY d) AS INTEGER)
      AS grp
  FROM days
),
streaks AS (
  SELECT user_id, grp, CAST(COUNT(*) AS BIGINT) AS len
  FROM islands GROUP BY user_id, grp
),
mx AS (SELECT user_id, MAX(len) AS max_streak FROM streaks GROUP BY user_id)
SELECT max_streak, CAST(COUNT(*) AS BIGINT) AS n_users
FROM mx GROUP BY max_streak ORDER BY max_streak
"""

QUERIES["user_active_streaks"] = user_active_streaks
ORACLES["user_active_streaks"] = USER_STREAKS_SQL


def user_activity_by_tenure_day(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Activity by tenure day: for each day-index d since a user's FIRST
    event, the fraction of eligible users active on their day d — the
    cohort-free engagement-decay curve (retention_cohorts slices by
    calendar cohort; this aligns every user at their own day 0).  A user
    is eligible for day d only if the corpus horizon extends that far
    past their start, so late joiners never deflate the tail.

    Scale design (100 TB): first-event per user is one combinable
    aggregate joined back on user_id (fact→dim shape); day indices are
    row-local datediffs; eligibility denominators come from the same
    per-user frame exploded to its eligible range — bounded by the
    horizon in days — and both numerator and denominator are integer
    counts grouped by day index."""
    ev = load_table(spark, sf_dir, "events")
    first = ev.groupBy("user_id").agg(F.min(F.to_date("ts")).alias("d0"))
    horizon = ev.agg(F.max(F.to_date("ts")).alias("hmax"))
    active = (
        ev.select("user_id", F.to_date("ts").alias("d"))
        .distinct()
        .join(first, "user_id")
        .select("user_id", F.datediff(F.col("d"), F.col("d0")).alias("td"))
        .groupBy("td")
        .agg(F.count(F.lit(1)).cast("long").alias("n_active"))
    )
    eligible = (
        first.crossJoin(F.broadcast(horizon))
        .select(F.datediff(F.col("hmax"), F.col("d0")).alias("max_td"))
        .select(F.explode(F.sequence(F.lit(0), F.col("max_td"))).alias("td"))
        .groupBy("td")
        .agg(F.count(F.lit(1)).cast("long").alias("n_eligible"))
    )
    return (
        eligible.join(active, "td", "left")
        .select(
            F.col("td").cast("long").alias("tenure_day"),
            "n_eligible",
            F.coalesce("n_active", F.lit(0)).cast("long").alias("n_active"),
            F.round(
                F.coalesce("n_active", F.lit(0)).cast("double")
                / F.col("n_eligible").cast("double"),
                6,
            ).alias("active_frac"),
        )
        .orderBy("tenure_day")
    )


USER_TENURE_SQL = """
WITH first_e AS (
  SELECT user_id, MIN(CAST(ts AS DATE)) AS d0 FROM events GROUP BY user_id
),
horizon AS (SELECT MAX(CAST(ts AS DATE)) AS hmax FROM events),
active AS (
  SELECT date_diff('day', f.d0, a.d) AS td,
    CAST(COUNT(*) AS BIGINT) AS n_active
  FROM (SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events) a
  JOIN first_e f ON a.user_id = f.user_id
  GROUP BY 1
),
eligible AS (
  SELECT td, CAST(COUNT(*) AS BIGINT) AS n_eligible
  FROM first_e f CROSS JOIN horizon h,
    UNNEST(range(0, date_diff('day', f.d0, h.hmax) + 1)) AS r(td)
  GROUP BY td
)
SELECT CAST(e.td AS BIGINT) AS tenure_day, e.n_eligible,
  CAST(COALESCE(a.n_active, 0) AS BIGINT) AS n_active,
  round(CAST(COALESCE(a.n_active, 0) AS DOUBLE)
        / CAST(e.n_eligible AS DOUBLE), 6) AS active_frac
FROM eligible e LEFT JOIN active a ON e.td = a.td
ORDER BY tenure_day
"""

QUERIES["user_activity_by_tenure_day"] = user_activity_by_tenure_day
ORACLES["user_activity_by_tenure_day"] = USER_TENURE_SQL
