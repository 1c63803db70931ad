"""Sequential funnel analysis over the events stream: view -> click ->
purchase, each stage anchored strictly at-or-after the user's first
occurrence of the previous stage.

Plan shape: ONE shuffle.  All three stage anchors are unordered
full-partition window minimums over the same ``user_id`` partitioning, so
Catalyst stacks them on a single exchange (each stage's condition depends
on the previous stage's anchor, which is constant within the user
partition); the per-user reduction then reuses that partitioning and only
the final one-row summary exchanges again.  A join-chain formulation
(stage N aggregate joined back to the events scan) costs 3 scans and ~13
exchanges with AQE materialization barriers between every pair — measured
6x slower at sf0.1.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from debezium_server_bigquery_spark.sources.tables import load_table

FUNNEL_STAGES = ("view", "click", "purchase")


def funnel_view_click_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select("user_id", "event_type", "ts")
    ev = ev.filter(F.col("event_type").isin(*FUNNEL_STAGES))

    w = Window.partitionBy("user_id")
    t_view = F.min(F.when(F.col("event_type") == "view", F.col("ts"))).over(w)
    staged = ev.withColumn("t_view", t_view)
    t_click = F.min(
        F.when(
            (F.col("event_type") == "click") & (F.col("ts") >= F.col("t_view")),
            F.col("ts"),
        )
    ).over(w)
    staged = staged.withColumn("t_click", t_click)
    t_purchase = F.min(
        F.when(
            (F.col("event_type") == "purchase")
            & (F.col("ts") >= F.col("t_click")),
            F.col("ts"),
        )
    ).over(w)
    staged = staged.withColumn("t_purchase", t_purchase)

    per_user = staged.groupBy("user_id").agg(
        F.max("t_view").alias("t_view"),
        F.max("t_click").alias("t_click"),
        F.max("t_purchase").alias("t_purchase"),
    )
    return per_user.agg(
        F.count("t_view").alias("n_view"),
        F.count("t_click").alias("n_click_after_view"),
        F.count("t_purchase").alias("n_purchase_after_click"),
    ).select(
        "n_view",
        "n_click_after_view",
        "n_purchase_after_click",
        F.round(
            F.col("n_purchase_after_click") / F.greatest(F.col("n_view"), F.lit(1)),
            6,
        ).alias("conversion"),
    )


FUNNEL_SQL = """
WITH first_view AS (
  SELECT user_id, MIN(ts) AS t_view FROM events WHERE event_type = 'view' GROUP BY user_id
),
first_click AS (
  SELECT e.user_id, MIN(e.ts) AS t_click
  FROM events e JOIN first_view v ON e.user_id = v.user_id
  WHERE e.event_type = 'click' AND e.ts >= v.t_view
  GROUP BY e.user_id
),
first_purchase AS (
  SELECT e.user_id, MIN(e.ts) AS t_purchase
  FROM events e JOIN first_click c ON e.user_id = c.user_id
  WHERE e.event_type = 'purchase' AND e.ts >= c.t_click
  GROUP BY e.user_id
)
SELECT
  (SELECT COUNT(*) FROM first_view) AS n_view,
  (SELECT COUNT(*) FROM first_click) AS n_click_after_view,
  (SELECT COUNT(*) FROM first_purchase) AS n_purchase_after_click,
  round((SELECT COUNT(*) FROM first_purchase)::DOUBLE
        / greatest((SELECT COUNT(*) FROM first_view), 1), 6) AS conversion
"""


# --------------------------------------------------------------------------
# funnel_survival_km — Kaplan–Meier time-to-convert with censoring.
# --------------------------------------------------------------------------


def funnel_survival_km(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kaplan–Meier survival curve of time-to-purchase per signup
    cohort — the censoring-aware form of the funnel latency question:
    users who viewed but never purchased are NOT dropped (that biases
    conversion-time downward), they are right-censored at the corpus
    horizon and still count in the at-risk denominator until then.

    S(t) = Π_{t_i ≤ t} (1 − d_i/n_i) over event days t_i, where d_i is
    conversions at day i and n_i the cohort members still at risk.

    Scale design (100 TB): per-user first-view/first-purchase are two
    map-side-combinable aggregates; the KM table groups to (cohort,
    duration-day) — O(cohorts × horizon-days), metadata-sized — and the
    running product runs in a COHORT-partitioned window (never global)
    as exp(Σ ln(1 − d/n)) over an ordered frame, the associativity-safe
    form of a cumulative product.  Cross-engine floats: ln/exp may
    differ in the last ulp, ~9 orders below the 6-dp rounding (the Zipf/
    Heaps log-wobble argument); everything before them is exact integer
    arithmetic.  A day that converts every remaining member empties the
    risk set; that zero is carried as an explicit flag (ln(0) is NULL on
    Spark, an error on DuckDB) so survival is exactly 0.0 from that step
    on, on both engines."""
    ev = load_table(spark, sf_dir, "events").select("user_id", "event_type", "ts")
    t0 = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t0"))
    )
    tp = (
        ev.filter(F.col("event_type") == "purchase")
        .join(t0, "user_id")
        .filter(F.col("ts") >= F.col("t0"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("te"))
    )
    horizon = ev.agg(F.max(F.to_date("ts")).alias("maxd"))
    per_user = (
        t0.join(tp, "user_id", "left")
        .crossJoin(F.broadcast(horizon))
        .select(
            F.date_format("t0", "yyyy-MM").alias("cohort"),
            F.when(
                F.col("te").isNotNull(),
                F.datediff(F.to_date("te"), F.to_date("t0")),
            )
            .otherwise(F.datediff(F.col("maxd"), F.to_date("t0")))
            .cast("long")
            .alias("dur"),
            F.col("te").isNotNull().cast("long").alias("event"),
        )
    )
    g = per_user.groupBy("cohort", "dur").agg(
        F.sum("event").cast("long").alias("d"),
        F.sum(F.lit(1) - F.col("event")).cast("long").alias("c"),
    )
    totals = g.groupBy("cohort").agg(
        F.sum(F.col("d") + F.col("c")).cast("long").alias("n_cohort")
    )
    w = Window.partitionBy("cohort").orderBy("dur")
    prev = w.rowsBetween(Window.unboundedPreceding, -1)
    cur = w.rowsBetween(Window.unboundedPreceding, 0)
    km = (
        g.join(F.broadcast(totals), "cohort")
        .withColumn(
            "at_risk",
            F.col("n_cohort")
            - F.coalesce(F.sum(F.col("d") + F.col("c")).over(prev), F.lit(0)),
        )
        .withColumn(
            "lnterm",
            F.when(
                (F.col("d") > 0) & (F.col("at_risk") > F.col("d")),
                F.log(
                    (F.col("at_risk") - F.col("d")).cast("double")
                    / F.col("at_risk").cast("double")
                ),
            ).otherwise(F.lit(0.0)),
        )
        .withColumn(
            # a step where d == at_risk empties the risk set: survival is
            # EXACTLY 0 from that step on (ln(0) is NULL on Spark and an
            # error on DuckDB, so the zero is carried as a flag instead)
            "hit_zero",
            F.max(
                ((F.col("d") > 0) & (F.col("d") == F.col("at_risk"))).cast(
                    "int"
                )
            ).over(cur),
        )
        .withColumn(
            "survival",
            F.when(F.col("hit_zero") == 1, F.lit(0.0)).otherwise(
                F.round(F.exp(F.sum("lnterm").over(cur)), 6) + F.lit(0.0)
            ),
        )
    )
    return (
        km.filter(F.col("d") > 0)
        .select(
            "cohort",
            F.col("dur").alias("t_days"),
            F.col("at_risk").alias("n_at_risk"),
            F.col("d").alias("n_events"),
            "survival",
        )
        .orderBy("cohort", "t_days")
    )


FUNNEL_KM_SQL = """
WITH t0 AS (
  SELECT user_id, MIN(ts) AS t0 FROM events
  WHERE event_type = 'view' GROUP BY user_id
),
tp AS (
  SELECT e.user_id, MIN(e.ts) AS te
  FROM events e JOIN t0 ON e.user_id = t0.user_id
  WHERE e.event_type = 'purchase' AND e.ts >= t0.t0
  GROUP BY e.user_id
),
horizon AS (SELECT MAX(CAST(ts AS DATE)) AS maxd FROM events),
per_user AS (
  SELECT strftime(t0.t0, '%Y-%m') AS cohort,
    CAST(CASE WHEN tp.te IS NOT NULL
      THEN date_diff('day', CAST(t0.t0 AS DATE), CAST(tp.te AS DATE))
      ELSE date_diff('day', CAST(t0.t0 AS DATE), h.maxd) END AS BIGINT) AS dur,
    CAST(CASE WHEN tp.te IS NOT NULL THEN 1 ELSE 0 END AS BIGINT) AS event
  FROM t0 LEFT JOIN tp ON t0.user_id = tp.user_id CROSS JOIN horizon h
),
g AS (
  SELECT cohort, dur,
    CAST(SUM(event) AS BIGINT) AS d,
    CAST(SUM(1 - event) AS BIGINT) AS c
  FROM per_user GROUP BY cohort, dur
),
totals AS (
  SELECT cohort, CAST(SUM(d + c) AS BIGINT) AS n_cohort FROM g GROUP BY cohort
),
risk AS (
  SELECT g.cohort, g.dur, g.d,
    t.n_cohort - COALESCE(SUM(g.d + g.c) OVER (
      PARTITION BY g.cohort ORDER BY g.dur
      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS at_risk
  FROM g JOIN totals t ON g.cohort = t.cohort
),
terms AS (
  SELECT cohort, dur, d, at_risk,
    CASE WHEN d > 0 AND at_risk > d
      THEN ln(CAST(at_risk - d AS DOUBLE) / CAST(at_risk AS DOUBLE))
      ELSE 0.0 END AS lnterm,
    CASE WHEN d > 0 AND d = at_risk THEN 1 ELSE 0 END AS zero_step
  FROM risk
),
km AS (
  SELECT cohort, dur, d, at_risk,
    SUM(lnterm) OVER (PARTITION BY cohort ORDER BY dur
      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS lnsum,
    MAX(zero_step) OVER (PARTITION BY cohort ORDER BY dur
      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS hit_zero
  FROM terms
)
SELECT cohort, CAST(dur AS BIGINT) AS t_days,
  CAST(at_risk AS BIGINT) AS n_at_risk,
  d AS n_events,
  CASE WHEN hit_zero = 1 THEN 0.0
       ELSE round(exp(lnsum), 6) + 0.0 END AS survival
FROM km WHERE d > 0
ORDER BY cohort, t_days
"""


QUERIES = {
    "funnel_view_click_purchase": funnel_view_click_purchase,
    "funnel_survival_km": funnel_survival_km,
}

ORACLES = {
    "funnel_view_click_purchase": FUNNEL_SQL,
    "funnel_survival_km": FUNNEL_KM_SQL,
}
