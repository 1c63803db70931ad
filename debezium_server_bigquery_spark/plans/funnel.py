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


QUERIES = {"funnel_view_click_purchase": funnel_view_click_purchase}

ORACLES = {"funnel_view_click_purchase": FUNNEL_SQL}
