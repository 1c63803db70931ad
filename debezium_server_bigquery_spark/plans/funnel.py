"""Sequential funnel analysis over the events stream: view -> click ->
purchase, each stage anchored strictly at-or-after the user's first
occurrence of the previous stage.

Plan shape: the events scan is filtered to the three stage types
(predicate pushdown), each stage is one map-side-combinable min-aggregate
on user_id, and the stage joins are tiny (one row per user) on the same
user_id key — AQE turns them into broadcast joins once the first stage
has collapsed the cardinality.  The final result is a single summary row.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from debezium_server_bigquery_spark.sources.tables import load_table

FUNNEL_STAGES = ("view", "click", "purchase")


def funnel_view_click_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select("user_id", "event_type", "ts")
    ev = ev.filter(F.col("event_type").isin(*FUNNEL_STAGES))

    first_view = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_view"))
    )
    first_click = (
        ev.filter(F.col("event_type") == "click")
        .join(first_view, "user_id")
        .filter(F.col("ts") >= F.col("t_view"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_click"))
    )
    first_purchase = (
        ev.filter(F.col("event_type") == "purchase")
        .join(first_click, "user_id")
        .filter(F.col("ts") >= F.col("t_click"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_purchase"))
    )
    return (
        first_view.agg(F.count("*").alias("n_view"))
        .crossJoin(first_click.agg(F.count("*").alias("n_click_after_view")))
        .crossJoin(
            first_purchase.agg(F.count("*").alias("n_purchase_after_click"))
        )
        .select(
            "n_view",
            "n_click_after_view",
            "n_purchase_after_click",
            F.round(
                F.col("n_purchase_after_click")
                / F.greatest(F.col("n_view"), F.lit(1)),
                6,
            ).alias("conversion"),
        )
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
