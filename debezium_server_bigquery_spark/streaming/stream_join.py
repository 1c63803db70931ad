"""Stream-stream interval join (SURVEY §2.7 beyond-reference operator).

The reference's streaming surface is transport-only (consume -> convert ->
upload, BaseChangeConsumer.java); joining two live streams is the §2.7
capability a training-data/event pipeline adds on top.  Structured
Streaming's stream-stream inner join with watermarks on BOTH sides and a
time-range predicate is the canonical form: the range bound lets the state
store evict rows older than ``watermark + window`` on each side, so state
is O(active window), not O(stream) — the property that makes the operator
run forever on a 1000-executor cluster.

``stream_view_purchase_pairs`` is the batch twin (identical semantics,
DuckDB-checkable) built on the banded range join so the wide join stays an
equi-join on ``(user_id, time-bin)``; the streaming form
``interval_join_stream`` is pinned to the twin by
``tests/test_stream_join.py``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from debezium_server_bigquery_spark.operators.rangejoin import banded_range_join
from debezium_server_bigquery_spark.sources.tables import load_table
from debezium_server_bigquery_spark.timeutil import as_instant, epoch_micros

WINDOW_SEC = 3600  # views attributed to a purchase within the prior hour


def interval_join_stream(
    views: DataFrame,
    purchases: DataFrame,
    window_sec: int = WINDOW_SEC,
    watermark: str = "2 hours",
) -> DataFrame:
    """Join two STREAMS: (purchase, view) pairs with the view in the
    ``window_sec`` before the purchase, same user.

    Both inputs must carry (event_id, user_id, ts).  Watermarks on both
    sides + the range predicate bound the join state: a view row is
    evictable once the purchase-side watermark passes ``ts + window_sec``,
    a purchase row once the view-side watermark passes its ``ts``.
    """
    v_ts_type = views.schema["ts"].dataType
    p_ts_type = purchases.schema["ts"].dataType
    v = (
        views.select(
            F.col("event_id").alias("view_id"),
            F.col("user_id").alias("v_user"),
            as_instant(F.col("ts"), v_ts_type).alias("v_ts"),
        )
        .withWatermark("v_ts", watermark)
    )
    p = (
        purchases.select(
            F.col("event_id").alias("purchase_id"),
            "user_id",
            as_instant(F.col("ts"), p_ts_type).alias("p_ts"),
        )
        .withWatermark("p_ts", watermark)
    )
    cond = (
        (F.col("user_id") == F.col("v_user"))
        & (F.col("v_ts") >= F.col("p_ts") - F.expr(f"INTERVAL {window_sec} SECOND"))
        & (F.col("v_ts") < F.col("p_ts"))
    )
    return p.join(v, cond, "inner").select(
        "purchase_id",
        "user_id",
        "view_id",
        (F.unix_micros("p_ts") - F.unix_micros("v_ts")).alias("micros_before"),
    )


def stream_view_purchase_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch twin of the streaming interval join: raw matched pairs.

    Distinct from ``range_attr_views_before_purchase`` (which aggregates
    per-purchase counts): this emits the pair stream itself, the shape the
    streaming join produces micro-batch by micro-batch.
    """
    ev = load_table(spark, sf_dir, "events")
    ts_type = ev.schema["ts"].dataType
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"), "user_id", "ts"
    )
    views = ev.filter(F.col("event_type") == "view").select(
        F.col("event_id").alias("view_id"),
        "user_id",
        F.col("ts").alias("v_ts"),
    )
    matched = banded_range_join(
        purchases, views, "user_id", "ts", "v_ts", WINDOW_SEC
    )
    return matched.select(
        "purchase_id",
        "user_id",
        "view_id",
        (
            epoch_micros(F.col("ts"), ts_type)
            - epoch_micros(F.col("v_ts"), ts_type)
        ).alias("micros_before"),
    ).orderBy("purchase_id", "view_id")


STREAM_PAIRS_SQL = """
WITH p AS (
  SELECT event_id AS purchase_id, user_id, ts
  FROM events WHERE event_type = 'purchase'
),
v AS (
  SELECT event_id AS view_id, user_id, ts AS v_ts
  FROM events WHERE event_type = 'view'
)
SELECT p.purchase_id, p.user_id, v.view_id,
  CAST(epoch_us(p.ts) - epoch_us(v.v_ts) AS BIGINT) AS micros_before
FROM p JOIN v
  ON p.user_id = v.user_id
  AND v.v_ts >= p.ts - INTERVAL 3600 SECOND
  AND v.v_ts < p.ts
ORDER BY purchase_id, view_id
"""


QUERIES = {
    "stream_view_purchase_pairs": stream_view_purchase_pairs,
}

ORACLES = {
    "stream_view_purchase_pairs": STREAM_PAIRS_SQL,
}
