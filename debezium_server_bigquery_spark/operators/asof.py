"""As-of (time-travel) join — a custom operator Spark lacks natively.

Implementation is the scalable *union trick*: tag both inputs, union them,
and propagate the right side's latest row with
``last_value(..., ignorenulls) over (partition by key order by ts, tag)``.
Cost is one shuffle on the key (the union sorts within partitions) — no
range join, no per-row probe, no data explosion; this is the standard
distributed as-of pattern (used by kdb-style tick stores and Flink temporal
joins) and holds at 100 TB because state per key is one running value.

The DuckDB oracle uses its native ``ASOF JOIN`` so the two engines agree by
construction on the semantics: match the greatest right.ts <= left.ts,
inclusive.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from debezium_server_bigquery_spark.sources.tables import load_table
from debezium_server_bigquery_spark.timeutil import epoch_micros


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    right_cols: tuple[str, ...] = (),
) -> DataFrame:
    """For each left row, attach the right row with the greatest
    ``right_ts <= left_ts`` for the same ``key`` (inclusive, last wins on
    exact ties after ordering by the right's own columns).

    Returns the left rows plus ``asof_<col>`` for each requested right col.
    """
    rcols = list(right_cols)
    r = right.select(
        F.col(key).alias("__k"),
        F.col(right_ts).alias("__t"),
        F.lit(0).alias("__tag"),
        F.struct(*[F.col(c) for c in rcols]).alias("__rv"),
    )
    lcols = left.columns
    l = left.select(
        F.col(key).alias("__k"),
        F.col(left_ts).alias("__t"),
        F.lit(1).alias("__tag"),
        F.lit(None).cast(r.schema["__rv"].dataType).alias("__rv"),
        *[F.col(c) for c in lcols],
    )
    unioned = r.select("__k", "__t", "__tag", "__rv", *[
        F.lit(None).cast(left.schema[c].dataType).alias(c) for c in lcols
    ]).unionByName(l)
    # right rows (tag 0) sort before left rows at equal ts -> inclusive match
    w = (
        Window.partitionBy("__k")
        .orderBy("__t", "__tag")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched = unioned.withColumn("__last", F.last("__rv", ignorenulls=True).over(w))
    out = matched.filter(F.col("__tag") == 1).select(
        *lcols,
        *[F.col("__last").getField(c).alias(f"asof_{c}") for c in rcols],
    )
    return out


# --------------------------------------------------------------------------
# queries() entry: purchase -> most recent preceding view of the same user.
# --------------------------------------------------------------------------
def asof_purchase_last_view(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    ts_type = ev.schema["ts"].dataType
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts", "value"
    )
    # one view per (user, ts): keep max event_id so exact-tie matches are
    # deterministic in both engines
    views = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id", "ts")
        .agg(F.max("event_id").alias("view_event_id"))
    )
    joined = asof_join(
        purchases,
        views,
        key="user_id",
        left_ts="ts",
        right_ts="ts",
        right_cols=("view_event_id", "ts"),
    )
    return joined.select(
        "event_id",
        "user_id",
        F.coalesce(F.col("asof_view_event_id"), F.lit(-1)).alias(
            "prev_view_event_id"
        ),
        (
            F.when(
                F.col("asof_ts").isNotNull(),
                epoch_micros(F.col("ts"), ts_type)
                - epoch_micros(F.col("asof_ts"), ts_type),
            ).otherwise(F.lit(-1))
        ).alias("gap_us"),
    ).orderBy("event_id")


# CAST(ts AS TIMESTAMP) truncates DuckDB's TIMESTAMP_NS to microseconds,
# matching the Spark loader's precision (sources/tables.py).
ASOF_SQL = """
WITH purchases AS (
  SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts, value
  FROM events WHERE event_type = 'purchase'
),
views AS (
  SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, MAX(event_id) AS view_event_id
  FROM events WHERE event_type = 'view' GROUP BY user_id, CAST(ts AS TIMESTAMP)
)
SELECT p.event_id, p.user_id,
  COALESCE(v.view_event_id, -1) AS prev_view_event_id,
  COALESCE(epoch_us(p.ts) - epoch_us(v.ts), -1) AS gap_us
FROM purchases p
  ASOF LEFT JOIN views v ON p.user_id = v.user_id AND p.ts >= v.ts
ORDER BY p.event_id
"""


QUERIES = {"asof_purchase_last_view": asof_purchase_last_view}
ORACLES = {"asof_purchase_last_view": ASOF_SQL}


TOLERANCE_US = 7 * 24 * 3600 * 1_000_000  # 7 days


def asof_purchase_last_view_7d(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tolerance-bounded as-of join (the pandas ``merge_asof(tolerance=)``
    semantics): each purchase matches its most recent preceding view
    ONLY if it happened within 7 days — staler context is attribution
    noise, so the match is dropped, not kept.  Because the as-of match
    is already the NEAREST preceding row, the tolerance is a row-local
    post-filter on the same single-pass union-window plan (no second
    join, no extra shuffle at any scale)."""
    ev = load_table(spark, sf_dir, "events")
    ts_type = ev.schema["ts"].dataType
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts", "value"
    )
    views = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id", "ts")
        .agg(F.max("event_id").alias("view_event_id"))
    )
    joined = asof_join(
        purchases,
        views,
        key="user_id",
        left_ts="ts",
        right_ts="ts",
        right_cols=("view_event_id", "ts"),
    )
    gap = epoch_micros(F.col("ts"), ts_type) - epoch_micros(
        F.col("asof_ts"), ts_type
    )
    in_tol = F.col("asof_ts").isNotNull() & (gap <= TOLERANCE_US)
    return joined.select(
        "event_id",
        "user_id",
        F.when(in_tol, F.col("asof_view_event_id"))
        .otherwise(F.lit(-1))
        .alias("prev_view_event_id"),
        F.when(in_tol, gap).otherwise(F.lit(-1)).alias("gap_us"),
    ).orderBy("event_id")


ASOF_7D_SQL = f"""
WITH purchases AS (
  SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts, value
  FROM events WHERE event_type = 'purchase'
),
views AS (
  SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, MAX(event_id) AS view_event_id
  FROM events WHERE event_type = 'view' GROUP BY user_id, CAST(ts AS TIMESTAMP)
)
SELECT p.event_id, p.user_id,
  CASE WHEN v.ts IS NOT NULL
        AND epoch_us(p.ts) - epoch_us(v.ts) <= {TOLERANCE_US}
    THEN v.view_event_id ELSE -1 END AS prev_view_event_id,
  CASE WHEN v.ts IS NOT NULL
        AND epoch_us(p.ts) - epoch_us(v.ts) <= {TOLERANCE_US}
    THEN epoch_us(p.ts) - epoch_us(v.ts) ELSE -1 END AS gap_us
FROM purchases p
  ASOF LEFT JOIN views v ON p.user_id = v.user_id AND p.ts >= v.ts
ORDER BY p.event_id
"""

QUERIES["asof_purchase_last_view_7d"] = asof_purchase_last_view_7d
ORACLES["asof_purchase_last_view_7d"] = ASOF_7D_SQL
