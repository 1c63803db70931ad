"""Banded range join — the scalable form of a time-range join.

A naive range join (``l.key = r.key AND r.ts BETWEEN l.ts - W AND l.ts``)
gives Catalyst only the equi-key to hash on; within one hot key every left
row probes every right row (O(n*m) per key).  The banded form adds a time
*bin* to the join key: each side is bucketed into ``band``-second bins, the
left side duplicates into the ``ceil(W/band)+1`` bins its window can touch,
and the join becomes a pure equi-join on ``(key, bin)`` with the exact range
predicate applied post-join.  Per-key-per-bin groups bound the probe cost,
and at 100 TB the bin column doubles as a partition key so both sides
co-locate (this is the interval-bucketing pattern range-join optimizers
apply internally).

The reference has no joins at all (SURVEY §2.3) — this is a beyond-reference
operator for event-stream analytics over the replicated tables.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from debezium_server_bigquery_spark.sources.tables import load_table

WINDOW_SEC = 3600  # attribution window: views in the hour before a purchase


def banded_range_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    window_sec: int,
    band_sec: int | None = None,
    how: str = "inner",
) -> DataFrame:
    """Join right rows with ``left_ts - window_sec <= right_ts < left_ts``
    for the same ``key``.  Returns all left columns + all right columns
    (right ts column excluded from dup-checking is caller's concern).

    ``band_sec`` defaults to ``window_sec`` — one band per window, so the
    left side explodes into exactly 2 bins regardless of window size.

    ``right_ts`` must differ from ``left_ts``; the right key is renamed
    internally — both sides of a self-join share attribute lineage, and a
    condition built from the original DataFrames can silently resolve both
    key references to the same side (trivially true).
    """
    if right_ts == left_ts:
        raise ValueError("left_ts and right_ts must have distinct names")
    band = band_sec or window_sec
    n_bins = window_sec // band + 1
    rexp = right.withColumnRenamed(key, "__rkey").withColumn(
        "__rbin", F.floor(F.unix_timestamp(F.col(right_ts)) / band)
    )
    l_bin = F.floor(F.unix_timestamp(F.col(left_ts)) / band)
    lexp = left.withColumn(
        "__lbin", F.explode(F.array(*[l_bin - i for i in range(n_bins)]))
    )
    cond = (
        (F.col(key) == F.col("__rkey"))
        & (F.col("__lbin") == F.col("__rbin"))
        & (F.col(right_ts) >= F.col(left_ts) - F.expr(f"INTERVAL {window_sec} SECOND"))
        & (F.col(right_ts) < F.col(left_ts))
    )
    return lexp.join(rexp, cond, how).drop("__rkey", "__lbin", "__rbin")


def range_attr_views_before_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Purchase attribution: per purchase event, how many 'view' events the
    same user made in the preceding hour.  Inner banded join + re-attach
    keeps left-join semantics (zero-view purchases kept) while the wide
    join itself stays an equi-join on (user_id, bin).
    """
    ev = load_table(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    views = ev.filter(F.col("event_type") == "view").select(
        "user_id", F.col("ts").alias("v_ts")
    )
    matched = banded_range_join(
        purchases, views, "user_id", "ts", "v_ts", WINDOW_SEC
    )
    counts = matched.groupBy("event_id").agg(F.count("*").alias("n_views"))
    return (
        purchases.join(counts, "event_id", "left")
        .select(
            "event_id",
            "user_id",
            F.coalesce("n_views", F.lit(0)).alias("n_views"),
        )
        .orderBy("event_id")
    )


RANGE_ATTR_SQL = """
WITH p AS (
  SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'
),
v AS (
  SELECT user_id, ts AS v_ts FROM events WHERE event_type = 'view'
)
SELECT p.event_id, p.user_id, COUNT(v.v_ts) AS n_views
FROM p LEFT JOIN v
  ON p.user_id = v.user_id
  AND v.v_ts >= p.ts - INTERVAL 3600 SECOND
  AND v.v_ts < p.ts
GROUP BY p.event_id, p.user_id
ORDER BY event_id
"""


QUERIES = {
    "range_attr_views_before_purchase": range_attr_views_before_purchase,
}

ORACLES = {
    "range_attr_views_before_purchase": RANGE_ATTR_SQL,
}
