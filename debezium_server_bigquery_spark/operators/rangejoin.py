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


def attribution_model_comparison(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-touch vs last-touch vs linear attribution, side by side per
    touch type: every purchase credits the view/click touches of the
    same user in the preceding hour under all three industry models —
    the comparison sheet a marketing-analytics team uses to see how much
    each model flatters each channel.

    Scale design (100 TB): touches attach through the same banded
    equi-join as ``range_attr_views_before_purchase`` (2 bins per
    purchase, never a theta join); first/last are ONE struct-MIN/MAX
    aggregate per purchase (map-side combinable); linear weights are
    round(1/n, 12) in DECIMAL so the per-type sums are exact and
    order-independent.  Output is O(touch types)."""
    ev = load_table(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    touches = ev.filter(F.col("event_type").isin("view", "click")).select(
        "user_id",
        F.col("ts").alias("t_ts"),
        F.col("event_id").alias("t_eid"),
        F.col("event_type").alias("t_type"),
    )
    matched = banded_range_join(
        purchases, touches, "user_id", "ts", "t_ts", WINDOW_SEC
    ).select("event_id", "t_ts", "t_eid", "t_type")
    per_p = matched.groupBy("event_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_touches"),
        F.min(F.struct("t_ts", "t_eid", "t_type")).alias("first"),
        F.max(F.struct("t_ts", "t_eid", "t_type")).alias("last"),
    )
    firsts = per_p.groupBy(F.col("first.t_type").alias("t_type")).agg(
        F.count(F.lit(1)).cast("long").alias("first_touch_credits")
    )
    lasts = per_p.groupBy(F.col("last.t_type").alias("t_type")).agg(
        F.count(F.lit(1)).cast("long").alias("last_touch_credits")
    )
    linear = (
        matched.join(per_p.select("event_id", "n_touches"), "event_id")
        .select(
            "t_type",
            F.round(F.lit(1.0) / F.col("n_touches").cast("double"), 12)
            .cast("decimal(38,12)")
            .alias("w"),
        )
        .groupBy("t_type")
        .agg(F.sum("w").alias("w_sum"))
    )
    return (
        firsts.join(lasts, "t_type", "full")
        .join(linear, "t_type", "full")
        .select(
            "t_type",
            F.coalesce("first_touch_credits", F.lit(0)).alias(
                "first_touch_credits"
            ),
            F.coalesce("last_touch_credits", F.lit(0)).alias(
                "last_touch_credits"
            ),
            F.round(
                F.coalesce(
                    F.col("w_sum"), F.lit(0).cast("decimal(38,12)")
                ).cast("double"),
                6,
            ).alias("linear_credits"),
        )
        .orderBy("t_type")
    )


ATTRIBUTION_SQL = f"""
WITH p AS (
  SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'
),
t AS (
  SELECT user_id, ts AS t_ts, event_id AS t_eid, event_type AS t_type
  FROM events WHERE event_type IN ('view', 'click')
),
matched AS (
  SELECT p.event_id, t.t_ts, t.t_eid, t.t_type
  FROM p JOIN t
    ON p.user_id = t.user_id
   AND t.t_ts >= p.ts - INTERVAL {WINDOW_SEC} SECOND
   AND t.t_ts < p.ts
),
per_p AS (
  SELECT event_id,
    CAST(COUNT(*) AS BIGINT) AS n_touches,
    min(struct_pack(t_ts := t_ts, t_eid := t_eid, t_type := t_type)) AS first,
    max(struct_pack(t_ts := t_ts, t_eid := t_eid, t_type := t_type)) AS last
  FROM matched GROUP BY event_id
),
firsts AS (
  SELECT first.t_type AS t_type,
    CAST(COUNT(*) AS BIGINT) AS first_touch_credits
  FROM per_p GROUP BY first.t_type
),
lasts AS (
  SELECT last.t_type AS t_type,
    CAST(COUNT(*) AS BIGINT) AS last_touch_credits
  FROM per_p GROUP BY last.t_type
),
linear AS (
  SELECT m.t_type,
    CAST(SUM(CAST(round(1.0 / n.n_touches, 12) AS DECIMAL(38,12)))
      AS DECIMAL(38,12)) AS w_sum
  FROM matched m JOIN per_p n ON m.event_id = n.event_id
  GROUP BY m.t_type
)
SELECT COALESCE(f.t_type, l.t_type, li.t_type) AS t_type,
  COALESCE(f.first_touch_credits, 0) AS first_touch_credits,
  COALESCE(l.last_touch_credits, 0) AS last_touch_credits,
  round(CAST(COALESCE(li.w_sum, 0) AS DOUBLE), 6) AS linear_credits
FROM firsts f
FULL JOIN lasts l ON f.t_type = l.t_type
FULL JOIN linear li ON COALESCE(f.t_type, l.t_type) = li.t_type
ORDER BY t_type
"""

QUERIES["attribution_model_comparison"] = attribution_model_comparison
ORACLES["attribution_model_comparison"] = ATTRIBUTION_SQL
