"""Salted join — skew mitigation for large-large equi-joins.

When one join key carries a disproportionate share of rows (power-law user
ids, null-ish defaults), hash partitioning sends the whole hot key to one
task and the stage runs at the speed of that straggler.  Salting splits
each hot key across ``n_salts`` partitions: the probe side gets a
deterministic per-row salt, the build side is replicated into every salt,
and the join key becomes ``(key, salt)``.  Results are identical to the
plain join; the cost is ``n_salts``x duplication of the build side — use
it when the build side is too big to broadcast but far smaller than the
probe side's hot keys.

AQE's skew-join handling (``spark.sql.adaptive.skewJoin``) covers sort-
merge joins automatically; this operator is the explicit form for when the
optimizer can't see the skew (e.g. the build side is itself an aggregate,
or the join must stay a shuffled hash join).

The reference has no joins (SURVEY §2.3) — beyond-reference operator.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from debezium_server_bigquery_spark.plans.analytics import _dec
from debezium_server_bigquery_spark.sources.tables import load_table

N_SALTS = 8


def salted_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    n_salts: int = N_SALTS,
    how: str = "inner",
) -> DataFrame:
    """Equi-join on ``key`` with the left (probe, skewed) side salted and
    the right (build) side replicated across all salts."""
    salt = F.pmod(F.xxhash64(*[F.col(c) for c in left.columns]), F.lit(n_salts))
    l = left.withColumn("__salt", salt)
    r = right.withColumn(
        "__salt", F.explode(F.array(*[F.lit(i) for i in range(n_salts)]))
    )
    return l.join(r, [key, "__salt"], how).drop("__salt")


def skew_join_above_user_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per event type, how many events exceed their user's average value.

    The per-user profile is an aggregate of the fact table itself — the
    exact case where AQE can't pre-detect skew (the build side doesn't
    exist until runtime) and explicit salting keeps the probe-side hot
    users spread across tasks.
    """
    ev = load_table(spark, sf_dir, "events")
    profiles = ev.groupBy("user_id").agg(
        (F.sum(_dec("value")).cast("double") / F.count("*")).alias("user_avg")
    )
    joined = salted_join(ev, profiles, "user_id", N_SALTS)
    return (
        joined.filter(F.col("value") > F.col("user_avg"))
        .groupBy("event_type")
        .agg(F.count("*").alias("n_above"))
        .orderBy("event_type")
    )


SKEW_JOIN_SQL = """
WITH prof AS (
  SELECT user_id,
    CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS user_avg
  FROM events GROUP BY user_id
)
SELECT event_type, COUNT(*) AS n_above
FROM events JOIN prof USING (user_id)
WHERE value > user_avg
GROUP BY event_type
ORDER BY event_type
"""


QUERIES = {
    "skew_join_above_user_avg": skew_join_above_user_avg,
}

ORACLES = {
    "skew_join_above_user_avg": SKEW_JOIN_SQL,
}
