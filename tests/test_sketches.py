"""Accuracy bounds for the sketch operators vs exact answers."""

from __future__ import annotations

from pyspark.sql import functions as F

from debezium_server_bigquery_spark.functions.sketches import (
    HLL_RSD,
    sketch_distinct_users,
    sketch_value_quantiles,
)
from debezium_server_bigquery_spark.sources.tables import load_table


def test_hll_within_error_bound(spark, sf_dir):
    approx = {
        (r["day"], r["event_type"]): r["approx_users"]
        for r in sketch_distinct_users(spark, sf_dir).collect()
    }
    ev = load_table(spark, sf_dir, "events")
    exact = {
        (r["day"], r["event_type"]): r["exact_users"]
        for r in ev.groupBy(
            F.date_trunc("day", F.col("ts")).cast("date").alias("day"), "event_type"
        )
        .agg(F.countDistinct("user_id").alias("exact_users"))
        .collect()
    }
    assert approx.keys() == exact.keys()
    for k, a in approx.items():
        e = exact[k]
        assert abs(a - e) <= max(5, 5 * HLL_RSD * e), (k, a, e)


def test_quantiles_within_rank_error(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    approx = {r["event_type"]: r for r in sketch_value_quantiles(spark, sf_dir).collect()}
    for etype, row in approx.items():
        vals = sorted(
            r["value"]
            for r in ev.filter(F.col("event_type") == etype).select("value").collect()
        )
        n = len(vals)
        for p, col in ((0.5, "p50"), (0.9, "p90"), (0.99, "p99")):
            # rank error bound: the approx value must sit within +/-1% of
            # the target rank
            target = int(p * (n - 1))
            lo = vals[max(0, target - max(2, n // 100))]
            hi = vals[min(n - 1, target + max(2, n // 100))]
            assert lo <= row[col] <= hi, (etype, col, row[col], lo, hi)
