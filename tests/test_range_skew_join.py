"""Banded range join and salted skew join: result parity with the naive
formulation, plus the physical properties each exists for."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from debezium_server_bigquery_spark.operators.rangejoin import banded_range_join
from debezium_server_bigquery_spark.operators.skewjoin import salted_join


def _t(m, s=0):
    return dt.datetime(2024, 1, 1, 1, m, s)


def test_banded_range_join_semantics(spark):
    left = spark.createDataFrame(
        [(1, _t(30), "a"), (1, _t(0), "b"), (2, _t(30), "c")],
        "k long, ts timestamp, tag string",
    )
    right = spark.createDataFrame(
        # for "a" (01:30): -60min boundary inclusive, < ts exclusive
        [(1, _t(29, 59), 1), (1, dt.datetime(2024, 1, 1, 0, 30), 2),
         (1, dt.datetime(2024, 1, 1, 0, 29, 59), 3), (1, _t(30), 4),
         (2, _t(29), 5)],
        "k long, rts timestamp, rid long",
    )
    out = banded_range_join(left, right, "k", "ts", "rts", window_sec=3600)
    got = {(r["tag"], r["rid"]) for r in out.collect()}
    assert got == {("a", 1), ("a", 2), ("b", 2), ("b", 3), ("c", 5)}
    # for "a" [00:30, 01:30): rid 3 is one second before the window and
    # rid 4 is exactly at left ts (exclusive); for "b" [00:00, 01:00):
    # rids 2-3 precede it; key isolation holds for "c".


def test_banded_range_join_matches_naive(spark, sf_dir):
    from debezium_server_bigquery_spark.sources.tables import load_table

    ev = load_table(spark, sf_dir, "events").limit(2000)
    p = ev.filter(F.col("event_type") == "purchase").select("event_id", "user_id", "ts")
    v = ev.filter(F.col("event_type") == "view").select(
        F.col("user_id").alias("vu"), F.col("ts").alias("v_ts")
    )
    naive = (
        p.join(
            v,
            (p.user_id == v.vu)
            & (v.v_ts >= p.ts - F.expr("INTERVAL 3600 SECOND"))
            & (v.v_ts < p.ts),
        )
        .groupBy("event_id")
        .count()
    )
    banded = (
        banded_range_join(
            p,
            v.withColumnRenamed("vu", "user_id"),
            "user_id",
            "ts",
            "v_ts",
            window_sec=3600,
        )
        .groupBy("event_id")
        .count()
    )
    assert {tuple(r) for r in naive.collect()} == {tuple(r) for r in banded.collect()}


def test_banded_join_is_equi_join(spark, sf_dir):
    # the join must hash on (key, bin) — an equi-join, never a
    # BroadcastNestedLoopJoin over the pure range predicate
    from debezium_server_bigquery_spark.sources.tables import load_table

    ev = load_table(spark, sf_dir, "events")
    p = ev.filter(F.col("event_type") == "purchase").select("event_id", "user_id", "ts")
    v = ev.filter(F.col("event_type") == "view").select(
        "user_id", F.col("ts").alias("v_ts")
    )
    plan = (
        banded_range_join(p, v, "user_id", "ts", "v_ts", 3600)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "NestedLoop" not in plan


def test_salted_join_matches_plain(spark, sf_dir):
    from debezium_server_bigquery_spark.sources.tables import load_table

    ev = load_table(spark, sf_dir, "events").select("event_id", "user_id", "value")
    prof = ev.groupBy("user_id").agg(F.avg("value").alias("user_avg"))
    plain = ev.join(prof, "user_id").select("event_id", "user_avg")
    salted = salted_join(ev, prof, "user_id", n_salts=4).select("event_id", "user_avg")
    assert sorted(map(tuple, plain.collect())) == sorted(map(tuple, salted.collect()))


def test_salted_join_partitions_by_salt(spark, sf_dir):
    from debezium_server_bigquery_spark.sources.tables import load_table

    ev = load_table(spark, sf_dir, "events").select("event_id", "user_id", "value")
    prof = ev.groupBy("user_id").agg(F.avg("value").alias("user_avg"))
    plan = (
        salted_join(ev, prof, "user_id", n_salts=4)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # the exchange must spread each key across salts
    assert "__salt" in plan


def test_attribution_three_models_disagree_correctly(spark, tmp_path):
    import datetime

    from debezium_server_bigquery_spark.operators.rangejoin import (
        attribution_model_comparison,
    )

    t0 = datetime.datetime(2024, 3, 1, 12, 0, 0)

    def mins_before(m):
        return t0 - datetime.timedelta(minutes=m)

    rows = [
        # user 1: view (30 min before), click (10 min before), purchase.
        # first touch -> view, last touch -> click, linear 0.5 each.
        (1, mins_before(30), 1, "view", 1.0, "{}"),
        (2, mins_before(10), 1, "click", 1.0, "{}"),
        (3, t0, 1, "purchase", 1.0, "{}"),
        # user 2: single view touch -> all models credit view fully.
        (4, mins_before(5), 2, "view", 1.0, "{}"),
        (5, t0, 2, "purchase", 1.0, "{}"),
        # user 3: touch outside the 1h window -> no credits anywhere.
        (6, mins_before(90), 3, "click", 1.0, "{}"),
        (7, t0, 3, "purchase", 1.0, "{}"),
    ]
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    ).write.mode("overwrite").parquet(str(tmp_path / "events.parquet"))
    out = {r.t_type: r for r in attribution_model_comparison(spark, str(tmp_path)).collect()}
    assert out["view"].first_touch_credits == 2
    assert out["view"].last_touch_credits == 1
    assert abs(out["view"].linear_credits - 1.5) < 1e-9
    assert out["click"].first_touch_credits == 0
    assert out["click"].last_touch_credits == 1
    assert abs(out["click"].linear_credits - 0.5) < 1e-9
