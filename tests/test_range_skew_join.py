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
