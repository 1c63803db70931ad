"""As-of join unit semantics: inclusive match, no match, key isolation."""

from __future__ import annotations

import datetime as dt

from debezium_server_bigquery_spark.operators.asof import asof_join


def _t(s):
    return dt.datetime(2024, 1, 1, 0, 0, s)


def test_asof_join_semantics(spark):
    left = spark.createDataFrame(
        [(1, _t(10), "p1"), (1, _t(20), "p2"), (2, _t(5), "p3"), (3, _t(9), "p4")],
        "k long, ts timestamp, name string",
    )
    right = spark.createDataFrame(
        [(1, _t(10), 100), (1, _t(15), 101), (2, _t(7), 200)],
        "k long, ts timestamp, rid long",
    )
    out = {
        r["name"]: (r["asof_rid"], r["asof_ts"])
        for r in asof_join(left, right, key="k", right_cols=("rid", "ts")).collect()
    }
    assert out["p1"] == (100, _t(10))  # inclusive: equal ts matches
    assert out["p2"] == (101, _t(15))  # latest preceding wins
    assert out["p3"] == (None, None)  # right row is in the future
    assert out["p4"] == (None, None)  # key has no right rows


def test_asof_tolerance_drops_stale_matches(spark, tmp_path):
    import datetime

    from debezium_server_bigquery_spark.operators.asof import (
        asof_purchase_last_view_7d,
    )

    t0 = datetime.datetime(2024, 1, 20)

    def at(days_before):
        return t0 - datetime.timedelta(days=days_before)

    rows = [
        # user 1: view 1 day before purchase -> in tolerance
        (1, at(1), 1, "view", 1.0, "{}"),
        (2, t0, 1, "purchase", 1.0, "{}"),
        # user 2: view 10 days before purchase -> dropped by tolerance
        (3, at(10), 2, "view", 1.0, "{}"),
        (4, t0, 2, "purchase", 1.0, "{}"),
        # user 3: purchase with no view at all
        (5, t0, 3, "purchase", 1.0, "{}"),
    ]
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    ).write.mode("overwrite").parquet(str(tmp_path / "events.parquet"))
    out = {r.event_id: r for r in asof_purchase_last_view_7d(spark, str(tmp_path)).collect()}
    assert out[2].prev_view_event_id == 1
    assert out[2].gap_us == 24 * 3600 * 1_000_000
    assert out[4].prev_view_event_id == -1 and out[4].gap_us == -1
    assert out[5].prev_view_event_id == -1 and out[5].gap_us == -1
