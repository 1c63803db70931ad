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
