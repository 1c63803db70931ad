"""Column profiler — hand-checked stats and uniqueness flags."""

from __future__ import annotations

from debezium_server_bigquery_spark.plans.profiler import (
    profile_columns,
    profile_table_columns,
)


def test_profile_hand_case(spark):
    df = spark.createDataFrame(
        [(1, "a", None), (2, "b", 5.0), (3, "a", 6.0)],
        "pk long, grp string, val double",
    )
    rows = {
        r.col_name: r
        for r in profile_columns(df, "t", ["pk", "grp", "val"]).collect()
    }
    assert rows["pk"].n_rows == 3 and rows["pk"].n_null == 0
    assert rows["pk"].n_distinct == 3 and rows["pk"].is_unique
    assert rows["grp"].n_distinct == 2 and not rows["grp"].is_unique
    assert rows["val"].n_null == 1 and not rows["val"].is_unique  # null blocks PK


def test_profile_flags_real_keys(spark, sf_dir):
    rows = {
        (r.tbl, r.col_name): r for r in profile_table_columns(spark, sf_dir).collect()
    }
    assert rows[("orders", "o_orderkey")].is_unique  # the actual PK
    assert rows[("customer", "c_custkey")].is_unique
    assert not rows[("orders", "o_orderstatus")].is_unique
    assert all(r.n_null == 0 for r in rows.values())  # synthetic data has no nulls
