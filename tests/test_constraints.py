"""The constraint suite must actually catch violations, not just report
1.0 on clean data: inject dirty rows and assert the metrics drop and the
passed flag flips."""

from __future__ import annotations

from pyspark.sql import functions as F

from debezium_server_bigquery_spark.plans.constraints import _metric_col


def _report(spark, df, specs):
    agg = df.agg(
        *[
            F.round(_metric_col(col, kind, param), 6).alias(f"m_{i}")
            for i, (col, kind, param) in enumerate(specs)
        ]
    ).collect()[0]
    return {specs[i][:2]: agg[f"m_{i}"] for i in range(len(specs))}


def test_constraints_pass_on_clean_data(spark):
    df = spark.createDataFrame(
        [(1, "a", 5.0), (2, "b", 7.5)], "id long, cat string, x double"
    )
    m = _report(
        spark,
        df,
        [
            ("id", "unique", None),
            ("cat", "not_null", None),
            ("x", "range", (0.0, 10.0)),
            ("cat", "accepted_values", ("a", "b")),
        ],
    )
    assert all(v == 1.0 for v in m.values())


def test_constraints_catch_violations(spark):
    df = spark.createDataFrame(
        [(1, "a", 5.0), (1, None, 99.0), (2, "z", -1.0), (3, "b", 2.0)],
        "id long, cat string, x double",
    )
    m = _report(
        spark,
        df,
        [
            ("id", "unique", None),          # dup id 1 -> 3/4
            ("cat", "not_null", None),       # one null -> 3/4
            ("x", "range", (0.0, 10.0)),     # 99.0 and -1.0 out -> 2/4
            ("cat", "accepted_values", ("a", "b")),  # null + 'z' fail -> 2/4
            ("x", "min_value", 0.0),         # -1.0 fails -> 3/4
        ],
    )
    assert m[("id", "unique")] == 0.75
    assert m[("cat", "not_null")] == 0.75
    assert m[("x", "range")] == 0.5
    assert m[("cat", "accepted_values")] == 0.5
    assert m[("x", "min_value")] == 0.75


def test_constraint_report_flags_failures(spark, sf_dir):
    from debezium_server_bigquery_spark.plans.constraints import validate_constraints

    rows = validate_constraints(spark, sf_dir).collect()
    assert rows
    for r in rows:
        # pass/fail comes from the EXACT violation count — a rounded
        # metric of 1.0 with one bad row in millions must still fail
        assert r.passed == (r.n_violations == 0)
        if r.metric < 1.0:
            assert r.n_violations > 0


def test_constraints_single_violation_in_large_table_fails(spark):
    # one bad row among enough rows that the ROUNDED ratio is 1.000000
    n = 3_000_000
    df = spark.range(n).selectExpr(
        "id", "CASE WHEN id = 12345 THEN NULL ELSE id END AS v"
    )
    from debezium_server_bigquery_spark.plans.constraints import (
        _metric_col,
        _violations_col,
    )

    row = df.agg(
        F.round(_metric_col("v", "not_null", None), 6).alias("m"),
        _violations_col("v", "not_null", None).alias("viol"),
    ).collect()[0]
    assert row.m == 1.0  # display metric rounds up — would mask the bad row
    assert row.viol == 1  # the exact count still fails the gate
