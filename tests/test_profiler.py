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


def test_fd_audit_detects_violations(spark, tmp_path):
    from debezium_server_bigquery_spark.plans.profiler import (
        functional_dependency_audit,
    )

    # orders: o_orderkey -> o_custkey violated for key 2 (two custkeys)
    spark.createDataFrame(
        [(1, 10), (2, 20), (2, 21), (3, 30)],
        "o_orderkey long, o_custkey long",
    ).write.mode("overwrite").parquet(str(tmp_path / "orders.parquet"))
    spark.createDataFrame(
        [(10, 7), (20, 7)], "c_custkey long, c_nationkey long"
    ).write.mode("overwrite").parquet(str(tmp_path / "customer.parquet"))
    spark.createDataFrame(
        [(0, "t", "en", "s", 1)],
        "doc_id long, text string, lang string, source string, n_chars long",
    ).write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    spark.createDataFrame(
        [(1, 1, 100, 200), (1, 2, 101, 200), (2, 1, 100, 201)],
        "l_orderkey long, l_linenumber long, l_partkey long, l_suppkey long",
    ).write.mode("overwrite").parquet(str(tmp_path / "lineitem.parquet"))
    out = {r.fd: r for r in functional_dependency_audit(spark, str(tmp_path)).collect()}
    o = out["orders: o_orderkey -> o_custkey"]
    assert not o.holds and o.n_lhs_groups == 3 and o.n_violating_groups == 1
    assert out["customer: c_custkey -> c_nationkey"].holds
    assert out["lineitem: l_orderkey,l_linenumber -> l_partkey"].holds
    # l_partkey 100 maps to suppkeys {200, 201}: violated
    lp = out["lineitem: l_partkey -> l_suppkey"]
    assert not lp.holds and lp.n_violating_groups == 1


def test_correlation_matrix_perfect_and_zero(spark, tmp_path):
    from debezium_server_bigquery_spark.plans.profiler import (
        lineitem_correlation_matrix,
    )

    # qty == extprice (r = 1); tax constant (NULL); discount alternates
    rows = [
        (float(i), float(i), 0.1 if i % 2 else 0.2, 0.05)
        for i in range(1, 9)
    ]
    spark.createDataFrame(
        rows,
        "l_quantity double, l_extendedprice double, l_discount double, "
        "l_tax double",
    ).write.mode("overwrite").parquet(str(tmp_path / "lineitem.parquet"))
    out = {r.pair: r for r in lineitem_correlation_matrix(spark, str(tmp_path)).collect()}
    assert out["l_quantity~l_extendedprice"].pearson == 1.0
    assert out["l_quantity~l_tax"].pearson is None  # zero variance
    assert out["l_discount~l_tax"].pearson is None
