"""Replication-validation checksums: cross-bucket stability and mutation
sensitivity."""

from __future__ import annotations

import shutil

from pyspark.sql import functions as F


def test_checksum_detects_single_value_mutation(spark, sf_dir, tmp_path):
    from debezium_server_bigquery_spark.plans.validation import (
        validate_orders_checksum,
    )

    baseline = {r.bucket: r.checksum for r in validate_orders_checksum(spark, sf_dir).collect()}

    # replicate the table, corrupt ONE value, re-checksum
    mutated_dir = tmp_path / "mut"
    mutated_dir.mkdir()
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    some_key = orders.select(F.min("o_orderkey")).collect()[0][0]
    corrupted = orders.withColumn(
        "o_totalprice",
        F.when(F.col("o_orderkey") == some_key, F.col("o_totalprice") + 1.0).otherwise(
            F.col("o_totalprice")
        ),
    )
    corrupted.coalesce(1).write.parquet(str(mutated_dir / "orders.parquet"))

    mutated = {
        r.bucket: r.checksum
        for r in validate_orders_checksum(spark, str(mutated_dir)).collect()
    }
    diff = [b for b in baseline if baseline[b] != mutated.get(b)]
    assert len(diff) == 1, "exactly the bucket holding the corrupted key must differ"


def test_rowcounts_cover_every_table(spark, sf_dir):
    from debezium_server_bigquery_spark.plans.validation import (
        validate_rowcounts_all_tables,
    )
    from debezium_server_bigquery_spark.sources.tables import TABLE_NAMES

    rows = validate_rowcounts_all_tables(spark, sf_dir).collect()
    assert sorted(r.table_name for r in rows) == sorted(TABLE_NAMES)
    assert all(r.n_rows > 0 for r in rows)


def test_orders_lineitem_consistency_flags_broken_totals(spark, tmp_path):
    from debezium_server_bigquery_spark.plans.validation import (
        orders_lineitem_consistency,
    )

    # order 1: 100.00 * 1.10 * 0.90 = 99.00 -> header says 99.00 (match)
    # order 2: same derivation but header off by a dollar (mismatch)
    spark.createDataFrame(
        [(1, "O", 99.00), (2, "O", 100.00), (3, "F", 50.00)],
        "o_orderkey long, o_orderstatus string, o_totalprice double",
    ).write.mode("overwrite").parquet(str(tmp_path / "orders.parquet"))
    spark.createDataFrame(
        [
            (1, 100.00, 0.10, 0.10),
            (2, 100.00, 0.10, 0.10),
            (3, 50.00, 0.0, 0.0),
        ],
        "l_orderkey long, l_extendedprice double, l_discount double, l_tax double",
    ).write.mode("overwrite").parquet(str(tmp_path / "lineitem.parquet"))
    out = {r.o_orderstatus: r for r in orders_lineitem_consistency(spark, str(tmp_path)).collect()}
    assert out["F"].n_consistent == 1 and out["F"].n_inconsistent == 0
    assert out["O"].n_consistent == 1 and out["O"].n_inconsistent == 1
    assert abs(out["O"].max_abs_diff - 1.0) < 1e-9
