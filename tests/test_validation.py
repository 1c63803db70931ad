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
