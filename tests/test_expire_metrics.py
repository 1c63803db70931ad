"""Partition expiration + observed row counts in epoch markers."""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from debezium_server_bigquery_spark.operators.table import ParquetTable


def _rows(spark, ids, month):
    return spark.createDataFrame(
        [(i, f"v{i}") for i in ids], "id long, val string"
    ).select(
        "id",
        "val",
        F.to_timestamp(F.lit(f"{month}-15T00:00:00")).alias("__ts_ms"),
        F.lit(0).cast("long").alias("__source_ts_ms"),
    )


def test_expire_partitions_drops_old_months(spark, tmp_path):
    t = ParquetTable(spark, str(tmp_path / "t"), mode="append")
    for m in ("2023-11", "2023-12", "2024-01", "2024-02"):
        t.append(_rows(spark, range(10), m), epoch_id=m)
    assert t.read().count() == 40

    expired = t.expire_partitions("2024-01")
    assert expired == ["2023-11", "2023-12"]
    got = t.read()
    assert got.count() == 20
    months = {
        r[0]
        for r in got.select(F.date_format("__ts_ms", "yyyy-MM")).distinct().collect()
    }
    assert months == {"2024-01", "2024-02"}
    # idempotent
    assert t.expire_partitions("2024-01") == []


def test_expire_refuses_upsert_tables(spark, tmp_path):
    t = ParquetTable(
        spark, str(tmp_path / "t"), key_cols=["id"], mode="upsert", n_buckets=4
    )
    t.append(_rows(spark, range(5), "2024-01"), epoch_id=0)
    with pytest.raises(ValueError, match="time-partitioned"):
        t.expire_partitions("2024-01")


def test_epoch_marker_records_observed_row_count(spark, tmp_path):
    t = ParquetTable(spark, str(tmp_path / "t"), mode="append")
    t.append(_rows(spark, range(17), "2024-01"), epoch_id=7)
    marker = os.path.join(str(tmp_path / "t"), "_epochs", "7.json")
    with open(marker, encoding="utf-8") as fh:
        meta = json.load(fh)
    assert meta == {"epoch": 7, "rows": 17}


def test_pipeline_metrics_surface(spark, tmp_path):
    """CdcPipeline.metrics(): per-(table, epoch) processed-row counts read
    off the epoch markers — exact for appends, -1 sentinel for MERGEs."""
    from pyspark.sql import functions as F

    from debezium_server_bigquery_spark.streaming.pipeline import CdcPipeline

    def batch(ids, dest="t1"):
        return _rows(spark, ids, "2024-01").withColumn(
            "destination", F.lit(dest)
        )

    pipe = CdcPipeline(spark, str(tmp_path / "tgt"), mode="append")
    pipe.process_batch(batch([1, 2, 3]), epoch_id=0)
    pipe.process_batch(batch([4, 5]), epoch_id=1)
    rows = {r["epoch"]: r["rows"] for r in pipe.metrics().collect()}
    assert rows == {"0.0": 3, "1.0": 2}  # epoch.group markers, exact counts
    assert sum(rows.values()) == pipe.read_table("t1").count()
