"""Small-file compaction on the parquet destination table."""

from __future__ import annotations

from pyspark.sql import functions as F


def _rows(spark, ids, month="2024-01"):
    return spark.createDataFrame(
        [(i, f"v{i}", f"{month}-15T00:00:00") for i in ids],
        "id long, val string, iso string",
    ).select(
        "id",
        "val",
        F.to_timestamp("iso").alias("__ts_ms"),
        F.lit(0).cast("long").alias("__source_ts_ms"),
    )


def test_compact_reduces_files_keeps_rows(spark, tmp_path):
    from debezium_server_bigquery_spark.operators.table import ParquetTable

    t = ParquetTable(spark, str(tmp_path / "t"), key_cols=["id"], mode="append")
    for batch in range(6):
        t.append(_rows(spark, range(batch * 10, batch * 10 + 10)), epoch_id=batch)

    before = t.partition_file_counts()
    assert sum(before.values()) >= 6, "micro-batches must fragment"
    rows_before = sorted(tuple(r) for r in t.read().collect())

    n = t.compact(max_files_per_partition=2)
    assert n == len(before)

    after = t.partition_file_counts()
    assert all(c == 1 for c in after.values()), after
    rows_after = sorted(tuple(r) for r in t.read().collect())
    assert rows_before == rows_after


def test_compact_noop_below_threshold(spark, tmp_path):
    from debezium_server_bigquery_spark.operators.table import ParquetTable

    t = ParquetTable(spark, str(tmp_path / "t"), key_cols=["id"], mode="append")
    t.append(_rows(spark, range(10)), epoch_id=0)
    assert t.compact(max_files_per_partition=64) == 0


def test_compact_upsert_bucket_table(spark, tmp_path):
    from debezium_server_bigquery_spark.operators.table import ParquetTable

    t = ParquetTable(
        spark, str(tmp_path / "t"), key_cols=["id"], mode="upsert", n_buckets=4
    )
    for batch in range(5):
        t.append(_rows(spark, range(20)), epoch_id=batch)
    rows_before = sorted(tuple(r) for r in t.read().collect())
    assert t.compact(max_files_per_partition=2) > 0
    assert sorted(tuple(r) for r in t.read().collect()) == rows_before
    assert all(c == 1 for c in t.partition_file_counts().values())


def test_pipeline_auto_compact_every_n_epochs(spark, tmp_path):
    """auto_compact_every: after every Nth epoch the pipeline bin-packs
    fragmented append partitions; rows and values are untouched."""
    from debezium_server_bigquery_spark.streaming.pipeline import CdcPipeline

    def batch(ids):
        return _rows(spark, ids).withColumn("destination", F.lit("t1"))

    pipe = CdcPipeline(
        spark,
        str(tmp_path / "tgt"),
        mode="append",
        auto_compact_every=2,
        auto_compact_max_files=1,
    )
    for epoch, ids in enumerate([[1, 2], [3, 4], [5, 6], [7, 8]]):
        pipe.process_batch(batch(ids), epoch_id=epoch)

    table = pipe.table_for("t1")
    counts = table.partition_file_counts()
    # 4 appends (>=4 files) were packed down at epochs 1 and 3.
    assert counts and all(n <= 2 for n in counts.values()), counts
    got = sorted(r["id"] for r in table.read().collect())
    assert got == [1, 2, 3, 4, 5, 6, 7, 8]


def test_pipeline_auto_compact_off_by_default(spark, tmp_path):
    from debezium_server_bigquery_spark.streaming.pipeline import CdcPipeline

    def batch(ids):
        return _rows(spark, ids).withColumn("destination", F.lit("t1"))

    pipe = CdcPipeline(spark, str(tmp_path / "tgt"), mode="append")
    for epoch, ids in enumerate([[1], [2], [3], [4]]):
        pipe.process_batch(batch(ids), epoch_id=epoch)
    counts = pipe.table_for("t1").partition_file_counts()
    assert counts and max(counts.values()) >= 4  # fragmentation untouched


def test_backfill_time_partitions_rewrites_only_named(spark, sf_dir, tmp_path):
    """Corrective backfill swaps exactly the named month partitions; the
    untouched partition's data files are bit-identical afterwards."""
    import os

    from pyspark.sql import functions as F

    from debezium_server_bigquery_spark.operators.table import ParquetTable
    from debezium_server_bigquery_spark.sources.cdc import synthesize_cdc_events
    from debezium_server_bigquery_spark.sources.tables import load_table

    ev = synthesize_cdc_events(load_table(spark, sf_dir, "events")).filter(
        ~F.col("destination").startswith("__debezium-heartbeat")
    )
    t = ParquetTable(
        spark, str(tmp_path / "t"), mode="append", partition_type="DAY"
    )
    t.append(ev, epoch_id="e0")
    part_col = t.partition_col()
    months = sorted(
        r[0] for r in t.read_raw().select(part_col).distinct().collect()
    )
    assert len(months) >= 2
    target, untouched = months[0], months[1]

    def files_of(month):
        d = os.path.join(str(tmp_path / "t"), f"{part_col}={month}")
        return sorted(
            (n, os.path.getmtime(os.path.join(d, n)))
            for n in os.listdir(d)
            if n.endswith(".parquet")
        )

    before = files_of(untouched)
    raw = t.read_raw()
    # expected sum computed BEFORE the swap invalidates raw's file listing
    want = (
        raw.filter(F.col(part_col) == target)
        .agg(F.sum((F.col("value") * 2).cast("decimal(18,6)")).alias("s"))
        .first()
        .s
    )
    corrected = (
        raw.filter(F.col(part_col) == target)
        .withColumn("value", F.col("value") * 2)
        .drop(part_col)
    )
    t.backfill_time_partitions(corrected, [target])
    assert files_of(untouched) == before  # never moved
    # target partition really carries the corrected values
    got = (
        t.read_raw()
        .filter(F.col(part_col) == target)
        .agg(F.sum(F.col("value").cast("decimal(18,6)")).alias("s"))
        .first()
        .s
    )
    assert got == want
    # upsert tables refuse
    tu = ParquetTable(
        spark, str(tmp_path / "u"), key_cols=["user_id"], mode="upsert"
    )
    import pytest as _pytest

    with _pytest.raises(ValueError):
        tu.backfill_time_partitions(corrected, [target])
