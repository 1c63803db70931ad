"""S8 schema-history store + R4 in-batch schema grouping.

Mirrors the reference's state-store tests (BigquerySchemaHistoryTest.java:
103-132 record/recover across restart) and the schema-group behavior
(BaseChangeConsumer.java:189-205)."""

from __future__ import annotations

import json

from pyspark.sql import functions as F

from debezium_server_bigquery_spark.streaming.pipeline import CdcPipeline
from debezium_server_bigquery_spark.streaming.schema_history import (
    SCHEMA_FP_COL,
    SchemaHistory,
    schema_groups,
    with_schema_fingerprint,
)


def test_schema_history_store_and_ordered_recover(spark, tmp_path):
    h = SchemaHistory(spark, str(tmp_path / "history"))
    assert not h.exists()
    assert h.recover_records() == []
    assert not h.storage_exists_probe()

    ddl1 = json.dumps({"op": "CREATE", "cols": ["id"]})
    ddl2 = json.dumps({"op": "ALTER", "cols": ["id", "name"]})
    h.store_record("testc.inventory.t1", ddl1)
    h.store_record("testc.inventory.t1", ddl2)

    # a new instance over the same path replays in insert order (restart)
    h2 = SchemaHistory(spark, str(tmp_path / "history"))
    recovered = h2.recover_records()
    assert [d for _, d in recovered] == [ddl1, ddl2]
    assert all(dest == "testc.inventory.t1" for dest, _ in recovered)
    assert h2.storage_exists_probe()


def test_schema_fingerprint_and_groups(spark):
    lines = [
        json.dumps({"schema": {"fields": ["id"]}, "payload": {"id": 1}}),
        json.dumps({"schema": {"fields": ["id"]}, "payload": {"id": 2}}),
        json.dumps({"schema": {"fields": ["id", "name"]}, "payload": {"id": 3}}),
    ]
    raw = spark.createDataFrame([(l,) for l in lines], "value string")
    fp = with_schema_fingerprint(raw)
    assert SCHEMA_FP_COL in fp.columns
    n_groups = fp.select(SCHEMA_FP_COL).distinct().count()
    assert n_groups == 2

    parsed = fp.select(
        F.get_json_object("value", "$.payload.id").cast("long").alias("id"),
        F.col(SCHEMA_FP_COL),
    )
    groups = schema_groups(parsed)
    assert len(groups) == 2
    sizes = sorted(g.count() for _, g in groups)
    assert sizes == [1, 2]
    # fingerprint column removed from each group's frame
    assert all(SCHEMA_FP_COL not in g.columns for _, g in groups)


def test_schema_groups_passthrough_without_fp(spark):
    df = spark.range(5)
    groups = schema_groups(df)
    assert len(groups) == 1
    assert groups[0][1].count() == 5


def test_pipeline_splits_mixed_schema_batch(spark, tmp_path):
    rows = [
        ("testc.t", 1, "a", 1000 + i, "fp_v1") for i in range(3)
    ] + [
        ("testc.t", 2, "b", 2000, "fp_v2")
    ]
    batch = spark.createDataFrame(
        rows,
        f"destination string, id long, name string, __source_ts_ns long, {SCHEMA_FP_COL} string",
    ).withColumn("__op", F.lit("c"))
    p = CdcPipeline(spark, str(tmp_path / "tgt"), mode="append")
    p.run_batch(batch)
    got = p.read_table("testc_t")
    assert got.count() == 4
    assert SCHEMA_FP_COL not in got.columns
