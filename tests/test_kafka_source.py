"""S1 production path — Kafka-wire Debezium JSON -> pipeline (SURVEY §2.1).

A real broker isn't available in CI, so the parsing stage is exercised on
DataFrames with the exact kafka-source shape (key/value binary, topic,
partition, offset, timestamp) — both static and as a Structured Streaming
stream feeding ``CdcPipeline.run_stream``, mirroring the assertions of
tests/test_pipeline.py.  ``read_cdc_kafka`` is the thin composition of the
kafka reader options with this parser.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import functions as F
from pyspark.sql import types as T

from debezium_server_bigquery_spark.operators.routing import drop_tombstones
from debezium_server_bigquery_spark.sources.cdc import parse_cdc_kafka
from debezium_server_bigquery_spark.streaming.pipeline import CdcPipeline

SCHEMA_HINT = {
    "type": "struct",
    "fields": [
        {"type": "int32", "optional": False, "field": "id"},
        {"type": "string", "optional": True, "field": "name"},
        {"type": "string", "optional": True, "field": "__op"},
        {"type": "int64", "optional": True, "field": "__ts_ms"},
        {"type": "int64", "optional": True, "field": "__source_ts_ms"},
        {"type": "int64", "optional": True, "field": "__source_ts_ns"},
        {"type": "string", "optional": True, "field": "__deleted"},
    ],
}

KAFKA_SCHEMA = T.StructType(
    [
        T.StructField("key", T.BinaryType()),
        T.StructField("value", T.BinaryType()),
        T.StructField("topic", T.StringType()),
        T.StructField("partition", T.IntegerType()),
        T.StructField("offset", T.LongType()),
        T.StructField("timestamp", T.TimestampType()),
    ]
)


def _envelope(i: int, op: str = "c") -> bytes:
    return json.dumps(
        {
            "schema": SCHEMA_HINT,
            "payload": {
                "id": i,
                "name": f"n{i}",
                "__op": op,
                "__ts_ms": 1_700_000_000_000 + i,
                "__source_ts_ms": 1_700_000_000_000 + i,
                "__source_ts_ns": (1_700_000_000_000 + i) * 1_000_000,
                "__deleted": "true" if op == "d" else "false",
            },
        }
    ).encode()


def _kafka_rows(spark, n=4, topic="testc.inventory.customers", tombstone=True):
    rows = [
        (json.dumps({"id": i}).encode(), _envelope(i), topic, 0, i, None)
        for i in range(n)
    ]
    if tombstone:
        # Kafka tombstone: null value (reference drops via
        # debezium.transforms.unwrap.drop.tombstones=true)
        rows.append((json.dumps({"id": 99}).encode(), None, topic, 0, n, None))
    return spark.createDataFrame(rows, KAFKA_SCHEMA)


def test_parse_cdc_kafka_flattens_payload_and_maps_topic(spark):
    raw = _kafka_rows(spark, n=3)
    df = parse_cdc_kafka(raw, SCHEMA_HINT)
    assert df.columns[:2] == ["destination", "id"]
    live = drop_tombstones(df)
    rows = sorted((r.id, r.name, r.destination) for r in live.collect())
    assert rows == [
        (i, f"n{i}", "testc.inventory.customers") for i in range(3)
    ]
    # tombstone survives parsing as null payload, dropped only by R5
    assert df.count() == 4 and live.count() == 3


def test_kafka_stream_feeds_pipeline_e2e(spark, tmp_path):
    # Static kafka-shaped frame -> parquet -> readStream with the same shape
    # gives a Structured Streaming source indistinguishable from the kafka
    # connector's output, without a broker.
    src_dir = str(tmp_path / "kafka_src")
    _kafka_rows(spark, n=6).write.parquet(src_dir)
    stream = spark.readStream.schema(KAFKA_SCHEMA).parquet(src_dir)
    cdc = parse_cdc_kafka(stream, SCHEMA_HINT)

    p = CdcPipeline(spark, str(tmp_path / "tgt"), mode="append")
    q = p.run_stream(cdc, str(tmp_path / "ckpt"), available_now=True)
    q.awaitTermination(120)

    dests = [d for d in os.listdir(tmp_path / "tgt") if not d.startswith(".")]
    assert dests == ["testc_inventory_customers"]
    got = p.read_table("testc_inventory_customers")
    assert got.count() == 6  # tombstone dropped by R5
    assert sorted(r.id for r in got.select("id").collect()) == list(range(6))
    # meta coercion applied en route (F7): __ts_ms is a timestamp
    assert isinstance(got.schema["__ts_ms"].dataType, T.TimestampType)


def test_read_cdc_kafka_requires_schema_hint(spark):
    import pytest

    from debezium_server_bigquery_spark.sources.cdc import read_cdc_kafka

    with pytest.raises(ValueError, match="schema_hint"):
        read_cdc_kafka(spark, "localhost:9092", "t", None)


NESTED_HINT = {
    "type": "struct",
    "fields": [
        {
            "type": "struct",
            "optional": True,
            "field": "after",
            "fields": [
                {"type": "int32", "field": "id"},
                {"type": "string", "field": "name"},
            ],
        },
        {"type": "string", "optional": True, "field": "op"},
    ],
}


def test_parse_cdc_kafka_nested_as_json(spark):
    rows = [
        (
            None,
            json.dumps(
                {
                    "schema": NESTED_HINT,
                    "payload": {"after": {"id": 7, "name": "x"}, "op": "c"},
                }
            ).encode(),
            "t1",
            0,
            0,
            None,
        )
    ]
    raw = spark.createDataFrame(rows, KAFKA_SCHEMA)
    df = parse_cdc_kafka(raw, NESTED_HINT, nested_as_json=True)
    assert isinstance(df.schema["after"].dataType, T.StringType)
    got = df.collect()[0]
    assert json.loads(got["after"]) == {"id": 7, "name": "x"}
    assert got["op"] == "c"


def test_parse_cdc_kafka_strict_unknown_fields(spark):
    import pytest

    rows = [
        (
            None,
            json.dumps(
                {
                    "schema": SCHEMA_HINT,
                    "payload": {"id": 1, "name": "a", "surprise": True},
                }
            ).encode(),
            "t1",
            0,
            0,
            None,
        )
    ]
    raw = spark.createDataFrame(rows, KAFKA_SCHEMA)
    # permissive default: parses, unknown key silently dropped
    assert parse_cdc_kafka(raw, SCHEMA_HINT).collect()[0]["id"] == 1
    # strict: materialization fails naming the offending key
    with pytest.raises(Exception, match="surprise"):
        parse_cdc_kafka(raw, SCHEMA_HINT, ignore_unknown_fields=False).collect()
