"""Coercion tests — end-to-end from_json(wire schema) -> coercion columns,
checking the same semantics the reference's converter unit tests assert
(StreamRecordConverterTest.java:40-79; FIXTURES.md §B)."""

from __future__ import annotations

import base64
import datetime
import json

from pyspark.sql import functions as F

from debezium_server_bigquery_spark.coerce import coercion_columns, op_priority
from debezium_server_bigquery_spark.schema import debezium_schema_to_struct

SCHEMA = {
    "type": "struct",
    "fields": [
        {"type": "int32", "optional": False, "field": "id"},
        {"type": "int32", "name": "io.debezium.time.Date", "field": "order_date"},
        {"type": "int64", "name": "io.debezium.time.Timestamp", "field": "epoch_ts"},
        {"type": "string", "name": "io.debezium.time.ZonedTimestamp", "field": "c_tstz"},
        {"type": "string", "name": "io.debezium.time.IsoTimestamp", "field": "c_ts"},
        {"type": "string", "name": "io.debezium.time.IsoTime", "field": "c_time"},
        {"type": "string", "name": "io.debezium.data.Json", "field": "c_json"},
        {"type": "bytes", "field": "c_binary"},
        {
            "type": "struct",
            "name": "io.debezium.data.geometry.Geometry",
            "fields": [
                {"type": "int32", "field": "srid"},
                {"type": "bytes", "field": "wkb"},
            ],
            "field": "g",
        },
        {
            "type": "array",
            "items": {"type": "int32", "name": "io.debezium.time.Date"},
            "field": "c_dates",
        },
        {"type": "int64", "field": "__source_ts_ms"},
        {"type": "string", "field": "__op"},
        {"type": "string", "field": "__deleted"},
    ],
}

WKB = bytes.fromhex("d35d35d34d34")

EVENT = {
    "id": 7,
    "order_date": 16850,  # epoch days -> 2016-02-19 (fixture B1)
    "epoch_ts": 1562639337123,  # stays epoch INT64 (reference :347-349)
    "c_tstz": "2019-07-09T01:28:57.123456Z",
    "c_ts": "2019-07-09T02:28:10.123456Z",  # trailing Z stripped (F6)
    "c_time": "02:28:10Z",
    "c_json": '{"jfield": 111}',
    "c_binary": base64.b64encode(b"1234").decode(),
    "g": {"srid": 123, "wkb": base64.b64encode(WKB).decode()},
    "c_dates": [16850, 17207],
    "__source_ts_ms": 1562639337000,
    "__op": "u",
    "__deleted": "false",
}


def _convert(spark, event, schema=SCHEMA):
    wire = debezium_schema_to_struct(schema)
    df = spark.createDataFrame([(json.dumps(event),)], "value string")
    parsed = df.select(F.from_json("value", wire).alias("p")).select("p.*")
    return parsed.select(coercion_columns(schema)).collect()[0]


def test_full_coercion_row(spark):
    row = _convert(spark, EVENT)
    assert row.id == 7
    assert row.order_date == datetime.date(2016, 2, 19)  # F5
    assert row.epoch_ts == 1562639337123  # kept as epoch number
    assert row.c_tstz == datetime.datetime(2019, 7, 9, 1, 28, 57, 123456)  # UTC session
    assert row.c_ts == datetime.datetime(2019, 7, 9, 2, 28, 10, 123456)  # NTZ, Z stripped
    assert row.c_time == "02:28:10"  # F6 on TIME string
    assert row.c_json == '{"jfield": 111}'  # F4: canonical JSON text
    assert row.c_binary == b"1234"  # F1
    assert row.g.srid == 123
    assert row.g.wkb == "D35D35D34D34"  # F2: base64 -> upper hex
    assert row.c_dates == [datetime.date(2016, 2, 19), datetime.date(2017, 2, 10)]  # F9
    assert row["__source_ts_ms"] == datetime.datetime(2019, 7, 9, 2, 28, 57)  # F7 meta override
    assert row["__deleted"] is False  # F8


def test_null_propagation(spark):
    # reference type-fidelity seed includes an all-NULL row
    # (SourcePostgresqlDB.java:88-90).
    event = {"id": 1, "__op": "c", "__deleted": "false"}
    row = _convert(spark, event)
    assert row.id == 1
    assert row.order_date is None and row.g is None and row.c_dates is None


def test_op_priority_expr(spark):
    df = spark.createDataFrame([("c",), ("r",), ("u",), ("d",), ("x",)], "op string")
    vals = [r[0] for r in df.select(op_priority(F.col("op"))).collect()]
    # {c:1, r:2, u:3, d:4} — StreamBigqueryChangeConsumer.java:62
    assert vals == [1, 2, 3, 4, 0]
