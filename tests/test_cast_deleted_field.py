"""cast-deleted-field parity (BatchConsumerConfig.java:69-71).

The reference's ``debezium.sink.<type>.cast-deleted-field`` (default true)
controls whether the ``__deleted`` meta column's "true"/"false" string is
cast to BOOL (BaseRecordConverter.java:362-364).  With the toggle off the
column ships as its wire STRING — a user porting such a config must get the
same column type here.
"""

from __future__ import annotations

import json

from pyspark.sql import functions as F
from pyspark.sql import types as T

from debezium_server_bigquery_spark.cli import build_pipeline
from debezium_server_bigquery_spark.coerce import coercion_columns
from debezium_server_bigquery_spark.schema import debezium_schema_to_struct

SCHEMA = {
    "type": "struct",
    "fields": [
        {"type": "int32", "optional": False, "field": "id"},
        {"type": "string", "field": "__op"},
        {"type": "string", "field": "__deleted"},
    ],
}

EVENTS = [
    {"id": 1, "__op": "u", "__deleted": "false"},
    {"id": 2, "__op": "d", "__deleted": "true"},
]


def _convert(spark, cast_deleted_field):
    wire = debezium_schema_to_struct(SCHEMA)
    df = spark.createDataFrame([(json.dumps(e),) for e in EVENTS], "value string")
    parsed = df.select(F.from_json("value", wire).alias("p")).select("p.*")
    return parsed.select(
        coercion_columns(SCHEMA, cast_deleted_field=cast_deleted_field)
    )


def test_default_casts_to_bool(spark):
    out = _convert(spark, True)
    assert isinstance(out.schema["__deleted"].dataType, T.BooleanType)
    vals = {r["id"]: r["__deleted"] for r in out.collect()}
    assert vals == {1: False, 2: True}


def test_disabled_keeps_wire_string(spark):
    out = _convert(spark, False)
    assert isinstance(out.schema["__deleted"].dataType, T.StringType)
    vals = {r["id"]: r["__deleted"] for r in out.collect()}
    assert vals == {1: "false", 2: "true"}


def _meta_rows(spark):
    return spark.createDataFrame(
        [(1, "u", "false", 1000), (2, "d", "true", 2000)],
        "id long, __op string, __deleted string, __ts_ms long",
    )


def test_pipeline_meta_coercion_respects_toggle(spark, tmp_path):
    on = build_pipeline(
        spark,
        {
            "debezium.sink.type": "bigquerybatch",
            "engine.target-root": str(tmp_path / "on"),
        },
    )
    assert on.cast_deleted_field is True
    got = on._coerce_meta(_meta_rows(spark))
    assert isinstance(got.schema["__deleted"].dataType, T.BooleanType)
    # ts coercion is independent of the toggle
    assert isinstance(got.schema["__ts_ms"].dataType, T.TimestampType)

    off = build_pipeline(
        spark,
        {
            "debezium.sink.type": "bigquerybatch",
            "debezium.sink.bigquerybatch.cast-deleted-field": "false",
            "engine.target-root": str(tmp_path / "off"),
        },
    )
    assert off.cast_deleted_field is False
    got = off._coerce_meta(_meta_rows(spark))
    assert isinstance(got.schema["__deleted"].dataType, T.StringType)
    assert isinstance(got.schema["__ts_ms"].dataType, T.TimestampType)


def test_cli_stream_sink_key(spark, tmp_path):
    p = build_pipeline(
        spark,
        {
            "debezium.sink.type": "bigquerystream",
            "debezium.sink.bigquerystream.cast-deleted-field": "false",
            "engine.target-root": str(tmp_path / "s"),
        },
    )
    assert p.cast_deleted_field is False
