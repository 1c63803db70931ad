"""F10 — decimal.handling.mode=precise (DebeziumConfig.java:30-32).

Connect Decimal wire form: base64 big-endian two's-complement unscaled bytes
(java.math.BigInteger.toByteArray) + scale/precision schema parameters.
Round-trip: encode in Python exactly as the Java side would, replay through
read_cdc_ndjson -> coercion_columns, assert exact DECIMAL recovery —
including negatives and >64-bit unscaled magnitudes, which a conv()-only
decode would corrupt.
"""

from __future__ import annotations

import base64
import json
from decimal import Decimal

from pyspark.sql import types as T

from debezium_server_bigquery_spark.coerce import coercion_columns
from debezium_server_bigquery_spark.sources.cdc import read_cdc_ndjson

CASES = [
    ("123.45", 2, 10),
    ("-0.01", 2, 10),
    ("0.00", 2, 10),
    ("-98765.4321", 4, 12),
    ("12345678901234567890.123", 3, 23),  # unscaled > 2^63
    ("-12345678901234567890.123", 3, 23),
]


def _wire_bytes(value: str, scale: int) -> str:
    unscaled = int(Decimal(value).scaleb(scale))
    n = max(1, (unscaled.bit_length() + 8) // 8)  # toByteArray: sign bit room
    return base64.b64encode(unscaled.to_bytes(n, "big", signed=True)).decode()


def _schema(scale: int, precision: int) -> dict:
    return {
        "type": "struct",
        "fields": [
            {"type": "int32", "optional": False, "field": "id"},
            {
                "type": "bytes",
                "optional": True,
                "name": "org.apache.kafka.connect.data.Decimal",
                "parameters": {
                    "scale": str(scale),
                    "connect.decimal.precision": str(precision),
                },
                "field": "amount",
            },
        ],
    }


def _replay(spark, tmp_path, value, scale, precision, mode):
    schema = _schema(scale, precision)
    event = {
        "schema": schema,
        "payload": {"id": 1, "amount": _wire_bytes(value, scale)},
    }
    path = tmp_path / f"dec_{mode}_{scale}_{value.replace('-', 'm').replace('.', '_')}.ndjson"
    path.write_text(json.dumps(event) + "\n")
    wire = read_cdc_ndjson(spark, str(path))
    return wire.select(coercion_columns(schema, decimal_handling_mode=mode))


def test_precise_mode_recovers_exact_decimals(spark, tmp_path):
    for value, scale, precision in CASES:
        out = _replay(spark, tmp_path, value, scale, precision, "precise")
        dt = out.schema["amount"].dataType
        assert isinstance(dt, T.DecimalType) and dt.scale == scale, (value, dt)
        got = out.collect()[0]["amount"]
        assert got == Decimal(value), (value, got)


def test_double_mode_lowers_to_float64(spark, tmp_path):
    out = _replay(spark, tmp_path, "123.45", 2, 10, "double")
    assert isinstance(out.schema["amount"].dataType, T.DoubleType)
    assert abs(out.collect()[0]["amount"] - 123.45) < 1e-9


def test_null_decimal_stays_null(spark, tmp_path):
    schema = _schema(2, 10)
    event = {"schema": schema, "payload": {"id": 1, "amount": None}}
    path = tmp_path / "dec_null.ndjson"
    path.write_text(json.dumps(event) + "\n")
    wire = read_cdc_ndjson(spark, str(path))
    out = wire.select(coercion_columns(schema, decimal_handling_mode="precise"))
    assert out.collect()[0]["amount"] is None
