"""load_table must work under ANY SparkSession, not just get_spark's.

Regression for the round-1 driver failure: events.parquet is
TIMESTAMP(NANOS); a session built without session.py's defaults rejected it
with PARQUET_TYPE_ILLEGAL (reference of the failure: CORRECTNESS_r01.json,
19 erred queries, all on this read).
"""

from __future__ import annotations

import pytest
from pyspark.sql import types as T

from debezium_server_bigquery_spark.sources.tables import (
    _read_with_long_schema,
    load_table,
)


def test_load_events_without_session_conf(spark, sf_dir):
    # Simulate the external harness: the nanos conf is NOT preset.
    spark.conf.unset("spark.sql.legacy.parquet.nanosAsLong")
    df = load_table(spark, sf_dir, "events")
    assert isinstance(df.schema["ts"].dataType, T.TimestampType)
    assert isinstance(df.schema["ts_ns"].dataType, T.LongType)
    assert df.count() > 0


def test_fallback_schema_reader(spark, sf_dir):
    df = _read_with_long_schema(spark, f"{sf_dir}/events.parquet")
    assert isinstance(df.schema["ts"].dataType, T.LongType)
    row = df.limit(1).collect()[0]
    assert row["ts"] > 10**18  # nanos-since-epoch magnitude preserved


def test_ts_ns_precision_preserved(spark, sf_dir):
    # ts (micros timestamp) must equal ts_ns integer-divided by 1000.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = load_table(spark, sf_dir, "events")
    from pyspark.sql import functions as F

    bad = df.filter(
        F.unix_micros(F.col("ts")) != F.expr("ts_ns div 1000")
    ).count()
    assert bad == 0
