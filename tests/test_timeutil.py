"""Epoch math must not depend on spark.sql.session.timeZone.

Regression: ``to_utc_timestamp(ntz, 'UTC')`` looks right on a UTC
machine but hides an analyzer-inserted session-tz cast — under any other
session zone every CDC epoch column shifted by the UTC offset and the
driver's hash compare failed.  timeutil uses pure NTZ timestamp_diff
arithmetic, which this test pins under a non-UTC session zone.
"""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from debezium_server_bigquery_spark.sources.cdc import synthesize_cdc_events
from debezium_server_bigquery_spark.sources.tables import load_table
from debezium_server_bigquery_spark.timeutil import as_instant, epoch_micros, epoch_millis


@pytest.fixture()
def ny_tz(spark):
    old = spark.conf.get("spark.sql.session.timeZone")
    spark.conf.set("spark.sql.session.timeZone", "America/New_York")
    yield
    spark.conf.set("spark.sql.session.timeZone", old)


def test_epoch_micros_matches_duckdb_under_nonutc_tz(spark, sf_dir, ny_tz):
    df = load_table(spark, sf_dir, "events")
    got = {
        r["event_id"]: (r["us"], r["ms"])
        for r in df.select(
            "event_id",
            epoch_micros(F.col("ts"), df.schema["ts"].dataType).alias("us"),
            epoch_millis(F.col("ts"), df.schema["ts"].dataType).alias("ms"),
        )
        .limit(200)
        .collect()
    }
    con = duckdb.connect()
    want = {
        k: (us, ms)
        for k, us, ms in con.execute(
            f"SELECT event_id, epoch_us(ts), epoch_ms(ts) FROM "
            f"'{sf_dir}/events.parquet' WHERE event_id IN "
            f"({','.join(str(k) for k in got)})"
        ).fetchall()
    }
    assert got == want


def test_cdc_synth_ts_columns_under_nonutc_tz(spark, sf_dir, ny_tz):
    cdc = synthesize_cdc_events(load_table(spark, sf_dir, "events"))
    got = {
        r["event_id"]: (r["__ts_ms"], r["__source_ts_ns"])
        for r in cdc.select("event_id", "__ts_ms", "__source_ts_ns").limit(100).collect()
    }
    con = duckdb.connect()
    want = {
        k: (ms, ns)
        for k, ms, ns in con.execute(
            f"SELECT event_id, epoch_ms(ts), epoch_us(ts) * 1000 FROM "
            f"'{sf_dir}/events.parquet' WHERE event_id IN "
            f"({','.join(str(k) for k in got)})"
        ).fetchall()
    }
    assert got == want


def test_as_instant_is_session_tz_invariant(spark, sf_dir):
    df = load_table(spark, sf_dir, "events")
    expr = F.unix_micros(
        as_instant(F.col("ts"), df.schema["ts"].dataType)
    ).alias("us")
    utc = [r["us"] for r in df.select(expr).limit(50).collect()]
    old = spark.conf.get("spark.sql.session.timeZone")
    spark.conf.set("spark.sql.session.timeZone", "Asia/Tokyo")
    try:
        tokyo = [r["us"] for r in df.select(expr).limit(50).collect()]
    finally:
        spark.conf.set("spark.sql.session.timeZone", old)
    assert utc == tokyo


def test_epoch_millis_truncation_matches_duckdb_pre_1970(spark):
    """Both timestamp_diff(MILLISECOND, ...) and DuckDB's epoch_ms truncate
    toward zero on pre-1970 sub-millisecond instants (-500us -> 0); the NTZ
    epoch_millis must reproduce DuckDB exactly, not floor."""
    import duckdb

    vals = [
        "1969-12-31 23:59:59.9995",
        "1969-12-31 23:59:59.0005",
        "1970-01-01 00:00:00.0005",
    ]
    df = spark.createDataFrame([(v,) for v in vals], "s string").select(
        F.col("s").cast("timestamp_ntz").alias("ts")
    )
    got = [
        r["ms"]
        for r in df.select(
            epoch_millis(F.col("ts"), df.schema["ts"].dataType).alias("ms")
        ).collect()
    ]
    want = [
        duckdb.sql(f"SELECT epoch_ms(TIMESTAMP '{v}')").fetchone()[0] for v in vals
    ]
    assert got == want == [0, -999, 0]
