"""CDC operator queries — the reference's dataflow stages (SURVEY §2.1-§2.4)
expressed as oracle-checkable DataFrame plans over the synthesized CDC
stream (sources/cdc.py) derived from the ``events`` table.

Each query exercises one reference operator; the DuckDB twin recomputes the
same synthesis + operator in ANSI SQL, so the driver's hash compare covers
the operator end-to-end (FIXTURES.md §D replay strategy).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from debezium_server_bigquery_spark.coerce import OP_PRIORITY_SQL

from debezium_server_bigquery_spark.operators.dedup import dedup_last_writer
from debezium_server_bigquery_spark.operators.rank import ordered_output
from debezium_server_bigquery_spark.operators.routing import (
    filter_heartbeats,
    rewrite_destination,
)
from debezium_server_bigquery_spark.sources.cdc import (
    cdc_synth_oracle_sql,
    synthesize_cdc_events,
)
from debezium_server_bigquery_spark.sources.tables import load_table

# The oracle CTE shared by every query: synthesized CDC rows.
_CDC_CTE = f"WITH cdc AS ({cdc_synth_oracle_sql('events')})"

# Oracle twin of the A2 ordering: dedup column desc, then op priority desc,
# then event_id desc as a final deterministic tiebreak.
_OP_PRI = OP_PRIORITY_SQL  # A2 priority map — single source in coerce.py


def _cdc(spark: SparkSession, sf_dir: str) -> DataFrame:
    return synthesize_cdc_events(load_table(spark, sf_dir, "events"))


# --------------------------------------------------------------------------
# S2/S1 — the flattened change-event stream itself (schema + meta columns).
# --------------------------------------------------------------------------
def cdc_flatten(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _cdc(spark, sf_dir)


CDC_FLATTEN_SQL = f"{_CDC_CTE} SELECT * FROM cdc"


# --------------------------------------------------------------------------
# R1-R3 — heartbeat filter + destination rewrite + per-table grouping.
# The regexp collapses the three physical partitions events_p0/1/2 into one
# logical table (fan-in, docs/configuration.md:5-6).
# --------------------------------------------------------------------------
def cdc_route(spark: SparkSession, sf_dir: str) -> DataFrame:
    df = filter_heartbeats(_cdc(spark, sf_dir))
    df = rewrite_destination(df, r"_p\d+$", "")
    return (
        df.groupBy("destination")
        .agg(F.count("*").alias("n_events"), F.countDistinct("__table").alias("n_source_tables"))
        .orderBy("destination")
    )


CDC_ROUTE_SQL = f"""{_CDC_CTE}
SELECT regexp_replace(regexp_replace(destination, '_p\\d+$', ''), '\\.', '_', 'g') AS destination,
       COUNT(*) AS n_events, COUNT(DISTINCT __table) AS n_source_tables
FROM cdc
WHERE destination NOT LIKE '\\_\\_debezium-heartbeat%' ESCAPE '\\'
GROUP BY 1 ORDER BY destination
"""


# --------------------------------------------------------------------------
# A1/A2 — in-batch last-writer-wins dedup per (destination, PK).
# --------------------------------------------------------------------------
def cdc_dedup_last_writer(spark: SparkSession, sf_dir: str) -> DataFrame:
    df = filter_heartbeats(_cdc(spark, sf_dir))
    out = dedup_last_writer(
        df, ["destination", "user_id"], order_col="__source_ts_ns", tiebreak=("event_id",)
    )
    return out.select(
        "destination", "user_id", "event_id", "event_type", "value", "__op", "__source_ts_ns"
    ).orderBy("destination", "user_id")


CDC_DEDUP_SQL = f"""{_CDC_CTE}
SELECT destination, user_id, event_id, event_type, value, __op, __source_ts_ns
FROM (
  SELECT *, ROW_NUMBER() OVER (
      PARTITION BY destination, user_id
      ORDER BY __source_ts_ns DESC, {_OP_PRI} DESC, event_id DESC) AS rn
  FROM cdc
  WHERE destination NOT LIKE '\\_\\_debezium-heartbeat%' ESCAPE '\\'
)
WHERE rn = 1 ORDER BY destination, user_id
"""


# --------------------------------------------------------------------------
# S5/A3 — upsert final state: last writer per key, deletes applied
# (the destination table a user queries after replication).
# --------------------------------------------------------------------------
def cdc_upsert_final_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    df = filter_heartbeats(_cdc(spark, sf_dir))
    last = dedup_last_writer(
        df, ["destination", "user_id"], order_col="__source_ts_ns", tiebreak=("event_id",)
    )
    return (
        last.filter(F.col("__op") != "d")
        .select("destination", "user_id", "event_id", "event_type", "value", "__deleted")
        .orderBy("destination", "user_id")
    )


CDC_UPSERT_FINAL_SQL = f"""{_CDC_CTE}
SELECT destination, user_id, event_id, event_type, value, __deleted
FROM (
  SELECT *, ROW_NUMBER() OVER (
      PARTITION BY destination, user_id
      ORDER BY __source_ts_ns DESC, {_OP_PRI} DESC, event_id DESC) AS rn
  FROM cdc
  WHERE destination NOT LIKE '\\_\\_debezium-heartbeat%' ESCAPE '\\'
)
WHERE rn = 1 AND __op <> 'd' ORDER BY destination, user_id
"""


# --------------------------------------------------------------------------
# A3 keep-deletes variant: deleted keys stay as tombstone rows with
# __deleted = true (upsert-keep-deletes, StreamConsumerConfig.java:71-73).
# --------------------------------------------------------------------------
def cdc_upsert_keep_deletes(spark: SparkSession, sf_dir: str) -> DataFrame:
    df = filter_heartbeats(_cdc(spark, sf_dir))
    last = dedup_last_writer(
        df, ["destination", "user_id"], order_col="__source_ts_ns", tiebreak=("event_id",)
    )
    return (
        last.groupBy("destination")
        .agg(
            F.count("*").alias("n_keys"),
            F.sum(F.when(F.col("__op") == "d", 1).otherwise(0)).alias("n_deleted"),
            F.sum(F.when(F.col("__deleted") == "true", 1).otherwise(0)).alias("n_tombstones"),
        )
        .orderBy("destination")
    )


CDC_KEEP_DELETES_SQL = f"""{_CDC_CTE}
SELECT destination, COUNT(*) AS n_keys,
  CAST(SUM(CASE WHEN __op = 'd' THEN 1 ELSE 0 END) AS BIGINT) AS n_deleted,
  CAST(SUM(CASE WHEN __deleted = 'true' THEN 1 ELSE 0 END) AS BIGINT) AS n_tombstones
FROM (
  SELECT *, ROW_NUMBER() OVER (
      PARTITION BY destination, user_id
      ORDER BY __source_ts_ns DESC, {_OP_PRI} DESC, event_id DESC) AS rn
  FROM cdc
  WHERE destination NOT LIKE '\\_\\_debezium-heartbeat%' ESCAPE '\\'
)
WHERE rn = 1
GROUP BY destination ORDER BY destination
"""


# --------------------------------------------------------------------------
# S3 — append-mode stats: every change kept (audit-log semantics), counts
# per destination x op after routing.
# --------------------------------------------------------------------------
def cdc_append_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    df = filter_heartbeats(_cdc(spark, sf_dir))
    return (
        df.groupBy("destination", "__op")
        .agg(F.count("*").alias("n_rows"), F.countDistinct("user_id").alias("n_keys"))
        .orderBy("destination", "__op")
    )


CDC_APPEND_SQL = f"""{_CDC_CTE}
SELECT destination, __op, COUNT(*) AS n_rows, COUNT(DISTINCT user_id) AS n_keys
FROM cdc
WHERE destination NOT LIKE '\\_\\_debezium-heartbeat%' ESCAPE '\\'
GROUP BY destination, __op ORDER BY destination, __op
"""


# --------------------------------------------------------------------------
# F5/F7/F8 — scalar coercions: epoch-ms -> TIMESTAMP (__ts_ms meta
# override), epoch-days -> DATE, string bool -> BOOL.  Values synthesized
# from the event timestamp so the oracle can recompute them.
# --------------------------------------------------------------------------
def cdc_coerce_scalars(spark: SparkSession, sf_dir: str) -> DataFrame:
    df = _cdc(spark, sf_dir)
    epoch_days = (F.col("__ts_ms") / F.lit(86_400_000)).cast("long")
    # All calendar renderings below are pure epoch arithmetic:
    # timestamp_millis(...).cast("date") / date_format(...) render through
    # the SESSION time zone and shift on non-UTC harnesses, while the
    # DuckDB oracle's make_timestamp is naive UTC.
    date_part = F.date_from_unix_date(epoch_days.cast("int"))
    sod = F.expr("(__ts_ms div 1000) % 86400")  # second-of-day, UTC
    iso_utc = F.concat(
        date_part.cast("string"),
        F.lit("T"),
        F.lpad((sod / 3600).cast("int").cast("string"), 2, "0"),
        F.lit(":"),
        F.lpad(((sod % 3600) / 60).cast("int").cast("string"), 2, "0"),
        F.lit(":"),
        F.lpad((sod % 60).cast("string"), 2, "0"),
    )
    out = df.select(
        "event_id",
        # F7: epoch-ms -> timestamp, rendered as DATE for cross-engine hash.
        date_part.alias("ts_date"),
        # F5: epoch-days -> DATE (date_from_unix_date == dateFromDays).
        F.date_from_unix_date(epoch_days.cast("int")).alias("days_date"),
        # F8: string "true"/"false" -> BOOL.
        F.col("__deleted").cast("boolean").alias("deleted_bool"),
        # F6: trailing-Z strip on an ISO string derived from the ts.
        F.regexp_replace(
            F.concat(iso_utc, F.lit("Z")),
            r"(\d)Z$",
            r"$1",
        ).alias("iso_no_z"),
    )
    return ordered_output(out, "event_id")


CDC_COERCE_SQL = f"""{_CDC_CTE}
SELECT event_id,
  CAST(make_timestamp(__ts_ms * 1000) AS DATE) AS ts_date,
  CAST(DATE '1970-01-01' + to_days(CAST(__ts_ms // 86400000 AS INTEGER)) AS DATE) AS days_date,
  CAST(__deleted AS BOOLEAN) AS deleted_bool,
  regexp_replace(strftime(make_timestamp(__ts_ms * 1000), '%Y-%m-%dT%H:%M:%S') || 'Z', '(\\d)Z$', '\\1') AS iso_no_z
FROM cdc ORDER BY event_id
"""


# --------------------------------------------------------------------------
# nested-as-json mode (CommonConfig.java:24-26; asserted by
# StreamBigqueryChangeConsumerNestedTest.java:43-62): running WITHOUT
# ExtractNewRecordState, the full Debezium envelope arrives and its
# sub-structs (before/after/source/transaction) must land as JSON text
# columns while scalars stay typed.  The query rebuilds full-envelope JSON
# lines from the synthesized stream (pure column algebra), parses them
# through the real nested wire path (schema.py nested_as_json=True ->
# from_json raw-capture -> coercion pass-through), and proves the JSON
# columns are queryable by re-extracting the key from `after`.
# --------------------------------------------------------------------------
_NESTED_ENV_SCHEMA = {
    "type": "struct",
    "fields": [
        {
            "type": "struct",
            "optional": True,
            "field": "before",
            "fields": [
                {"type": "int64", "field": "event_id"},
                {"type": "int64", "field": "user_id"},
                {"type": "string", "field": "event_type"},
            ],
        },
        {
            "type": "struct",
            "optional": True,
            "field": "after",
            "fields": [
                {"type": "int64", "field": "event_id"},
                {"type": "int64", "field": "user_id"},
                {"type": "string", "field": "event_type"},
            ],
        },
        {
            "type": "struct",
            "optional": True,
            "field": "source",
            "fields": [
                {"type": "string", "field": "db"},
                {"type": "string", "field": "table"},
                {"type": "int64", "field": "ts_ms"},
            ],
        },
        {"type": "string", "field": "op"},
        {"type": "int64", "field": "ts_ms"},
    ],
}


def cdc_nested_envelope(spark: SparkSession, sf_dir: str) -> DataFrame:
    from debezium_server_bigquery_spark.coerce import coercion_columns
    from debezium_server_bigquery_spark.schema import debezium_schema_to_struct

    df = filter_heartbeats(_cdc(spark, sf_dir))
    after_json = F.concat(
        F.lit('{"event_id":'),
        F.col("event_id").cast("string"),
        F.lit(',"user_id":'),
        F.col("user_id").cast("string"),
        F.lit(',"event_type":"'),
        F.col("event_type"),
        F.lit('"}'),
    )
    source_json = F.concat(
        F.lit('{"db":"'),
        F.col("__db"),
        F.lit('","table":"'),
        F.col("__table"),
        F.lit('","ts_ms":'),
        F.col("__source_ts_ms").cast("string"),
        F.lit("}"),
    )
    line = F.concat(
        F.lit('{"before":null,"after":'),
        after_json,
        F.lit(',"source":'),
        source_json,
        F.lit(',"op":"'),
        F.col("__op"),
        F.lit('","ts_ms":'),
        F.col("__ts_ms").cast("string"),
        F.lit("}"),
    )
    wire_schema = debezium_schema_to_struct(_NESTED_ENV_SCHEMA, nested_as_json=True)
    wire = (
        df.select(line.alias("value"))
        .select(F.from_json("value", wire_schema).alias("e"))
        .select("e.*")
    )
    out = wire.select(coercion_columns(_NESTED_ENV_SCHEMA, nested_as_json=True))
    res = out.select(
        F.get_json_object("after", "$.event_id").cast("long").alias("event_id"),
        F.col("before"),
        F.col("after"),
        F.col("source"),
        F.col("op"),
        F.col("ts_ms"),
    )
    return ordered_output(res, "event_id")


CDC_NESTED_ENVELOPE_SQL = f"""{_CDC_CTE}
SELECT CAST(event_id AS BIGINT) AS event_id,
  CAST(NULL AS VARCHAR) AS before,
  '{{"event_id":' || CAST(event_id AS VARCHAR) || ',"user_id":' || CAST(user_id AS VARCHAR)
    || ',"event_type":"' || event_type || '"}}' AS after,
  '{{"db":"' || __db || '","table":"' || __table || '","ts_ms":'
    || CAST(__source_ts_ms AS VARCHAR) || '}}' AS source,
  __op AS op, __ts_ms AS ts_ms
FROM cdc
WHERE destination NOT LIKE '\\_\\_debezium-heartbeat%' ESCAPE '\\'
ORDER BY event_id
"""


# --------------------------------------------------------------------------
# F1/F2/F9/F10 — the "exotic" coercions: base64 wire bytes -> BINARY,
# geometry struct -> {srid, hex(wkb)}, array-element coercion
# (epoch-days[] -> DATE[]), and Kafka Connect Decimal wire bytes ->
# DECIMAL(p,s) under decimal.handling.mode=precise
# (BaseRecordConverter.java:262-291, 376-386; FIXTURES.md §B shapes
# various-array-data-types.json / serde-with-schema_geom.json).  Events are
# rebuilt as JSON wire lines with pure column algebra (the base64 payloads
# computed Catalyst-side), parsed through the real schema.py ->
# coercion_columns path, so the driver row covers the full wire pipeline.
# --------------------------------------------------------------------------
_EXOTIC_SCHEMA = {
    "type": "struct",
    "fields": [
        {"type": "int64", "optional": False, "field": "event_id"},
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
        {
            "type": "bytes",
            "name": "org.apache.kafka.connect.data.Decimal",
            "parameters": {"scale": "2", "connect.decimal.precision": "12"},
            "field": "c_amount",
        },
    ],
}


def cdc_coerce_exotic(spark: SparkSession, sf_dir: str) -> DataFrame:
    from debezium_server_bigquery_spark.coerce import coercion_columns
    from debezium_server_bigquery_spark.schema import debezium_schema_to_struct

    ev = load_table(spark, sf_dir, "events").filter(F.col("event_id") <= 2000)
    eid = F.col("event_id")
    # F1 payload: base64("blob-<id>") — from_json decodes base64 to BINARY.
    bin_b64 = F.base64(F.concat(F.lit("blob-"), eid.cast("string")).cast("binary"))
    # F2 wkb payload: 4 deterministic bytes — big-endian hex of event_id.
    wkb_hex = F.lpad(F.upper(F.conv(eid.cast("string"), 10, 16)), 8, "0")
    wkb_b64 = F.base64(F.unhex(wkb_hex))
    # F10 payload: BigInteger.toByteArray of the unscaled value (positive
    # here, so: minimal big-endian bytes with a leading 0x00 pad when the
    # top bit would read as a sign).  unscaled = event_id*100 + 7, scale 2.
    unscaled = eid * 100 + 7
    dec_hex = F.upper(F.conv(unscaled.cast("string"), 10, 16))
    dec_hex = F.lpad(dec_hex, ((F.length(dec_hex) + 1) / 2).cast("int") * 2, "0")
    dec_hex = F.when(
        F.substring(dec_hex, 1, 1).isin("8", "9", "A", "B", "C", "D", "E", "F"),
        F.concat(F.lit("00"), dec_hex),
    ).otherwise(dec_hex)
    dec_b64 = F.base64(F.unhex(dec_hex))
    line = F.concat(
        F.lit('{"event_id":'),
        eid.cast("string"),
        F.lit(',"c_binary":"'),
        bin_b64,
        F.lit('","g":{"srid":'),
        (eid % 4326).cast("string"),
        F.lit(',"wkb":"'),
        wkb_b64,
        F.lit('"},"c_dates":['),
        (eid % 20000).cast("string"),
        F.lit(","),
        ((eid * 3) % 20000).cast("string"),
        F.lit('],"c_amount":"'),
        dec_b64,
        F.lit('"}'),
    )
    wire_schema = debezium_schema_to_struct(_EXOTIC_SCHEMA)
    wire = (
        ev.select(line.alias("value"))
        .select(F.from_json("value", wire_schema).alias("e"))
        .select("e.*")
    )
    out = wire.select(
        coercion_columns(_EXOTIC_SCHEMA, decimal_handling_mode="precise")
    )
    res = out.select(
        "event_id",
        F.hex("c_binary").alias("bin_hex"),  # F1 round-trip, hex for the hash
        F.col("g.srid").alias("g_srid"),  # F2/F3
        F.col("g.wkb").alias("g_wkb"),
        # F9+F5: array<date> reduced to scalar columns — the driver
        # canonicalizer pandas-sorts the frame and cannot hash list cells,
        # so registry convention is scalar-only outputs (cf. quantize.py).
        F.col("c_dates")[0].alias("date_lo"),
        F.col("c_dates")[1].alias("date_hi"),
        F.col("c_amount").cast("string").alias("amount_str"),  # F10 precise
        F.col("c_amount").cast("double").alias("amount_dbl"),
    )
    return ordered_output(res, "event_id")


CDC_COERCE_EXOTIC_SQL = """
SELECT event_id,
  hex('blob-' || CAST(event_id AS VARCHAR)) AS bin_hex,
  CAST(event_id % 4326 AS BIGINT) AS g_srid,
  upper(lpad(to_hex(event_id), 8, '0')) AS g_wkb,
  DATE '1970-01-01' + CAST(event_id % 20000 AS INTEGER) AS date_lo,
  DATE '1970-01-01' + CAST((event_id * 3) % 20000 AS INTEGER) AS date_hi,
  CAST(CAST((event_id * 100 + 7) / 100.0 AS DECIMAL(12,2)) AS VARCHAR) AS amount_str,
  (event_id * 100 + 7) / 100.0 AS amount_dbl
FROM events WHERE event_id <= 2000 ORDER BY event_id
"""


QUERIES = {
    "cdc_flatten": cdc_flatten,
    "cdc_route": cdc_route,
    "cdc_dedup_last_writer": cdc_dedup_last_writer,
    "cdc_upsert_final_state": cdc_upsert_final_state,
    "cdc_upsert_keep_deletes": cdc_upsert_keep_deletes,
    "cdc_append_stats": cdc_append_stats,
    "cdc_coerce_scalars": cdc_coerce_scalars,
    "cdc_nested_envelope": cdc_nested_envelope,
    "cdc_coerce_exotic": cdc_coerce_exotic,
}

ORACLES = {
    "cdc_flatten": CDC_FLATTEN_SQL,
    "cdc_route": CDC_ROUTE_SQL,
    "cdc_dedup_last_writer": CDC_DEDUP_SQL,
    "cdc_upsert_final_state": CDC_UPSERT_FINAL_SQL,
    "cdc_upsert_keep_deletes": CDC_KEEP_DELETES_SQL,
    "cdc_append_stats": CDC_APPEND_SQL,
    "cdc_coerce_scalars": CDC_COERCE_SQL,
    "cdc_nested_envelope": CDC_NESTED_ENVELOPE_SQL,
    "cdc_coerce_exotic": CDC_COERCE_EXOTIC_SQL,
}
