"""Value coercions F1-F11 (SURVEY §2.6) as pure Catalyst expressions.

Python mirror of ``BaseRecordConverter.handleFieldValue`` (:244-334) and the
schema-side overrides (:336-394).  Every coercion is built from
``pyspark.sql.functions`` — no Python UDFs — so the whole layer stays inside
whole-stage codegen and scales linearly with executors.

Given a Debezium schema node and a DataFrame already parsed to the wire
schema (see :mod:`schema`), :func:`coercion_columns` returns the select-list
that produces destination-table rows.
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import Column
from pyspark.sql import functions as F

from debezium_server_bigquery_spark import schema as S

# Trailing-Z strip regex — BaseRecordConverter.java:59,136-141: ISO DATE /
# DATETIME / TIME strings ending "<digit>Z" lose the Z.
_TRAILING_Z = r"(\d)Z$"


def strip_trailing_z(col: Column) -> Column:
    """F6 — ``removeTemporalValueTrailingZ`` (:136-141)."""
    return F.regexp_replace(col, _TRAILING_Z, r"$1")


def geometry_wkb_hex(col: Column, wire_is_binary: bool) -> Column:
    """F2 — geometry wkb (binary, or base64 text) -> upper-hex string
    (:262-280).  The reference has the same representation TODO (:263-265);
    spatial decode is a post-process (`ST_GEOGFROMWKB` in BQ)."""
    binary = col if wire_is_binary else F.unbase64(col)
    return F.hex(binary)


def decimal_from_bytes(col: Column, node: dict[str, Any], mode: str) -> Column:
    """F10 precise branch — Kafka Connect Decimal wire bytes -> DECIMAL.

    The wire value is the big-endian two's-complement **unscaled** integer
    (java.math.BigInteger.toByteArray) with ``scale`` and
    ``connect.decimal.precision`` in the schema parameters.  Decoded with
    pure Catalyst expressions: fold the hex digits into a DECIMAL(38,0)
    accumulator seeded with the sign-adjusted first byte, then rescale.
    ``mode="double"`` (the reference's default, DebeziumConfig.java:30-32)
    lowers the result to FLOAT64; ``mode="precise"`` keeps DECIMAL.
    """
    params = node.get("parameters", {}) or {}
    scale = int(params.get("scale", "0"))
    precision = min(int(params.get("connect.decimal.precision", "38")), 38)
    precision = max(precision, scale + 1)
    hx = F.hex(col)  # 2 uppercase hex chars per byte, MSB first
    first = F.conv(F.substring(hx, 1, 2), 16, 10).cast("decimal(38,0)")
    signed0 = F.when(first >= 128, first - 256).otherwise(first)
    # remaining bytes: acc = acc*256 + byte[i].  Guard the single-byte case:
    # sequence(1, 0) steps DOWNWARD in Spark, it is not an empty sequence.
    unscaled = F.when(F.length(hx) <= 2, signed0).otherwise(
        F.aggregate(
            F.sequence(F.lit(1), (F.length(hx) / 2).cast("int") - 1),
            signed0,
            lambda acc, i: acc * 256
            + F.conv(F.substring(hx, i * 2 + 1, 2), 16, 10).cast("decimal(38,0)"),
        )
    )
    out = (unscaled / F.lit(10**scale)).cast(f"decimal({precision},{scale})")
    return out.cast("double") if mode == "double" else out


def _coerce_node(
    col: Column,
    node: dict[str, Any],
    name: str | None,
    *,
    decimal_mode: str,
    nested_as_json: bool = False,
    cast_deleted_field: bool = True,
) -> Column:
    """Coercion expression for one schema node; recurses into containers."""
    phys = node.get("type")
    sem = node.get("name")

    # Meta-field overrides first (BaseRecordConverter.java:342-344, 362-364).
    if name in S.TS_MS_FIELDS and phys in ("int64", "int32"):
        # F7 — epoch-ms -> TIMESTAMP (:320-329).
        return F.timestamp_millis(col)
    if name in S.BOOLEAN_FIELDS and phys == "string":
        # F8 — "true"/"false" -> BOOL (:362-364).  The reference can turn
        # this off (BatchConsumerConfig.java:69-71 castDeletedField);
        # when disabled the __deleted column ships as its wire STRING.
        if cast_deleted_field:
            return col.cast("boolean")
        return col

    if phys in ("int8", "int16", "int32", "int64"):
        if sem == S.SEM_DATE:
            # F5 — epoch-days -> DATE (:305-313, dateFromDays :225-227).
            return F.date_from_unix_date(col.cast("int"))
        # Timestamp/MicroTimestamp/NanoTimestamp stay as epoch numbers —
        # the reference keeps INT64 (:347-349).
        return col
    if phys == "string":
        if sem == S.SEM_ISO_DATE:
            return F.to_date(strip_trailing_z(col))
        if sem == S.SEM_ISO_TIMESTAMP:
            # BQ DATETIME ~ Spark TIMESTAMP_NTZ.
            return F.to_timestamp_ntz(strip_trailing_z(col))
        if sem in (S.SEM_ISO_TIME, S.SEM_ZONED_TIME):
            # Spark has no TIME type; keep the (Z-stripped) ISO string.
            return strip_trailing_z(col)
        if sem == S.SEM_ZONED_TIMESTAMP:
            return F.to_timestamp(col)
        # F4 — JSON-typed strings kept as canonical JSON text; queries use
        # get_json_object / from_json (the reference parses to a tree only
        # to re-serialize for BigQuery, :292-304).
        return col
    if phys == "struct":
        if sem == S.SEM_GEOMETRY:
            wkb_node = next(
                (f for f in node.get("fields", []) if f.get("field") == "wkb"), {}
            )
            geom = F.struct(
                col.getField("srid").cast("long").alias("srid"),
                geometry_wkb_hex(
                    col.getField("wkb"), wkb_node.get("type") == "bytes"
                ).alias("wkb"),
            )
            return F.when(col.isNull(), F.lit(None)).otherwise(geom)
        if nested_as_json:
            # nested-as-json mode: the wire schema already parsed this
            # sub-struct as raw JSON text (schema.py:83-87 mirror of
            # StreamRecordConverter.java:58-69) — keep it verbatim, the
            # destination column type is JSON (CommonConfig.java:24-26).
            return col
        # F3 — recurse into sub-fields (:281-291).
        sub = [
            _coerce_node(
                col.getField(f["field"]),
                f,
                f["field"],
                decimal_mode=decimal_mode,
                nested_as_json=nested_as_json,
                cast_deleted_field=cast_deleted_field,
            ).alias(f["field"])
            for f in node.get("fields", [])
        ]
        return F.when(col.isNull(), F.lit(None)).otherwise(F.struct(*sub))
    if phys == "array":
        items = node.get("items")
        if not items:
            return col
        # F9 — element-wise coercion via transform (:376-386).
        return F.transform(
            col,
            lambda x: _coerce_node(
                x,
                items,
                None,
                decimal_mode=decimal_mode,
                nested_as_json=nested_as_json,
                cast_deleted_field=cast_deleted_field,
            ),
        )
    if phys == "bytes" and sem == S.SEM_DECIMAL:
        # F10 — decimal.handling.mode: precise wire bytes -> DECIMAL (or
        # lowered to FLOAT64 in the default double mode).
        return decimal_from_bytes(col, node, decimal_mode)
    # boolean / bytes / map / unknown: wire value is already final.
    return col


def coercion_columns(
    schema_node: dict[str, Any],
    *,
    decimal_handling_mode: str = "double",
    nested_as_json: bool = False,
    cast_deleted_field: bool = True,
) -> list[Column]:
    """Select-list turning wire-schema rows into destination rows.

    ``decimal_handling_mode`` mirrors ``debezium.source.decimal.handling.mode``
    (double default, DebeziumConfig.java:30-32); "precise" preserves
    Connect Decimal wire bytes as DECIMAL(p,s).  ``nested_as_json`` mirrors
    ``debezium.sink.batch.nested-as-json`` (CommonConfig.java:24-26): the
    wire parse kept sub-structs as JSON text, so struct coercion is a
    pass-through (geometry stays typed either way, matching schema.py).
    ``cast_deleted_field`` mirrors ``debezium.sink.<type>.cast-deleted-field``
    (BatchConsumerConfig.java:69-71, default true): when False the F8
    string->BOOL cast is skipped and ``__deleted`` ships as STRING.
    """
    cols = []
    for f in schema_node.get("fields", []):
        name = f["field"]
        cols.append(
            _coerce_node(
                F.col(name),
                f,
                name,
                decimal_mode=decimal_handling_mode,
                nested_as_json=nested_as_json,
                cast_deleted_field=cast_deleted_field,
            ).alias(name)
        )
    return cols


def op_priority(col: Column) -> Column:
    """CDC op -> dedup priority {c:1, r:2, u:3, d:4} — mirror of the
    ``cdcOperations`` map (StreamBigqueryChangeConsumer.java:62) used by the
    A2 ordering comparator (:238-255)."""
    return (
        F.when(col == "c", F.lit(1))
        .when(col == "r", F.lit(2))
        .when(col == "u", F.lit(3))
        .when(col == "d", F.lit(4))
        .otherwise(F.lit(0))
    )


# DuckDB twin of op_priority — the ONE place the A2 priority map lives in
# SQL form; oracle builders interpolate this instead of restating the map.
OP_PRIORITY_SQL = (
    "CASE __op WHEN 'c' THEN 1 WHEN 'r' THEN 2 WHEN 'u' THEN 3 "
    "WHEN 'd' THEN 4 ELSE 0 END"
)
