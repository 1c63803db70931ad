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


def _coerce_node(col: Column, node: dict[str, Any], name: str | None) -> Column:
    """Coercion expression for one schema node; recurses into containers."""
    phys = node.get("type")
    sem = node.get("name")

    # Meta-field overrides first (BaseRecordConverter.java:342-344, 362-364).
    if name in S.TS_MS_FIELDS and phys in ("int64", "int32"):
        # F7 — epoch-ms -> TIMESTAMP (:320-329).
        return F.timestamp_millis(col)
    if name in S.BOOLEAN_FIELDS and phys == "string":
        # F8 — "true"/"false" -> BOOL (:362-364; cast-deleted-field).
        return col.cast("boolean")

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
        # F3 — recurse into sub-fields (:281-291).
        sub = [
            _coerce_node(col.getField(f["field"]), f, f["field"]).alias(f["field"])
            for f in node.get("fields", [])
        ]
        return F.when(col.isNull(), F.lit(None)).otherwise(F.struct(*sub))
    if phys == "array":
        items = node.get("items")
        if not items:
            return col
        # F9 — element-wise coercion via transform (:376-386).
        return F.transform(col, lambda x: _coerce_node(x, items, None))
    # boolean / bytes / map / unknown: wire value is already final.
    return col


def coercion_columns(schema_node: dict[str, Any]) -> list[Column]:
    """Select-list turning wire-schema rows into destination rows."""
    cols = []
    for f in schema_node.get("fields", []):
        name = f["field"]
        cols.append(_coerce_node(F.col(name), f, name).alias(name))
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
