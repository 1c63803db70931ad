"""Property-based tests (hypothesis) for the two byte-level decoders.

- WKB -> WKT/GeoJSON (functions/geo.py): random geometry trees encoded to
  WKB in BOTH endiannesses (and optionally the EWKB SRID header) must
  decode to identical text; GeoJSON coordinates must equal the source tree.
- Kafka Connect Decimal wire bytes (coerce.decimal_from_bytes): any
  unscaled integer (positive, negative, zero, multi-byte) encoded exactly
  like java.math.BigInteger.toByteArray must decode to unscaled/10^scale.
  The hand-written fixtures only cover a handful of positive values; the
  property covers the sign/padding space.
"""

from __future__ import annotations

import base64
import json
import struct

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from debezium_server_bigquery_spark.functions.geo import (
    wkb_hex_to_geojson_py,
    wkb_hex_to_wkt_py,
)

_coord = st.floats(
    min_value=-1e6, max_value=1e6, allow_nan=False, allow_infinity=False
)
_point = st.tuples(_coord, _coord)
_line = st.lists(_point, min_size=2, max_size=5)
_ring = st.lists(_point, min_size=3, max_size=5)
_polygon = st.lists(_ring, min_size=1, max_size=3)

_geometry = st.one_of(
    st.tuples(st.just(1), _point),
    st.tuples(st.just(2), _line),
    st.tuples(st.just(3), _polygon),
    st.tuples(st.just(4), st.lists(_point, min_size=1, max_size=4)),
    st.tuples(st.just(5), st.lists(_line, min_size=1, max_size=3)),
    st.tuples(st.just(6), st.lists(_polygon, min_size=1, max_size=2)),
)


def _encode(gtype: int, tree, little: bool, srid: int | None = None) -> bytes:
    e = "<" if little else ">"
    t = gtype | (0x20000000 if srid is not None else 0)
    head = bytes([1 if little else 0]) + struct.pack(e + "I", t)
    if srid is not None:
        head += struct.pack(e + "I", srid)

    def pt(p):
        return struct.pack(e + "dd", *p)

    def seq(items, fn):
        return struct.pack(e + "I", len(items)) + b"".join(fn(i) for i in items)

    if gtype == 1:
        return head + pt(tree)
    if gtype == 2:
        return head + seq(tree, pt)
    if gtype == 3:
        return head + seq(tree, lambda rg: seq(rg, pt))
    if gtype == 4:
        return head + seq(tree, lambda p: _encode(1, p, little))
    if gtype == 5:
        return head + seq(tree, lambda ln: _encode(2, ln, little))
    return head + seq(tree, lambda pg: _encode(3, pg, little))


@given(_geometry, st.integers(min_value=0, max_value=99999))
@settings(max_examples=150, deadline=None)
def test_wkb_decode_endianness_and_srid_invariant(geom, srid):
    gtype, tree = geom
    le = _encode(gtype, tree, True).hex()
    be = _encode(gtype, tree, False).hex()
    ewkb = _encode(gtype, tree, True, srid=srid).hex()
    wkt = wkb_hex_to_wkt_py(le)
    assert wkt is not None and wkt.split(" ", 1)[0] in (
        "POINT", "LINESTRING", "POLYGON", "MULTIPOINT",
        "MULTILINESTRING", "MULTIPOLYGON",
    )
    assert wkb_hex_to_wkt_py(be) == wkt
    assert wkb_hex_to_wkt_py(ewkb) == wkt
    assert wkb_hex_to_geojson_py(be) == wkb_hex_to_geojson_py(le)


@given(st.tuples(st.just(1), _point))
@settings(max_examples=80, deadline=None)
def test_wkb_geojson_coordinates_roundtrip(geom):
    gtype, (x, y) = geom
    gj = json.loads(wkb_hex_to_geojson_py(_encode(gtype, (x, y), True).hex()))
    assert gj["type"] == "Point"
    assert gj["coordinates"] == [x, y]


@given(st.binary(min_size=2, max_size=40))
@settings(max_examples=100, deadline=None)
def test_wkb_garbage_never_raises(buf):
    # arbitrary bytes: decode returns a string or None, never raises
    r = wkb_hex_to_wkt_py(buf.hex())
    assert r is None or isinstance(r, str)


# --------------------------------------------------------------------------
# Connect Decimal wire decode
# --------------------------------------------------------------------------
def _java_big_integer_bytes(n: int) -> bytes:
    """java.math.BigInteger.toByteArray: minimal big-endian two's complement."""
    if n == 0:
        return b"\x00"
    length = (n.bit_length() + 8) // 8  # +1 sign bit, rounded up
    return n.to_bytes(length, "big", signed=True)


@given(
    st.integers(min_value=-(10**15), max_value=10**15),
    st.integers(min_value=0, max_value=6),
)
@settings(
    max_examples=30,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_decimal_wire_decode_matches_biginteger(spark, unscaled, scale):
    from debezium_server_bigquery_spark.coerce import coercion_columns
    from debezium_server_bigquery_spark.schema import debezium_schema_to_struct

    node = {
        "type": "struct",
        "fields": [
            {
                "type": "bytes",
                "name": "org.apache.kafka.connect.data.Decimal",
                "parameters": {
                    "scale": str(scale),
                    "connect.decimal.precision": "20",
                },
                "field": "d",
            }
        ],
    }
    wire = base64.b64encode(_java_big_integer_bytes(unscaled)).decode()
    df = spark.createDataFrame(
        [(json.dumps({"d": wire}),)], "value string"
    ).select(
        F.from_json("value", debezium_schema_to_struct(node)).alias("p")
    ).select("p.*")
    row = df.select(
        coercion_columns(node, decimal_handling_mode="precise")
    ).collect()[0]
    from decimal import Decimal

    expected = Decimal(unscaled).scaleb(-scale)
    assert row["d"] == expected, (unscaled, scale, row["d"])
