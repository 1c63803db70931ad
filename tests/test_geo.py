"""WKT conversion hook (functions/geo.py) — the post-process the reference
left as a TODO (BaseRecordConverter.java:263-265).

Covers the pure parser (both endiannesses, every supported type, EWKB SRID
flag, garbage input), the Arrow-batched column form, and the transform-chain
hook on the F2 geometry struct shape.
"""

from __future__ import annotations

import struct

from pyspark.sql import functions as F

from debezium_server_bigquery_spark.functions.geo import (
    geometry_wkt_transform,
    wkb_hex_to_geojson_py,
    wkb_hex_to_wkt,
    wkb_hex_to_wkt_py,
)


def _wkb(gtype: int, body: bytes, little: bool = True, srid: int | None = None) -> str:
    e = "<" if little else ">"
    t = gtype | (0x20000000 if srid is not None else 0)
    out = bytes([1 if little else 0]) + struct.pack(e + "I", t)
    if srid is not None:
        out += struct.pack(e + "I", srid)
    return (out + body).hex()


def _pts(e: str, *coords: float) -> bytes:
    return struct.pack(e + "d" * len(coords), *coords)


def test_point_both_endian():
    le = _wkb(1, _pts("<", 1.0, 1.0))
    be = _wkb(1, _pts(">", 1.0, 1.0), little=False)
    assert wkb_hex_to_wkt_py(le) == "POINT (1 1)"
    assert wkb_hex_to_wkt_py(be) == "POINT (1 1)"
    assert wkb_hex_to_wkt_py(le.lower()) == "POINT (1 1)"


def test_point_fractional_and_negative():
    assert wkb_hex_to_wkt_py(_wkb(1, _pts("<", -0.5, 2.25))) == "POINT (-0.5 2.25)"


def test_ewkb_srid_flag_stripped():
    assert wkb_hex_to_wkt_py(_wkb(1, _pts("<", 3.0, 4.0), srid=4326)) == "POINT (3 4)"


def test_linestring_and_polygon():
    ls = _wkb(2, struct.pack("<I", 2) + _pts("<", 0.0, 0.0, 1.0, 2.0))
    assert wkb_hex_to_wkt_py(ls) == "LINESTRING (0 0, 1 2)"
    ring = struct.pack("<I", 4) + _pts("<", 0.0, 0.0, 1.0, 0.0, 1.0, 1.0, 0.0, 0.0)
    poly = _wkb(3, struct.pack("<I", 1) + ring)
    assert wkb_hex_to_wkt_py(poly) == "POLYGON ((0 0, 1 0, 1 1, 0 0))"


def test_multi_and_collection():
    p1 = bytes.fromhex(_wkb(1, _pts("<", 1.0, 2.0)))
    p2 = bytes.fromhex(_wkb(1, _pts("<", 3.0, 4.0)))
    mp = _wkb(4, struct.pack("<I", 2) + p1 + p2)
    assert wkb_hex_to_wkt_py(mp) == "MULTIPOINT ((1 2), (3 4))"
    gc = _wkb(7, struct.pack("<I", 2) + p1 + p2)
    assert wkb_hex_to_wkt_py(gc) == "GEOMETRYCOLLECTION (POINT (1 2), POINT (3 4))"


def test_geojson_forms():
    import json

    pt = _wkb(1, _pts("<", 1.0, 2.0))
    assert json.loads(wkb_hex_to_geojson_py(pt)) == {
        "type": "Point",
        "coordinates": [1.0, 2.0],
    }
    ring = struct.pack("<I", 4) + _pts("<", 0.0, 0.0, 1.0, 0.0, 1.0, 1.0, 0.0, 0.0)
    poly = _wkb(3, struct.pack("<I", 1) + ring)
    assert json.loads(wkb_hex_to_geojson_py(poly)) == {
        "type": "Polygon",
        "coordinates": [[[0.0, 0.0], [1.0, 0.0], [1.0, 1.0], [0.0, 0.0]]],
    }
    p1 = bytes.fromhex(_wkb(1, _pts("<", 1.0, 2.0)))
    p2 = bytes.fromhex(_wkb(1, _pts("<", 3.0, 4.0)))
    gc = _wkb(7, struct.pack("<I", 2) + p1 + p2)
    assert json.loads(wkb_hex_to_geojson_py(gc)) == {
        "type": "GeometryCollection",
        "geometries": [
            {"type": "Point", "coordinates": [1.0, 2.0]},
            {"type": "Point", "coordinates": [3.0, 4.0]},
        ],
    }
    assert wkb_hex_to_geojson_py("zz") is None and wkb_hex_to_geojson_py(None) is None
    # canonical text form: sorted keys, compact separators (deterministic)
    assert wkb_hex_to_geojson_py(pt) == '{"coordinates":[1.0,2.0],"type":"Point"}'


def test_garbage_and_null_yield_none():
    assert wkb_hex_to_wkt_py(None) is None
    assert wkb_hex_to_wkt_py("") is None
    assert wkb_hex_to_wkt_py("zz") is None  # not hex
    assert wkb_hex_to_wkt_py("01") is None  # truncated
    assert wkb_hex_to_wkt_py(_wkb(99, b"")) is None  # unsupported type


def test_column_udf_and_transform_hook(spark):
    rows = [
        (1, {"srid": 123, "wkb": _wkb(1, _pts("<", 1.0, 1.0)).upper()}),
        (2, {"srid": 0, "wkb": "deadbeef"}),
        (3, None),
    ]
    df = spark.createDataFrame(rows, "id long, g struct<srid: long, wkb: string>")
    out = geometry_wkt_transform(["g", "missing_col"])(df)
    got = {r["id"]: r["g"] for r in out.orderBy("id").collect()}
    assert got[1]["wkt"] == "POINT (1 1)"
    assert got[1]["srid"] == 123 and got[1]["wkb"] == rows[0][1]["wkb"]
    assert got[2]["wkt"] is None  # garbage decodes to NULL, row survives
    assert got[3] is None  # null geometry stays null
    # bare column form
    one = df.select(wkb_hex_to_wkt(F.col("g.wkb")).alias("w")).collect()
    assert one[0]["w"] == "POINT (1 1)"
