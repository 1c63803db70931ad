"""Geometry WKT conversion — beyond-parity post-process hook (F2+).

The reference stops at hex-WKB with its own open TODO
(BaseRecordConverter.java:263-265: "geometry values are written as hex
WKB; converting to a readable representation is left to the warehouse",
i.e. ``ST_GEOGFROMWKB`` in BigQuery).  This module closes that TODO on the
Spark side: an opt-in transform that decodes hex-WKB into WKT text, meant
for the pipeline's per-destination transform chain (SURVEY §2.8) or any
ad-hoc enrichment.

Scale design: WKB decode is inherently byte-twiddling (endianness flag +
IEEE754 doubles), which Catalyst cannot express without a bits-to-double
reinterpret — so this is one of the engine's few documented Python
boundaries, and like the multimodal decode it is **Arrow-batched**
(``pandas_udf``), never per-row: each executor receives columnar batches
and loops in-process over a compact bytes parser.  The parse is O(bytes)
per geometry with no state, so it scales embarrassingly with executors.

Supported: 2-D Point / LineString / Polygon / MultiPoint /
MultiLineString / MultiPolygon / GeometryCollection, both endiannesses,
with or without the EWKB embedded-SRID flag.  Unparseable or unsupported
input yields NULL (a post-process must not kill the pipeline the way the
reference's converter exception would — ConsumerUtil parity is the
*parse* stage's job, not the enrichment's).
"""

from __future__ import annotations

import struct
from collections.abc import Sequence

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

_EWKB_SRID_FLAG = 0x20000000
_TYPE_NAMES = {
    1: "POINT",
    2: "LINESTRING",
    3: "POLYGON",
    4: "MULTIPOINT",
    5: "MULTILINESTRING",
    6: "MULTIPOLYGON",
    7: "GEOMETRYCOLLECTION",
}


def _num(v: float) -> str:
    """Shortest exact decimal for a coordinate; integral values lose '.0'
    (the WKT convention: POINT (1 1), not POINT (1.0 1.0))."""
    if v == int(v) and abs(v) < 1e16:
        return str(int(v))
    return repr(v)


class _Reader:
    __slots__ = ("buf", "pos")

    def __init__(self, buf: bytes):
        self.buf = buf
        self.pos = 0

    def take(self, n: int) -> bytes:
        b = self.buf[self.pos : self.pos + n]
        if len(b) != n:
            raise ValueError("truncated WKB")
        self.pos += n
        return b


def _read_geometry(r: _Reader) -> str:
    endian = "<" if r.take(1)[0] == 1 else ">"
    (gtype,) = struct.unpack(endian + "I", r.take(4))
    if gtype & _EWKB_SRID_FLAG:
        gtype &= ~_EWKB_SRID_FLAG
        r.take(4)  # embedded SRID — the struct carries it separately
    # ISO WKB encodes Z/M/ZM as +1000/+2000/+3000: 2-D only here.
    if gtype not in _TYPE_NAMES:
        raise ValueError(f"unsupported WKB geometry type {gtype}")

    def point() -> str:
        x, y = struct.unpack(endian + "dd", r.take(16))
        return f"{_num(x)} {_num(y)}"

    def ring() -> str:
        (n,) = struct.unpack(endian + "I", r.take(4))
        return "(" + ", ".join(point() for _ in range(n)) + ")"

    name = _TYPE_NAMES[gtype]
    if gtype == 1:
        return f"{name} ({point()})"
    if gtype == 2:
        return f"{name} {ring()}"
    if gtype == 3:
        (n,) = struct.unpack(endian + "I", r.take(4))
        return f"{name} (" + ", ".join(ring() for _ in range(n)) + ")"
    # multi-geometries and collections hold full sub-geometries (each with
    # its own endianness byte and type header)
    (n,) = struct.unpack(endian + "I", r.take(4))
    subs = [_read_geometry(r) for _ in range(n)]
    if gtype == 4:  # MULTIPOINT ((1 2), (3 4)) — strip the POINT keyword
        subs = [s[len("POINT ") :] for s in subs]
    elif gtype in (5, 6):  # strip LINESTRING/POLYGON keywords
        subs = [s.split(" ", 1)[1] for s in subs]
    return f"{name} (" + ", ".join(subs) + ")"


def wkb_hex_to_wkt_py(hx: str | None) -> str | None:
    """Pure-Python single-value form (tests / driver-side use)."""
    if hx is None or hx == "":
        return None
    try:
        return _read_geometry(_Reader(bytes.fromhex(hx)))
    except Exception:
        return None


_UDF = None


def wkb_hex_to_wkt(col: Column) -> Column:
    """Arrow-batched hex-WKB -> WKT; NULL for unparseable input.

    The pandas_udf is built on first use (decorating at import time needs
    an active SparkSession, which a library module must not assume)."""
    global _UDF
    if _UDF is None:

        @pandas_udf("string")
        def _decode(hx: pd.Series) -> pd.Series:
            return hx.map(wkb_hex_to_wkt_py)

        _UDF = _decode
    return _UDF(col)


def geometry_wkt_transform(cols: Sequence[str]):
    """Transform-chain hook: for each named geometry struct column
    (``{srid, wkb}``, the F2 output shape) add a ``wkt`` sub-field.

    Use with :class:`CdcPipeline` (SURVEY §2.8)::

        pipeline.transforms["*"] = [geometry_wkt_transform(["g"])]

    Non-struct or missing columns pass through untouched, so one chain
    can serve heterogeneous destinations.
    """

    def apply(df: DataFrame) -> DataFrame:
        from pyspark.sql import types as T

        for c in cols:
            if c not in df.columns:
                continue
            dt = df.schema[c].dataType
            if not isinstance(dt, T.StructType) or "wkb" not in dt.names:
                continue
            sub: list[Column] = [
                F.col(f"{c}.{f}").alias(f) for f in dt.names
            ] + [wkb_hex_to_wkt(F.col(f"{c}.wkb")).alias("wkt")]
            df = df.withColumn(
                c, F.when(F.col(c).isNull(), F.lit(None)).otherwise(F.struct(*sub))
            )
        return df

    return apply
