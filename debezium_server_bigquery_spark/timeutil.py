"""Timezone-safe epoch extraction.

The driver's testdata stores ``events.ts`` as parquet
``TIMESTAMP(isAdjustedToUTC=false)``, which Spark surfaces as
``TIMESTAMP_NTZ``.  Spark 4's ``unix_millis``/``unix_micros`` accept only
``TIMESTAMP`` (LTZ), and a bare ``cast`` from NTZ to LTZ shifts by the
session time zone — non-deterministic across harnesses.  The DuckDB
correctness oracle reads the same column as a naive timestamp and its
``epoch_us`` treats the wall time as UTC, so the engine must do the same:
``to_utc_timestamp(ntz, 'UTC')`` reinterprets the naive wall clock as UTC
regardless of ``spark.sql.session.timeZone``, making ``unix_micros`` exact
and session-independent.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T


def epoch_micros(col: Column, dtype: T.DataType) -> Column:
    """Epoch microseconds of a timestamp column of either flavor.

    NTZ wall time is interpreted as UTC (DuckDB ``epoch_us`` parity);
    LTZ is already an instant.
    """
    if isinstance(dtype, T.TimestampNTZType):
        return F.unix_micros(F.to_utc_timestamp(col, "UTC"))
    return F.unix_micros(col)


def epoch_millis(col: Column, dtype: T.DataType) -> Column:
    """Epoch milliseconds — same semantics as :func:`epoch_micros`."""
    if isinstance(dtype, T.TimestampNTZType):
        return F.unix_millis(F.to_utc_timestamp(col, "UTC"))
    return F.unix_millis(col)


def as_instant(col: Column, dtype: T.DataType) -> Column:
    """Timestamp column as an LTZ instant (UTC wall-clock for NTZ input).

    Structured Streaming watermarks/event-time windows accept only
    ``TIMESTAMP`` — NTZ event-time columns must pass through this first.
    """
    if isinstance(dtype, T.TimestampNTZType):
        return F.to_utc_timestamp(col, "UTC")
    return col
