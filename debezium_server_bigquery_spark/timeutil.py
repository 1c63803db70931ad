"""Timezone-safe epoch extraction.

The driver's testdata stores ``events.ts`` as parquet
``TIMESTAMP(isAdjustedToUTC=false)``, which Spark surfaces as
``TIMESTAMP_NTZ``.  Spark 4's ``unix_millis``/``unix_micros`` accept only
``TIMESTAMP`` (LTZ), and every implicit NTZ->LTZ conversion — including
the analyzer's cast inserted under ``to_utc_timestamp`` — shifts by the
*session* time zone, so results would differ between a UTC harness and
any other.  The DuckDB correctness oracle reads the same column as a
naive timestamp and its ``epoch_us`` treats the wall time as UTC; the
only session-independent way to match that in Spark is pure NTZ
arithmetic: ``timestamp_diff(MICROSECOND, NTZ '1970-01-01', ts)``
involves no time zone at all.  (Verified: ``to_utc_timestamp(ntz,
'UTC')`` is wrong by the session offset under
``spark.sql.session.timeZone=America/New_York``; ``timestamp_diff`` is
exact under any zone.)
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T


def _ntz_epoch() -> Column:
    return F.lit("1970-01-01 00:00:00").cast("timestamp_ntz")


def epoch_micros(col: Column, dtype: T.DataType) -> Column:
    """Epoch microseconds of a timestamp column of either flavor.

    NTZ wall time is interpreted as UTC (DuckDB ``epoch_us`` parity, no
    session-time-zone dependence); LTZ is already an instant.
    """
    if isinstance(dtype, T.TimestampNTZType):
        return F.timestamp_diff("MICROSECOND", _ntz_epoch(), col)
    return F.unix_micros(col)


def epoch_millis(col: Column, dtype: T.DataType) -> Column:
    """Epoch milliseconds — same semantics as :func:`epoch_micros`.

    ``timestamp_diff(MILLISECOND, ...)`` truncates toward zero for
    pre-1970 sub-millisecond instants — and so does DuckDB's ``epoch_ms``
    (verified: -500 us -> 0 in both engines), so the direct form is the
    oracle-exact one.  (``unix_millis`` on LTZ floors instead; the two
    differ only for pre-1970 fractions, which the driver data never has.)
    """
    if isinstance(dtype, T.TimestampNTZType):
        return F.timestamp_diff("MILLISECOND", _ntz_epoch(), col)
    return F.unix_millis(col)


def as_instant(col: Column, dtype: T.DataType) -> Column:
    """Timestamp column as an LTZ instant (UTC wall-clock for NTZ input).

    Structured Streaming watermarks/event-time windows accept only
    ``TIMESTAMP`` — NTZ event-time columns must pass through this first.
    Built from the epoch number, not a cast, so the instant is the same
    under any session time zone.
    """
    if isinstance(dtype, T.TimestampNTZType):
        return F.timestamp_micros(epoch_micros(col, dtype))
    return col
