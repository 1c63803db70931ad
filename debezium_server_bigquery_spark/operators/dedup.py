"""A1/A2 — in-batch last-writer-wins dedup (SURVEY §2.4).

Python mirror of ``StreamBigqueryChangeConsumer.deduplicateBatch`` (:207-223)
and ``compareByTsThenOp`` (:238-255): keep, per primary key, the event with
the greatest ``(__source_ts_ns, op_priority)``.

Scale note: implemented as ``groupBy(pk).agg(max_by(struct(*), ordering))``
rather than a ``row_number()`` window.  The aggregation form gets map-side
partial aggregation (each input partition reduces to <= |keys| rows before
the exchange) and needs no sort; the window form shuffles *every* row and
sorts each partition.  At 100 TB with hot keys this is the difference
between a bounded shuffle and a skew stall — AQE skew-join/agg handles the
residue.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from debezium_server_bigquery_spark.coerce import op_priority


def dedup_ordering(
    order_col: str = "__source_ts_ns", tiebreak: Sequence[str] = ()
) -> Column:
    """The A2 comparator as one orderable struct: dedup column, then CDC op
    priority {c:1 < r:2 < u:3 < d:4}, then caller-supplied tiebreaks.

    The reference compares ts first and falls back to op priority on exact
    ties (compareByTsThenOp :238-255, priority map :62).
    """
    parts: list[Column] = [F.col(order_col), op_priority(F.col("__op"))]
    parts.extend(F.col(c) for c in tiebreak)
    return F.struct(*parts)


def dedup_last_writer(
    df: DataFrame,
    key_cols: Sequence[str],
    order_col: str = "__source_ts_ns",
    tiebreak: Sequence[str] = (),
) -> DataFrame:
    """Keep one row per key: the max by :func:`dedup_ordering`.

    Mandatory before MERGE — like the reference (dedup gated at
    StreamBigqueryChangeConsumer.java:189-191), and Delta-style merges
    require unique source keys per target row.
    """
    if not key_cols:
        return df
    row = F.struct(*[F.col(c) for c in df.columns])
    ordering = dedup_ordering(order_col, tiebreak)
    if not tiebreak:
        # max_by picks an arbitrary row on exact (ts, op) ties, so replays
        # of the same micro-batch could converge to different table states.
        # A content hash as the final comparator makes the winner a pure
        # function of the batch's rows (fully identical rows tie harmlessly).
        ordering = F.struct(ordering, F.xxhash64(F.to_json(row)))
    out = df.groupBy(*[F.col(k) for k in key_cols]).agg(
        F.max_by(row, ordering).alias("_last")
    )
    return out.select("_last.*")
