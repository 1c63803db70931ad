"""Routing operators R1-R6 (SURVEY §2.2).

All are single Catalyst expressions — they fuse into the surrounding
whole-stage-codegen scan, cost no shuffle, and push down to parquet when
used against stored batches.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

HEARTBEAT_PREFIX = "__debezium-heartbeat"


def filter_heartbeats(df: DataFrame, prefix: str = HEARTBEAT_PREFIX) -> DataFrame:
    """R2 — drop events whose destination starts with the heartbeat prefix
    (reference BaseChangeConsumer.java:171-173; DebeziumConfig.java:82-88)."""
    return df.filter(~F.col("destination").startswith(prefix))


def rewrite_destination(
    df: DataFrame, regexp: str = "", replace: str = ""
) -> DataFrame:
    """R3 — optional regexp rewrite then ``.`` -> ``_``
    (reference BaseChangeConsumer.getTableId :178-183; CommonConfig.java:14-18).

    The regexp enables fan-in: N physical source partitions map to one
    destination table (docs/configuration.md:5-6).
    """
    col = F.col("destination")
    if regexp:
        col = F.regexp_replace(col, regexp, replace)
    return df.withColumn("destination", F.regexp_replace(col, r"\.", "_"))


def drop_tombstones(df: DataFrame, payload_probe: str = "__op") -> DataFrame:
    """R5 — skip records with null payload (reference
    BatchRecordConverter.java:37-39, StreamRecordConverter.java:45-47).

    A tombstone has ``value == null`` before any unwrap, so every payload
    column parses null; probing the op column covers both shapes — ``__op``
    for ExtractNewRecordState-flattened events, ``op`` for full envelopes
    (nested-as-json mode runs without the unwrap SMT).  Batches with
    neither column pass through untouched.
    """
    probe = (
        payload_probe
        if payload_probe in df.columns
        else ("op" if "op" in df.columns else None)
    )
    if probe is None:
        return df
    return df.filter(F.col(probe).isNotNull())


def destinations_in(df: DataFrame) -> list[str]:
    """R1 — the distinct destinations of a micro-batch (reference groups with
    ``Collectors.groupingBy(ChangeEvent::destination)``,
    BaseChangeConsumer.java:144-145).

    Driver-side collect is safe: cardinality == number of replicated tables
    (small by construction), and the job is an agg-only scan.
    """
    # bounded-collect: O(destinations) list; see docstring
    return [r[0] for r in df.select("destination").distinct().collect()]
