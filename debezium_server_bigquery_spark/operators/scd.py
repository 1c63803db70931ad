"""SCD Type 2 dimension build — history-preserving upsert.

The reference applies change events destructively: its MERGE consumer keeps
only each key's last state (BaseBigqueryStorageConsumer's in-batch dedup +
MERGE upsert, mirrored by operators/merge.py / staged_upsert.py).  A data
warehouse frequently needs the *other* projection of the same stream — a
slowly-changing-dimension table where every version of a row survives with
its validity interval.  This module derives that SCD2 table from the same
ordered change stream, so a reference user gets both sinks from one source.

Shape and scale: the whole build is ONE window over the change stream —
``lead(order_col)`` partitioned by the business key with the A2 ordering
(ts, op-priority, event_id) closes each version at the next change (update
OR delete), then delete rows are dropped.  One shuffle on the key, O(1)
state per key in the window, no join, no self-join — the standard
distributed SCD2 shape that holds at 100 TB because cost is a single
key-partitioned sort, the same cost class as the MERGE dedup it parallels.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from debezium_server_bigquery_spark.operators.routing import filter_heartbeats
from debezium_server_bigquery_spark.sources.cdc import (
    cdc_synth_oracle_sql,
    synthesize_cdc_events,
)
from debezium_server_bigquery_spark.sources.tables import load_table

# A2 ordering priority (coerce.py op_priority): create < read < update < delete.
# Built lazily — Column construction needs an active SparkContext.
def _op_pri_col() -> Column:
    return (
        F.when(F.col("__op") == "c", 1)
        .when(F.col("__op") == "r", 2)
        .when(F.col("__op") == "u", 3)
        .when(F.col("__op") == "d", 4)
        .otherwise(0)
    )


def scd2_from_changes(
    changes: DataFrame,
    keys: list[str],
    order_col: str,
    op_col: str = "__op",
    delete_op: str = "d",
    tiebreak: tuple[str, ...] = ("event_id",),
) -> DataFrame:
    """Turn an ordered change stream into SCD Type 2 version rows.

    Every non-delete change opens a version valid from its own ``order_col``
    until the key's NEXT change of any kind (update closes and supersedes;
    delete closes without opening).  Adds:

    - ``valid_from`` / ``valid_to`` — interval bounds in ``order_col`` units;
      ``valid_to`` is NULL for the open (current) version.
    - ``is_current`` — ``valid_to IS NULL``.
    - ``version_num`` — 1-based per-key version counter over surviving rows.

    Ordering within a key is (order_col, op-priority, tiebreak) — identical
    to the MERGE consumer's A2 comparator, so the SCD2 table's final open
    version agrees row-for-row with the destructive upsert's final state.
    """
    order_cols: list[Column] = [F.col(order_col), _op_pri_col()]
    order_cols += [F.col(c) for c in tiebreak]
    w_all = Window.partitionBy(*keys).orderBy(*order_cols)
    versioned = changes.withColumn("valid_to", F.lead(order_col).over(w_all))
    alive = versioned.filter(F.col(op_col) != delete_op)
    # Second window runs over the already-shuffled key partitioning: Catalyst
    # reuses the exchange (same partition keys), so this costs a sort only.
    w_alive = Window.partitionBy(*keys).orderBy(*order_cols)
    return (
        alive.withColumn("valid_from", F.col(order_col))
        .withColumn("is_current", F.col("valid_to").isNull())
        .withColumn("version_num", F.row_number().over(w_alive).cast("long"))
    )


# --------------------------------------------------------------------------
# queries() entry: SCD2 user-dimension history from the synthesized CDC
# stream — the history-preserving twin of cdc_upsert_final_state.
# --------------------------------------------------------------------------
def scd2_user_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    cdc = filter_heartbeats(synthesize_cdc_events(load_table(spark, sf_dir, "events")))
    out = scd2_from_changes(
        cdc,
        keys=["user_id"],
        order_col="__source_ts_ns",
        tiebreak=("event_id",),
    )
    return out.select(
        "user_id",
        "event_id",
        "event_type",
        "value",
        "__op",
        F.col("valid_from").alias("valid_from_ns"),
        F.coalesce(F.col("valid_to"), F.lit(-1)).alias("valid_to_ns"),
        "is_current",
        "version_num",
    ).orderBy("user_id", "version_num")


_OP_PRI_SQL = (
    "CASE __op WHEN 'c' THEN 1 WHEN 'r' THEN 2 WHEN 'u' THEN 3 WHEN 'd' THEN 4 ELSE 0 END"
)

SCD2_SQL = f"""
WITH cdc AS ({cdc_synth_oracle_sql('events')}),
live AS (
  SELECT * FROM cdc
  WHERE destination NOT LIKE '\\_\\_debezium-heartbeat%' ESCAPE '\\'
),
versioned AS (
  SELECT *, LEAD(__source_ts_ns) OVER (
      PARTITION BY user_id
      ORDER BY __source_ts_ns, {_OP_PRI_SQL}, event_id) AS valid_to_raw
  FROM live
)
SELECT user_id, event_id, event_type, value, __op,
  __source_ts_ns AS valid_from_ns,
  COALESCE(valid_to_raw, -1) AS valid_to_ns,
  valid_to_raw IS NULL AS is_current,
  CAST(ROW_NUMBER() OVER (
      PARTITION BY user_id
      ORDER BY __source_ts_ns, {_OP_PRI_SQL}, event_id) AS BIGINT) AS version_num
FROM versioned
WHERE __op <> 'd'
ORDER BY user_id, version_num
"""


QUERIES = {"scd2_user_history": scd2_user_history}
ORACLES = {"scd2_user_history": SCD2_SQL}
