"""Distributed exact global ranking.

``Window.orderBy`` without a partition key collapses to a SINGLE task —
the textbook global-sort bottleneck.  This primitive computes the exact
same ``row_number`` over a total order at cluster scale:

1. ``repartitionByRange`` on the order columns (a distributed range
   sort — boundaries are sampled, which only moves WHERE partition
   splits fall, never the total order, so the result is deterministic);
2. local ``row_number`` within each range partition;
3. global rank = local rank + the cumulative row count of all earlier
   partitions — an O(num_partitions) driver-side offset list, the same
   metadata class as merge's bucket list.

The order columns must form a total order (append a unique tiebreak);
otherwise ranks of ties would depend on partition placement.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def global_row_number(
    df: DataFrame, order_cols: list[Column], out: str = "rank"
) -> DataFrame:
    """Exact 1-based global row_number over ``order_cols`` without a
    single-partition window."""
    spark = df.sparkSession
    n_parts = max(2, spark.sparkContext.defaultParallelism)
    # localCheckpoint: the range partitioner SAMPLES to pick boundaries, so
    # recomputing the lineage for the counts action and the final plan
    # could place splits differently and mismatch the offsets — materialize
    # the ranged layout once and let both consumers read it.
    ranged = (
        df.repartitionByRange(n_parts, *order_cols)
        .withColumn("__pid", F.spark_partition_id())
        .localCheckpoint()
    )
    # O(num_partitions) rows to the driver — metadata, not data
    counts = {
        r["__pid"]: r["cnt"]
        for r in ranged.groupBy("__pid").agg(F.count("*").alias("cnt")).collect()
    }
    offsets, acc = {}, 0
    for pid in sorted(counts):
        offsets[pid] = acc
        acc += counts[pid]
    offset_col = F.coalesce(
        *[
            F.when(F.col("__pid") == pid, F.lit(off))
            for pid, off in sorted(offsets.items())
        ],
        F.lit(0),
    ) if offsets else F.lit(0)
    w = Window.partitionBy("__pid").orderBy(*order_cols)
    return (
        ranged.withColumn(
            out, (F.row_number().over(w).cast("long") + offset_col).cast("long")
        )
        .drop("__pid")
    )
