"""Distributed 2D skyline (Pareto-dominance) operator.

The skyline of a point set keeps every point not DOMINATED by another
(q dominates p iff q ≤ p in both dimensions and < in at least one) —
the classic multi-criteria shortlist (cheapest-and-smallest parts,
best price/latency suppliers).  PAPERS.md lineage: Börzsönyi et al.
ICDE'01 ("The Skyline Operator"); the sort-based 2D algorithm is a
single pass over the x-order keeping a running y-minimum.

The running minimum over a TOTAL order is the same global-window trap
the rank/prefix-sum primitives solve (operators/rank.py): a naive
``Window.orderBy`` collapses to one task.  This module uses the chunked
form instead — the same two-level shape as the scalable packer:

1. points collapse to their per-x-value y-minimum (one combinable agg);
2. x-values hash into RANGE chunks (value-derived, so chunk boundaries
   respect the x order); a local cumulative min runs per chunk;
3. per-chunk minima — O(chunks), metadata-class — collect to the
   driver, prefix-min there, and broadcast back as (chunk, carry_in):
   exactly rank.py's offset-list pattern with MIN instead of SUM.

A point survives iff its y is strictly below every strictly-cheaper
x's y-minimum, and equals its own x's y-minimum (same-x points with a
smaller y dominate; exact (x, y) duplicates co-survive — ties dominate
nobody).  All comparisons run on exact integer cents, so the skyline
membership is bit-identical across engines and partitionings.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from debezium_server_bigquery_spark.sources.tables import load_table

CHUNK_CENTS = 1_000  # $10 of price per chunk


def skyline_min2d(
    df: DataFrame, x: str, y: str, chunk_width: int
) -> DataFrame:
    """Rows of ``df`` on the minimize-(x, y) skyline; x and y must be
    integer-typed columns.  See module docstring for the chunked
    prefix-min design."""
    spark = df.sparkSession
    per_x = df.groupBy(x).agg(F.min(y).alias("__my"))
    chunked = per_x.withColumn("__chunk", (F.col(x) / chunk_width).cast("long"))
    w_local = (
        Window.partitionBy("__chunk")
        .orderBy(x)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    local = chunked.withColumn("__local_min", F.min("__my").over(w_local))
    chunk_mins = {
        r["__chunk"]: r["m"]
        # bounded-collect: O(#chunks) per-chunk minima
        for r in chunked.groupBy("__chunk").agg(F.min("__my").alias("m")).collect()
    }
    carry: dict[int, int | None] = {}
    run: int | None = None
    for c in sorted(chunk_mins):
        carry[c] = run  # strictly-earlier chunks only
        m = chunk_mins[c]
        run = m if run is None else min(run, m)
    carry_df = F.broadcast(
        spark.createDataFrame(
            [(int(c), v) for c, v in carry.items()],
            f"__chunk long, __carry_in {'long'}",
        )
    )
    frontier = (
        local.join(carry_df, "__chunk")
        .withColumn(
            "__min_before",
            F.least(
                F.coalesce(F.col("__local_min"), F.lit(None).cast("long")),
                F.coalesce(F.col("__carry_in"), F.col("__local_min")),
            ),
        )
        .filter(
            F.col("__min_before").isNull()
            | (F.col("__my") < F.col("__min_before"))
        )
        .select(x, F.col("__my").alias("__keep_y"))
    )
    return df.join(
        frontier, (df[x] == frontier[x]) & (df[y] == frontier["__keep_y"])
    ).select(df["*"])


def skyline_parts_price_size(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pareto-optimal parts minimizing (retail price, size): no other
    part is both cheaper-or-equal and smaller-or-equal with one strict.
    Price compares in exact integer cents."""
    parts = load_table(spark, sf_dir, "part").select(
        "p_partkey",
        F.round(F.col("p_retailprice") * 100, 0).cast("long").alias("cents"),
        F.col("p_size").cast("long").alias("size"),
    )
    sky = skyline_min2d(parts, "cents", "size", CHUNK_CENTS)
    return sky.select(
        "p_partkey",
        F.round(F.col("cents").cast("double") / 100.0, 2).alias("price"),
        F.col("size").cast("int").alias("p_size"),
    ).orderBy("price", "p_size", "p_partkey")


SKYLINE_PARTS_SQL = """
WITH pts AS (
  SELECT p_partkey,
    CAST(round(p_retailprice * 100, 0) AS BIGINT) AS cents,
    CAST(p_size AS BIGINT) AS size
  FROM part
),
per_x AS (SELECT cents, MIN(size) AS my FROM pts GROUP BY cents),
run AS (
  SELECT cents, my,
    MIN(my) OVER (ORDER BY cents
                  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
      AS min_before
  FROM per_x
),
frontier AS (
  SELECT cents, my FROM run
  WHERE min_before IS NULL OR my < min_before
)
SELECT p.p_partkey,
  round(CAST(p.cents AS DOUBLE) / 100.0, 2) AS price,
  CAST(p.size AS INTEGER) AS p_size
FROM pts p JOIN frontier f ON p.cents = f.cents AND p.size = f.my
ORDER BY price, p_size, p.p_partkey
"""


QUERIES = {"skyline_parts_price_size": skyline_parts_price_size}
ORACLES = {"skyline_parts_price_size": SKYLINE_PARTS_SQL}
