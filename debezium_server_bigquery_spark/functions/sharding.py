"""Deterministic shard export — the terminal step of a training-data
pipeline.

A curated corpus ships as N shard files whose assignment and internal
order must be reproducible run-to-run (resumable exports, stable data
ordering for training-loss comparisons).  Both are derived from one
md5-based 60-bit hash of the document id — identical in Spark and DuckDB,
so the whole layout is oracle-checkable:

- ``shard_id = h % n_shards`` — uniform, key-stable placement; no
  coordination, no driver state.
- ``shard_pos = row_number() over (partition by shard_id order by h,
  doc_id)`` — a deterministic pseudo-random permutation *within* each
  shard (hash order == shuffled order), which is exactly the "global
  shuffle" training wants, without any global sort.

Scale shape (100 TB): one shuffle on ``shard_id`` and a per-shard sort —
physically identical to the ``repartition(n_shards).sortWithinPartitions``
the parquet/WebDataset writer needs anyway, so the plan IS the write plan.
``n_shards`` is chosen so one shard ≈ one output file (thousands at real
scale); per-shard data then fits an executor and the window sort never
sees more than one shard.  No global ordering across shards is promised —
that would need a total sort; consumers read shards independently.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from debezium_server_bigquery_spark.sources.tables import load_table

N_SHARDS = 8


def shard_hash(key: Column) -> Column:
    """60-bit md5-derived hash of the key's string form (cross-engine)."""
    return F.conv(F.substring(F.md5(key.cast("string")), 1, 15), 16, 10).cast("long")


def _shard_hash_sql(expr: str) -> str:
    return f"(('0x' || substr(md5(CAST({expr} AS VARCHAR)), 1, 15))::BIGINT)"


def assign_shards(
    df: DataFrame, key_col: str = "doc_id", n_shards: int = N_SHARDS
) -> DataFrame:
    """Add ``shard_id`` and ``shard_pos`` (1-based hash-order position
    within the shard) to ``df``.  Deterministic in the key alone."""
    if n_shards < 1:
        raise ValueError(f"n_shards must be >= 1, got {n_shards}")
    h = shard_hash(F.col(key_col))
    out = df.withColumn("__h", h).withColumn(
        "shard_id", F.pmod(F.col("__h"), F.lit(n_shards)).cast("int")
    )
    w = Window.partitionBy("shard_id").orderBy("__h", key_col)
    return out.withColumn("shard_pos", F.row_number().over(w)).drop("__h")


def export_shards(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document shard assignment over ``documents``: where each doc
    lands and in which within-shard (shuffled) position.

    The final ``orderBy`` is presentation-only (deterministic graded
    output); the physical export writes ``partitionBy(shard_id)`` +
    ``sortWithinPartitions(shard_pos)`` — no global sort at any scale."""
    docs = load_table(spark, sf_dir, "documents")
    return (
        assign_shards(docs, "doc_id", N_SHARDS)
        .select("doc_id", "shard_id", "shard_pos")
        .orderBy("shard_id", "shard_pos")
    )


def shard_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One row per shard: document count, byte budget (sum of n_chars),
    and the first document in hash order — the export's integrity/resume
    manifest (a re-run must reproduce it exactly)."""
    docs = load_table(spark, sf_dir, "documents")
    assigned = assign_shards(docs, "doc_id", N_SHARDS)
    return (
        assigned.groupBy("shard_id")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_chars").alias("total_chars"),
            F.min(F.when(F.col("shard_pos") == 1, F.col("doc_id"))).alias(
                "first_doc"
            ),
        )
        .orderBy("shard_id")
    )


_ASSIGNED_CTE = f"""
WITH assigned AS (
  SELECT doc_id, n_chars,
    CAST({_shard_hash_sql("doc_id")} % {N_SHARDS} AS INTEGER) AS shard_id,
    CAST(ROW_NUMBER() OVER (
      PARTITION BY {_shard_hash_sql("doc_id")} % {N_SHARDS}
      ORDER BY {_shard_hash_sql("doc_id")}, doc_id) AS INTEGER) AS shard_pos
  FROM documents
)
"""

EXPORT_SHARDS_SQL = f"""{_ASSIGNED_CTE}
SELECT doc_id, shard_id, shard_pos
FROM assigned ORDER BY shard_id, shard_pos
"""

SHARD_MANIFEST_SQL = f"""{_ASSIGNED_CTE}
SELECT shard_id,
  COUNT(*) AS n_docs,
  CAST(SUM(n_chars) AS BIGINT) AS total_chars,
  MIN(CASE WHEN shard_pos = 1 THEN doc_id END) AS first_doc
FROM assigned GROUP BY shard_id ORDER BY shard_id
"""


QUERIES = {"export_shards": export_shards, "shard_manifest": shard_manifest}

ORACLES = {
    "export_shards": EXPORT_SHARDS_SQL,
    "shard_manifest": SHARD_MANIFEST_SQL,
}
