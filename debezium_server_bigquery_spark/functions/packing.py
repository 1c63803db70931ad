"""Training-batch assembly operators over the ``documents`` table.

- **pack_token_budget** — sequence packing: assign documents to fixed
  token-budget bins (context windows) for training-batch assembly.  The
  exact greedy first-fit pack is inherently sequential; the distributed
  form used here is quotient packing: within each pack stream (``source``),
  order documents deterministically, take the exclusive running token sum,
  and ``bin = cum_tokens div budget``.  A document may straddle a budget
  boundary (its ``bin_offset + n_tokens`` can exceed the budget) — exactly
  the "document crosses the context boundary and is split" behavior of
  real packing pipelines.  One window per pack stream; streams pack in
  parallel.  At 100 TB the stream key becomes (source, day) so no single
  window sort exceeds a partition.
- **profile_documents** — per-column dataset profile (null count, exact
  distinct count): the data-quality gate run before a training job.  Exact
  COUNT(DISTINCT) is the oracle-checkable form; at 100 TB swap in
  ``approx_count_distinct`` (see functions/sketches.py) per column.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from debezium_server_bigquery_spark.functions.text import token_count_bpeish
from debezium_server_bigquery_spark.sources.tables import load_table

TOKEN_BUDGET = 2048  # context-window token budget per packed bin


def pack_token_budget(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    sized = docs.select(
        "doc_id",
        "source",
        token_count_bpeish(F.col("text")).cast("long").alias("n_tokens"),
    )
    w = (
        Window.partitionBy("source")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    cum = F.coalesce(F.sum("n_tokens").over(w), F.lit(0).cast("long"))
    return (
        sized.withColumn("cum_tokens", cum)
        .select(
            "doc_id",
            "source",
            "n_tokens",
            F.expr(f"cum_tokens div {TOKEN_BUDGET}").alias("bin_id"),
            (F.col("cum_tokens") % TOKEN_BUDGET).alias("bin_offset"),
        )
        .orderBy("source", "doc_id")
    )


PACK_TOKEN_BUDGET_SQL = rf"""
WITH sized AS (
  SELECT doc_id, source,
    CAST(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]', 0)) AS BIGINT)
      AS n_tokens
  FROM documents
),
cum AS (
  SELECT doc_id, source, n_tokens,
    COALESCE(SUM(n_tokens) OVER (
      PARTITION BY source ORDER BY doc_id
      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum_tokens
  FROM sized
)
SELECT doc_id, source, n_tokens,
  CAST(cum_tokens // {TOKEN_BUDGET} AS BIGINT) AS bin_id,
  CAST(cum_tokens % {TOKEN_BUDGET} AS BIGINT) AS bin_offset
FROM cum
ORDER BY source, doc_id
"""


_PROFILE_COLS = ("doc_id", "text", "lang", "source", "n_chars")


def profile_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    aggs = []
    for c in _PROFILE_COLS:
        aggs.append(F.sum(F.col(c).isNull().cast("long")).alias(f"{c}__nulls"))
        aggs.append(F.count_distinct(F.col(c)).alias(f"{c}__distinct"))
    wide = docs.agg(F.count("*").alias("__total"), *aggs)
    stack_args = ", ".join(
        f"'{c}', {c}__nulls, {c}__distinct" for c in _PROFILE_COLS
    )
    return (
        wide.select(
            F.col("__total"),
            F.expr(
                f"stack({len(_PROFILE_COLS)}, {stack_args}) "
                "as (column_name, n_nulls, n_distinct)"
            ),
        )
        .select(
            "column_name", "n_nulls", "n_distinct", F.col("__total").alias("n_rows")
        )
        .orderBy("column_name")
    )


PROFILE_DOCUMENTS_SQL = " UNION ALL ".join(
    f"""
    SELECT '{c}' AS column_name,
      CAST(COUNT(*) FILTER ({c} IS NULL) AS BIGINT) AS n_nulls,
      CAST(COUNT(DISTINCT {c}) AS BIGINT) AS n_distinct,
      CAST(COUNT(*) AS BIGINT) AS n_rows
    FROM documents
    """
    for c in _PROFILE_COLS
) + " ORDER BY column_name"


_PREFIX_CHUNK = 1024  # doc_ids per local prefix-sum chunk


def pack_token_budget_scalable(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Same packing semantics as :func:`pack_token_budget`, computed as a
    distributed two-level prefix sum instead of one window sort per pack
    stream.

    A running sum ordered by doc_id cannot be two-phased like a top-N,
    but it CAN be chunked: within ``(source, doc_id div C)`` every doc_id
    precedes every doc_id of the next chunk, so

        cum = (exclusive cumsum within chunk)
            + (sum of all earlier chunks of the same source)

    The first term is a window over at most C rows; the second is a tiny
    aggregate (one row per chunk) whose own cumsum runs over chunks, not
    documents.  At 100 TB no sort ever sees more than C documents — the
    classic parallel prefix-sum, expressed in two windows Catalyst plans
    as two small exchanges.  Output is byte-identical to the single-window
    form (same oracle).
    """
    docs = load_table(spark, sf_dir, "documents")
    sized = docs.select(
        "doc_id",
        "source",
        token_count_bpeish(F.col("text")).cast("long").alias("n_tokens"),
        F.expr(f"doc_id div {_PREFIX_CHUNK}").alias("chunk"),
    )
    w_local = (
        Window.partitionBy("source", "chunk")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    local = sized.withColumn(
        "local_cum", F.coalesce(F.sum("n_tokens").over(w_local), F.lit(0).cast("long"))
    )
    chunk_totals = sized.groupBy("source", "chunk").agg(
        F.sum("n_tokens").alias("chunk_sum")
    )
    w_chunks = (
        Window.partitionBy("source")
        .orderBy("chunk")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = chunk_totals.withColumn(
        "chunk_offset",
        F.coalesce(F.sum("chunk_sum").over(w_chunks), F.lit(0).cast("long")),
    ).select("source", "chunk", "chunk_offset")
    return (
        local.join(offsets, ["source", "chunk"])
        .select(
            "doc_id",
            "source",
            "n_tokens",
            F.expr(f"(local_cum + chunk_offset) div {TOKEN_BUDGET}").alias("bin_id"),
            ((F.col("local_cum") + F.col("chunk_offset")) % TOKEN_BUDGET).alias(
                "bin_offset"
            ),
        )
        .orderBy("source", "doc_id")
    )


QUERIES = {
    "pack_token_budget": pack_token_budget,
    "pack_token_budget_scalable": pack_token_budget_scalable,
    "profile_documents": profile_documents,
}

ORACLES = {
    "pack_token_budget": PACK_TOKEN_BUDGET_SQL,
    "pack_token_budget_scalable": PACK_TOKEN_BUDGET_SQL,
    "profile_documents": PROFILE_DOCUMENTS_SQL,
}
