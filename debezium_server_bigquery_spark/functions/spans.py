"""Exact common-span detection — the substring-dedup signal.

"Deduplicating Training Data Makes Language Models Better" (Lee et al.,
2022) removes exact substrings of >= N tokens shared across documents,
found with a suffix array.  A suffix array does not distribute; the
Spark-native equivalent is the rolling window form: every length-N word
window of every document is hashed (stride 1), and a window hash seen in
more than one document marks a shared span.  That is one shingle explode
(narrow) plus one map-side-combinable aggregation on the span hash — the
same plan shape as exact dedup, linear at 100 TB, no suffix array and no
cross-document comparison.

Two operators:

- ``text_common_spans`` — the corpus-level index: every span (as a
  hash) appearing in >= 2 distinct documents, with its document count
  and the id range it infects.  This is the removal work-list of the
  suffix-array method.
- a per-document contamination ratio could join this index back to the
  shingled documents; the existing ``text_contamination_check`` covers
  the against-benchmark variant, so only the corpus index is registered.

Span length is in WORDS (whitespace tokens), matching the shingle
tokenizer the dedup family already uses.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from debezium_server_bigquery_spark.functions.dedup_fuzzy import shingles, shingles_sql
from debezium_server_bigquery_spark.sources.tables import load_table

SPAN_WORDS = 8  # minimum span length to count as duplication


def text_common_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents", spread=True)
    spans = docs.select(
        "doc_id", F.explode(shingles(F.col("text"), SPAN_WORDS)).alias("span")
    )
    return (
        spans.groupBy(F.md5("span").alias("span_hash"))
        .agg(
            F.countDistinct("doc_id").alias("n_docs"),
            F.min("doc_id").alias("first_doc"),
            F.max("doc_id").alias("last_doc"),
        )
        .filter(F.col("n_docs") >= 2)
        .orderBy("span_hash")
    )


TEXT_COMMON_SPANS_SQL = f"""
WITH shingled AS ({shingles_sql(SPAN_WORDS)}),
exploded AS (
  SELECT doc_id, unnest(sh) AS span FROM shingled
)
SELECT md5(span) AS span_hash,
  COUNT(DISTINCT doc_id) AS n_docs,
  MIN(doc_id) AS first_doc,
  MAX(doc_id) AS last_doc
FROM exploded
GROUP BY span
HAVING COUNT(DISTINCT doc_id) >= 2
ORDER BY span_hash
"""


def text_span_dup_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document duplication ratio: the fraction of a document's
    length-N word windows that also occur in some OTHER document — the
    filter signal substring dedup acts on (drop or trim docs above a
    threshold).

    Plan: one shingle explode, one aggregation building the span->n_docs
    index, one equi-join back on the span hash, one per-doc aggregation.
    Both shuffles key on high-cardinality hashes; no document ever meets
    another document directly.
    """
    docs = load_table(spark, sf_dir, "documents", spread=True)
    spans = docs.select(
        "doc_id", F.explode(shingles(F.col("text"), SPAN_WORDS)).alias("span")
    ).withColumn("span_hash", F.md5("span")).drop("span")
    index = spans.groupBy("span_hash").agg(
        F.countDistinct("doc_id").alias("n_docs")
    )
    joined = spans.join(index, "span_hash")
    return (
        joined.groupBy("doc_id")
        .agg(
            F.count("*").alias("n_spans"),
            F.sum(F.when(F.col("n_docs") >= 2, 1).otherwise(0)).alias("n_shared"),
        )
        .select(
            "doc_id",
            "n_spans",
            F.col("n_shared").cast("long").alias("n_shared"),
            F.round(F.col("n_shared") / F.col("n_spans"), 6).alias("dup_ratio"),
        )
        .orderBy("doc_id")
    )


TEXT_SPAN_DUP_RATIO_SQL = f"""
WITH shingled AS ({shingles_sql(SPAN_WORDS)}),
spans AS (
  SELECT doc_id, md5(unnest(sh)) AS span_hash FROM shingled
),
idx AS (
  SELECT span_hash, COUNT(DISTINCT doc_id) AS n_docs FROM spans GROUP BY span_hash
)
SELECT s.doc_id,
  COUNT(*) AS n_spans,
  CAST(SUM(CASE WHEN i.n_docs >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_shared,
  round(SUM(CASE WHEN i.n_docs >= 2 THEN 1 ELSE 0 END) / COUNT(*), 6) AS dup_ratio
FROM spans s JOIN idx i USING (span_hash)
GROUP BY s.doc_id
ORDER BY s.doc_id
"""


QUERIES = {
    "text_common_spans": text_common_spans,
    "text_span_dup_ratio": text_span_dup_ratio,
}
ORACLES = {
    "text_common_spans": TEXT_COMMON_SPANS_SQL,
    "text_span_dup_ratio": TEXT_SPAN_DUP_RATIO_SQL,
}
