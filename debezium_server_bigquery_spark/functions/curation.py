"""Corpus-curation operators: stratified sampling and vocabulary building.

Training-data pipelines sample corpora by stratum (language, source,
quality bucket) and build token vocabularies before tokenizer training.
Both are single-shuffle plans of pure ``pyspark.sql.functions`` column
algebra with DuckDB oracle twins (no reference analog — the reference
replicates tables 1:1; these are the LLM-pipeline extensions the engine
adds on top, same family as functions/text.py).

Determinism: sampling uses the md5-derived 60-bit hash (identical in both
engines) as the random key, so "random" sampling is reproducible and
oracle-checkable — exactly how production pipelines make sampling
re-runnable across engine versions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from debezium_server_bigquery_spark.functions.dedup_fuzzy import _hash60_sql, hash60
from debezium_server_bigquery_spark.sources.tables import load_table

SAMPLE_PER_STRATUM = 50
VOCAB_TOP_K = 50


def sample_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic stratified sample: top ``SAMPLE_PER_STRATUM`` docs per
    language, ordered by a salted content-independent hash of the doc id.

    Scale shape: ONE shuffle (hash-partition by stratum), then a per-group
    rank.  The hash key makes the sample uniform-at-random but replayable.
    For pathologically hot strata the window sort is the textbook
    pre-aggregation target (two-phase: per-partition local top-N, then
    global top-N); Spark's rank-over-window is the standard single-pass
    form and AQE splits skewed partitions.
    """
    docs = load_table(spark, sf_dir, "documents")
    keyed = docs.select(
        "doc_id",
        "lang",
        "source",
        hash60(F.concat(F.lit("sample:"), F.col("doc_id"))).alias("rk"),
    )
    w = Window.partitionBy("lang").orderBy("rk", "doc_id")
    return (
        keyed.withColumn("sample_rank", F.row_number().over(w))
        .filter(F.col("sample_rank") <= SAMPLE_PER_STRATUM)
        .select("doc_id", "lang", "source", "sample_rank")
        .orderBy("lang", "sample_rank")
    )


SAMPLE_STRATIFIED_SQL = f"""
WITH keyed AS (
  SELECT doc_id, lang, source,
    {_hash60_sql("'sample:' || doc_id")} AS rk
  FROM documents
),
ranked AS (
  SELECT doc_id, lang, source,
    ROW_NUMBER() OVER (PARTITION BY lang ORDER BY rk, doc_id) AS sample_rank
  FROM keyed
)
SELECT doc_id, lang, source, CAST(sample_rank AS INTEGER) AS sample_rank
FROM ranked WHERE sample_rank <= {SAMPLE_PER_STRATUM}
ORDER BY lang, sample_rank
"""


def vocab_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global vocabulary head: top-K terms by document frequency.

    Document frequency (distinct docs containing the term), not raw count:
    ``array_distinct`` per doc before the explode keeps the aggregate a
    plain COUNT(*) — map-side combinable — instead of a COUNT(DISTINCT).
    The global top-K is an orderBy+limit, which Spark executes as
    TakeOrderedAndProject (per-partition top-K, tiny driver merge) — no
    full sort at any scale.
    """
    docs = load_table(spark, sf_dir, "documents", spread=True)
    terms = docs.select(
        F.explode(
            F.array_distinct(
                F.filter(F.split(F.lower(F.col("text")), r"\s+"), lambda t: t != "")
            )
        ).alias("term")
    )
    return (
        terms.groupBy("term")
        .agg(F.count("*").alias("doc_freq"))
        .orderBy(F.desc("doc_freq"), F.asc("term"))
        .limit(VOCAB_TOP_K)
    )


VOCAB_TOP_TERMS_SQL = rf"""
WITH terms AS (
  SELECT unnest(list_distinct(
           list_filter(string_split_regex(lower(text), '\s+'), t -> t <> ''))) AS term
  FROM documents
)
SELECT term, COUNT(*) AS doc_freq
FROM terms GROUP BY term
ORDER BY doc_freq DESC, term ASC
LIMIT {VOCAB_TOP_K}
"""


QUERIES = {
    "sample_stratified": sample_stratified,
    "vocab_top_terms": vocab_top_terms,
}

ORACLES = {
    "sample_stratified": SAMPLE_STRATIFIED_SQL,
    "vocab_top_terms": VOCAB_TOP_TERMS_SQL,
}
