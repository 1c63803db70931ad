"""corpus_recipe — the composed curation pipeline, end to end.

Every stage exists as a standalone operator elsewhere in the package;
this query chains them the way a real pre-training corpus build does:

    quality filter  ->  exact dedup (first-writer)  ->  per-language cap
                    ->  per-(lang, source) corpus summary
                    |->  deterministic shard layout -> export manifest
                         (corpus_export_manifest)

The point under test is *composition*: Catalyst collapses the four
conceptual stages into scan -> project -> two hash aggregations -> one
window per language, with the tokenize computed once (staged selects,
same JIT-bloat guard as functions/text.py).  At 100 TB each stage is
the same plan shape as its standalone twin — no stage materializes an
intermediate corpus.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from debezium_server_bigquery_spark.functions.text import TOKEN_REGEX
from debezium_server_bigquery_spark.sources.tables import load_table

MIN_TOKENS = 20
MAX_PUNCT_RATIO = 0.30
PER_LANG_CAP = 200
EXPORT_SHARDS = 4


def _capped_survivors(docs: DataFrame) -> DataFrame:
    """quality filter -> exact dedup -> per-language cap: the documents a
    corpus build actually ships (columns doc_id, lang, source, n_tokens)."""
    scored = docs.select(
        "doc_id",
        "lang",
        "source",
        "text",
        # coalesce: NULL text counts as an empty document in both engines
        # (Spark size(NULL) and DuckDB len(NULL) disagree on the sentinel).
        F.size(
            F.regexp_extract_all(
                F.coalesce(F.col("text"), F.lit("")), F.lit(TOKEN_REGEX), 0
            )
        )
        .cast("long")
        .alias("n_tokens"),
        (
            F.length(F.regexp_replace(F.col("text"), r"[A-Za-z0-9\s]", ""))
            / F.greatest(F.length(F.col("text")), F.lit(1))
        ).alias("punct_ratio"),
    ).filter(
        (F.col("n_tokens") >= MIN_TOKENS) & (F.col("punct_ratio") <= MAX_PUNCT_RATIO)
    )
    # exact dedup, first-writer-wins (min doc_id per content hash)
    w_dup = Window.partitionBy(F.md5("text"))
    deduped = (
        scored.withColumn("keeper", F.min("doc_id").over(w_dup))
        .filter(F.col("doc_id") == F.col("keeper"))
        .drop("keeper", "text", "punct_ratio")
    )
    # Deterministic per-language cap, two-phase (same pattern as
    # curation.sample_stratified): phase 1 ranks within (lang, salt) so no
    # single sort sees more than ~1/SALTS of a language — a language is one
    # partition otherwise, the classic window skew at 100 TB.  Phase 1's
    # per-salt top-K is a superset of the global top-K, so phase 2 ranks
    # at most SALTS*CAP rows per language.
    salts = 16
    w1 = Window.partitionBy("lang", F.pmod(F.col("doc_id"), F.lit(salts))).orderBy(
        "doc_id"
    )
    pruned = deduped.withColumn("rk1", F.row_number().over(w1)).filter(
        F.col("rk1") <= PER_LANG_CAP
    )
    w_cap = Window.partitionBy("lang").orderBy("doc_id")
    return (
        pruned.withColumn("rk", F.row_number().over(w_cap))
        .filter(F.col("rk") <= PER_LANG_CAP)
        .select("doc_id", "lang", "source", "n_tokens")
    )


def corpus_recipe(spark: SparkSession, sf_dir: str) -> DataFrame:
    capped = _capped_survivors(load_table(spark, sf_dir, "documents", spread=True))
    return (
        capped.groupBy("lang", "source")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_tokens").alias("total_tokens"),
            F.round(
                F.avg(F.col("n_tokens").cast("decimal(18,4)")).cast("double"), 4
            ).alias("avg_tokens"),
        )
        .orderBy("lang", "source")
    )


def corpus_export_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full corpus-build terminal: recipe survivors -> deterministic
    shard layout -> per-shard export manifest (doc count, token budget,
    first doc in hash order).  Composition is the point: curation and
    export chain without materializing an intermediate corpus, and the
    shard stage adds exactly one shuffle (on shard_id) to the recipe plan.
    """
    from debezium_server_bigquery_spark.functions.sharding import assign_shards

    capped = _capped_survivors(load_table(spark, sf_dir, "documents", spread=True))
    assigned = assign_shards(capped, "doc_id", EXPORT_SHARDS)
    return (
        assigned.groupBy("shard_id")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_tokens").alias("total_tokens"),
            F.min(F.when(F.col("shard_pos") == 1, F.col("doc_id"))).alias(
                "first_doc"
            ),
        )
        .orderBy("shard_id")
    )


_RECIPE_CTES = rf"""
WITH scored AS (
  SELECT doc_id, lang, source, text,
    CAST(len(regexp_extract_all(coalesce(text, ''), '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]', 0)) AS BIGINT)
      AS n_tokens,
    len(regexp_replace(text, '[A-Za-z0-9\s]', '', 'g'))
      / greatest(len(text), 1) AS punct_ratio
  FROM documents
),
filtered AS (
  SELECT * FROM scored
  WHERE n_tokens >= {MIN_TOKENS} AND punct_ratio <= {MAX_PUNCT_RATIO}
),
deduped AS (
  SELECT * FROM (
    SELECT doc_id, lang, source, n_tokens,
           MIN(doc_id) OVER (PARTITION BY md5(text)) AS keeper
    FROM filtered
  ) WHERE doc_id = keeper
),
capped AS (
  SELECT * FROM (
    SELECT doc_id, lang, source, n_tokens,
           ROW_NUMBER() OVER (PARTITION BY lang ORDER BY doc_id) AS rk
    FROM deduped
  ) WHERE rk <= {PER_LANG_CAP}
)
"""

CORPUS_RECIPE_SQL = f"""{_RECIPE_CTES}
SELECT lang, source,
  COUNT(*) AS n_docs,
  CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
  round(CAST(AVG(CAST(n_tokens AS DECIMAL(18,4))) AS DOUBLE), 4) AS avg_tokens
FROM capped
GROUP BY lang, source
ORDER BY lang, source
"""

_H60 = "(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT)"

CORPUS_EXPORT_SQL = f"""{_RECIPE_CTES}
, assigned AS (
  SELECT n_tokens, doc_id,
    CAST({_H60} % {{n}} AS INTEGER) AS shard_id,
    CAST(ROW_NUMBER() OVER (
      PARTITION BY {_H60} % {{n}} ORDER BY {_H60}, doc_id) AS INTEGER) AS shard_pos
  FROM capped
)
SELECT shard_id,
  COUNT(*) AS n_docs,
  CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
  MIN(CASE WHEN shard_pos = 1 THEN doc_id END) AS first_doc
FROM assigned GROUP BY shard_id ORDER BY shard_id
"""


QUERIES = {
    "corpus_recipe": corpus_recipe,
    "corpus_export_manifest": corpus_export_manifest,
}
ORACLES = {
    "corpus_recipe": CORPUS_RECIPE_SQL,
    "corpus_export_manifest": CORPUS_EXPORT_SQL.format(n=4),
}
