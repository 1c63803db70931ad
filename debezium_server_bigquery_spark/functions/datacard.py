"""Per-source dataset datacard — the "datasheet" a corpus curator
publishes per provenance slice: volume, length profile, language mix,
and exact-duplication rate in one report.

Plan shape: two map-side-combinable aggregates over one scan subtree —
per-source stats (counts, char sums, distinct langs/hashes) and the
(source, lang) counts whose per-source argmax yields the dominant
language — joined on the source key.  Output is O(sources) rows; every
float is a rounded ratio/mean of exact integers.  The distinct-hash
count is the one shuffle-heavy term; at 100 TB swap in HLL from
sketches.py when an approximate dup-rate is acceptable (the same trade
the constraint suite documents for `unique`).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from debezium_server_bigquery_spark.sources.tables import load_table


def dataset_datacard(spark: SparkSession, sf_dir: str) -> DataFrame:
    # spread: the md5 over full text is the CPU-heavy narrow stage the
    # flag exists for on single-split test layouts
    docs = load_table(spark, sf_dir, "documents", spread=True)
    base = docs.select(
        "source", "lang", "n_chars", F.md5("text").alias("th")
    )
    per_source = base.groupBy("source").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_chars").alias("total_chars"),
        # exact long sum / count — F.avg's double partial sums are
        # order-dependent past 2^53 total chars
        F.round(F.sum("n_chars").cast("double") / F.count("*"), 6).alias(
            "avg_chars"
        ),
        F.countDistinct("lang").alias("n_langs"),
        F.countDistinct("th").alias("n_unique_texts"),
    )
    lang_counts = base.groupBy("source", "lang").agg(F.count("*").alias("n"))
    # dominant language: argmax by count, ties to the lexicographically
    # LARGER lang (struct max semantics, mirrored by ORDER BY n DESC,
    # lang DESC in the twin)
    top_lang = (
        lang_counts.groupBy("source")
        .agg(F.max(F.struct(F.col("n"), F.col("lang"))).alias("m"))
        .select(
            "source",
            F.col("m.lang").alias("top_lang"),
            F.col("m.n").alias("top_lang_docs"),
        )
    )
    return (
        per_source.join(top_lang, "source")
        .select(
            "source",
            "n_docs",
            "total_chars",
            "avg_chars",
            "n_langs",
            "top_lang",
            "top_lang_docs",
            F.round(
                F.lit(1.0) - F.col("n_unique_texts") / F.col("n_docs"), 6
            ).alias("dup_ratio"),
        )
        .orderBy("source")
    )


DATACARD_SQL = """
WITH base AS (
  SELECT source, lang, n_chars, md5(text) AS th FROM documents
),
per_source AS (
  SELECT source, COUNT(*) AS n_docs,
    CAST(SUM(n_chars) AS BIGINT) AS total_chars,
    round(CAST(SUM(n_chars) AS DOUBLE) / COUNT(*), 6) AS avg_chars,
    COUNT(DISTINCT lang) AS n_langs,
    COUNT(DISTINCT th) AS n_unique_texts
  FROM base GROUP BY source
),
lang_counts AS (
  SELECT source, lang, COUNT(*) AS n FROM base GROUP BY source, lang
),
top_lang AS (
  SELECT source, lang AS top_lang, n AS top_lang_docs FROM (
    SELECT *, ROW_NUMBER() OVER (
        PARTITION BY source ORDER BY n DESC, lang DESC) AS rn
    FROM lang_counts
  ) WHERE rn = 1
)
SELECT p.source, p.n_docs, p.total_chars, p.avg_chars, p.n_langs,
  t.top_lang, t.top_lang_docs,
  round(1.0 - p.n_unique_texts / CAST(p.n_docs AS DOUBLE), 6) AS dup_ratio
FROM per_source p JOIN top_lang t ON p.source = t.source
ORDER BY p.source
"""


QUERIES = {"dataset_datacard": dataset_datacard}
ORACLES = {"dataset_datacard": DATACARD_SQL}
