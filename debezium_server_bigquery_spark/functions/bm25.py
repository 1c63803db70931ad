"""BM25 full-text retrieval over the documents table.

Keyword search is the retrieval half of a training-data pipeline (targeted
corpus slicing, contamination probes, eval-set mining); TF-IDF term
profiling already exists (curation.py) — this adds the query side: score
documents against a term set with Okapi BM25 (the Lucene/Robertson
variant) and return the top-k, all as distributed column algebra.

Plan shape (scales to 100 TB) — pivoted single pass:
- ONE tokenize pass feeds ONE per-doc aggregate producing the document
  length plus a tf column per query term (the fixed small query set is a
  natural pivot) — map-side combinable, shuffle keyed on doc_id only.
- Corpus stats (N, avgdl, per-term df) are a one-row aggregate OVER that
  result, broadcast back; there is NO corpus-sized join anywhere.
- The per-doc score is a fixed left-to-right fold of per-term
  expressions, so float determinism holds by construction.
- Top-k is a global ``orderBy().limit(k)`` → TakeOrderedAndProject (per
  partition heap + driver merge of k rows), never a full sort.

Cross-engine determinism: ``ln`` can differ in the last ulp between libm
and the JVM, so ranking orders by the ROUNDED score (6 dp) with a doc_id
tie-break — the same convention as text_tfidf_top_terms.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from debezium_server_bigquery_spark.functions.dedup_fuzzy import words
from debezium_server_bigquery_spark.sources.tables import load_table

K1 = 1.2
B = 0.75
TOP_K = 20
# Fixed query for the registered entry: frequent + mid + rare-ish terms.
QUERY_TERMS = ("spark", "window", "merge", "vector")


def bm25_topk(
    docs: DataFrame,
    query_terms: tuple[str, ...],
    k: int = TOP_K,
    k1: float = K1,
    b: float = B,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Top-``k`` documents by Okapi BM25 for ``query_terms``.

    Single-pass pivoted form: ONE tokenize feeds ONE per-doc aggregate
    producing the doc length and a tf column per query term (the query is
    a fixed, small term set — a natural pivot).  Corpus stats (N, avgdl,
    per-term df) are a one-row aggregate OVER that result, broadcast back;
    the per-doc score is then a fixed left-to-right sum of per-term
    expressions — no second scan, no corpus-sized join, and a
    deterministic float fold order by construction.

    Returns (id_col, matched_terms, bm25) ordered by rounded score desc
    then id — deterministic under score ties.
    """
    toks = docs.select(
        F.col(id_col), F.explode(words(F.lower(F.col(text_col)))).alias("term")
    )
    agg = toks.groupBy(id_col).agg(
        F.count("*").alias("dl"),
        *[
            F.sum((F.col("term") == t).cast("long")).alias(f"tf_{i}")
            for i, t in enumerate(query_terms)
        ],
    )
    stats = agg.agg(
        F.count("*").alias("n_docs"),
        # exact long sum / count, never F.avg over longs (double partial
        # sums are order-dependent past 2^53 total tokens)
        (F.sum("dl").cast("double") / F.count("*")).alias("avgdl"),
        *[
            F.sum((F.col(f"tf_{i}") > 0).cast("long")).alias(f"df_{i}")
            for i in range(len(query_terms))
        ],
    )

    def _term_score(i: int):
        tf = F.col(f"tf_{i}")
        idf = F.log(
            F.lit(1.0)
            + (F.col("n_docs") - F.col(f"df_{i}") + F.lit(0.5))
            / (F.col(f"df_{i}") + F.lit(0.5))
        )
        tfn = (tf * (k1 + 1.0)) / (
            tf + k1 * (1.0 - b + b * F.col("dl") / F.col("avgdl"))
        )
        return F.when(tf > 0, idf * tfn).otherwise(F.lit(0.0))

    score = _term_score(0)
    matched = (F.col("tf_0") > 0).cast("long")
    for i in range(1, len(query_terms)):
        score = score + _term_score(i)  # fixed fold order
        matched = matched + (F.col(f"tf_{i}") > 0).cast("long")
    scored = (
        agg.crossJoin(F.broadcast(stats))
        .select(
            F.col(id_col),
            matched.alias("matched_terms"),
            F.round(score, 6).alias("bm25"),
        )
        .filter(F.col("matched_terms") > 0)
    )
    return scored.orderBy(F.desc("bm25"), F.asc(id_col)).limit(k)


# --------------------------------------------------------------------------
# queries() entry + DuckDB oracle twin.
# --------------------------------------------------------------------------
def bm25_search_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents", spread=True)
    return bm25_topk(docs, QUERY_TERMS, TOP_K)


def _bm25_sql(query_terms: tuple[str, ...], k1: float, b: float, top_k: int) -> str:
    """DuckDB twin of the pivoted single-pass plan — identical expression
    structure and fold order so every double matches bit-for-bit before
    the final round."""
    tf_cols = ",\n    ".join(
        f"CAST(SUM(CASE WHEN term = '{t}' THEN 1 ELSE 0 END) AS BIGINT) AS tf_{i}"
        for i, t in enumerate(query_terms)
    )
    df_cols = ",\n    ".join(
        f"CAST(SUM(CASE WHEN tf_{i} > 0 THEN 1 ELSE 0 END) AS BIGINT) AS df_{i}"
        for i in range(len(query_terms))
    )
    # parenthesized as idf * (num / den) — the exact association the Spark
    # side uses (tfn built first); FP multiply/divide is not associative,
    # so (idf * num) / den could differ in the last ulp and flip round(,6)
    term_scores = " + ".join(
        f"""(CASE WHEN tf_{i} > 0 THEN
      ln(1.0 + (n_docs - df_{i} + 0.5) / (df_{i} + 0.5))
      * ((tf_{i} * ({k1} + 1.0))
         / (tf_{i} + {k1} * (1.0 - {b} + {b} * dl / avgdl)))
    ELSE 0.0 END)"""
        for i in range(len(query_terms))
    )
    matched = " + ".join(
        f"CAST(CASE WHEN tf_{i} > 0 THEN 1 ELSE 0 END AS BIGINT)"
        for i in range(len(query_terms))
    )
    return rf"""
WITH toks AS (
  SELECT doc_id,
    unnest(list_filter(string_split_regex(lower(text), '\s+'), t -> t <> '')) AS term
  FROM documents
),
agg AS (
  SELECT doc_id, COUNT(*) AS dl,
    {tf_cols}
  FROM toks GROUP BY doc_id
),
stats AS (
  SELECT COUNT(*) AS n_docs,
    CAST(SUM(dl) AS DOUBLE) / COUNT(*) AS avgdl,
    {df_cols}
  FROM agg
)
SELECT doc_id,
  {matched} AS matched_terms,
  round({term_scores}, 6) AS bm25
FROM agg CROSS JOIN stats
WHERE {matched} > 0
ORDER BY bm25 DESC, doc_id ASC
LIMIT {top_k}
"""


BM25_SQL = _bm25_sql(QUERY_TERMS, K1, B, TOP_K)


QUERIES = {"bm25_search_topk": bm25_search_topk}
ORACLES = {"bm25_search_topk": BM25_SQL}
