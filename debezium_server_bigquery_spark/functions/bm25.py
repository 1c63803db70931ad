"""BM25 full-text retrieval over the documents table.

Keyword search is the retrieval half of a training-data pipeline (targeted
corpus slicing, contamination probes, eval-set mining); TF-IDF term
profiling already exists (curation.py) — this adds the query side: score
documents against a term set with Okapi BM25 (the Lucene/Robertson
variant) and return the top-k, all as distributed column algebra.

Plan shape (scales to 100 TB):
- ONE tokenize pass feeds two aggregates: per-doc length (map-side
  combinable count) and the postings for the QUERY TERMS ONLY — the
  ``isin`` filter prunes before the wide (doc, term) shuffle, so the
  expensive aggregate is proportional to query-term frequency, not corpus
  vocabulary.
- Document frequency and the (N, avgdl) scalars are tiny aggregates
  broadcast back; the only corpus-sized join is postings ⋈ doc-lengths on
  doc_id — an equi-join between two doc-keyed aggregates.
- Top-k is a global ``orderBy().limit(k)`` → TakeOrderedAndProject (per
  partition heap + driver merge of k rows), never a full sort.

Cross-engine determinism: ``ln`` can differ in the last ulp between libm
and the JVM, so ranking orders by the ROUNDED score (6 dp) with a doc_id
tie-break — the same convention as text_tfidf_top_terms.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

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

    Returns (id_col, matched_terms, bm25) ordered by rounded score desc
    then id — deterministic under score ties.
    """
    toks = docs.select(
        F.col(id_col),
        F.explode(
            F.filter(F.split(F.lower(F.col(text_col)), r"\s+"), lambda t: t != "")
        ).alias("term"),
    )
    dl = toks.groupBy(id_col).agg(F.count("*").alias("dl"))
    tf_q = (
        toks.filter(F.col("term").isin(*query_terms))
        .groupBy(id_col, "term")
        .agg(F.count("*").alias("tf"))
    )
    df_ = tf_q.groupBy("term").agg(F.count("*").alias("df"))
    stats = dl.agg(
        F.count("*").alias("n_docs"), F.avg("dl").alias("avgdl")
    )
    idf = F.log(
        F.lit(1.0)
        + (F.col("n_docs") - F.col("df") + F.lit(0.5)) / (F.col("df") + F.lit(0.5))
    )
    tfn = (F.col("tf") * (k1 + 1.0)) / (
        F.col("tf") + k1 * (1.0 - b + b * F.col("dl") / F.col("avgdl"))
    )
    scored = (
        tf_q.join(F.broadcast(df_), "term")
        .join(dl, id_col)
        .crossJoin(F.broadcast(stats))
        .groupBy(id_col)
        .agg(
            F.count("*").alias("matched_terms"),
            F.round(F.sum(idf * tfn), 6).alias("bm25"),
        )
    )
    return scored.orderBy(F.desc("bm25"), F.asc(id_col)).limit(k)


# --------------------------------------------------------------------------
# queries() entry + DuckDB oracle twin.
# --------------------------------------------------------------------------
def bm25_search_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents", spread=True)
    return bm25_topk(docs, QUERY_TERMS, TOP_K)


_TERMS_SQL = ", ".join(f"'{t}'" for t in QUERY_TERMS)

BM25_SQL = rf"""
WITH toks AS (
  SELECT doc_id,
    unnest(list_filter(string_split_regex(lower(text), '\s+'), t -> t <> '')) AS term
  FROM documents
),
dl AS (SELECT doc_id, COUNT(*) AS dl FROM toks GROUP BY doc_id),
tf_q AS (
  SELECT doc_id, term, COUNT(*) AS tf FROM toks
  WHERE term IN ({_TERMS_SQL}) GROUP BY doc_id, term
),
df AS (SELECT term, COUNT(*) AS df FROM tf_q GROUP BY term),
stats AS (SELECT COUNT(*) AS n_docs, AVG(dl) AS avgdl FROM dl)
SELECT tf_q.doc_id,
  COUNT(*) AS matched_terms,
  round(SUM(
    ln(1.0 + (stats.n_docs - df.df + 0.5) / (df.df + 0.5))
    * (tf_q.tf * ({K1} + 1.0))
      / (tf_q.tf + {K1} * (1.0 - {B} + {B} * dl.dl / stats.avgdl))
  ), 6) AS bm25
FROM tf_q
JOIN df ON tf_q.term = df.term
JOIN dl ON tf_q.doc_id = dl.doc_id
CROSS JOIN stats
GROUP BY tf_q.doc_id
ORDER BY bm25 DESC, tf_q.doc_id ASC
LIMIT {TOP_K}
"""


QUERIES = {"bm25_search_topk": bm25_search_topk}
ORACLES = {"bm25_search_topk": BM25_SQL}
