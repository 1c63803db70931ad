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




# --------------------------------------------------------------------------
# Retrieval quality eval: self-retrieval MRR.
# --------------------------------------------------------------------------
N_PROBES = 20  # lowest doc_ids form the query set
QUERY_LEN = 6  # first distinct terms of each probe doc become its query


def retrieval_self_mrr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Self-retrieval eval for the BM25 ranker: each probe document's
    first ``QUERY_LEN`` distinct terms become a query, the full corpus is
    ranked, and the probe's own rank is reported with its reciprocal
    rank — the standard MRR probe (a ranker that cannot find a document
    from its own opening words is broken; rank distribution >> 1 flags
    boilerplate-dominated corpora).  Follows EVALS.md: the exact ranker
    IS the system under test, the relevance oracle is identity.

    Scale design (100 TB): the query set is O(probes·terms) and
    broadcasts everywhere; corpus postings are filtered BY that broadcast
    *before* the per-(doc, term) aggregate, so the candidate set is the
    union of ≤ ``N_PROBES × QUERY_LEN`` posting lists, never the corpus;
    doc lengths and corpus stats are one map-side aggregate (avgdl is a
    one-row broadcast).  Rank is counted per query against the probe's
    own row (a ≤-candidates equi-join on qid), not a global sort.

    Cross-engine determinism: each term's score rounds to 12 dp and
    accumulates in DECIMAL(38,12) — an order-independent exact sum, so
    data-dependent aggregation order cannot wobble ranks; ties break on
    doc_id (same convention as ``bm25_search_topk``).
    """
    docs = load_table(spark, sf_dir, "documents", spread=True)
    toks = docs.select(
        "doc_id",
        F.posexplode(words(F.lower(F.col("text")))).alias("pos", "term"),
    )
    from pyspark.sql.window import Window

    probe_ids = docs.select("doc_id").orderBy("doc_id").limit(N_PROBES)
    probe_toks = toks.join(
        F.broadcast(probe_ids.withColumnRenamed("doc_id", "qid")),
        toks["doc_id"] == F.col("qid"),
    ).select("qid", "pos", "term")
    first_pos = probe_toks.groupBy("qid", "term").agg(
        F.min("pos").alias("fpos")
    )
    wq = Window.partitionBy("qid").orderBy("fpos", "term")
    qterms = (
        first_pos.withColumn("qrank", F.row_number().over(wq))
        .filter(F.col("qrank") <= QUERY_LEN)
        .select("qid", "term")
    )
    # corpus-side: postings restricted to query terms BEFORE aggregation
    cand_toks = toks.join(
        F.broadcast(qterms.select("term").distinct()), "term"
    )
    postings = cand_toks.groupBy("doc_id", "term").agg(
        F.count(F.lit(1)).cast("long").alias("tf")
    )
    dl = toks.groupBy("doc_id").agg(F.count(F.lit(1)).cast("long").alias("dl"))
    stats = dl.agg(
        F.count(F.lit(1)).alias("n_docs"),
        (F.sum("dl").cast("double") / F.count(F.lit(1))).alias("avgdl"),
    )
    dfreq = postings.groupBy("term").agg(
        F.count(F.lit(1)).cast("long").alias("df")
    )
    idf = F.log(
        F.lit(1.0)
        + (F.col("n_docs") - F.col("df") + F.lit(0.5)) / (F.col("df") + F.lit(0.5))
    )
    tfn = (F.col("tf") * (K1 + 1.0)) / (
        F.col("tf") + K1 * (1.0 - B + B * F.col("dl") / F.col("avgdl"))
    )
    scored = (
        qterms.join(postings, "term")
        .join(dl.hint("shuffle_hash"), "doc_id")
        .join(F.broadcast(dfreq), "term")
        .crossJoin(F.broadcast(stats))
        .select(
            "qid",
            "doc_id",
            F.round(idf * tfn, 12).cast("decimal(38,12)").alias("tscore"),
        )
        .groupBy("qid", "doc_id")
        .agg(F.sum("tscore").alias("score"))
    )
    self_rows = scored.filter(F.col("qid") == F.col("doc_id")).select(
        F.col("qid").alias("p_qid"),
        F.col("score").alias("p_score"),
    )
    ranked = (
        scored.join(
            F.broadcast(self_rows), scored["qid"] == self_rows["p_qid"]
        )
        .groupBy("qid")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_candidates"),
            (
                F.lit(1)
                + F.sum(
                    (
                        (F.col("score") > F.col("p_score"))
                        | (
                            (F.col("score") == F.col("p_score"))
                            & (F.col("doc_id") < F.col("qid"))
                        )
                    ).cast("long")
                )
            )
            .cast("long")
            .alias("self_rank"),
        )
    )
    return ranked.select(
        "qid",
        "n_candidates",
        "self_rank",
        F.round(F.lit(1.0) / F.col("self_rank").cast("double"), 6).alias("rr"),
    ).orderBy("qid")


RETRIEVAL_MRR_SQL = rf"""
WITH toks AS (
  SELECT doc_id, r.i - 1 AS pos, d.w[r.i] AS term
  FROM (SELECT doc_id,
          list_filter(string_split_regex(lower(text), '\s+'), t -> t <> '') AS w
        FROM documents) d,
  UNNEST(range(1, len(d.w) + 1)) AS r(i)
),
probe_ids AS (
  SELECT doc_id AS qid FROM documents ORDER BY doc_id LIMIT {N_PROBES}
),
first_pos AS (
  SELECT p.qid, t.term, MIN(t.pos) AS fpos
  FROM toks t JOIN probe_ids p ON t.doc_id = p.qid
  GROUP BY p.qid, t.term
),
qterms AS (
  SELECT qid, term FROM (
    SELECT qid, term,
      ROW_NUMBER() OVER (PARTITION BY qid ORDER BY fpos, term) AS qrank
    FROM first_pos
  ) WHERE qrank <= {QUERY_LEN}
),
postings AS (
  SELECT t.doc_id, t.term, CAST(COUNT(*) AS BIGINT) AS tf
  FROM toks t
  WHERE t.term IN (SELECT DISTINCT term FROM qterms)
  GROUP BY t.doc_id, t.term
),
dl AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS dl FROM toks GROUP BY doc_id),
stats AS (
  SELECT COUNT(*) AS n_docs, CAST(SUM(dl) AS DOUBLE) / COUNT(*) AS avgdl
  FROM dl
),
dfreq AS (SELECT term, CAST(COUNT(*) AS BIGINT) AS df FROM postings GROUP BY term),
scored AS (
  SELECT q.qid, p.doc_id,
    SUM(CAST(round(
      ln(1.0 + (s.n_docs - f.df + 0.5) / (f.df + 0.5))
      * ((p.tf * ({K1} + 1.0))
         / (p.tf + {K1} * (1.0 - {B} + {B} * l.dl / s.avgdl))), 12)
      AS DECIMAL(38,12))) AS score
  FROM qterms q
  JOIN postings p ON p.term = q.term
  JOIN dl l ON l.doc_id = p.doc_id
  JOIN dfreq f ON f.term = p.term
  CROSS JOIN stats s
  GROUP BY q.qid, p.doc_id
)
SELECT s.qid,
  CAST(COUNT(*) AS BIGINT) AS n_candidates,
  CAST(1 + SUM(CASE WHEN s.score > p.p_score
                     OR (s.score = p.p_score AND s.doc_id < s.qid)
               THEN 1 ELSE 0 END) AS BIGINT) AS self_rank,
  round(1.0 / CAST(1 + SUM(CASE WHEN s.score > p.p_score
                     OR (s.score = p.p_score AND s.doc_id < s.qid)
               THEN 1 ELSE 0 END) AS DOUBLE), 6) AS rr
FROM scored s
JOIN (SELECT qid AS p_qid, score AS p_score FROM scored WHERE qid = doc_id) p
  ON s.qid = p.p_qid
GROUP BY s.qid
ORDER BY s.qid
"""


QUERIES = {
    "bm25_search_topk": bm25_search_topk,
    "retrieval_self_mrr": retrieval_self_mrr,
}
ORACLES = {
    "bm25_search_topk": BM25_SQL,
    "retrieval_self_mrr": RETRIEVAL_MRR_SQL,
}
