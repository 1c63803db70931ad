"""Statistical n-gram language model + likelihood-based quality filtering.

The classic corpus-curation step the reference has no analog for: train a
word-bigram model with add-one smoothing over the documents corpus, then
score every document by its mean bigram likelihood under that model —
low-likelihood documents are statistical outliers (boilerplate, wrong
language, mangled encodings), the same filtering read as CCNet-style
perplexity pruning.  Both steps are pure DataFrame column algebra: one
tokenize pass, one explode to adjacent pairs, hash-keyed count joins.

Scale design (100 TB): the LM lives as a DataFrame keyed on the bigram —
never collected, and the scoring join carries an explicit
``shuffle_hash`` hint so the corpus-sized LM frame is never broadcast
either (without the hint AQE may pick broadcast at toy SF, which would
be a scale-killer shape if trusted; the hint makes the documented
behavior the guaranteed one).  Scoring joins documents' bigrams against
it on the (a, b) hash key, and contexts on the a key — shuffle joins AQE
can skew-split (stop words make "the"-keyed rows heavy).  The only
broadcasts are one-row aggregates (vocabulary size).  Top-k outputs
compile to TakeOrderedAndProject — no global sort, no single-task
window.

Cross-engine determinism (hash gate holds without tolerance): the score
avoids transcendentals entirely — log/exp differ in the last ulp between
libm implementations, so instead of log-perplexity the filter ranks by
the MEAN smoothed bigram probability.  Each probability is one IEEE
double division of exact integers (correctly rounded, bit-identical in
Spark and DuckDB); the per-document mean casts each term to
DECIMAL(25,15) before summing (exact, associative — the PageRank
contribution pattern, functions/graph.py) and rounds the final ratio.

Lineage note (round 7 closed the triple scan; round 8 closed the cache
lifetime): both query entry points materialize the tokenized frame ONCE
through ``checkpoint_parquet`` — documents.text is scanned + tokenized
exactly once per query run, and the LM-count branch, the probe branch,
and the vocabulary aggregate all scan the materialized token arrays.
Round 7 used ``persist()`` here, which stranded a corpus-sized
``InMemoryRelation`` per invocation (no safe in-function unpersist point:
the caller materializes the returned frame outside the function); the
scratch-parquet checkpoint leaves nothing in executor memory and is the
shape a 100 TB run needs anyway — a token corpus does not fit a memory
cache, a checkpoint table is the real-world substrate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast

from debezium_server_bigquery_spark.sources.tables import (
    checkpoint_parquet,
    load_table,
)

TOP_BIGRAMS = 30
BOTTOM_DOCS = 25


def _doc_tokens(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(doc_id, lang, toks array<string>) — lowercased, whitespace-split,
    empties dropped BEFORE pairing so adjacency is over real tokens.

    NOTE: functions/text.py::text_bigram_perplexity keeps its own smaller
    inline bigram machinery with different smoothing (a per-doc
    diagnostic, graded since round 3, its oracle frozen); this module is
    the corpus-LM form.  Tokenization here must stay consistent with
    ``words()``/whitespace splitting used across the text family."""
    return docs.select(
        "doc_id",
        "lang",
        F.expr(f"filter(split(lower({text_col}), '\\\\s+'), x -> x <> '')").alias(
            "toks"
        ),
    )


def _doc_bigrams(toks: DataFrame) -> DataFrame:
    """Explode each document's token list to adjacent (a, b) pairs — a
    narrow per-row fan-out (n-1 pairs per n-token doc), no shuffle.
    ``lang`` rides along (constant per doc) so consumers never need a
    corpus-sized join back to documents."""
    return (
        toks.filter(F.size("toks") >= 2)
        .select(
            "doc_id",
            "lang",
            F.explode(
                F.expr(
                    "transform(sequence(1, size(toks) - 1), "
                    "i -> struct(element_at(toks, i) as a, "
                    "element_at(toks, i + 1) as b))"
                )
            ).alias("p"),
        )
        .select("doc_id", "lang", "p.a", "p.b")
    )


def bigram_lm(toks: DataFrame) -> DataFrame:
    """(a, b, cnt, prob) — add-one-smoothed conditional probability
    P(b|a) = (c(a,b) + 1) / (c(a) + V), c(a) the bigram-context count and
    V the corpus vocabulary size (one-row broadcast)."""
    bigrams = _doc_bigrams(toks)
    c_ab = bigrams.groupBy("a", "b").agg(F.count("*").alias("cnt"))
    c_a = c_ab.groupBy("a").agg(F.sum("cnt").alias("ctx"))
    vocab = toks.select(F.explode("toks").alias("w")).agg(
        F.countDistinct("w").alias("v")
    )
    return (
        c_ab.join(c_a, "a")  # hash join on the context key
        .crossJoin(broadcast(vocab))
        .select(
            "a",
            "b",
            "cnt",
            # one IEEE division of exact integers — bit-identical cross-engine
            ((F.col("cnt") + 1) / (F.col("ctx") + F.col("v"))).alias("prob"),
        )
    )


def lm_bigram_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The trained LM's head: top bigrams by count (ties on words)."""
    docs = load_table(spark, sf_dir, "documents", spread=True)
    # one scan of documents.text: both bigram_lm branches (pair counts,
    # vocabulary) scan the checkpointed token arrays — no lingering cache
    lm = bigram_lm(checkpoint_parquet(_doc_tokens(docs), "dsbq_lm_toks_"))
    return (
        lm.select("a", "b", "cnt", F.round("prob", 9).alias("prob"))
        .orderBy(F.desc("cnt"), F.asc("a"), F.asc("b"))
        .limit(TOP_BIGRAMS)
    )


LM_BIGRAM_TOPK_SQL = r"""
WITH toks AS (
  SELECT doc_id, lang,
    list_filter(regexp_split_to_array(lower(text), '\s+'), x -> x <> '') AS toks
  FROM documents
), bg AS (
  SELECT doc_id, toks[i] AS a, toks[i + 1] AS b
  FROM toks, UNNEST(range(1, len(toks))) AS r(i)
), c_ab AS (
  SELECT a, b, COUNT(*) AS cnt FROM bg GROUP BY a, b
), c_a AS (
  SELECT a, CAST(SUM(cnt) AS BIGINT) AS ctx FROM c_ab GROUP BY a
), v AS (
  SELECT COUNT(DISTINCT w) AS v FROM toks, UNNEST(toks) AS u(w)
)
SELECT a, b, cnt, round((cnt + 1) / CAST(ctx + v AS DOUBLE), 9) AS prob
FROM c_ab JOIN c_a USING (a), v
ORDER BY cnt DESC, a ASC, b ASC LIMIT 30
"""


def doc_lm_scores(toks: DataFrame) -> DataFrame:
    """(doc_id, lang, n_bigrams, mean_prob) for every document with >= 2
    tokens — the corpus-LM likelihood score, shared by the bottom-k
    filter and the rank-fusion blender.  lang is carried through the
    bigram frame (constant per doc) and grouped alongside doc_id — NO
    join back to the corpus-cardinality documents table, which would
    otherwise need a broadcast or shuffle of one row per document."""
    lm = bigram_lm(toks)
    return (
        _doc_bigrams(toks)
        # bigram-keyed join; shuffle_hash forbids a corpus-sized broadcast
        # of the LM frame (AQE would pick one at toy SF and lie about the
        # 100 TB shape)
        .join(lm.select("a", "b", "prob").hint("shuffle_hash"), ["a", "b"])
        .groupBy("doc_id", "lang")
        .agg(
            F.count("*").alias("n_bigrams"),
            # decimal-cast terms: exact associative sum (graph.py pattern)
            F.sum(F.col("prob").cast("decimal(25,15)")).alias("psum"),
        )
        .select(
            "doc_id",
            "lang",
            "n_bigrams",
            F.round(
                (F.col("psum").cast("double") / F.col("n_bigrams")), 9
            ).alias("mean_prob"),
        )
    )


def doc_lm_quality_bottomk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Likelihood-based quality filter: the documents whose bigrams are
    LEAST probable under the corpus's own bigram LM — the removal
    candidates a perplexity filter would surface.  Documents with fewer
    than two tokens have no bigrams and are not scored."""
    docs = load_table(spark, sf_dir, "documents", spread=True)
    # one scan of documents.text: LM counts, vocab, and the probe side all
    # scan the checkpointed token arrays (round-7 fixed the triple scan;
    # round-8 swaps the leaky persist for the scratch-parquet checkpoint)
    scored = doc_lm_scores(
        checkpoint_parquet(_doc_tokens(docs), "dsbq_lm_toks_")
    )
    return scored.orderBy(F.asc("mean_prob"), F.asc("doc_id")).limit(BOTTOM_DOCS)


DOC_LM_QUALITY_SQL = r"""
WITH toks AS (
  SELECT doc_id, lang,
    list_filter(regexp_split_to_array(lower(text), '\s+'), x -> x <> '') AS toks
  FROM documents
), bg AS (
  SELECT doc_id, lang, toks[i] AS a, toks[i + 1] AS b
  FROM toks, UNNEST(range(1, len(toks))) AS r(i)
), c_ab AS (
  SELECT a, b, COUNT(*) AS cnt FROM bg GROUP BY a, b
), c_a AS (
  SELECT a, CAST(SUM(cnt) AS BIGINT) AS ctx FROM c_ab GROUP BY a
), v AS (
  SELECT COUNT(DISTINCT w) AS v FROM toks, UNNEST(toks) AS u(w)
), lm AS (
  SELECT a, b, (cnt + 1) / CAST(ctx + v AS DOUBLE) AS prob
  FROM c_ab JOIN c_a USING (a), v
)
SELECT bg.doc_id, lang, COUNT(*) AS n_bigrams,
  round(CAST(SUM(CAST(prob AS DECIMAL(25,15))) AS DOUBLE) / COUNT(*), 9)
    AS mean_prob
FROM bg JOIN lm USING (a, b)
GROUP BY bg.doc_id, lang
ORDER BY mean_prob ASC, doc_id ASC LIMIT 25
"""


QUERIES = {
    "lm_bigram_topk": lm_bigram_topk,
    "doc_lm_quality_bottomk": doc_lm_quality_bottomk,
}
ORACLES = {
    "lm_bigram_topk": LM_BIGRAM_TOPK_SQL,
    "doc_lm_quality_bottomk": DOC_LM_QUALITY_SQL,
}
