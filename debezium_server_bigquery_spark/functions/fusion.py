"""Multi-signal quality fusion — reciprocal rank fusion (RRF) of
independent document-quality signals.

A curation pipeline rarely trusts one scorer: the heuristic quality
filter (length/stopword/punctuation, functions/text.py) and the
corpus-LM likelihood (functions/lm.py) disagree exactly where each is
blind.  RRF (Cormack et al., SIGIR'09) blends them scale-free — each
signal contributes 1/(K + rank), so magnitudes never need calibrating —
and the blended top-k is the "best documents by consensus" cut.

Scale: each signal's rank comes from ``operators/rank.global_row_number``
(range partition + local rank + O(partitions) offsets — never a
single-task window); the two rank frames hash-join on doc_id and the
top-k compiles to TakeOrderedAndProject.

Determinism: each RRF term is one IEEE division of exact integers and
the two-term sum is written in the same fixed order in both engines —
bit-identical before the output rounding.  Documents with < 2 tokens
have no LM score and are excluded (inner join), matching the oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from debezium_server_bigquery_spark.sources.tables import load_table

RRF_K = 60
TOP_DOCS = 30


def rrf_blend(ranked: list[DataFrame], k: int = RRF_K) -> DataFrame:
    """Join per-signal (doc_id, rank_i) frames and sum 1/(k + rank_i)."""
    out = ranked[0]
    for nxt in ranked[1:]:
        out = out.join(nxt, "doc_id")
    rank_cols = [c for c in out.columns if c.startswith("rank_")]
    expr = None
    for c in rank_cols:  # fixed fold order — FP-sum determinism
        term = F.lit(1.0) / (F.lit(k) + F.col(c))
        expr = term if expr is None else expr + term
    return out.withColumn("rrf", expr)


def quality_rank_fusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top documents by RRF consensus of the heuristic quality score and
    the corpus-LM mean bigram likelihood."""
    from debezium_server_bigquery_spark.functions.lm import (
        _doc_tokens,
        doc_lm_scores,
    )
    from debezium_server_bigquery_spark.functions.text import quality_scores
    from debezium_server_bigquery_spark.operators.rank import global_row_number

    q = quality_scores(spark, sf_dir).select("doc_id", "quality_score")
    # checkpoint: the LM scorer's three consumers (pair counts, vocab,
    # probe) scan the materialized token arrays — one documents.text scan
    # and no lingering InMemoryRelation, same fix as doc_lm_quality_bottomk
    from debezium_server_bigquery_spark.sources.tables import checkpoint_parquet

    lmscore = doc_lm_scores(
        checkpoint_parquet(
            _doc_tokens(load_table(spark, sf_dir, "documents", spread=True)),
            "dsbq_lm_toks_",
        )
    ).select("doc_id", "mean_prob")
    r1 = global_row_number(
        q, [F.desc("quality_score"), F.asc("doc_id")], out="rank_q"
    ).select("doc_id", "rank_q")
    r2 = global_row_number(
        lmscore, [F.desc("mean_prob"), F.asc("doc_id")], out="rank_lm"
    ).select("doc_id", "rank_lm")
    return (
        rrf_blend([r1, r2])
        .select("doc_id", "rank_q", "rank_lm", F.round("rrf", 9).alias("rrf"))
        .orderBy(F.desc("rrf"), F.asc("doc_id"))
        .limit(TOP_DOCS)
    )


# The oracle recomputes both signals from scratch (same definitions as
# TEXT_QUALITY_SQL and DOC_LM_QUALITY_SQL) and blends with the identical
# fixed-order RRF expression.
QUALITY_RRF_SQL = rf"""
WITH toks0 AS (
  SELECT doc_id, text,
    list_filter(string_split_regex(text, '\s+'), t -> t <> '') AS w,
    list_filter(string_split_regex(lower(text), '\s+'), t -> t <> '') AS wl
  FROM documents
), quality AS (
  SELECT doc_id,
    round(
      (CASE WHEN len(w) BETWEEN 10 AND 1000 THEN 0.4 ELSE 0.0 END)
      + (CASE WHEN len(list_filter(wl, t -> list_contains(
            ['the','a','and','of','to','in','is','on','for','with'], t)))
          / greatest(len(wl), 1) > 0.01 THEN 0.3 ELSE 0.0 END)
      + (CASE WHEN length(regexp_replace(text, '[A-Za-z0-9\s]', '', 'g'))
          / greatest(length(text), 1) < 0.1 THEN 0.3 ELSE 0.0 END), 2)
      AS quality_score
  FROM toks0
), toks AS (
  SELECT doc_id,
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
  SELECT COUNT(DISTINCT w2) AS v FROM toks, UNNEST(toks) AS u(w2)
), lm AS (
  SELECT a, b, (cnt + 1) / CAST(ctx + v AS DOUBLE) AS prob
  FROM c_ab JOIN c_a USING (a), v
), lmscore AS (
  SELECT bg.doc_id,
    round(CAST(SUM(CAST(prob AS DECIMAL(25,15))) AS DOUBLE) / COUNT(*), 9)
      AS mean_prob
  FROM bg JOIN lm USING (a, b)
  GROUP BY bg.doc_id
), r1 AS (
  SELECT doc_id, CAST(ROW_NUMBER() OVER (
    ORDER BY quality_score DESC, doc_id ASC) AS BIGINT) AS rank_q
  FROM quality
), r2 AS (
  SELECT doc_id, CAST(ROW_NUMBER() OVER (
    ORDER BY mean_prob DESC, doc_id ASC) AS BIGINT) AS rank_lm
  FROM lmscore
)
SELECT doc_id, rank_q, rank_lm,
  round(1.0::DOUBLE / ({RRF_K} + rank_q)
      + 1.0::DOUBLE / ({RRF_K} + rank_lm), 9) AS rrf
FROM r1 JOIN r2 USING (doc_id)
ORDER BY rrf DESC, doc_id ASC LIMIT {TOP_DOCS}
"""


QUERIES = {"quality_rank_fusion": quality_rank_fusion}
ORACLES = {"quality_rank_fusion": QUALITY_RRF_SQL}


# --------------------------------------------------------------------------
# rbo_ranker_agreement — rank-biased overlap between two curation rankers.
# --------------------------------------------------------------------------
RBO_K = 20  # truncation depth of each ranked list
RBO_P = "0.9"  # persistence: weight of depth d is (1-p)·p^(d-1)


def _rbo_weights() -> list[str]:
    """(1−p)·p^(d−1)/d for d = 1..K as exact 18-dp decimal literal strings
    (division by d is quantized half-even ONCE here; both engines then
    consume the identical literal, so no runtime pow/div can wobble)."""
    from decimal import ROUND_HALF_EVEN, Decimal

    p = Decimal(RBO_P)
    return [
        str(
            ((1 - p) * p ** (d - 1) / Decimal(d)).quantize(
                Decimal("1e-18"), rounding=ROUND_HALF_EVEN
            )
        )
        for d in range(1, RBO_K + 1)
    ]


def rbo_ranker_agreement(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rank-biased overlap (Webber et al. 2010, truncated at K=20, p=0.9)
    between the two cheap curation rankers — heuristic quality score vs
    raw document length — per language.  The ranker-redundancy check
    before spending on a third signal: RBO ≈ 1 means the quality gate is
    just a length gate in disguise; ≈ 0 means independent orderings.

    Scale design (100 TB): both rankings are LANGUAGE-partitioned
    windows (never global; per-lang top-K is the object of interest);
    every doc in both top-K lists contributes to depths d ≥ max(ra, rb),
    so the depth explosion is bounded by K·K rows per language.
    Exactness: depth weights are fixed 18-dp DECIMAL literals summed
    exactly (order-independent); the only float is the final cast."""
    from debezium_server_bigquery_spark.functions.text import quality_scores
    from pyspark.sql.window import Window

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "lang", "n_chars"
    )
    q = quality_scores(spark, sf_dir).select("doc_id", "quality_score")
    j = docs.join(q, "doc_id")
    wa = Window.partitionBy("lang").orderBy(
        F.desc("quality_score"), F.asc("doc_id")
    )
    wb = Window.partitionBy("lang").orderBy(F.desc("n_chars"), F.asc("doc_id"))
    ranked = j.select(
        "lang",
        "doc_id",
        F.row_number().over(wa).alias("ra"),
        F.row_number().over(wb).alias("rb"),
    )
    both = ranked.filter(
        (F.col("ra") <= RBO_K) & (F.col("rb") <= RBO_K)
    ).select("lang", F.greatest("ra", "rb").alias("m"))
    warr = F.array(
        *[F.lit(w).cast("decimal(38,18)") for w in _rbo_weights()]
    )
    contrib = both.select(
        "lang", F.explode(F.sequence(F.col("m"), F.lit(RBO_K))).alias("d")
    ).select("lang", F.element_at(warr, F.col("d")).alias("w"))
    counts = both.groupBy("lang").agg(
        F.count(F.lit(1)).cast("long").alias("n_both")
    )
    rbo = contrib.groupBy("lang").agg(F.sum("w").alias("rbo_dec"))
    return (
        counts.join(rbo, "lang")
        .select(
            "lang",
            "n_both",
            (F.round(F.col("rbo_dec").cast("double"), 6) + F.lit(0.0)).alias(
                "rbo"
            ),
        )
        .orderBy("lang")
    )


def _rbo_sql() -> str:
    from debezium_server_bigquery_spark.functions.curation import _QUALITY_CTE

    arr = ", ".join(f"'{w}'::DECIMAL(38,18)" for w in _rbo_weights())
    return f"""
WITH quality AS ({_QUALITY_CTE}),
j AS (
  SELECT d.lang, d.doc_id, d.n_chars, q.quality_score
  FROM documents d JOIN quality q USING (doc_id)
),
ranked AS (
  SELECT lang, doc_id,
    ROW_NUMBER() OVER (PARTITION BY lang
                       ORDER BY quality_score DESC, doc_id) AS ra,
    ROW_NUMBER() OVER (PARTITION BY lang
                       ORDER BY n_chars DESC, doc_id) AS rb
  FROM j
),
both_l AS (
  SELECT lang, greatest(ra, rb) AS m FROM ranked
  WHERE ra <= {RBO_K} AND rb <= {RBO_K}
),
contrib AS (
  SELECT lang, ([{arr}])[CAST(r.d AS INT)] AS w
  FROM both_l, UNNEST(range(m, {RBO_K} + 1)) AS r(d)
),
counts AS (
  SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_both FROM both_l GROUP BY lang
),
rbo AS (
  SELECT lang, CAST(SUM(w) AS DECIMAL(38,18)) AS rbo_dec
  FROM contrib GROUP BY lang
)
SELECT c.lang, c.n_both,
  round(CAST(r.rbo_dec AS DOUBLE), 6) + 0.0 AS rbo
FROM counts c JOIN rbo r ON c.lang = r.lang
ORDER BY c.lang
"""


RBO_SQL = _rbo_sql()

QUERIES["rbo_ranker_agreement"] = rbo_ranker_agreement
ORACLES["rbo_ranker_agreement"] = RBO_SQL
