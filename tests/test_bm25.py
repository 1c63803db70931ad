from __future__ import annotations

import math

from debezium_server_bigquery_spark.functions.bm25 import bm25_topk


def _docs(spark):
    rows = [
        (1, "spark spark spark filler filler filler"),
        (2, "spark filler filler filler filler filler"),
        (3, "vector filler filler filler filler filler"),
        (4, "filler filler filler filler filler filler"),
        (5, "spark vector filler filler filler filler"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def _scores(spark, terms):
    out = bm25_topk(_docs(spark), terms, k=10)
    return {r.doc_id: (r.matched_terms, r.bm25) for r in out.collect()}


def test_bm25_zero_match_docs_excluded(spark):
    s = _scores(spark, ("spark",))
    assert set(s) == {1, 2, 5}


def test_bm25_tf_monotone(spark):
    # same length, more occurrences of the query term -> higher score
    s = _scores(spark, ("spark",))
    assert s[1][1] > s[2][1] > 0


def test_bm25_rarer_term_scores_higher(spark):
    # 'vector' (df=2) is rarer than 'spark' (df=3): single-occurrence docs
    # of equal length rank the rarer term higher
    s = _scores(spark, ("spark", "vector"))
    assert s[3][1] > s[2][1]
    # doc 5 matches both terms and beats every single-term doc
    assert s[5][0] == 2
    assert s[5][1] > max(s[1][1], s[3][1])


def test_bm25_matches_closed_form(spark):
    # hand-computed Okapi BM25 for doc 2, term 'spark':
    # N=5 docs, df=3, tf=1, dl=6, avgdl=6, k1=1.2, b=0.75
    s = _scores(spark, ("spark",))
    idf = math.log(1.0 + (5 - 3 + 0.5) / (3 + 0.5))
    tfn = (1 * 2.2) / (1 + 1.2 * (1 - 0.75 + 0.75 * 6 / 6))
    assert abs(s[2][1] - round(idf * tfn, 6)) < 1e-9


def test_bm25_topk_limit_and_order(spark, sf_dir):
    from debezium_server_bigquery_spark.functions.bm25 import bm25_search_topk

    rows = bm25_search_topk(spark, sf_dir).collect()
    assert 0 < len(rows) <= 20
    scores = [r.bm25 for r in rows]
    assert scores == sorted(scores, reverse=True)
