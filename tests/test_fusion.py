"""RRF quality fusion — hand-checked blending semantics."""

from __future__ import annotations

import pytest

from debezium_server_bigquery_spark.functions.fusion import RRF_K, rrf_blend


def _ranked(spark, name, pairs):
    return spark.createDataFrame(pairs, f"doc_id long, {name} long")


def test_rrf_blend_hand_case(spark):
    r1 = _ranked(spark, "rank_q", [(1, 1), (2, 2), (3, 3)])
    r2 = _ranked(spark, "rank_lm", [(1, 3), (2, 1), (3, 2)])
    out = {r.doc_id: r.rrf for r in rrf_blend([r1, r2]).collect()}
    for d, (a, b) in {1: (1, 3), 2: (2, 1), 3: (3, 2)}.items():
        assert out[d] == pytest.approx(1 / (RRF_K + a) + 1 / (RRF_K + b))


def test_rrf_consensus_beats_single_signal(spark):
    # doc 2 is ranked 1st by BOTH signals; doc 1 wins one signal but is
    # last in the other -> consensus puts doc 2 on top
    r1 = _ranked(spark, "rank_q", [(1, 2), (2, 1), (3, 3)])
    r2 = _ranked(spark, "rank_lm", [(1, 3), (2, 1), (3, 2)])
    out = sorted(
        rrf_blend([r1, r2]).collect(), key=lambda r: -r.rrf
    )
    assert out[0].doc_id == 2


def test_fusion_query_shape(spark, sf_dir):
    from debezium_server_bigquery_spark.functions.fusion import quality_rank_fusion

    rows = quality_rank_fusion(spark, sf_dir).collect()
    assert 0 < len(rows) <= 30
    vals = [r.rrf for r in rows]
    assert vals == sorted(vals, reverse=True)
    assert all(r.rank_q >= 1 and r.rank_lm >= 1 for r in rows)


def _rbo_expected(ra: dict, rb: dict, k: int = 20) -> float:
    """Brute-force truncated RBO from the same quantized weight table."""
    from debezium_server_bigquery_spark.functions.fusion import _rbo_weights
    from decimal import Decimal

    ws = [Decimal(w) for w in _rbo_weights()]
    total = Decimal(0)
    for doc, a in ra.items():
        b = rb.get(doc)
        if b is None or a > k or b > k:
            continue
        for d in range(max(a, b), k + 1):
            total += ws[d - 1]
    return float(round(total, 6))


def test_rbo_perfect_and_reversed_agreement(spark, tmp_path):
    from debezium_server_bigquery_spark.functions.fusion import (
        rbo_ranker_agreement,
    )

    def docs_rows(lang, lengths, base):
        # identical quality profile (all ties -> rank by doc_id), length
        # ranker ordered by the word count we choose per doc
        rows = []
        for i, n_words in enumerate(lengths):
            t = " ".join(["word"] * n_words)
            rows.append((base + i, t, lang, "s", len(t)))
        return rows

    rows = docs_rows("aa", [20, 19, 18, 17, 16], 0)  # agree: both = id asc
    rows += docs_rows("bb", [16, 17, 18, 19, 20], 100)  # reversed
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    out = {r.lang: r for r in rbo_ranker_agreement(spark, str(tmp_path)).collect()}

    agree = _rbo_expected({i: i + 1 for i in range(5)}, {i: i + 1 for i in range(5)})
    rev = _rbo_expected(
        {i: i + 1 for i in range(5)}, {i: 5 - i for i in range(5)}
    )
    assert out["aa"].n_both == 5 and abs(out["aa"].rbo - agree) < 1e-9
    assert out["bb"].n_both == 5 and abs(out["bb"].rbo - rev) < 1e-9
    assert out["aa"].rbo > out["bb"].rbo
