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
