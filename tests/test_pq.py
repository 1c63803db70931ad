"""Product quantization (functions/pq.py).

The oracle twins pin cross-engine value equality; these tests pin the
CLAIMS: codes are a valid 32x-compressed representation, the codebook is
metadata-sized, and the ADC-shortlist + exact-rerank composition recovers
real recall while touching a fraction of the raw vectors.
"""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest
from pyspark.sql.functions import broadcast
from pyspark.sql.window import Window

from debezium_server_bigquery_spark.functions import pq
from debezium_server_bigquery_spark.functions.similarity import _sq_dist
from debezium_server_bigquery_spark.sources.tables import load_table

SF_DIR = "/root/testdata/sf0.01"  # 500 vectors: big enough for recall stats


@pytest.fixture(scope="module")
def emb(spark):
    return load_table(spark, SF_DIR, "embeddings").cache()


def test_codebook_is_metadata_sized(spark, emb):
    cb = pq.pq_codebook(emb).collect()
    # PQ_M subspaces x one codeword per label
    n_labels = emb.select("label").distinct().count()
    assert len(cb) == pq.PQ_M * n_labels
    assert all(len(r["cw"]) == pq.PQ_SUBDIM for r in cb)


def test_codes_are_one_byte_per_subspace(spark, emb):
    cb = pq.pq_codebook(emb)
    codes = pq.pq_encode(emb, cb)
    n = emb.count()
    assert codes.count() == n * pq.PQ_M  # exactly one code per (vec, m)
    rng = codes.agg(F.min("code"), F.max("code")).collect()[0]
    assert rng[0] >= 0 and rng[1] <= 255  # fits one byte: 32x compression
    # each (vec_id, m) key is unique
    assert codes.select("vec_id", "m").distinct().count() == n * pq.PQ_M


def _exact_top5(spark, emb):
    q = emb.filter(F.col("vec_id") < pq.PQ_N_QUERIES).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qe")
    )
    j = broadcast(q).join(emb, F.col("qid") != F.col("vec_id"))
    w = Window.partitionBy("qid").orderBy("d", "vec_id")
    top = (
        j.withColumn("d", _sq_dist(F.col("qe"), F.col("embedding")))
        .withColumn("r", F.row_number().over(w))
        .filter(F.col("r") <= pq.PQ_TOPK)
        .select("qid", "vec_id")
        .collect()
    )
    out: dict[int, set] = {}
    for r in top:
        out.setdefault(r.qid, set()).add(r.vec_id)
    return out


def test_rerank_recall_beats_random_sampling(spark, emb):
    """Scanning only the ADC top-PQ_SHORTLIST (10% of this corpus) with
    exact re-rank must recover far more of the true top-5 than a random
    10% sample would (expected recall = the sample rate, 0.10)."""
    exact = _exact_top5(spark, emb)
    got = pq.ann_pq_rerank(spark, SF_DIR).collect()
    mine: dict[int, set] = {}
    for r in got:
        mine.setdefault(r.query_id, set()).add(r.neighbor_id)
    recalls = [len(exact[q] & mine[q]) / pq.PQ_TOPK for q in exact]
    mean = sum(recalls) / len(recalls)
    assert mean >= 0.4, recalls  # measured 0.58; random sampling gives 0.10


def test_adc_topk_shape_and_order(spark):
    rows = pq.ann_pq_adc_topk(spark, SF_DIR).collect()
    assert len(rows) == pq.PQ_N_QUERIES * pq.PQ_TOPK
    by_q: dict[int, list] = {}
    for r in rows:
        by_q.setdefault(r.query_id, []).append(r)
    for q, rs in by_q.items():
        assert [r.rank for r in rs] == list(range(1, pq.PQ_TOPK + 1))
        dists = [r.adc_dist for r in rs]
        assert dists == sorted(dists)
        assert all(d > 0 for d in dists)
        assert all(r.neighbor_id != q for r in rs)
