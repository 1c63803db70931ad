"""Semantics pins for ngram_novelty_by_split, retrieval_self_mrr, and
stream_static_enrich_e2e on constructed fixtures.

- novelty: train/test membership uses the REAL split hash (ids are
  probed, not assumed); expected novelty counted by hand over trigrams;
- MRR: unique-vocabulary probes must self-retrieve at rank 1; an exact
  duplicate text ties and the doc_id tie-break charges the HIGHER id
  with rank 2 (rr = 0.5);
- stream-static enrich: the streamed join + rollup equals the batch
  join computed directly on the same fixture.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from debezium_server_bigquery_spark.functions.bm25 import retrieval_self_mrr
from debezium_server_bigquery_spark.functions.decontamination import (
    ngram_novelty_by_split,
)


def _write_docs(spark, tmp_path, rows):
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    return str(tmp_path)


def _split_ids(spark, want: str, n: int, start: int = 0) -> list[int]:
    """First n doc_ids >= start that the real split hash assigns to ``want``."""
    from debezium_server_bigquery_spark.functions.curation import split_of

    cand = spark.createDataFrame(
        [(i,) for i in range(start, start + 3000)], "doc_id long"
    ).select("doc_id", split_of(F.col("doc_id")).alias("split"))
    ids = [r.doc_id for r in cand.filter(F.col("split") == want).collect()]
    assert len(ids) >= n, f"not enough {want} ids in probe range"
    return sorted(ids)[:n]


def test_ngram_novelty_counts_unseen_test_trigrams(spark, tmp_path):
    train_ids = _split_ids(spark, "train", 1)
    test_ids = _split_ids(spark, "test", 2)
    # train trigrams: {a b c, b c d}; test: {a b c (seen), x y z (novel)}
    rows = [
        (train_ids[0], "a b c d", "en", "s", 7),
        (test_ids[0], "a b c", "en", "s", 5),
        (test_ids[1], "x y z", "en", "s", 5),
    ]
    sf = _write_docs(spark, tmp_path, rows)
    out = {r.lang: r for r in ngram_novelty_by_split(spark, sf).collect()}
    r = out["en"]
    assert r.n_test_shingles == 2  # {a b c, x y z}
    assert r.n_novel == 1  # x y z unseen in train
    assert abs(r.novelty_rate - 0.5) < 1e-9


def test_retrieval_self_mrr_unique_vocab_rank1_and_dup_tiebreak(spark, tmp_path):
    texts = {
        0: "alpha beta gamma delta epsilon zeta",
        1: "alpha beta gamma delta epsilon zeta",  # exact dup of doc 0
        2: "one two three four five six",
        3: "red green blue cyan magenta yellow",
    }
    rows = [(i, t, "en", "s", len(t)) for i, t in texts.items()]
    sf = _write_docs(spark, tmp_path, rows)
    out = {r.qid: r for r in retrieval_self_mrr(spark, sf).collect()}
    assert out[0].self_rank == 1 and out[0].rr == 1.0
    assert out[1].self_rank == 2 and out[1].rr == 0.5  # loses the id tie-break
    assert out[2].self_rank == 1
    assert out[3].self_rank == 1
    # dup pair sees both copies as candidates; unique docs see only themselves
    assert out[0].n_candidates == 2 and out[2].n_candidates == 1


def test_stream_static_enrich_matches_batch_join(spark, tmp_path):
    from debezium_server_bigquery_spark.plans.pipeline_queries import (
        stream_static_enrich_e2e,
    )

    spark.createDataFrame(
        [
            (1, 10, 100.0),
            (2, 10, 50.5),
            (3, 11, 20.0),
            (4, 12, 7.25),
            (5, 12, 2.75),
            (6, 99, 1.0),  # no matching customer -> dropped by inner join
        ],
        "o_orderkey long, o_custkey long, o_totalprice double",
    ).write.mode("overwrite").parquet(str(tmp_path / "orders.parquet"))
    spark.createDataFrame(
        [(10, "BUILDING"), (11, "AUTOMOBILE"), (12, "BUILDING")],
        "c_custkey long, c_mktsegment string",
    ).write.mode("overwrite").parquet(str(tmp_path / "customer.parquet"))
    out = {
        r.c_mktsegment: r
        for r in stream_static_enrich_e2e(spark, str(tmp_path)).collect()
    }
    assert set(out) == {"BUILDING", "AUTOMOBILE"}
    assert out["BUILDING"].n_orders == 4
    assert abs(out["BUILDING"].sum_totalprice - 160.5) < 1e-9
    assert out["AUTOMOBILE"].n_orders == 1
    assert abs(out["AUTOMOBILE"].sum_totalprice - 20.0) < 1e-9
