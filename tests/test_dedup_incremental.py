"""Incremental cross-corpus MinHash dedup (functions/dedup_incremental.py)."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from debezium_server_bigquery_spark.functions.dedup_incremental import (
    MinHashBandIndex,
    dedup_incremental_minhash,
)
from debezium_server_bigquery_spark.sources.tables import load_table

SF = "/root/testdata/sf0.001"


def _lsh_pairs(df):
    """Stored-index matches restricted to the LSH-band view the inline
    query produces (exact-only pairs carry n_shared_bands = 0)."""
    return {
        (r["new_doc"], r["corpus_doc"], r["n_shared_bands"])
        for r in df.collect()
        if r["n_shared_bands"] > 0
    }


@pytest.mark.heavy
def test_inline_candidates_match_stored_index(spark, tmp_path):
    docs = load_table(spark, SF, "documents")
    corpus = docs.filter(F.col("doc_id") % 2 == 0)
    new = docs.filter(F.col("doc_id") % 2 == 1)

    idx = MinHashBandIndex(spark, str(tmp_path / "mhidx"))
    idx.build(corpus)
    stored_pairs = _lsh_pairs(idx.match(new))
    inline_pairs = {
        (r["new_doc"], r["corpus_doc"], r["n_shared_bands"])
        for r in dedup_incremental_minhash(spark, SF).collect()
    }
    assert stored_pairs == inline_pairs
    assert stored_pairs, "fixture corpus must contain cross-split near-dups"


@pytest.mark.heavy
def test_match_shuffle_mode_parity(spark, tmp_path):
    docs = load_table(spark, SF, "documents")
    idx = MinHashBandIndex(spark, str(tmp_path / "mhidx"))
    idx.build(docs.filter(F.col("doc_id") % 2 == 0))
    new = docs.filter(F.col("doc_id") % 2 == 1)
    a = sorted(tuple(r) for r in idx.match(new, broadcast_batch=True).collect())
    b = sorted(tuple(r) for r in idx.match(new, broadcast_batch=False).collect())
    assert a == b


@pytest.mark.heavy
def test_append_admits_new_signatures(spark, tmp_path):
    docs = load_table(spark, SF, "documents")
    idx = MinHashBandIndex(spark, str(tmp_path / "mhidx"))
    idx.build(docs.filter(F.col("doc_id") % 4 == 0))
    idx.append(docs.filter(F.col("doc_id") % 4 == 2))
    # After append the index equals a fresh build over the union.
    full = MinHashBandIndex(spark, str(tmp_path / "mhidx_full"))
    full.build(docs.filter(F.col("doc_id") % 2 == 0))
    new = docs.filter(F.col("doc_id") % 2 == 1)
    got = sorted(tuple(r) for r in idx.match(new).collect())
    want = sorted(tuple(r) for r in full.match(new).collect())
    assert got == want


@pytest.mark.heavy
def test_duplicate_index_rows_do_not_inflate_band_counts(spark, tmp_path):
    """Crash-replay contract: re-appending the same signatures (the crash
    window in streaming/ingest.py) must not change any n_shared_bands —
    distinct-band counting makes duplicates harmless."""
    docs = load_table(spark, SF, "documents")
    corpus = docs.filter(F.col("doc_id") % 2 == 0)
    new = docs.filter(F.col("doc_id") % 2 == 1)
    idx = MinHashBandIndex(spark, str(tmp_path / "mhidx"))
    idx.build(corpus)
    before = sorted(tuple(r) for r in idx.match(new).collect())
    idx.append(corpus)  # duplicate every signature row
    after = sorted(tuple(r) for r in idx.match(new).collect())
    assert before == after


def test_exact_band_catches_unshingleable_docs(spark, tmp_path):
    """Docs shorter than one shingle produce no LSH bands; identical text
    must still collide via the exact-hash band."""
    corpus = spark.createDataFrame(
        [(1, "hello world"), (2, "tiny")], "doc_id long, text string"
    )
    idx = MinHashBandIndex(spark, str(tmp_path / "mhidx"))
    idx.build(corpus)
    probe = spark.createDataFrame(
        [(11, "hello world"), (12, "fresh text")], "doc_id long, text string"
    )
    rows = {(r["new_doc"], r["corpus_doc"]): r for r in idx.match(probe).collect()}
    assert (11, 1) in rows
    assert rows[(11, 1)]["exact_match"] is True
    assert rows[(11, 1)]["n_shared_bands"] == 0
    assert not any(nd == 12 for nd, _ in rows)


def test_match_empty_probe_returns_empty(spark, tmp_path):
    corpus = spark.createDataFrame([(1, "hello world")], "doc_id long, text string")
    idx = MinHashBandIndex(spark, str(tmp_path / "mhidx"))
    idx.build(corpus)
    empty = spark.createDataFrame([], "doc_id long, text string")
    assert idx.match(empty).count() == 0


@pytest.mark.heavy
def test_match_plan_prunes_and_never_cartesian(spark, tmp_path):
    docs = load_table(spark, SF, "documents")
    idx = MinHashBandIndex(spark, str(tmp_path / "mhidx"))
    idx.build(docs.filter(F.col("doc_id") % 2 == 0))
    out = idx.match(docs.filter(F.col("doc_id") % 2 == 1))
    out.sparkSession.conf.set("spark.sql.debug.maxToStringFields", "1000")
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    # the (band, sig_pre) keys reach the index scan as partition filters
    assert "PartitionFilters: [" in plan
    assert "sig_pre" in plan.split("PartitionFilters")[1][:600]


@pytest.mark.heavy
def test_null_text_docs_neither_crash_nor_escape_exact_dedup(spark, tmp_path):
    """NULL text hashes as the empty document: the probe must not crash the
    driver-side prefix collection, and two NULL/empty docs must collide on
    the exact band across batches."""
    idx = MinHashBandIndex(spark, str(tmp_path / "idx"))
    corpus = spark.createDataFrame([(1, None), (2, "real text here")], "doc_id long, text string")
    idx.build(corpus)
    probe = spark.createDataFrame([(10, None), (11, "")], "doc_id long, text string")
    got = idx.match(probe).collect()
    exact = {(r["new_doc"], r["corpus_doc"]) for r in got if r["exact_match"]}
    # NULL == empty == NULL across batches on the exact band
    assert (10, 1) in exact and (11, 1) in exact
