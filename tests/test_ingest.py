"""Deduplicating document-ingest pipeline (streaming/ingest.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from debezium_server_bigquery_spark.sources.tables import load_table
from debezium_server_bigquery_spark.streaming.ingest import DedupIngestPipeline

SF = "/root/testdata/sf0.001"


def _batches(spark, n=3):
    docs = load_table(spark, SF, "documents")
    return docs, [docs.filter(F.col("doc_id") % n == i) for i in range(n)]


@pytest.mark.heavy
def test_ingest_admits_once_across_batches(spark, tmp_path):
    docs, batches = _batches(spark)
    pipe = DedupIngestPipeline(spark, str(tmp_path / "ing"))
    for eid, b in enumerate(batches):
        pipe.process_batch(b, epoch_id=eid)
    corpus = pipe.corpus()
    n_total = docs.count()
    n_admitted = corpus.count()
    # the fixture corpus contains duplicates -> something must be rejected
    assert 0 < n_admitted < n_total
    # admitted docs are unique by content hash (exact dups eliminated)
    assert (
        corpus.select(F.md5("text")).distinct().count() == n_admitted
    )
    # no admitted pair shares >= dup_bands LSH bands (near-dups eliminated)
    from debezium_server_bigquery_spark.functions.dedup_fuzzy import (
        minhash_band_table,
    )

    bands = minhash_band_table(corpus.select("doc_id", "text"))
    a, b = bands.alias("a"), bands.alias("b")
    offenders = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.sig") == F.col("b.sig"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy("a.doc_id", "b.doc_id")
        .agg(F.count("*").alias("n"))
        .filter(F.col("n") >= pipe.dup_bands)
        .count()
    )
    assert offenders == 0


@pytest.mark.heavy
def test_ingest_epoch_replay_is_noop(spark, tmp_path):
    _, batches = _batches(spark)
    pipe = DedupIngestPipeline(spark, str(tmp_path / "ing"))
    pipe.process_batch(batches[0], epoch_id=0)
    n = pipe.corpus().count()
    pipe.process_batch(batches[0], epoch_id=0)  # checkpoint replay
    assert pipe.corpus().count() == n


@pytest.mark.heavy
def test_ingest_reingest_same_docs_rejected(spark, tmp_path):
    _, batches = _batches(spark)
    pipe = DedupIngestPipeline(spark, str(tmp_path / "ing"))
    pipe.process_batch(batches[0], epoch_id=0)
    n = pipe.corpus().count()
    # same documents under a NEW epoch: exact copies share all bands
    pipe.process_batch(batches[0], epoch_id=1)
    assert pipe.corpus().count() == n


def test_ingest_short_doc_exact_dup_rejected_across_batches(spark, tmp_path):
    """A document too short to shingle (no LSH bands) must still be
    rejected when an identical copy arrives in a later batch — the
    exact-hash band covers it."""
    pipe = DedupIngestPipeline(spark, str(tmp_path / "ing"))
    b1 = spark.createDataFrame(
        [(1, "hello world"), (2, "a distinctly longer document body here")],
        "doc_id long, text string",
    )
    b2 = spark.createDataFrame(
        [(11, "hello world"), (12, "completely novel content for batch two")],
        "doc_id long, text string",
    )
    pipe.process_batch(b1, epoch_id=0)
    pipe.process_batch(b2, epoch_id=1)
    admitted = {r["doc_id"] for r in pipe.corpus().select("doc_id").collect()}
    assert admitted == {1, 2, 12}  # 11 is an exact copy of 1


def test_ingest_all_short_doc_batch_does_not_crash(spark, tmp_path):
    """A non-first batch whose docs all lack shingles AND exact matches
    must flow through (empty-probe guard) and be admitted."""
    pipe = DedupIngestPipeline(spark, str(tmp_path / "ing"))
    pipe.process_batch(
        spark.createDataFrame(
            [(1, "some reasonably long first document")], "doc_id long, text string"
        ),
        epoch_id=0,
    )
    pipe.process_batch(
        spark.createDataFrame([(2, "tiny one")], "doc_id long, text string"),
        epoch_id=1,
    )
    admitted = {r["doc_id"] for r in pipe.corpus().select("doc_id").collect()}
    assert admitted == {1, 2}


@pytest.mark.heavy
def test_ingest_run_stream_availablenow(spark, tmp_path):
    """The streaming entry drains a file source through the same dedup
    body; the drained corpus matches the batch-mode result."""
    docs, batches = _batches(spark)
    src_dir = str(tmp_path / "src")
    docs.write.parquet(src_dir)
    stream = spark.readStream.schema(docs.schema).parquet(src_dir)

    pipe = DedupIngestPipeline(spark, str(tmp_path / "ing_s"))
    q = pipe.run_stream(stream, str(tmp_path / "ckpt"))
    q.awaitTermination(300)

    ref = DedupIngestPipeline(spark, str(tmp_path / "ing_b"))
    ref.run_batch(docs)
    # one big availableNow batch == one run_batch over the same rows
    assert pipe.corpus().count() == ref.corpus().count()
    assert (
        pipe.corpus().select(F.md5("text")).distinct().count()
        == pipe.corpus().count()
    )


@pytest.mark.heavy
def test_ingest_crash_between_index_and_rows_replays_cleanly(
    spark, tmp_path, monkeypatch
):
    """Signatures landed, rows did not — the module's crash window.  The
    replay must still admit the rows (orphaned signatures are filtered by
    the corpus-membership check)."""
    _, batches = _batches(spark)
    pipe = DedupIngestPipeline(spark, str(tmp_path / "ing"))
    pipe.process_batch(batches[0], epoch_id=0)
    n0 = pipe.corpus().count()

    from debezium_server_bigquery_spark.operators.table import ParquetTable

    def crash(self, df, epoch_id=None):
        raise OSError("crash after index append, before row append")

    monkeypatch.setattr(ParquetTable, "append", crash)
    with pytest.raises(OSError):
        pipe.process_batch(batches[1], epoch_id=1)
    monkeypatch.undo()
    assert pipe.corpus().count() == n0  # rows really did not land

    pipe2 = DedupIngestPipeline(spark, str(tmp_path / "ing"))  # restart
    pipe2.process_batch(batches[1], epoch_id=1)  # replay
    n1 = pipe2.corpus().count()
    assert n1 > n0, "replayed batch must admit despite its orphaned signatures"
    # and the follow-up batch still deduplicates normally
    pipe2.process_batch(batches[2], epoch_id=2)
    corpus = pipe2.corpus()
    assert corpus.select(F.md5("text")).distinct().count() == corpus.count()
