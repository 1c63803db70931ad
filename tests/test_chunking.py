"""Chunking + PII scrub: windowing arithmetic and plan shape.

Oracle parity is covered by tools/check_oracles.py; these tests pin the
operator semantics on hand-built rows and assert the no-shuffle plan.
"""

from __future__ import annotations

import pytest
from debezium_server_bigquery_spark.functions.chunking import (
    CHUNK_OVERLAP,
    CHUNK_SIZE,
    _STRIDE,
    chunk_documents,
    text_pii_scrub,
)


@pytest.fixture()
def docs_dir(spark, tmp_path):
    # letter-only words: each is exactly ONE pre-token under TOKEN_REGEX
    # (a digit suffix would split into two)
    words = " ".join("abc" for _ in range(CHUNK_SIZE + _STRIDE + 5))
    rows = [
        (1, words, "en", "web", len(words)),
        (2, "short doc", "en", "web", 9),
        (3, "", "en", "web", 0),
        (4, "mail me at a.b@example.com or 10.0.0.1 / +4915112345678", "en", "web", 56),
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    df.write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    return str(tmp_path)


def test_chunk_windows(spark, docs_dir):
    out = chunk_documents(spark, docs_dir)
    rows = {(r["doc_id"], r["chunk_id"]): r for r in out.collect()}
    # doc 1: n = CHUNK_SIZE + _STRIDE + 5 tokens -> starts 0, stride, 2*stride
    n1 = CHUNK_SIZE + _STRIDE + 5
    starts = list(range(0, n1, _STRIDE))
    assert [k[1] for k in sorted(rows) if k[0] == 1] == list(range(len(starts)))
    first = rows[(1, 0)]
    assert first["start_token"] == 0 and first["n_chunk_tokens"] == CHUNK_SIZE
    last = rows[(1, len(starts) - 1)]
    assert last["n_chunk_tokens"] == n1 - starts[-1]
    # doc 2: two tokens -> one chunk of 2
    assert rows[(2, 0)]["n_chunk_tokens"] == 2
    # doc 3: empty -> no chunks
    assert not any(k[0] == 3 for k in rows)


def test_chunk_overlap_consistency():
    assert _STRIDE == CHUNK_SIZE - CHUNK_OVERLAP and _STRIDE > 0


def test_chunk_plan_has_no_shuffle(spark, docs_dir):
    plan = chunk_documents(spark, docs_dir)._jdf.queryExecution().executedPlan().toString()
    # The chunk build itself (generate/project) must not shuffle.  The
    # OUTPUT is allowed exactly the ordered_output pair (hash exchange to
    # materialize the narrow result + rangepartitioning for the sort — see
    # operators/rank.py::ordered_output) plus an optional spread rebalance.
    assert plan.count("Exchange") <= 3
    # and the expensive part stays below ONE stage: the generate/projection
    # must sit under the hash exchange, not under the range sampler
    assert plan.count("Exchange rangepartitioning") == 1


def test_pii_scrub_counts(spark, docs_dir):
    r = {x["doc_id"]: x for x in text_pii_scrub(spark, docs_dir).collect()}
    assert r[4]["n_emails"] == 1
    assert r[4]["n_ipv4"] == 1
    assert r[4]["n_phones"] == 1
    assert r[1]["n_emails"] == r[1]["n_ipv4"] == r[1]["n_phones"] == 0
    assert r[4]["scrubbed_hash"] != r[1]["scrubbed_hash"]


def test_paragraph_dup_rate_detects_planted_block(spark, sf_dir, tmp_path):
    """Two docs sharing one identical 64-token block must both show a
    non-zero dup_block_rate; unique docs stay at 0 (modulo corpus dups)."""
    import os

    from pyspark.sql import functions as F

    from debezium_server_bigquery_spark.functions.chunking import (
        BLOCK_WIN,
        paragraph_dup_rate,
    )

    words = " ".join(f"w{i}" for i in range(BLOCK_WIN))
    rows = [
        (1, words + " unique tail one " + "x " * BLOCK_WIN),
        (2, words + " different tail two " + "y " * BLOCK_WIN),
        (3, "entirely distinct text " + "z " * (2 * BLOCK_WIN)),
    ]
    spark.createDataFrame(rows, "doc_id long, text string").write.parquet(
        os.path.join(str(tmp_path), "documents.parquet")
    )
    out = {r.doc_id: r for r in paragraph_dup_rate(spark, str(tmp_path)).collect()}
    assert out[1].n_shared_blocks >= 1 and out[2].n_shared_blocks >= 1
    assert out[1].dup_block_rate > 0 and out[2].dup_block_rate > 0
    assert out[3].n_shared_blocks == 0 and out[3].dup_block_rate == 0.0
    # rate is shared/total for every doc
    assert all(
        r.dup_block_rate == round(r.n_shared_blocks / r.n_blocks, 6)
        for r in out.values()
    )
