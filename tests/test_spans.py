"""Substring-dedup span operators on hand-built documents."""

from __future__ import annotations

import pytest

from debezium_server_bigquery_spark.functions.spans import (
    SPAN_WORDS,
    text_common_spans,
    text_span_dup_ratio,
)


@pytest.fixture()
def docs_dir(spark, tmp_path):
    shared = " ".join(f"s{i}" for i in range(SPAN_WORDS))  # one exact span
    rows = [
        (1, f"alpha beta {shared} gamma delta", "en", "web", 0),
        (2, f"unrelated prefix {shared}", "en", "web", 0),
        (3, "totally different words without overlap here at all", "en", "web", 0),
        (4, "short", "en", "web", 0),  # < SPAN_WORDS tokens: no spans
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    df.write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    return str(tmp_path)


def test_common_spans_finds_the_shared_window(spark, docs_dir):
    out = text_common_spans(spark, docs_dir).collect()
    # exactly the one 8-word window occurs in two documents
    assert len(out) == 1
    row = out[0]
    assert row["n_docs"] == 2
    assert (row["first_doc"], row["last_doc"]) == (1, 2)


def test_span_dup_ratio_per_document(spark, docs_dir):
    r = {x["doc_id"]: x for x in text_span_dup_ratio(spark, docs_dir).collect()}
    # doc 1: 5 extra words around the span -> 5 windows total, 1 shared
    assert r[1]["n_shared"] == 1 and r[1]["n_spans"] > 1
    assert 0 < r[1]["dup_ratio"] < 1
    # doc 2: 2 extra words -> 3 windows, 1 shared
    assert r[2]["n_shared"] == 1
    # doc 3 has no shared window; doc 4 has no windows at all
    assert r[3]["n_shared"] == 0 and r[3]["dup_ratio"] == 0.0
    assert 4 not in r


@pytest.fixture()
def span_pair_dir(spark, tmp_path):
    """Two pairs with known maximal overlaps: (1,2) share exactly 12
    consecutive words, (3,4) share exactly SPAN_WORDS; doc 5 overlaps
    nothing.  All other tokens are unique so no accidental windows."""
    shared12 = " ".join(f"t{i}" for i in range(12))
    shared8 = " ".join(f"u{i}" for i in range(SPAN_WORDS))
    rows = [
        (1, f"lone1 lone2 {shared12} lone3 lone4", "en", "web", 0),
        (2, f"{shared12} lone5 lone6", "en", "web", 0),
        (3, f"lone7 lone8 {shared8} lone9", "en", "web", 0),
        (4, shared8, "en", "web", 0),
        (5, "entirely separate vocabulary with no repeats anywhere at all", "en", "web", 0),
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    df.write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    return str(tmp_path)


def test_longest_shared_span_chains_diagonal_runs(spark, span_pair_dir):
    from debezium_server_bigquery_spark.functions.spans import (
        longest_shared_span_pairs,
    )

    out = [
        (r.doc_a, r.doc_b, r.span_words)
        for r in longest_shared_span_pairs(spark, span_pair_dir).collect()
    ]
    # a 12-word overlap is 5 consecutive 8-word windows on one diagonal;
    # the single shared window of (3,4) reports the window length itself
    assert out == [(1, 2, 12), (3, 4, SPAN_WORDS)]


def test_span_trim_estimate_merges_overlapping_windows(spark, tmp_path):
    """Ten words shared verbatim = three overlapping 8-word windows that
    must merge to a covered length of 10, not 24."""
    shared10 = " ".join(f"v{i}" for i in range(10))
    rows = [
        (1, f"pre1 pre2 {shared10} post1", "en", "web", 0),
        (2, f"{shared10} tail1 tail2", "en", "web", 0),
        (3, "independent words that never repeat anywhere else at all ok", "en", "web", 0),
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    df.write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    from debezium_server_bigquery_spark.functions.spans import span_trim_estimate

    out = {r.doc_id: r for r in span_trim_estimate(spark, str(tmp_path)).collect()}
    assert out[1].covered_words == 10 and out[1].n_words == 13
    assert out[2].covered_words == 10 and out[2].trim_ratio == round(10 / 12, 6)
    assert 3 not in out  # no shared windows -> nothing to trim
