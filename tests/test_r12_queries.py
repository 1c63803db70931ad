"""Edge-semantics tests for the round-12 query registrations.

The oracle gate proves Spark==DuckDB on the real testdata; these pin the
semantics themselves on hand-built corpora where the right answer is
computable by eye (the oracle can only prove the twins AGREE)."""

from __future__ import annotations

import pytest

from debezium_server_bigquery_spark.functions.curation import (
    QPRIOR_K,
    domain_quality_prior_join,
)
from debezium_server_bigquery_spark.functions.dedup_incremental import (
    dedup_cross_run_fingerprint_store,
)
from debezium_server_bigquery_spark.functions.mixing import (
    EPOCH_CAP,
    epoch_repetition_plan,
)
from debezium_server_bigquery_spark.functions.text import (
    context_window_utilization,
    tokenizer_fertility_drift_gate,
)


def _write_docs(spark, tmp_path, rows):
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    return str(tmp_path)


def test_cross_run_store_counts(spark, tmp_path):
    # Store (even ids): texts A, B.  Batch (odd ids):
    #   1: A      -> dup of store
    #   3,5: C,C  -> 3 admitted (first), 5 in-batch dup
    #   7: D      -> admitted
    sf = _write_docs(
        spark,
        tmp_path,
        [
            (0, "A", "en", "s1", 1),
            (2, "B", "en", "s1", 1),
            (1, "A", "en", "s1", 1),
            (3, "C", "en", "s1", 1),
            (5, "C", "en", "s1", 1),
            (7, "D", "en", "s1", 1),
        ],
    )
    [r] = dedup_cross_run_fingerprint_store(spark, sf).collect()
    assert (
        r["batch_docs"],
        r["dups_vs_store"],
        r["dups_in_batch"],
        r["admitted"],
    ) == (4, 1, 1, 2)
    assert r["novelty_rate"] == 0.5


def test_cross_run_store_null_text_cannot_escape(spark, tmp_path):
    # NULL text fingerprints as '' (package convention): a NULL batch doc
    # must count as a dup of an empty-string store doc, not slip through
    # a NULL-never-equi-joins hole.
    sf = _write_docs(
        spark,
        tmp_path,
        [(0, "", "en", "s1", 0), (1, None, "en", "s1", 0)],
    )
    [r] = dedup_cross_run_fingerprint_store(spark, sf).collect()
    assert r["dups_vs_store"] == 1 and r["admitted"] == 0


def test_fertility_drift_flags_the_outlier_source(spark, tmp_path):
    # s_norm: pure words (fertility 1.0); s_punct: every word shadowed by
    # punctuation pretokens (fertility 2.0 — way past the 5% band).
    rows = [(i, "aa bb cc dd", "en", "s_norm", 11) for i in range(8)]
    rows += [(100 + i, "a. b. c. d.", "en", "s_punct", 11) for i in range(8)]
    sf = _write_docs(spark, tmp_path, rows)
    out = {r["source"]: r for r in tokenizer_fertility_drift_gate(spark, sf).collect()}
    assert out["s_norm"]["fertility"] == 1.0
    assert out["s_punct"]["fertility"] == 2.0
    assert out["s_punct"]["drift_flag"] is True
    # symmetric band: the clean source ALSO drifts relative to the rest
    # (its leave-one-out baseline is the junk source)
    assert out["s_norm"]["drift_flag"] is True


def test_context_window_truncation_accounting(spark, tmp_path):
    # One doc of 200 single-letter words (200 pretokens): overflows the
    # 128 window by 72 tokens, fits every larger one.
    text = " ".join(["a"] * 200)
    sf = _write_docs(spark, tmp_path, [(0, text, "en", "s1", len(text))])
    rows = {r["window_tokens"]: r for r in context_window_utilization(spark, sf).collect()}
    assert set(rows) == {128, 512, 2048, 8192}
    assert rows[128]["docs_truncated"] == 1
    assert rows[128]["pretokens_kept"] == 128
    assert rows[128]["token_loss_pct"] == round(72 / 200, 6)
    assert rows[512]["docs_truncated"] == 0
    assert rows[512]["token_loss_pct"] == 0.0


def test_quality_prior_shrinks_small_source_toward_global_mean(spark, tmp_path):
    # big: many perfect-quality docs;  tiny: one zero-quality doc.  The
    # tiny source's prior must sit near the global mean (K=20 dominates
    # n=1), far above its raw mean of 0.
    good = (
        "the quick brown fox jumps over the lazy dog and runs on to the "
        "green field with a friend for fun in the sun"
    )
    rows = [(i, good, "en", "big", len(good)) for i in range(50)]
    rows.append((999, "@@@@", "en", "tiny", 4))
    sf = _write_docs(spark, tmp_path, rows)
    out = {r["source"]: r for r in domain_quality_prior_join(spark, sf).collect()}
    assert out["big"]["raw_mean_quality"] == 1.0
    assert out["tiny"]["raw_mean_quality"] == 0.0
    assert out["tiny"]["prior_quality"] > 0.9  # shrunk to the corpus mean
    assert out["tiny"]["shrinkage_weight"] == round(1 / (1 + QPRIOR_K), 6)
    # the tiny source's one doc scores below its own prior
    assert out["tiny"]["docs_below_prior"] == 1
    assert out["big"]["docs_below_prior"] == 0


def test_epoch_plan_flags_upweighted_small_domain(spark, tmp_path):
    # rare: 1 doc; common: 99 docs of the same text.  Temperature 0.3
    # up-weights the rare domain enough that a 2x-corpus budget draws it
    # far past EPOCH_CAP epochs; the common domain stays under.
    rows = [(i, "w " * 20, "en", "common", 40) for i in range(99)]
    rows.append((1000, "w " * 20, "en", "rare", 40))
    sf = _write_docs(spark, tmp_path, rows)
    out = {r["source"]: r for r in epoch_repetition_plan(spark, sf).collect()}
    assert out["rare"]["over_epoch_cap"] is True
    assert out["rare"]["epochs"] > EPOCH_CAP
    assert out["common"]["over_epoch_cap"] is False
    # weights normalize
    assert abs(out["rare"]["weight"] + out["common"]["weight"] - 1.0) < 1e-5
