"""Unit tests for corpus curation (stratified sampling, vocabulary) and
int8 embedding quantization; the sf0.01 oracle gate covers the same
operators against DuckDB."""

from __future__ import annotations

import math

from pyspark.sql import functions as F


def test_sample_stratified_caps_and_determinism(spark, sf_dir):
    from debezium_server_bigquery_spark.functions.curation import (
        SAMPLE_PER_STRATUM,
        sample_stratified,
    )

    out = sample_stratified(spark, sf_dir).collect()
    per_lang: dict[str, list[int]] = {}
    for r in out:
        per_lang.setdefault(r.lang, []).append(r.sample_rank)
    for lang, ranks in per_lang.items():
        assert len(ranks) <= SAMPLE_PER_STRATUM
        assert ranks == list(range(1, len(ranks) + 1)), lang
    # deterministic across runs: same plan, same hash keys
    again = sample_stratified(spark, sf_dir).collect()
    assert [tuple(r) for r in out] == [tuple(r) for r in again]


def test_vocab_top_terms_ordering(spark, sf_dir):
    from debezium_server_bigquery_spark.functions.curation import vocab_top_terms

    rows = vocab_top_terms(spark, sf_dir).collect()
    assert rows, "vocabulary must be non-empty"
    freqs = [(r.doc_freq, r.term) for r in rows]
    # descending doc_freq, ascending term on ties
    assert freqs == sorted(freqs, key=lambda t: (-t[0], t[1]))
    # document frequency can never exceed the document count
    n_docs = spark.read.parquet(f"{sf_dir}/documents.parquet").count()
    assert all(r.doc_freq <= n_docs for r in rows)


def test_quantize_int8_roundtrip_error_bound(spark, sf_dir):
    from debezium_server_bigquery_spark.functions.quantize import (
        INT8_MAX,
        embedding_quantize_int8,
    )

    rows = embedding_quantize_int8(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert -INT8_MAX <= r.q_min <= r.q_max <= INT8_MAX
        # symmetric quantization: max abs error per element is scale/2,
        # so mse <= (scale/2)^2
        assert r.mse <= (r.scale / 2) ** 2 + 1e-15, r.vec_id


def test_quantize_matches_python_reference(spark, sf_dir):
    from debezium_server_bigquery_spark.functions.quantize import (
        INT8_MAX,
        embedding_quantize_int8,
    )

    emb = {
        r.vec_id: [float(x) for x in r.embedding]
        for r in spark.read.parquet(f"{sf_dir}/embeddings.parquet").limit(20).collect()
    }
    got = {
        r.vec_id: r
        for r in embedding_quantize_int8(spark, sf_dir).collect()
        if r.vec_id in emb
    }
    for vid, vec in emb.items():
        scale = max(abs(x) for x in vec) / INT8_MAX
        q = [max(-INT8_MAX, min(INT8_MAX, math.floor(x / scale + 0.5))) for x in vec]
        mse = sum((x - qi * scale) ** 2 for x, qi in zip(vec, q)) / len(vec)
        assert abs(got[vid].scale - scale) < 1e-9
        assert got[vid].q_min == min(q) and got[vid].q_max == max(q)
        assert abs(got[vid].mse - mse) < 1e-12


def test_weighted_sampling_tilts_quality_upward(spark, sf_dir):
    """Selection probability == quality, so the selected slice's mean
    quality must be >= the corpus mean (strictly, unless degenerate)."""
    from pyspark.sql import functions as F

    from debezium_server_bigquery_spark.functions.curation import (
        sample_weighted_by_quality,
    )
    from debezium_server_bigquery_spark.functions.text import text_quality_score

    sel = sample_weighted_by_quality(spark, sf_dir).collect()
    assert len(sel) > 0
    total_sel = sum(r.n_selected for r in sel)
    overall_sel_mean = (
        sum(r.mean_quality * r.n_selected for r in sel) / total_sel
    )
    corpus = text_quality_score(spark, sf_dir).agg(
        F.avg("quality_score").alias("m"), F.count("*").alias("n")
    ).collect()[0]
    assert 0 < total_sel < corpus.n  # a genuine subset
    assert overall_sel_mean >= corpus.m  # quality-weighted tilt


def test_corpus_curation_funnel_monotone(spark, sf_dir):
    """Funnel counts are cumulative: each stage can only shrink the set,
    and each stage's count reconciles with its standalone feeder."""
    from pyspark.sql import functions as F

    from debezium_server_bigquery_spark.functions.recipe import (
        corpus_curation_funnel,
    )
    from debezium_server_bigquery_spark.sources.tables import load_table

    r = corpus_curation_funnel(spark, sf_dir).first()
    docs = load_table(spark, sf_dir, "documents")
    assert r.n_raw == docs.count()
    assert (
        r.n_raw
        >= r.n_after_exact
        >= r.n_after_neardup
        >= r.n_after_quality
        >= r.n_after_decontam
    )
    # exact stage reconciles with distinct content hashes
    assert r.n_after_exact == docs.select(F.md5("text")).distinct().count()


def test_split_balance_chisq_reconciles(spark, sf_dir):
    from debezium_server_bigquery_spark.functions.curation import (
        dataset_splits,
        split_balance_chisq,
    )

    chis = {r.lang: r for r in split_balance_chisq(spark, sf_dir).collect()}
    splits = dataset_splits(spark, sf_dir).collect()
    by = {}
    for r in splits:
        by.setdefault(r.lang, {})[r.split] = r.n_docs
    for lang, row in chis.items():
        assert row.n_train == by[lang].get("train", 0)
        assert row.n_val == by[lang].get("val", 0)
        assert row.n_test == by[lang].get("test", 0)
        assert row.n == row.n_train + row.n_val + row.n_test
        # literal recompute of the three-term statistic
        want = sum(
            (obs - row.n * f) ** 2 / (row.n * f)
            for obs, f in (
                (row.n_train, 0.90),
                (row.n_val, 0.05),
                (row.n_test, 0.05),
            )
        )
        assert row.chisq == round(want, 6)


def test_term_collocations_lift_bounds(spark, sf_dir):
    from debezium_server_bigquery_spark.functions.curation import (
        COLLOC_MIN_SUPPORT,
        term_collocations_lift,
        vocab_top_terms,
    )

    rows = term_collocations_lift(spark, sf_dir).collect()
    assert 0 < len(rows) <= 30
    vocab = {r.term for r in vocab_top_terms(spark, sf_dir).collect()}
    for r in rows:
        assert r.term_a < r.term_b  # canonical pair order
        assert r.term_a in vocab and r.term_b in vocab  # head-bounded
        assert r.n_ab >= COLLOC_MIN_SUPPORT
        # co-occurrence can't exceed either marginal
        assert r.n_ab <= min(r.df_a, r.df_b)
    lifts = [r.lift for r in rows]
    assert lifts == sorted(lifts, reverse=True)


def test_term_ppmi_similarity_bounds(spark, sf_dir):
    from debezium_server_bigquery_spark.functions.curation import (
        term_ppmi_similarity,
        vocab_top_terms,
    )

    rows = term_ppmi_similarity(spark, sf_dir).collect()
    assert 0 < len(rows) <= 30
    vocab = {r.term for r in vocab_top_terms(spark, sf_dir).collect()}
    for r in rows:
        assert r.term_a < r.term_b  # canonical pair order
        assert r.term_a in vocab and r.term_b in vocab  # head-bounded
        assert r.n_shared_ctx >= 1
        # cosine of nonnegative vectors lives in [0, 1] (+rounding slack)
        assert 0.0 <= r.cosine <= 1.000001
    cos = [r.cosine for r in rows]
    assert cos == sorted(cos, reverse=True)


def test_quality_percentile_by_lang_exact_ranks(spark, sf_dir):
    from collections import defaultdict

    from debezium_server_bigquery_spark.functions.curation import (
        quality_percentile_by_lang,
    )

    rows = quality_percentile_by_lang(spark, sf_dir).collect()
    assert rows
    by_lang = defaultdict(list)
    for r in rows:
        by_lang[r.lang].append(r)
    for lang, members in by_lang.items():
        ranks = [m.lang_rank for m in members]
        assert ranks == list(range(1, len(members) + 1))  # contiguous, 1-based
        assert members[-1].pct_rank == 1.0  # the top doc is the 100th pctile
        scores = [m.quality_score for m in members]
        assert scores == sorted(scores)  # rank follows score within lang


def test_neyman_allocation_favors_variance(spark, tmp_path):
    import math

    from debezium_server_bigquery_spark.functions.curation import (
        NEYMAN_BUDGET,
        neyman_allocation_plan,
    )

    rows = []
    # lang aa: 4 docs, constant length -> sigma 0 -> zero allocation
    for i in range(4):
        rows.append((i, "t", "aa", "s", 100))
    # lang bb: 4 docs, spread lengths -> all of the budget (clipped to 4)
    for i, n in enumerate([10, 200, 400, 800]):
        rows.append((10 + i, "t", "bb", "s", n))
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    out = {r.lang: r for r in neyman_allocation_plan(spark, str(tmp_path)).collect()}
    assert out["aa"].neyman_share == 0.0 and out["aa"].n_alloc == 0
    assert out["bb"].neyman_share == 1.0
    assert out["bb"].n_alloc == 4 and out["bb"].clipped  # budget >> stratum
    assert NEYMAN_BUDGET > 4
