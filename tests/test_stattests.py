"""Semantics pins for the stattests operators on constructed fixtures.

- KS: the distributed grouped-CDF computation must equal a brute-force
  local KS over the SAME hash-assigned split labels;
- kappa: hand-built 2×2 tables pin perfect agreement (1.0) and exact
  chance agreement (0.0);
- EWMA: a constant series forecasts itself (mae = bias = 0); the
  gap-aware guard refuses to score days whose 14 trailing rows are not
  14 consecutive days; a linear ramp matches the integer-weight
  reference computed locally;
- encoding report: each anomaly class counts exactly once from a
  one-doc-per-class corpus.
"""

from __future__ import annotations

import datetime

from pyspark.sql import functions as F

from debezium_server_bigquery_spark.functions.stattests import (
    _EWMA_DEN,
    _EWMA_W,
    EWMA_LAGS,
    encoding_anomaly_report,
    events_ewma_forecast_error,
    label_agreement_kappa,
    split_ks_statistic,
)


def _write_docs(spark, tmp_path, rows):
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    return str(tmp_path)


def _write_events(spark, tmp_path, rows):
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    ).write.mode("overwrite").parquet(str(tmp_path / "events.parquet"))
    return str(tmp_path)


# --------------------------------------------------------------------- KS


def test_ks_matches_bruteforce_over_hash_splits(spark, tmp_path):
    # 300 docs, lengths drawn from two deterministic ramps so the train
    # and test CDFs genuinely differ; labels come from the REAL split
    # hash, the reference recomputes KS locally from those labels.
    from debezium_server_bigquery_spark.functions.curation import split_of

    rows = [
        (i, "t", "en", "s", 50 + (i * 7) % 200) for i in range(300)
    ]
    sf = _write_docs(spark, tmp_path, rows)
    labels = {
        r.doc_id: r.split
        for r in spark.createDataFrame(
            [(i,) for i in range(300)], "doc_id long"
        )
        .select("doc_id", split_of(F.col("doc_id")).alias("split"))
        .collect()
    }
    train = sorted(n for (i, _, _, _, n) in rows if labels[i] == "train")
    test = sorted(n for (i, _, _, _, n) in rows if labels[i] == "test")
    values = sorted(set(train) | set(test))
    d = 0.0
    for v in values:
        ct = sum(1 for x in train if x <= v)
        cs = sum(1 for x in test if x <= v)
        d = max(d, abs(ct / len(train) - cs / len(test)))
    out = {r.lang: r for r in split_ks_statistic(spark, sf).collect()}
    got = out["en"]
    assert got.n_train == len(train) and got.n_test == len(test)
    assert abs(got.ks_stat - d) < 1e-6


# ------------------------------------------------------------------ kappa


def test_kappa_perfect_and_chance_agreement(spark, tmp_path):
    # A = len >= 400; B = one '.' per 200 chars.  Four archetypes:
    a1b1 = "." * 400
    a1b0 = "x" * 400
    a0b1 = "x" * 99 + "."
    a0b0 = "x" * 100
    rows = []
    # lang aa: two A1B1 + two A0B0 -> perfect agreement, kappa = 1
    for i, t in enumerate([a1b1, a1b1, a0b0, a0b0]):
        rows.append((i, t, "aa", "s", len(t)))
    # lang bb: one of each cell -> po = pe = 0.5, kappa = 0
    for i, t in enumerate([a1b1, a1b0, a0b1, a0b0]):
        rows.append((10 + i, t, "bb", "s", len(t)))
    sf = _write_docs(spark, tmp_path, rows)
    out = {r.lang: r for r in label_agreement_kappa(spark, sf).collect()}
    assert out["aa"].kappa == 1.0
    assert out["bb"].kappa == 0.0
    assert out["bb"].p_len_gate == 0.5 and out["bb"].p_punct_gate == 0.5


# ------------------------------------------------------------------- EWMA


def _day(d: int) -> datetime.datetime:
    return datetime.datetime(2024, 1, 1) + datetime.timedelta(days=d)


def test_ewma_constant_series_zero_error(spark, tmp_path):
    rows = []
    eid = 0
    for d in range(20):  # 20 consecutive days, 3 events each
        for _ in range(3):
            rows.append((eid, _day(d), 1, "view", 1.0, "{}"))
            eid += 1
    sf = _write_events(spark, tmp_path, rows)
    out = events_ewma_forecast_error(spark, sf).collect()
    assert len(out) == 1
    r = out[0]
    assert r.n_days_scored == 20 - EWMA_LAGS
    assert r.mae == 0.0 and r.mean_bias == 0.0


def test_ewma_gap_disqualifies_misaligned_days(spark, tmp_path):
    # days 0..9 and 11..25: only day 25 has 14 consecutive prior days.
    rows = []
    eid = 0
    for d in list(range(10)) + list(range(11, 26)):
        rows.append((eid, _day(d), 1, "view", 1.0, "{}"))
        eid += 1
    sf = _write_events(spark, tmp_path, rows)
    out = events_ewma_forecast_error(spark, sf).collect()
    assert len(out) == 1 and out[0].n_days_scored == 1


def test_ewma_ramp_matches_integer_weight_reference(spark, tmp_path):
    # x_d = d + 1 events on day d, days 0..15 -> scored days 14 and 15.
    rows = []
    eid = 0
    for d in range(16):
        for _ in range(d + 1):
            rows.append((eid, _day(d), 1, "view", 1.0, "{}"))
            eid += 1
    sf = _write_events(spark, tmp_path, rows)
    errs = []
    for t in (14, 15):
        num = sum(w * (t - k + 1) for k, w in enumerate(_EWMA_W, start=1))
        errs.append((t + 1) * _EWMA_DEN - num)
    exp_mae = round(sum(abs(e) for e in errs) / len(errs) / float(_EWMA_DEN), 6)
    exp_bias = round(sum(errs) / len(errs) / float(_EWMA_DEN), 6)
    out = events_ewma_forecast_error(spark, sf).collect()
    assert len(out) == 1
    assert out[0].n_days_scored == 2
    assert abs(out[0].mae - exp_mae) < 1e-9
    assert abs(out[0].mean_bias - exp_bias) < 1e-9


# -------------------------------------------------------------- encoding


def test_encoding_report_counts_each_anomaly_once(spark, tmp_path):
    docs = [
        (0, "clean ascii text here", "en", "s", 21),
        (1, "bad � byte", "en", "s", 10),
        (2, "ctrl\x01char", "en", "s", 9),
        (3, "x" * 41 + " trailing", "en", "s", 50),
        (4, "café au lait", "en", "s", 12),
    ]
    sf = _write_docs(spark, tmp_path, docs)
    r = encoding_anomaly_report(spark, sf).collect()[0]
    assert r.n_docs == 5
    assert r.n_replacement_char == 1
    assert r.n_control_chars == 1
    assert r.n_long_token == 1
    # the replacement char and the accented char are both non-ASCII
    assert r.n_non_ascii == 2
    assert abs(r.frac_long_token - 0.2) < 1e-9


def test_mutual_information_independent_and_determined(spark, tmp_path):
    import math

    from debezium_server_bigquery_spark.functions.stattests import (
        lang_source_mutual_information,
    )

    # independent grid: every (lang, source) cell equal -> MI = 0
    rows = []
    i = 0
    for lang in ("aa", "bb"):
        for src in ("s1", "s2"):
            for _ in range(5):
                rows.append((i, "t", lang, src, 1))
                i += 1
    sf = _write_docs(spark, tmp_path, rows)
    out = lang_source_mutual_information(spark, sf).collect()[0]
    assert out.mi_nats == 0.0 and out.normalized_mi == 0.0
    assert abs(out.h_lang - round(math.log(2), 6)) < 1e-9

    # determined: lang fixes source -> MI = H = ln 2, normalized 1
    rows = []
    i = 0
    for lang, src in (("aa", "s1"), ("bb", "s2")):
        for _ in range(5):
            rows.append((i, "t", lang, src, 1))
            i += 1
    sf = _write_docs(spark, tmp_path, rows)
    out = lang_source_mutual_information(spark, sf).collect()[0]
    assert abs(out.mi_nats - round(math.log(2), 6)) < 1e-6
    assert out.normalized_mi == 1.0


def test_spearman_monotone_and_inverse(spark, tmp_path):
    """Quality ties make rank-by-id; craft lengths so rho hits +-1:
    identical quality everywhere means mr_q is one shared midrank (zero
    variance -> NULL), so vary the punctuation gate to give two quality
    levels aligned (then reversed) with length."""
    from debezium_server_bigquery_spark.functions.stattests import (
        spearman_quality_length,
    )

    clean = "the cat sat on the mat with a dog and more words here now"
    dirty = "!!! ??? *** %%% $$$ ###"  # fails length + punct gates
    rows = []
    # lang aa: high-quality docs are the LONG ones -> rho = +1
    rows.append((0, clean * 3, "aa", "s", len(clean * 3)))
    rows.append((1, clean * 2, "aa", "s", len(clean * 2)))
    rows.append((2, dirty, "aa", "s", len(dirty)))
    # lang bb: high-quality docs are the SHORT ones -> rho = -1
    rows.append((10, clean, "bb", "s", len(clean)))
    rows.append((11, dirty * 20, "bb", "s", len(dirty * 20)))
    rows.append((12, dirty * 30, "bb", "s", len(dirty * 30)))
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    out = {r.lang: r for r in spearman_quality_length(spark, str(tmp_path)).collect()}
    assert out["aa"].spearman_rho is not None and out["aa"].spearman_rho > 0.5
    assert out["bb"].spearman_rho is not None and out["bb"].spearman_rho < -0.5


def test_cronbach_alpha_identical_items_is_one(spark, tmp_path):
    """A corpus where all three gates agree on every doc (all pass or
    all fail) has perfectly consistent items -> alpha = 1."""
    from debezium_server_bigquery_spark.functions.stattests import (
        quality_items_cronbach_alpha,
    )

    good = "the cat sat on the mat with a dog and some more plain words"
    bad = "@@@@ ^^^^ &&&&"  # 3 tokens: fails length, stopword, punct gates
    rows = [(i, good, "en", "s", len(good)) for i in range(5)]
    rows += [(10 + i, bad, "en", "s", len(bad)) for i in range(5)]
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    out = quality_items_cronbach_alpha(spark, str(tmp_path)).collect()[0]
    # good docs pass all gates (i=1,1,1), bad docs fail all (0,0,0)
    assert out.p_len == 0.5 and out.p_stopword == 0.5 and out.p_punct == 0.5
    assert out.cronbach_alpha == 1.0
