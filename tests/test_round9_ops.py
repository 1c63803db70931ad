"""Semantics pins for the round-9 operators on constructed micro-corpora.

Each test writes a tiny documents/events parquet into tmp_path and runs
the registered query against it — same entry point the driver grades,
fixture-level control over the invariant being pinned:

- winnowing (SIGMOD'03): any shared run of >= W + K - 1 words MUST yield
  a common fingerprint (the algorithm's detection guarantee);
- boilerplate clusters: exact cluster size and corpus share;
- vocab coverage: cumulative coverage equals hand-computed top-k mass;
- Zipf fit: an exactly-Zipfian corpus (freq = C / rank) fits slope -1;
- exact quantiles: percentile_disc semantics on a known 1..100 ladder;
- session path trigrams: session gaps fence off cross-session paths.
"""

from __future__ import annotations

import datetime

import pytest

from debezium_server_bigquery_spark.functions.curation import (
    boilerplate_prefix_clusters,
    vocab_coverage_curve,
    zipf_slope_fit,
)
from debezium_server_bigquery_spark.functions.spans import (
    WINNOW_K,
    WINNOW_W,
    winnowing_dup_pairs,
)
from debezium_server_bigquery_spark.plans.behavior import session_path_trigrams
from debezium_server_bigquery_spark.plans.diagnostics import (
    exact_quantiles_by_type,
)


def _write_docs(spark, tmp_path, texts):
    rows = [
        (i, t, "en", "src0", len(t)) for i, t in enumerate(texts)
    ]
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


def test_winnowing_detects_shared_run(spark, tmp_path):
    guarantee = WINNOW_K + WINNOW_W - 1  # any shared run this long is found
    shared = " ".join(f"s{i}" for i in range(guarantee))
    doc_a = "alpha beta gamma " + shared + " delta epsilon zeta eta theta"
    doc_b = "one two three four five " + shared + " six seven eight nine"
    doc_c = " ".join(f"u{i}" for i in range(30))  # no overlap with anyone
    sf = _write_docs(spark, tmp_path, [doc_a, doc_b, doc_c])
    rows = winnowing_dup_pairs(spark, sf).collect()
    pairs = {(r.doc_a, r.doc_b) for r in rows}
    assert (0, 1) in pairs, "the W+K-1 guarantee run must surface the pair"
    assert all(2 not in p for p in pairs), "disjoint doc must pair with no one"
    r = next(r for r in rows if (r.doc_a, r.doc_b) == (0, 1))
    assert r.n_shared >= 1 and 0 < r.containment <= 1.0


def test_boilerplate_prefix_cluster_share(spark, tmp_path):
    header = "terms of service for this site apply to"  # exactly 8 tokens
    texts = [header + f" clause {i} body text here" for i in range(3)]
    texts.append("a completely different document body with no template")
    sf = _write_docs(spark, tmp_path, texts)
    rows = boilerplate_prefix_clusters(spark, sf).collect()
    assert len(rows) == 1  # the singleton prefix is filtered (n_docs >= 2)
    assert rows[0].prefix == header
    assert rows[0].n_docs == 3
    assert rows[0].share == pytest.approx(0.75)


def test_vocab_coverage_matches_hand_count(spark, tmp_path):
    # frequencies: w1 x 40, w2 x 30, w3 x 20, w4 x 6, w5..w10 x 1 => 102 occ
    text = " ".join(
        ["w1"] * 40 + ["w2"] * 30 + ["w3"] * 20 + ["w4"] * 6
        + [f"r{i}" for i in range(6)]
    )
    sf = _write_docs(spark, tmp_path, [text])
    rows = {r.k: r for r in vocab_coverage_curve(spark, sf).collect()}
    assert set(rows) == {5, 10}  # vocab has 10 terms; 20/30/1000/10000 absent
    assert rows[5].total_occurrences == 102
    assert rows[5].cum_occurrences == 40 + 30 + 20 + 6 + 1
    assert rows[10].cum_occurrences == 102
    assert rows[10].coverage == pytest.approx(1.0)
    assert rows[5].coverage == pytest.approx(97 / 102, abs=1e-6)


def test_zipf_slope_on_exact_zipf_corpus(spark, tmp_path):
    # freq(rank r) = 840 / r exactly => log freq = log 840 - log rank:
    # a perfect line of slope -1 no matter the log base or noise-free fit.
    freqs = [840 // r for r in range(1, 9) if 840 % r == 0]
    text = " ".join(
        " ".join([f"t{r}"] * f) for r, f in enumerate(freqs, start=1)
    )
    sf = _write_docs(spark, tmp_path, [text])
    row = zipf_slope_fit(spark, sf).collect()[0]
    assert row.n_terms == len(freqs)
    assert row.slope == pytest.approx(-1.0, abs=1e-6)


def test_exact_quantiles_on_value_ladder(spark, tmp_path):
    base = datetime.datetime(2024, 1, 1)
    rows = [
        (i, base + datetime.timedelta(seconds=i), 1, "click", float(i), "{}")
        for i in range(1, 101)  # values 1.0 .. 100.0
    ]
    sf = _write_events(spark, tmp_path, rows)
    got = {
        r.quantile: r.value
        for r in exact_quantiles_by_type(spark, sf).collect()
    }
    # ceil(q * 100)-th smallest of 1..100 is exactly q*100 for these q
    assert got == {0.25: 25.0, 0.5: 50.0, 0.75: 75.0, 0.9: 90.0, 0.99: 99.0}


def test_similarity_histogram_collapse_detected(spark, tmp_path):
    """A fully collapsed embedding space (all vectors identical) must put
    100% of sampled-pair mass in the top cosine bin — the failure mode the
    audit exists to catch."""
    from debezium_server_bigquery_spark.functions.similarity import (
        embedding_similarity_histogram,
    )

    vec = [1.0, 2.0, 3.0, 4.0]
    rows = [(i, vec, i % 3) for i in range(40)]
    spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    ).write.mode("overwrite").parquet(str(tmp_path / "embeddings.parquet"))
    out = embedding_similarity_histogram(spark, str(tmp_path)).collect()
    assert len(out) == 1
    assert out[0].bin == 19 and out[0].sim_hi == 1.0
    assert out[0].share == pytest.approx(1.0)
    assert out[0].n_pairs > 0  # 40 ids over 16 buckets must collide somewhere


def test_source_quality_report_flags_mirror_source(spark, tmp_path):
    from debezium_server_bigquery_spark.functions.curation import (
        source_quality_report,
    )

    mirror = "the quick brown fox jumps over the lazy dog again"
    texts = [
        (0, mirror, "en", "srcA", len(mirror)),
        (1, mirror, "en", "srcA", len(mirror)),  # exact dup inside srcA
        (2, "a unique document body with its own words here", "en", "srcA", 47),
        (3, mirror, "en", "srcB", len(mirror)),  # mirror copy in srcB
    ]
    spark.createDataFrame(
        texts, "doc_id long, text string, lang string, source string, n_chars long"
    ).write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    rows = {r.source: r for r in source_quality_report(spark, str(tmp_path)).collect()}
    assert rows["srcA"].n_docs == 3 and rows["srcA"].share == pytest.approx(0.75)
    # dup flag is corpus-wide: srcB's single doc is a copy of srcA's text
    assert rows["srcB"].dup_rate == pytest.approx(1.0)
    assert rows["srcA"].dup_rate == pytest.approx(2 / 3, abs=1e-6)


def test_quality_dup_calibration_separates_deciles(spark, tmp_path):
    from debezium_server_bigquery_spark.functions.curation import (
        quality_vs_dup_calibration,
    )

    junk = "spam spam spam"  # < 10 words -> low quality; 10 identical copies
    good = (
        "the quick brown fox jumps over a lazy dog and the story keeps "
        "going on for quite a while longer"
    )
    texts = [(i, junk, "en", "s", len(junk)) for i in range(10)]
    texts += [(10 + i, good + f" variant {i}", "en", "s", 99) for i in range(10)]
    spark.createDataFrame(
        texts, "doc_id long, text string, lang string, source string, n_chars long"
    ).write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    rows = {r.quality_decile: r for r in quality_vs_dup_calibration(spark, str(tmp_path)).collect()}
    assert sum(r.n_docs for r in rows.values()) == 20
    assert sum(r.n_dups for r in rows.values()) == 10
    # the 10 identical junk docs rank lowest -> deciles 0..4 all-dup,
    # the unique good docs fill 5..9 dup-free
    for d in range(5):
        assert rows[d].dup_rate == pytest.approx(1.0)
    for d in range(5, 10):
        assert rows[d].dup_rate == pytest.approx(0.0)


def test_winnowing_verified_exact_jaccard(spark, tmp_path):
    from debezium_server_bigquery_spark.functions.spans import (
        winnowing_verified_pairs,
    )

    guarantee = WINNOW_K + WINNOW_W - 1
    shared = " ".join(f"s{i}" for i in range(guarantee + 3))
    doc_a = "alpha beta gamma delta " + shared
    doc_b = "one two three four five " + shared
    sf = _write_docs(spark, tmp_path, [doc_a, doc_b])
    rows = winnowing_verified_pairs(spark, sf).collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r.doc_a, r.doc_b) == (0, 1)
    # the shared run contributes shared-run k-grams to both sets
    assert r.n_common_grams >= guarantee + 3 - (WINNOW_K - 1)
    assert 0 < r.exact_jaccard <= 1.0


def test_cusum_finds_step_change_day(spark, tmp_path):
    from debezium_server_bigquery_spark.plans.behavior import (
        events_cusum_changepoint,
    )

    base = datetime.datetime(2024, 1, 1)
    rows, eid = [], 0
    # 10 days at 5/day, then a step UP to 20/day for 10 days:
    # |CUSUM| of the scaled deviation peaks exactly on the last
    # pre-step day (day index 9)
    for d in range(20):
        per_day = 5 if d < 10 else 20
        for i in range(per_day):
            rows.append(
                (eid, base + datetime.timedelta(days=d, minutes=i), 1,
                 "click", 1.0, "{}")
            )
            eid += 1
    sf = _write_events(spark, tmp_path, rows)
    out = {r.event_type: r for r in events_cusum_changepoint(spark, sf).collect()}
    r = out["click"]
    epoch_day0 = (base - datetime.datetime(1970, 1, 1)).days
    assert r.change_day == epoch_day0 + 9
    assert r.direction == -1  # pre-step days run below the overall mean
    assert r.n_days == 20


def test_order_ship_latency_quantiles_ladder(spark, tmp_path):
    from debezium_server_bigquery_spark.plans.diagnostics import (
        order_to_ship_latency_quantiles,
    )

    d0 = datetime.date(2024, 1, 1)
    orders = [(k, 1, "O", 10.0, d0, "1-URGENT") for k in range(1, 101)]
    spark.createDataFrame(
        orders,
        "o_orderkey long, o_custkey long, o_orderstatus string, "
        "o_totalprice double, o_orderdate date, o_orderpriority string",
    ).write.mode("overwrite").parquet(str(tmp_path / "orders.parquet"))
    # order k ships k days after o_orderdate -> latency ladder 1..100
    li = [(k, 1, 1, 1, 1.0, 1.0, 0.0, 0.0, "N", "O",
           d0 + datetime.timedelta(days=k)) for k in range(1, 101)]
    spark.createDataFrame(
        li,
        "l_orderkey long, l_partkey long, l_suppkey long, l_linenumber long, "
        "l_quantity double, l_extendedprice double, l_discount double, "
        "l_tax double, l_returnflag string, l_linestatus string, "
        "l_shipdate date",
    ).write.mode("overwrite").parquet(str(tmp_path / "lineitem.parquet"))
    got = {
        r.quantile: r.ship_days
        for r in order_to_ship_latency_quantiles(spark, str(tmp_path)).collect()
    }
    assert got == {0.5: 50, 0.9: 90, 0.99: 99}


def test_props_key_profile_type_split(spark, tmp_path):
    from debezium_server_bigquery_spark.plans.diagnostics import props_key_profile

    t0 = datetime.datetime(2024, 1, 1)
    rows = [
        (1, t0, 1, "view", 1.0, '{"k": 3, "name": "x"}'),
        (2, t0, 1, "view", 1.0, '{"k": 4.5}'),
        (3, t0, 1, "view", 1.0, '{"k": -7}'),
        (4, t0, 1, "view", 1.0, "{}"),  # no keys at all
    ]
    sf = _write_events(spark, tmp_path, rows)
    out = {r.key: r for r in props_key_profile(spark, sf).collect()}
    assert set(out) == {"k", "name"}
    k = out["k"]
    assert (k.n_present, k.n_int, k.n_double, k.n_other) == (3, 2, 1, 0)
    assert k.presence_rate == pytest.approx(0.75)
    assert (out["name"].n_present, out["name"].n_other) == (1, 1)


def test_session_duration_quantiles_known_sessions(spark, tmp_path):
    from debezium_server_bigquery_spark.plans.diagnostics import (
        session_duration_quantiles,
    )

    t0 = datetime.datetime(2024, 1, 1, 9, 0, 0)  # a Monday -> weekday 0
    rows = []
    # 10 users, user u has one session lasting 60*u seconds (2 events)
    for u in range(1, 11):
        rows.append((u * 2, t0, u, "view", 1.0, "{}"))
        rows.append(
            (u * 2 + 1, t0 + datetime.timedelta(seconds=60 * u), u, "click",
             1.0, "{}")
        )
    sf = _write_events(spark, tmp_path, rows)
    got = {
        r.quantile: (r.start_weekday, r.duration_s)
        for r in session_duration_quantiles(spark, sf).collect()
    }
    # durations 60..600: p50 = 5th value = 300, p90 = 9th = 540
    assert got == {0.5: (0, 300), 0.9: (0, 540)}


def test_knn_probe_orthogonal_clusters(spark, tmp_path):
    """Two orthogonal clusters: a vector predicts correctly IFF its hash
    bucket contains at least one same-label peer (within-cluster cosine
    ~1 beats the cross-cluster 0) — the probe is a sampled estimator, so
    the exact expected accuracy is computable from the deterministic
    bucket assignment, not assumed to be 1.0."""
    import hashlib

    from debezium_server_bigquery_spark.functions.similarity import (
        SIMHIST_BUCKETS,
        embedding_label_knn_accuracy,
    )

    n = 40
    rows = []
    for i in range(n):
        label = i % 2
        vec = (
            [1.0, 0.001 * i, 0.0, 0.0]
            if label == 0
            else [0.0, 0.0, 1.0, 0.001 * i]
        )
        rows.append((i, vec, label))
    spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    ).write.mode("overwrite").parquet(str(tmp_path / "embeddings.parquet"))

    def bucket(vid: int) -> int:
        h = hashlib.md5(f"simhist:{vid}".encode()).hexdigest()[:15]
        return int(h, 16) % SIMHIST_BUCKETS

    members: dict[int, list[int]] = {}
    for i in range(n):
        members.setdefault(bucket(i), []).append(i)
    expected: dict[int, tuple[int, int]] = {0: (0, 0), 1: (0, 0)}
    for b, ids in members.items():
        if len(ids) < 2:
            continue  # no neighbor at all -> not probed
        for i in ids:
            lab = i % 2
            probed, correct = expected[lab]
            has_peer = any(j != i and j % 2 == lab for j in ids)
            expected[lab] = (probed + 1, correct + (1 if has_peer else 0))
    out = {r.label: r for r in embedding_label_knn_accuracy(spark, str(tmp_path)).collect()}
    for lab in (0, 1):
        probed, correct = expected[lab]
        assert out[lab].n_probed == probed
        assert out[lab].n_correct == correct
        assert out[lab].knn_accuracy == pytest.approx(
            round(correct / probed, 6)
        )


def test_session_path_trigrams_respect_session_gap(spark, tmp_path):
    t0 = datetime.datetime(2024, 1, 1, 12, 0, 0)
    m = datetime.timedelta(minutes=1)
    gap = datetime.timedelta(minutes=31)  # > 30-min session gap
    rows = [
        (1, t0 + 0 * m, 7, "view", 1.0, "{}"),
        (2, t0 + 1 * m, 7, "click", 1.0, "{}"),
        (3, t0 + 2 * m, 7, "purchase", 1.0, "{}"),
        # new session: the cross-boundary (click, purchase, view) and
        # (purchase, view, click) windows must NOT appear
        (4, t0 + 2 * m + gap, 7, "view", 1.0, "{}"),
        (5, t0 + 3 * m + gap, 7, "click", 1.0, "{}"),
        (6, t0 + 4 * m + gap, 7, "view", 1.0, "{}"),
    ]
    sf = _write_events(spark, tmp_path, rows)
    got = {
        (r.step1, r.step2, r.step3): r.n_paths
        for r in session_path_trigrams(spark, sf).collect()
    }
    assert got == {
        ("view", "click", "purchase"): 1,
        ("view", "click", "view"): 1,
    }
