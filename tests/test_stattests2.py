"""Semantics pins for Mann-Whitney, join-cardinality profile, and the
Kaplan-Meier funnel survival curve on constructed fixtures."""

from __future__ import annotations

import datetime
import math

from debezium_server_bigquery_spark.functions.stattests import (
    mann_whitney_source_shift,
)
from debezium_server_bigquery_spark.plans.diagnostics import (
    join_cardinality_profile,
)
from debezium_server_bigquery_spark.plans.funnel import funnel_survival_km


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


def test_mann_whitney_separated_sources(spark, tmp_path):
    # source A strictly shorter than source B: no ties, closed-form z.
    rows = [(i, "t", "en", "A", n) for i, n in enumerate([1, 2, 3])]
    rows += [(10 + i, "t", "en", "B", n) for i, n in enumerate([4, 5, 6])]
    sf = _write_docs(spark, tmp_path, rows)
    out = {r.source: r for r in mann_whitney_source_shift(spark, sf).collect()}
    n_s, n_r, n = 3, 3, 6
    # A holds ranks 1..3: R=6, U = R - n_s(n_s+1)/2 = 0
    u, mu = 0.0, n_s * n_r / 2.0
    var = n_s * n_r / 12.0 * (n + 1)  # no ties
    z = round((u - mu) / math.sqrt(var), 6)
    assert out["A"].n_s == 3 and out["A"].n_rest == 3
    assert abs(out["A"].z_mw - z) < 1e-9
    assert abs(out["B"].z_mw + z) < 1e-9  # symmetric one-vs-rest


def test_mann_whitney_identical_sources_z_zero(spark, tmp_path):
    rows = [(i, "t", "en", "A", 5) for i in range(3)]
    rows += [(10 + i, "t", "en", "B", 5) for i in range(3)]
    sf = _write_docs(spark, tmp_path, rows)
    out = {r.source: r for r in mann_whitney_source_shift(spark, sf).collect()}
    # every value tied: variance collapses to zero -> NULL
    assert out["A"].z_mw is None and out["B"].z_mw is None


def test_join_cardinality_exact_products(spark, tmp_path):
    def w(name, schema, rows):
        spark.createDataFrame(rows, schema).write.mode("overwrite").parquet(
            str(tmp_path / f"{name}.parquet")
        )

    w("customer", "c_custkey long, c_nationkey long", [(1, 7), (2, 7), (3, 8)])
    w("orders", "o_orderkey long, o_custkey long",
      [(10, 1), (11, 1), (12, 2), (13, 99)])  # custkey 99 unmatched
    w("lineitem", "l_orderkey long, l_partkey long, l_suppkey long",
      [(10, 100, 200), (10, 101, 200), (11, 100, 201)])
    w("part", "p_partkey long", [(100,), (101,), (102,)])
    w("supplier", "s_suppkey long", [(200,), (201,)])
    w("nation", "n_nationkey long", [(7,), (8,)])
    out = {r.edge: r for r in join_cardinality_profile(spark, str(tmp_path)).collect()}
    co = out["customer->orders"]
    assert (co.n_left, co.n_right, co.n_keys_matched) == (3, 4, 2)
    assert int(co.join_rows) == 3  # cust1 x 2 orders + cust2 x 1
    assert co.max_right_fanout == 2
    ol = out["orders->lineitem"]
    assert int(ol.join_rows) == 3 and ol.max_right_fanout == 2
    nc = out["nation->customer"]
    assert int(nc.join_rows) == 3 and nc.max_right_fanout == 2


def _ts(d: int) -> datetime.datetime:
    return datetime.datetime(2024, 1, 1) + datetime.timedelta(days=d)


def test_km_survival_with_censoring(spark, tmp_path):
    rows = [
        (0, _ts(0), 1, "view", 1.0, "{}"),
        (1, _ts(2), 1, "purchase", 1.0, "{}"),
        (2, _ts(0), 2, "view", 1.0, "{}"),
        (3, _ts(2), 2, "purchase", 1.0, "{}"),
        (4, _ts(0), 3, "view", 1.0, "{}"),  # never purchases
        (5, _ts(5), 4, "click", 1.0, "{}"),  # horizon extender only
    ]
    sf = _write_events(spark, tmp_path, rows)
    out = funnel_survival_km(spark, sf).collect()
    assert len(out) == 1  # only day 2 has conversions
    r = out[0]
    assert r.cohort == "2024-01" and r.t_days == 2
    assert r.n_at_risk == 3 and r.n_events == 2
    assert abs(r.survival - round(1 / 3, 6)) < 1e-9


def test_km_risk_set_exhaustion_yields_zero(spark, tmp_path):
    rows = [
        (0, _ts(0), 1, "view", 1.0, "{}"),
        (1, _ts(1), 1, "purchase", 1.0, "{}"),
        (2, _ts(0), 2, "view", 1.0, "{}"),
        (3, _ts(1), 2, "purchase", 1.0, "{}"),
    ]
    sf = _write_events(spark, tmp_path, rows)
    out = funnel_survival_km(spark, sf).collect()
    assert len(out) == 1
    assert out[0].n_at_risk == 2 and out[0].n_events == 2
    assert out[0].survival == 0.0


def test_dispersion_index_poisson_vs_constant(spark, tmp_path):
    from debezium_server_bigquery_spark.functions.stattests import (  # noqa: F401
        split_ks_statistic,
    )
    from debezium_server_bigquery_spark.functions.timeseries import (
        events_dispersion_index,
    )

    rows = []
    eid = 0
    # type "const": 3 events every day for 10 days -> variance 0, D = 0
    for d in range(10):
        for _ in range(3):
            rows.append((eid, _ts(d), 1, "const", 1.0, "{}"))
            eid += 1
    # type "ramp": day d has d+1 events, days 0..4 -> known moments
    for d in range(5):
        for _ in range(d + 1):
            rows.append((eid, _ts(d), 1, "ramp", 1.0, "{}"))
            eid += 1
    sf = _write_events(spark, tmp_path, rows)
    out = {r.event_type: r for r in events_dispersion_index(spark, sf).collect()}
    assert out["const"].dispersion == 0.0
    # x = 1..5: n=5, sx=15, sxx=55 -> var_num = 5*55-225 = 50
    # D = 50 / (4 * 15) = 0.833333
    assert abs(out["ramp"].dispersion - round(50 / 60, 6)) < 1e-9
    assert out["ramp"].mean_daily == 3.0


def test_dp_histogram_noise_is_seeded_laplace(spark, tmp_path):
    import math

    from debezium_server_bigquery_spark.functions.dedup_fuzzy import hash60  # noqa: F401
    from debezium_server_bigquery_spark.plans.diagnostics import (
        _DP_U_SCALE,
        dp_noisy_histogram_eval,
    )
    from pyspark.sql import functions as F

    rows = [(i, "t", "en" if i < 7 else "fr", "s", 5) for i in range(10)]
    sf = _write_docs(spark, tmp_path, rows)
    out = {r.lang: r for r in dp_noisy_histogram_eval(spark, sf).collect()}
    assert out["en"].n_true == 7 and out["fr"].n_true == 3
    # replicate the seeded draw for 'en' through the same hash column
    from debezium_server_bigquery_spark.functions.dedup_fuzzy import hash60 as h60

    u_row = (
        spark.range(1)
        .select(
            (F.pmod(h60(F.lit("dp:en")), F.lit(_DP_U_SCALE)).cast("double")
             / F.lit(float(_DP_U_SCALE))).alias("u")
        )
        .collect()[0]
    )
    u = u_row.u
    expected = round(-1.0 * math.copysign(1.0, u - 0.5) * math.log(1.0 - 2.0 * abs(u - 0.5)), 6)
    assert abs(out["en"].noise - expected) < 1e-9
    assert abs(out["en"].n_released - round(7 + expected + 0.0, 6)) < 1e-6


def test_conformal_coverage_on_constructed_series(spark, tmp_path):
    """Constant calibration series -> residuals 0 -> q_hat 0; a test day
    matching the dow mean is covered, a bursty one is not."""
    from debezium_server_bigquery_spark.functions.timeseries import (
        conformal_volume_intervals,
    )

    rows, eid = [], 0
    base = datetime.datetime(2024, 1, 1)
    # 21 calibration days with exactly 2 events each
    for d in range(21):
        for _ in range(2):
            rows.append((eid, base + datetime.timedelta(days=d), 1, "view", 1.0, "{}"))
            eid += 1
    # 4 test days: three at the fitted rate, one burst of 9 events
    for d in (21, 22, 23):
        for _ in range(2):
            rows.append((eid, base + datetime.timedelta(days=d), 1, "view", 1.0, "{}"))
            eid += 1
    for _ in range(9):
        rows.append((eid, base + datetime.timedelta(days=24), 1, "view", 1.0, "{}"))
        eid += 1
    sf = _write_events(spark, tmp_path, rows)
    out = conformal_volume_intervals(spark, sf).collect()
    assert len(out) == 1
    r = out[0]
    assert r.n_cal == 21 and r.n_test == 4
    assert r.q_hat == 0.0
    assert abs(r.coverage - 0.75) < 1e-9  # the burst day escapes the band


def test_mase_trend_series_closed_form(spark, tmp_path):
    """Linear daily trend: the lag-7 naive errs by exactly 7 in-sample;
    the dow-mean forecaster errs by exactly 14 on the next 4 test days
    (the dow mean sits 14 below the continued trend) -> MASE = 2."""
    from debezium_server_bigquery_spark.functions.timeseries import (
        forecast_mase_by_type,
    )

    rows, eid = [], 0
    base = datetime.datetime(2024, 1, 1)
    for d in range(25):  # 21 calibration days + 4 test days
        for _ in range(d + 1):
            rows.append((eid, base + datetime.timedelta(days=d), 1, "view", 1.0, "{}"))
            eid += 1
    sf = _write_events(spark, tmp_path, rows)
    out = forecast_mase_by_type(spark, sf).collect()
    assert len(out) == 1
    r = out[0]
    assert r.n_test == 4
    assert r.mae_naive == 7.0
    assert r.mae_model == 14.0
    assert r.mase == 2.0


def test_poisson_bootstrap_ci_degenerate_on_constant_metric(spark, tmp_path):
    """All users spend the same amount: every resampled mean equals it,
    so the CI collapses to a point at the mean."""
    from debezium_server_bigquery_spark.plans.experiments import (
        poisson_bootstrap_ci,
    )

    t0 = datetime.datetime(2024, 1, 1)
    rows = [(u, t0, u, "view", 5.0, "{}") for u in range(1, 41)]
    sf = _write_events(spark, tmp_path, rows)
    out = poisson_bootstrap_ci(spark, sf).collect()[0]
    assert out.n_users == 40
    assert out.mean_spend == 5.0
    assert out.ci_lo == 5.0 and out.ci_hi == 5.0


def test_jsd_zero_for_identical_mix_and_bounded(spark, tmp_path):
    import math

    from debezium_server_bigquery_spark.functions.stattests import (
        event_mix_jsd_weekly,
    )

    rows, eid = [], 0
    # week 1 (Jan 1-7 2024) and week 2: identical type mixes -> JSD 0
    for d in (1, 8):
        t0 = datetime.datetime(2024, 1, d)
        for _ in range(6):
            rows.append((eid, t0, 1, "view", 1.0, "{}")); eid += 1
        for _ in range(2):
            rows.append((eid, t0, 1, "click", 1.0, "{}")); eid += 1
    # week 3: all purchases (disjoint type) -> JSD positive, <= ln 2
    t3 = datetime.datetime(2024, 1, 15)
    for _ in range(8):
        rows.append((eid, t3, 1, "purchase", 1.0, "{}")); eid += 1
    sf = _write_events(spark, tmp_path, rows)
    out = {r.week: r.jsd for r in event_mix_jsd_weekly(spark, sf).collect()}
    assert len(out) == 3
    assert out[1] == out[2]  # same mix -> same divergence from corpus
    assert out[3] > out[1]
    assert all(0.0 <= v <= math.log(2) + 1e-9 for v in out.values())
