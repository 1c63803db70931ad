"""The volume-anomaly query must flag the canonical outage: a type that
goes silent produces explicit zero days that z-score far below baseline."""

from __future__ import annotations

import datetime

from pyspark.sql import functions as F

from debezium_server_bigquery_spark.plans.behavior import volume_anomaly_frame


def _frame(spark, rows):
    return spark.createDataFrame(rows, "event_type string, day date")


def test_outage_days_exist_and_are_flagged(spark):
    base = datetime.date(2024, 1, 1)
    rows = []
    # wobbling ~100/day for 10 days, then a 3-day total outage, then resume
    for d in list(range(10)) + [13, 14]:
        day = base + datetime.timedelta(days=d)
        rows += [("click", day)] * (100 + (d % 3))
    out = volume_anomaly_frame(_frame(spark, rows)).collect()
    by_day = {r.day: r for r in out}
    # the silent days exist in the output with explicit zero counts
    for gap in (10, 11, 12):
        day = base + datetime.timedelta(days=gap)
        assert day in by_day, "densification must materialize silent days"
        assert by_day[day].n_events == 0
    # the first outage day z-scores hard negative and is flagged
    first_gap = by_day[base + datetime.timedelta(days=10)]
    assert first_gap.z is not None and first_gap.z < -3
    assert first_gap.is_anomaly


def test_outage_against_constant_baseline_flagged(spark):
    base = datetime.date(2024, 1, 1)
    rows = []
    # PERFECTLY constant 100/day -> zero variance -> z undefined; the
    # deviation-from-constant rule must still flag the outage
    for d in range(10):
        day = base + datetime.timedelta(days=d)
        rows += [("click", day)] * 100
    rows += [("click", base + datetime.timedelta(days=12))] * 100
    out = volume_anomaly_frame(_frame(spark, rows)).collect()
    by_day = {r.day: r for r in out}
    gap = by_day[base + datetime.timedelta(days=10)]
    assert gap.n_events == 0 and gap.z is None and gap.is_anomaly


def test_steady_volume_not_flagged(spark):
    base = datetime.date(2024, 1, 1)
    rows = []
    for d in range(10):
        day = base + datetime.timedelta(days=d)
        rows += [("view", day)] * (100 + (d % 3))  # mild daily wobble
    out = volume_anomaly_frame(_frame(spark, rows)).collect()
    assert not any(r.is_anomaly for r in out)


def test_dau_wau_stickiness_invariants(spark, sf_dir):
    """WAU >= DAU always (the window contains the day); stickiness in
    (0, 1]; a 1-day corpus would give stickiness 1.0 everywhere."""
    from debezium_server_bigquery_spark.plans.behavior import dau_wau_stickiness

    rows = dau_wau_stickiness(spark, sf_dir).collect()
    assert len(rows) > 0
    for r in rows:
        assert r.wau >= r.dau >= 1
        assert 0.0 < r.stickiness <= 1.0
        assert r.stickiness == round(r.dau / r.wau, 6)


def test_dau_wau_hand_case(spark):
    """3 users: u1 active day0+day3, u2 day0, u3 day9 (isolated week)."""
    import pandas as pd

    from debezium_server_bigquery_spark.plans.behavior import dau_wau_stickiness

    df = pd.DataFrame(
        {
            "user_id": [1, 1, 2, 3],
            "ts": pd.to_datetime(
                ["2024-01-01", "2024-01-04", "2024-01-01", "2024-01-10"]
            ),
        }
    )
    import unittest.mock as mock

    ev = spark.createDataFrame(df)
    with mock.patch(
        "debezium_server_bigquery_spark.plans.behavior.load_table",
        return_value=ev,
    ):
        got = {
            str(r.day): (r.dau, r.wau) for r in dau_wau_stickiness(spark, "x").collect()
        }
    # day0 window [day-6, day0] sees u1+u2; day3 window sees u1+u2 as well
    assert got["2024-01-01"] == (2, 2)
    assert got["2024-01-04"] == (1, 2)
    # u1's Jan-4 activity is exactly 6 days back — still inside the window
    assert got["2024-01-10"] == (1, 2)


def test_next_prediction_accuracy_bounds(spark, sf_dir):
    from debezium_server_bigquery_spark.plans.segmentation import (
        event_next_prediction_accuracy,
    )

    rows = event_next_prediction_accuracy(spark, sf_dir).collect()
    assert len(rows) > 0
    for r in rows:
        assert 0 <= r.n_correct <= r.n_test
        assert r.accuracy == round(r.n_correct / r.n_test, 6)


def test_gini_hand_cases(spark):
    """Equal spends -> Gini 0; extreme concentration -> near 1."""
    import unittest.mock as mock

    from debezium_server_bigquery_spark.plans import segmentation

    def run(rows):
        orders = spark.createDataFrame(
            rows, "o_custkey long, o_totalprice double, o_orderdate date"
        )
        with mock.patch.object(segmentation, "load_table", return_value=orders):
            return segmentation.customer_revenue_gini(spark, "x").collect()[0]

    equal = run([(k, 100.0, None) for k in range(10)])
    assert equal.gini == 0.0
    concentrated = run(
        [(k, 0.01, None) for k in range(9)] + [(9, 100000.0, None)]
    )
    assert concentrated.gini > 0.85


def test_user_recency_weighted_value_exact_decay(spark, sf_dir):
    """Hand-computed decay: score == sum(value * 2^-age_weeks) with the
    week age measured from the stream max, capped at DECAY_CAP_WEEKS."""
    from debezium_server_bigquery_spark.plans.behavior import (
        DECAY_CAP_WEEKS,
        user_recency_weighted_value,
    )
    from debezium_server_bigquery_spark.sources.tables import load_table

    out = {r.user_id: r for r in user_recency_weighted_value(spark, sf_dir).collect()}
    ev = load_table(spark, sf_dir, "events").select("user_id", "value", "ts_ns").collect()
    hi = max(r.ts_ns for r in ev)
    week = 7 * 86400 * 10**9
    expect: dict[int, float] = {}
    counts: dict[int, int] = {}
    for r in ev:
        k = min((hi - r.ts_ns) // week, DECAY_CAP_WEEKS)
        expect[r.user_id] = expect.get(r.user_id, 0) + round(r.value * 100) * (1 << (DECAY_CAP_WEEKS - k))
        counts[r.user_id] = counts.get(r.user_id, 0) + 1
    assert set(out) == set(expect)
    for uid, num in expect.items():
        assert out[uid].n_events == counts[uid]
        assert out[uid].recency_value == round(num / (100 * (1 << DECAY_CAP_WEEKS)), 6)


def test_lang_id_confusion_reconciles(spark, sf_dir):
    from debezium_server_bigquery_spark.functions.text import (
        lang_id_confusion,
        text_lang_id,
    )

    conf = lang_id_confusion(spark, sf_dir).collect()
    docs = text_lang_id(spark, sf_dir).count()
    assert sum(r.n_docs for r in conf) == docs
    # per-label fractions sum to 1
    by_label: dict[str, float] = {}
    for r in conf:
        by_label[r.labeled_lang] = by_label.get(r.labeled_lang, 0.0) + r.frac_of_labeled
    assert all(abs(v - 1.0) < 1e-4 for v in by_label.values())


def test_value_outliers_mad_python_model(spark, sf_dir):
    """MAD medians and outlier counts match a literal python recompute."""
    import statistics

    from debezium_server_bigquery_spark.plans.diagnostics import (
        MAD_K,
        value_outliers_mad,
    )
    from debezium_server_bigquery_spark.sources.tables import load_table

    out = {r.event_type: r for r in value_outliers_mad(spark, sf_dir).collect()}
    ev = (
        load_table(spark, sf_dir, "events")
        .select("event_type", "value")
        .collect()
    )
    by_type: dict[str, list[float]] = {}
    for r in ev:
        by_type.setdefault(r.event_type, []).append(r.value)
    for t, vals in by_type.items():
        med = statistics.median(vals)
        devs = [abs(v - med) for v in vals]
        mad = statistics.median(devs)
        n_out = sum(1 for d in devs if d > MAD_K * mad)
        assert out[t].n_events == len(vals)
        assert out[t].median_value == round(med, 6)
        assert out[t].mad == round(mad, 6)
        assert out[t].n_outliers == n_out


def test_burstiness_flags_metronomic_users(spark, tmp_path):
    """A perfectly regular (bot-like) stream must rank ahead of a bursty
    one, with CV 0 for constant gaps and the documented exact moments."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    from datetime import datetime, timedelta

    from debezium_server_bigquery_spark.plans.behavior import (
        BURST_MIN_GAPS,
        user_interarrival_burstiness,
    )

    base = datetime(2024, 1, 1)
    rows = []
    eid = 0
    for i in range(BURST_MIN_GAPS + 1):  # bot: constant 60s cadence
        rows.append((eid, base + timedelta(seconds=60 * i), 1))
        eid += 1
    gap = 1
    t = base
    for i in range(BURST_MIN_GAPS + 1):  # human: geometric burst pattern
        rows.append((eid, t, 2))
        eid += 1
        t = t + timedelta(seconds=gap)
        gap = gap * 2 if gap < 4096 else 1
    table = pa.table(
        {
            "event_id": pa.array([r[0] for r in rows], pa.int64()),
            "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
            "user_id": pa.array([r[2] for r in rows], pa.int64()),
            "event_type": pa.array(["view"] * len(rows)),
            "value": pa.array([1.0] * len(rows)),
            "props": pa.array(["{}"] * len(rows)),
        }
    )
    pq.write_table(table, str(tmp_path / "events.parquet"))
    out = user_interarrival_burstiness(spark, str(tmp_path)).collect()
    assert [r.user_id for r in out] == [1, 2]  # metronome first
    bot, human = out[0], out[1]
    assert bot.cv == 0.0 and bot.mean_gap_ms == 60000.0
    assert human.cv > 0.5
    assert bot.n_gaps == BURST_MIN_GAPS


def test_session_event_affinity_lift_identities(spark, sf_dir):
    from debezium_server_bigquery_spark.plans.behavior import (
        session_event_affinity,
    )

    rows = session_event_affinity(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r.type_a < r.type_b  # canonical unordered pair
        assert 0 < r.n_ab <= min(r.n_a, r.n_b)  # co-occurrence <= marginals
        assert r.lift > 0
    lifts = [r.lift for r in rows]
    assert lifts == sorted(lifts, reverse=True)


def test_tenure_curve_alignment_and_eligibility(spark, tmp_path):
    import datetime

    from debezium_server_bigquery_spark.plans.behavior import (
        user_activity_by_tenure_day,
    )

    d = lambda k: datetime.datetime(2024, 1, 1) + datetime.timedelta(days=k)  # noqa: E731
    rows = [
        # user 1 starts day 0, active days 0 and 2 (horizon 3 -> eligible 0..3)
        (0, d(0), 1, "view", 1.0, "{}"),
        (1, d(2), 1, "view", 1.0, "{}"),
        # user 2 starts day 2, active days 2 and 3 (eligible 0..1)
        (2, d(2), 2, "view", 1.0, "{}"),
        (3, d(3), 2, "view", 1.0, "{}"),
    ]
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    ).write.mode("overwrite").parquet(str(tmp_path / "events.parquet"))
    out = {r.tenure_day: r for r in user_activity_by_tenure_day(spark, str(tmp_path)).collect()}
    # day 0: both users eligible, both active at their own day 0
    assert out[0].n_eligible == 2 and out[0].n_active == 2
    # day 1: both eligible, user 2 active (their day 1 = calendar day 3)
    assert out[1].n_eligible == 2 and out[1].n_active == 1
    # day 2: only user 1 eligible (user 2's horizon ends at day 1), active
    assert out[2].n_eligible == 1 and out[2].n_active == 1
    # day 3: only user 1 eligible, inactive
    assert out[3].n_eligible == 1 and out[3].n_active == 0
