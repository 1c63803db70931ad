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
