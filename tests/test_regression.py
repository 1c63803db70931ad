"""Closed-form grouped OLS — pinned against numpy.polyfit."""

from __future__ import annotations

import numpy as np
import pytest

from pyspark.sql import functions as F

from debezium_server_bigquery_spark.functions.regression import (
    ols_fit,
    ols_sums,
    revenue_trend_by_segment,
)


def _fit(spark, rows):
    from decimal import Decimal

    rows = [(g, x, Decimal(str(y))) for g, x, y in rows]
    df = spark.createDataFrame(rows, "g string, x int, y decimal(18,2)")
    out = ols_fit(ols_sums(df, ["g"], F.col("x"), F.col("y")))
    return {r.g: r for r in out.collect()}


def test_ols_matches_numpy(spark):
    rng = np.random.default_rng(11)
    xs = np.arange(1, 31)
    ys = 3.5 * xs + 12 + rng.normal(scale=2.0, size=30)
    rows = [("a", int(x), round(float(y), 2)) for x, y in zip(xs, ys)]
    got = _fit(spark, rows)["a"]
    ys2 = np.array([r[2] for r in rows])
    slope, intercept = np.polyfit(xs.astype(float), ys2, 1)
    assert got.slope == pytest.approx(slope, rel=1e-9)
    assert got.intercept == pytest.approx(intercept, rel=1e-9)
    corr = np.corrcoef(xs.astype(float), ys2)[0, 1]
    assert got.r2 == pytest.approx(corr**2, rel=1e-9)


def test_ols_exact_line_r2_one(spark):
    rows = [("g", x, float(2 * x + 5)) for x in range(1, 11)]
    got = _fit(spark, [(g, x, round(y, 2)) for g, x, y in rows])["g"]
    assert got.slope == pytest.approx(2.0)
    assert got.intercept == pytest.approx(5.0)
    assert got.r2 == pytest.approx(1.0)


def test_ols_degenerate_single_x_is_null(spark):
    got = _fit(spark, [("g", 7, 1.0), ("g", 7, 3.0)])["g"]
    assert got.slope is None and got.r2 is None


def test_ols_groups_fit_independently(spark):
    rows = [("up", x, float(x)) for x in range(1, 6)] + [
        ("down", x, float(-2 * x)) for x in range(1, 6)
    ]
    got = _fit(spark, [(g, x, round(y, 2)) for g, x, y in rows])
    assert got["up"].slope == pytest.approx(1.0)
    assert got["down"].slope == pytest.approx(-2.0)


def test_revenue_trend_output_shape(spark, sf_dir):
    out = revenue_trend_by_segment(spark, sf_dir).collect()
    assert len(out) == 5  # TPC-H market segments
    for r in out:
        assert r.n_days > 1 and r.r2 is not None and 0.0 <= r.r2 <= 1.0


def test_weekday_seasonality_indices_average_to_one(spark, sf_dir):
    from debezium_server_bigquery_spark.functions.regression import (
        revenue_weekday_seasonality,
    )

    rows = revenue_weekday_seasonality(spark, sf_dir).collect()
    assert {r.weekday for r in rows} == set(range(7))
    total_days = sum(r.n_days for r in rows)
    # day-weighted mean of the indices is 1 by construction
    weighted = sum(r.seasonal_index * r.n_days for r in rows) / total_days
    assert abs(weighted - 1.0) < 1e-4
    assert all(r.mean_daily_revenue > 0 for r in rows)


def test_logistic_irls_matches_python_replication(spark, tmp_path):
    import datetime
    import math

    from debezium_server_bigquery_spark.functions.regression import (
        logistic_irls_conversion,
    )

    t0 = datetime.datetime(2024, 1, 1)
    xs = [1.0, 2.0, 3.0, 4.0, 5.0, 6.0]
    ys = [0, 0, 0, 1, 1, 1]  # conversion rises with value
    rows = [
        (i, t0, 1, "purchase" if y else "view", x, "{}")
        for i, (x, y) in enumerate(zip(xs, ys))
    ]
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    ).write.mode("overwrite").parquet(str(tmp_path / "events.parquet"))
    out = logistic_irls_conversion(spark, str(tmp_path)).collect()[0]

    n, sx, sxx = len(xs), sum(xs), sum(x * x for x in xs)
    sy, sxy = sum(ys), sum(x * y for x, y in zip(xs, ys))
    a, b, d = n * 0.25, sx * 0.25, sxx * 0.25
    r0, r1 = sy - n * 0.5, sxy - sx * 0.5
    det = a * d - b * b
    b0 = (d * r0 - b * r1) / det
    b1 = (a * r1 - b * r0) / det
    assert abs(out.beta0_iter1 - round(b0, 6)) < 1e-9
    assert abs(out.beta1_iter1 - round(b1, 6)) < 1e-9
    # iteration 2 replication with the same 12-dp rounding
    sw = swx = swxx = sr0 = sr1 = 0.0
    for x, y in zip(xs, ys):
        p = 1.0 / (1.0 + math.exp(-(b0 + b1 * x)))
        w = p * (1.0 - p)
        sw += round(w, 12)
        swx += round(w * x, 12)
        swxx += round(w * x * x, 12)
        sr0 += round(y - p, 12)
        sr1 += round(x * (y - p), 12)
    det2 = sw * swxx - swx * swx
    d0 = (swxx * sr0 - swx * sr1) / det2
    d1 = (sw * sr1 - swx * sr0) / det2
    assert abs(out.beta0 - round(b0 + d0, 6)) < 1e-6
    assert abs(out.beta1 - round(b1 + d1, 6)) < 1e-6
    assert out.beta1 > 0  # conversion increases with value
