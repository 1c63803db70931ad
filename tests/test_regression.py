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
