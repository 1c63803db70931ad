"""Distributed closed-form linear regression (per-group OLS trend).

The analytics step after windows and funnels: fit y = a·x + b per group
with the closed-form normal equations — slope, intercept, and R² derive
from six sufficient statistics (n, Σx, Σx², Σy, Σxy, Σy²) that one
map-side-combinable aggregate produces.  No iteration, no driver data,
no ML library: grouped regression over a trillion rows costs exactly one
groupBy.

Cross-engine determinism: x is integer (day ordinal), y decimal — all six
sums are EXACT (integer/decimal arithmetic, associative); each sum is
cast to double once (correctly rounded) and the closed-form expressions
are written identically in both engines, so every IEEE step matches
bit-for-bit before the output rounding.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from debezium_server_bigquery_spark.sources.tables import load_table


def ols_sums(df: DataFrame, keys: list[str], x: Column, y: Column) -> DataFrame:
    """Per-group sufficient statistics for simple OLS.  ``x`` must be
    integral and ``y`` decimal so every sum is exact."""
    d = df.select(*keys, x.alias("x"), y.alias("y"))
    return d.groupBy(*keys).agg(
        F.count("*").alias("n"),
        F.sum("x").cast("double").alias("sx"),
        F.sum(F.col("x") * F.col("x")).cast("double").alias("sxx"),
        F.sum("y").cast("double").alias("sy"),
        F.sum(F.col("x") * F.col("y")).cast("double").alias("sxy"),
        F.sum(F.col("y") * F.col("y")).cast("double").alias("syy"),
    )


def ols_fit(sums: DataFrame) -> DataFrame:
    """slope / intercept / R² from the sufficient statistics.  Groups with
    zero x-variance (a single distinct x) yield NULLs via try_divide."""
    num = F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")
    den = F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    slope = F.try_divide(num, den)
    intercept = (F.col("sy") - slope * F.col("sx")) / F.col("n")
    r2 = F.try_divide(
        num * num,
        den * (F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")),
    )
    return sums.withColumns(
        {"slope": slope, "intercept": intercept, "r2": r2}
    )


def revenue_trend_by_segment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily-revenue trend per market segment: is each segment's spend
    growing, and how linearly?  One fact-dim join, one daily aggregate,
    one OLS aggregate — all shuffle-keyed, nothing collected."""
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_mktsegment"
    )
    daily = (
        orders.join(cust, orders.o_custkey == cust.c_custkey)
        .groupBy(
            F.col("c_mktsegment").alias("segment"),
            F.datediff(
                F.col("o_orderdate").cast("date"), F.lit("1970-01-01").cast("date")
            ).alias("x"),
        )
        .agg(F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias("y"))
    )
    fit = ols_fit(ols_sums(daily, ["segment"], F.col("x"), F.col("y")))
    return fit.select(
        "segment",
        F.col("n").alias("n_days"),
        F.round("slope", 8).alias("slope"),
        F.round("intercept", 4).alias("intercept"),
        F.round("r2", 8).alias("r2"),
    ).orderBy("segment")


REVENUE_TREND_SQL = """
WITH daily AS (
  SELECT c_mktsegment AS segment,
    (CAST(o_orderdate AS DATE) - DATE '1970-01-01') AS x,
    SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS y
  FROM orders JOIN customer ON o_custkey = c_custkey
  GROUP BY 1, 2
), sums AS (
  SELECT segment, COUNT(*) AS n,
    CAST(SUM(x) AS DOUBLE) AS sx,
    CAST(SUM(x * x) AS DOUBLE) AS sxx,
    CAST(SUM(y) AS DOUBLE) AS sy,
    CAST(SUM(x * y) AS DOUBLE) AS sxy,
    CAST(SUM(y * y) AS DOUBLE) AS syy
  FROM daily GROUP BY segment
)
SELECT segment, n AS n_days,
  round((n * sxy - sx * sy) / NULLIF(n * sxx - sx * sx, 0), 8) AS slope,
  round((sy - ((n * sxy - sx * sy) / NULLIF(n * sxx - sx * sx, 0)) * sx) / n,
    4) AS intercept,
  round(((n * sxy - sx * sy) * (n * sxy - sx * sy))
    / NULLIF((n * sxx - sx * sx) * (n * syy - sy * sy), 0), 8) AS r2
FROM sums ORDER BY segment
"""


def discount_quantity_elasticity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-brand Pearson correlation between line discount and quantity —
    the "does discounting actually move volume" read, per brand so a
    category manager sees which lines respond.  Near 0 on independent
    columns (the synthetic data's truth); a real price-elastic catalog
    shows positive r.

    Scale + determinism: both columns fix to exact integers first
    (quantity is integral; discount → cents via one IEEE round), the six
    Pearson moments are exact BIGINT sums per brand (map-side
    combinable after one fact×dim equi-join with the part table), and
    the only float is the final ratio.  Zero-variance brands yield
    NULL."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey",
        F.col("l_quantity").cast("long").alias("qty"),
        F.round(F.col("l_discount") * 100, 0).cast("long").alias("disc"),
    )
    part = load_table(spark, sf_dir, "part").select(
        F.col("p_partkey").alias("l_partkey"), "p_brand"
    )
    j = li.join(F.broadcast(part), "l_partkey")
    m = j.groupBy("p_brand").agg(
        F.count(F.lit(1)).cast("long").alias("n_lines"),
        F.sum("disc").alias("sx"),
        F.sum("qty").alias("sy"),
        F.sum(F.col("disc") * F.col("qty")).alias("sxy"),
        F.sum(F.col("disc") * F.col("disc")).alias("sxx"),
        F.sum(F.col("qty") * F.col("qty")).alias("syy"),
    )
    varx = m["n_lines"] * m["sxx"] - m["sx"] * m["sx"]
    vary = m["n_lines"] * m["syy"] - m["sy"] * m["sy"]
    cov = m["n_lines"] * m["sxy"] - m["sx"] * m["sy"]
    return m.select(
        "p_brand",
        "n_lines",
        F.when(
            (varx > 0) & (vary > 0),
            F.round(
                cov.cast("double")
                / F.sqrt(varx.cast("double") * vary.cast("double")),
                6,
            ),
        ).alias("corr_disc_qty"),
    ).orderBy("p_brand")


ELASTICITY_SQL = """
WITH li AS (
  SELECT l_partkey,
    CAST(l_quantity AS BIGINT) AS qty,
    CAST(round(l_discount * 100, 0) AS BIGINT) AS disc
  FROM lineitem
),
j AS (SELECT p.p_brand, li.qty, li.disc
      FROM li JOIN part p ON li.l_partkey = p.p_partkey),
m AS (
  SELECT p_brand,
    CAST(COUNT(*) AS BIGINT) AS n_lines,
    SUM(disc) AS sx, SUM(qty) AS sy,
    SUM(disc * qty) AS sxy, SUM(disc * disc) AS sxx, SUM(qty * qty) AS syy
  FROM j GROUP BY p_brand
)
SELECT p_brand, n_lines,
  CASE WHEN (n_lines * sxx - sx * sx) > 0 AND (n_lines * syy - sy * sy) > 0
    THEN round(
      CAST(n_lines * sxy - sx * sy AS DOUBLE)
      / sqrt(CAST(n_lines * sxx - sx * sx AS DOUBLE)
             * CAST(n_lines * syy - sy * sy AS DOUBLE)), 6)
  END AS corr_disc_qty
FROM m
ORDER BY p_brand
"""


def revenue_weekday_seasonality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekday seasonal profile of daily order revenue: per ISO weekday
    (0 = Monday), the mean DAILY revenue and its index against the
    overall daily mean — the seasonality read that pairs with the OLS
    trend for a full decompose-by-inspection.  Two combinable aggregates
    (per-day, then per-weekday) plus a one-row broadcast overall mean;
    every mean is an exact decimal sum over an IEEE division."""
    orders = load_table(spark, sf_dir, "orders")
    daily = orders.groupBy(
        F.col("o_orderdate").cast("date").alias("day")
    ).agg(F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias("rev"))
    overall = daily.agg(
        (F.sum("rev").cast("double") / F.count("*")).alias("overall_mean")
    )
    return (
        daily.groupBy(F.expr("weekday(day)").alias("weekday"))
        .agg(
            F.count("*").alias("n_days"),
            (F.sum("rev").cast("double") / F.count("*")).alias("mean_rev_raw"),
        )
        .crossJoin(F.broadcast(overall))
        .select(
            "weekday",
            "n_days",
            F.round("mean_rev_raw", 4).alias("mean_daily_revenue"),
            F.round(
                F.col("mean_rev_raw") / F.col("overall_mean"), 6
            ).alias("seasonal_index"),
        )
        .orderBy("weekday")
    )


WEEKDAY_SEASONALITY_SQL = """
WITH daily AS (
  SELECT CAST(o_orderdate AS DATE) AS day,
    SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS rev
  FROM orders GROUP BY 1
), overall AS (
  SELECT CAST(SUM(rev) AS DOUBLE) / COUNT(*) AS overall_mean FROM daily
), wk AS (
  SELECT isodow(day) - 1 AS weekday, COUNT(*) AS n_days,
    CAST(SUM(rev) AS DOUBLE) / COUNT(*) AS mean_rev_raw
  FROM daily GROUP BY 1
)
SELECT weekday, n_days,
  round(mean_rev_raw, 4) AS mean_daily_revenue,
  round(mean_rev_raw / overall_mean, 6) AS seasonal_index
FROM wk, overall ORDER BY weekday
"""


QUERIES = {
    "revenue_trend_by_segment": revenue_trend_by_segment,
    "revenue_weekday_seasonality": revenue_weekday_seasonality,
    "discount_quantity_elasticity": discount_quantity_elasticity,
}
ORACLES = {
    "revenue_trend_by_segment": REVENUE_TREND_SQL,
    "revenue_weekday_seasonality": WEEKDAY_SEASONALITY_SQL,
    "discount_quantity_elasticity": ELASTICITY_SQL,
}


def logistic_irls_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed logistic regression of the purchase label on event
    value — two unrolled IRLS (Fisher scoring) iterations from β = 0,
    the model-fitting counterpart of the OLS trend ops: each iteration
    is ONE map-side-combinable aggregate of weighted moments and a 2×2
    closed-form solve on the driver-free one-row frame.

    Exactness: iteration 1 from β = 0 has constant weights (w = 1/4,
    p = 1/2), so its normal equations use only EXACT decimal/integer
    sums.  Iteration 2's per-row sigmoid is the one transcendental;
    each weighted term rounds to 12 dp and accumulates in
    DECIMAL(38,12), making the aggregation order irrelevant — and both
    engines evaluate the identical expression tree on the identical
    rows, so the graded hash is stable for a given input table.  The
    2×2 inverse is written in one fixed term order on both engines."""
    ev = load_table(spark, sf_dir, "events").select(
        F.col("value").cast("decimal(18,2)").alias("xd"),
        (F.col("event_type") == "purchase").cast("long").alias("y"),
    )
    m1 = ev.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("xd").cast("decimal(38,2)").alias("sx"),
        F.sum((F.col("xd") * F.col("xd")).cast("decimal(38,4)")).alias("sxx"),
        F.sum("y").cast("long").alias("sy"),
        F.sum(F.when(F.col("y") == 1, F.col("xd"))).alias("sxy"),
    )

    def solve(a, b, d, r0, r1):
        det = a * d - b * b
        return (d * r0 - b * r1) / det, (a * r1 - b * r0) / det

    n = F.col("n").cast("double")
    sx = F.col("sx").cast("double")
    sxx = F.col("sxx").cast("double")
    a1, b1_, d1 = n * 0.25, sx * 0.25, sxx * 0.25
    r0_1 = F.col("sy").cast("double") - n * 0.5
    r1_1 = F.coalesce(F.col("sxy"), F.lit(0).cast("decimal(38,2)")).cast(
        "double"
    ) - sx * 0.5
    beta0_1, beta1_1 = solve(a1, b1_, d1, r0_1, r1_1)
    b_iter1 = m1.select(
        "n",
        beta0_1.alias("b0"),
        beta1_1.alias("b1"),
    )
    x = F.col("xd").cast("double")
    z = F.col("b0") + F.col("b1") * x
    p = F.lit(1.0) / (F.lit(1.0) + F.exp(-z))
    w = p * (F.lit(1.0) - p)
    d12 = lambda c: F.round(c, 12).cast("decimal(38,12)")  # noqa: E731
    m2 = (
        ev.crossJoin(F.broadcast(b_iter1))
        .agg(
            F.max("n").alias("n"),
            F.max("b0").alias("b0"),
            F.max("b1").alias("b1"),
            F.sum(d12(w)).alias("sw"),
            F.sum(d12(w * x)).alias("swx"),
            F.sum(d12(w * x * x)).alias("swxx"),
            F.sum(d12(F.col("y").cast("double") - p)).alias("sr0"),
            F.sum(d12(x * (F.col("y").cast("double") - p))).alias("sr1"),
        )
    )
    a2 = F.col("sw").cast("double")
    b2 = F.col("swx").cast("double")
    d2 = F.col("swxx").cast("double")
    r0_2 = F.col("sr0").cast("double")
    r1_2 = F.col("sr1").cast("double")
    delta0, delta1 = solve(a2, b2, d2, r0_2, r1_2)
    return m2.select(
        F.col("n").cast("long").alias("n_events"),
        (F.round(F.col("b0"), 6) + F.lit(0.0)).alias("beta0_iter1"),
        (F.round(F.col("b1"), 6) + F.lit(0.0)).alias("beta1_iter1"),
        (F.round(F.col("b0") + delta0, 6) + F.lit(0.0)).alias("beta0"),
        (F.round(F.col("b1") + delta1, 6) + F.lit(0.0)).alias("beta1"),
    )


LOGISTIC_IRLS_SQL = """
WITH ev AS (
  SELECT CAST(value AS DECIMAL(18,2)) AS xd,
    CAST(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS BIGINT) AS y
  FROM events
),
m1 AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n,
    CAST(SUM(xd) AS DECIMAL(38,2)) AS sx,
    CAST(SUM(CAST(xd * xd AS DECIMAL(38,4))) AS DECIMAL(38,4)) AS sxx,
    CAST(SUM(y) AS BIGINT) AS sy,
    CAST(COALESCE(SUM(CASE WHEN y = 1 THEN xd END), 0) AS DECIMAL(38,2)) AS sxy
  FROM ev
),
b1 AS (
  SELECT n,
    (CAST(sxx AS DOUBLE) * 0.25 * (CAST(sy AS DOUBLE) - CAST(n AS DOUBLE) * 0.5)
     - CAST(sx AS DOUBLE) * 0.25
       * (CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * 0.5))
    / (CAST(n AS DOUBLE) * 0.25 * (CAST(sxx AS DOUBLE) * 0.25)
       - (CAST(sx AS DOUBLE) * 0.25) * (CAST(sx AS DOUBLE) * 0.25)) AS b0,
    (CAST(n AS DOUBLE) * 0.25 * (CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * 0.5)
     - CAST(sx AS DOUBLE) * 0.25
       * (CAST(sy AS DOUBLE) - CAST(n AS DOUBLE) * 0.5))
    / (CAST(n AS DOUBLE) * 0.25 * (CAST(sxx AS DOUBLE) * 0.25)
       - (CAST(sx AS DOUBLE) * 0.25) * (CAST(sx AS DOUBLE) * 0.25)) AS b1
  FROM m1
),
m2 AS (
  SELECT MAX(b.n) AS n, MAX(b.b0) AS b0, MAX(b.b1) AS b1,
    CAST(SUM(CAST(round(
      (1.0 / (1.0 + exp(-(b.b0 + b.b1 * CAST(e.xd AS DOUBLE)))))
      * (1.0 - 1.0 / (1.0 + exp(-(b.b0 + b.b1 * CAST(e.xd AS DOUBLE))))), 12)
      AS DECIMAL(38,12))) AS DECIMAL(38,12)) AS sw,
    CAST(SUM(CAST(round(
      (1.0 / (1.0 + exp(-(b.b0 + b.b1 * CAST(e.xd AS DOUBLE)))))
      * (1.0 - 1.0 / (1.0 + exp(-(b.b0 + b.b1 * CAST(e.xd AS DOUBLE)))))
      * CAST(e.xd AS DOUBLE), 12) AS DECIMAL(38,12))) AS DECIMAL(38,12)) AS swx,
    CAST(SUM(CAST(round(
      (1.0 / (1.0 + exp(-(b.b0 + b.b1 * CAST(e.xd AS DOUBLE)))))
      * (1.0 - 1.0 / (1.0 + exp(-(b.b0 + b.b1 * CAST(e.xd AS DOUBLE)))))
      * CAST(e.xd AS DOUBLE) * CAST(e.xd AS DOUBLE), 12)
      AS DECIMAL(38,12))) AS DECIMAL(38,12)) AS swxx,
    CAST(SUM(CAST(round(
      CAST(e.y AS DOUBLE)
      - 1.0 / (1.0 + exp(-(b.b0 + b.b1 * CAST(e.xd AS DOUBLE)))), 12)
      AS DECIMAL(38,12))) AS DECIMAL(38,12)) AS sr0,
    CAST(SUM(CAST(round(
      CAST(e.xd AS DOUBLE) * (CAST(e.y AS DOUBLE)
      - 1.0 / (1.0 + exp(-(b.b0 + b.b1 * CAST(e.xd AS DOUBLE))))), 12)
      AS DECIMAL(38,12))) AS DECIMAL(38,12)) AS sr1
  FROM ev e CROSS JOIN b1 b
)
SELECT CAST(n AS BIGINT) AS n_events,
  round(b0, 6) + 0.0 AS beta0_iter1,
  round(b1, 6) + 0.0 AS beta1_iter1,
  round(b0 + (CAST(swxx AS DOUBLE) * CAST(sr0 AS DOUBLE)
              - CAST(swx AS DOUBLE) * CAST(sr1 AS DOUBLE))
        / (CAST(sw AS DOUBLE) * CAST(swxx AS DOUBLE)
           - CAST(swx AS DOUBLE) * CAST(swx AS DOUBLE)), 6) + 0.0 AS beta0,
  round(b1 + (CAST(sw AS DOUBLE) * CAST(sr1 AS DOUBLE)
              - CAST(swx AS DOUBLE) * CAST(sr0 AS DOUBLE))
        / (CAST(sw AS DOUBLE) * CAST(swxx AS DOUBLE)
           - CAST(swx AS DOUBLE) * CAST(swx AS DOUBLE)), 6) + 0.0 AS beta1
FROM m2
"""

QUERIES["logistic_irls_conversion"] = logistic_irls_conversion
ORACLES["logistic_irls_conversion"] = LOGISTIC_IRLS_SQL
