"""Experimentation analytics: A/B assignment, tests, variance reduction.

An analytics engine that feeds a product team needs the experimentation
readout path, not just descriptive rollups.  Both operators assign users
to arms with the same deterministic id-hash discipline as
``dataset_splits`` (assignment is a pure column function — reproducible,
join-free) and reduce to EXACT integer/decimal moments with floats only
in the final scalar algebra, so the hash gate holds without tolerance.

- ``ab_test_proportion_z`` — the two-proportion z-test on user-level
  conversion (≥ 1 purchase) between hash-assigned arms.  Under a null
  A/A split (which a content-independent hash gives on this synthetic
  corpus) z should hover near 0 — the aa-test sanity readout an
  experimentation platform runs continuously.
- ``cuped_adjusted_lift`` — CUPED (Deng et al., WSDM'13): reduce metric
  variance with a pre-period covariate.  θ = cov(pre, post)/var(pre) is
  assembled from exact decimal sums; the adjusted lift needs NO per-user
  float row math because mean(y − θx) = ȳ − θ·x̄ by linearity, and
  var(y − θx) = var(y) − 2θ·cov + θ²·var(x) from the same moments.

Scale design (100 TB): each operator is ONE map-side-combinable
per-user aggregate followed by ONE O(arms) rollup; assignment adds no
join; every Σ runs in DECIMAL (value is cast to DECIMAL(18,2) once, the
repo convention), counts are integers, and the z/θ/lift algebra runs on
a one-row frame.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from debezium_server_bigquery_spark.functions.dedup_fuzzy import (
    _hash60_sql,
    hash60,
)
from debezium_server_bigquery_spark.sources.tables import load_table

SPLIT_DATE = "2024-01-16"  # pre/post boundary: mid-range of the events table


def _arm(user_col) -> F.Column:
    return F.when(
        F.pmod(hash60(F.concat(F.lit("ab:"), user_col)), F.lit(2)) == 0,
        F.lit("A"),
    ).otherwise(F.lit("B"))


_ARM_SQL = (
    f"CASE WHEN {_hash60_sql(chr(39) + 'ab:' + chr(39) + ' || user_id')} % 2 = 0"
    " THEN 'A' ELSE 'B' END"
)


def ab_test_proportion_z(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-proportion z on user conversion between hash-assigned arms."""
    ev = load_table(spark, sf_dir, "events")
    per_user = ev.groupBy("user_id").agg(
        F.max((F.col("event_type") == "purchase").cast("long")).alias("conv")
    )
    arms = per_user.select(_arm(F.col("user_id")).alias("arm"), "conv")
    m = arms.groupBy().agg(
        F.sum((F.col("arm") == "A").cast("long")).alias("n_a"),
        F.sum((F.col("arm") == "B").cast("long")).alias("n_b"),
        F.sum(F.when(F.col("arm") == "A", F.col("conv")).otherwise(0)).alias(
            "conv_a"
        ),
        F.sum(F.when(F.col("arm") == "B", F.col("conv")).otherwise(0)).alias(
            "conv_b"
        ),
    )
    p_a = F.col("conv_a").cast("double") / F.col("n_a").cast("double")
    p_b = F.col("conv_b").cast("double") / F.col("n_b").cast("double")
    pool = (F.col("conv_a") + F.col("conv_b")).cast("double") / (
        F.col("n_a") + F.col("n_b")
    ).cast("double")
    se = F.sqrt(
        pool
        * (F.lit(1.0) - pool)
        * (
            F.lit(1.0) / F.col("n_a").cast("double")
            + F.lit(1.0) / F.col("n_b").cast("double")
        )
    )
    return m.select(
        F.col("n_a").cast("long").alias("n_a"),
        F.col("n_b").cast("long").alias("n_b"),
        F.col("conv_a").cast("long").alias("conv_a"),
        F.col("conv_b").cast("long").alias("conv_b"),
        (F.round(p_a, 6) + F.lit(0.0)).alias("p_a"),
        (F.round(p_b, 6) + F.lit(0.0)).alias("p_b"),
        F.when(
            (F.col("n_a") > 0) & (F.col("n_b") > 0) & (se > 0),
            F.round((p_a - p_b) / se, 6) + F.lit(0.0),
        ).alias("z"),
    )


AB_TEST_SQL = f"""
WITH per_user AS (
  SELECT user_id,
    MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS conv
  FROM events GROUP BY user_id
),
arms AS (SELECT {_ARM_SQL} AS arm, conv FROM per_user),
m AS (
  SELECT
    CAST(SUM(CASE WHEN arm = 'A' THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
    CAST(SUM(CASE WHEN arm = 'B' THEN 1 ELSE 0 END) AS BIGINT) AS n_b,
    CAST(SUM(CASE WHEN arm = 'A' THEN conv ELSE 0 END) AS BIGINT) AS conv_a,
    CAST(SUM(CASE WHEN arm = 'B' THEN conv ELSE 0 END) AS BIGINT) AS conv_b
  FROM arms
)
SELECT n_a, n_b, conv_a, conv_b,
  round(CAST(conv_a AS DOUBLE) / CAST(n_a AS DOUBLE), 6) + 0.0 AS p_a,
  round(CAST(conv_b AS DOUBLE) / CAST(n_b AS DOUBLE), 6) + 0.0 AS p_b,
  CASE WHEN n_a > 0 AND n_b > 0 AND
    sqrt((CAST(conv_a + conv_b AS DOUBLE) / CAST(n_a + n_b AS DOUBLE))
         * (1.0 - CAST(conv_a + conv_b AS DOUBLE) / CAST(n_a + n_b AS DOUBLE))
         * (1.0 / CAST(n_a AS DOUBLE) + 1.0 / CAST(n_b AS DOUBLE))) > 0
  THEN round(
    (CAST(conv_a AS DOUBLE) / CAST(n_a AS DOUBLE)
     - CAST(conv_b AS DOUBLE) / CAST(n_b AS DOUBLE))
    / sqrt((CAST(conv_a + conv_b AS DOUBLE) / CAST(n_a + n_b AS DOUBLE))
           * (1.0 - CAST(conv_a + conv_b AS DOUBLE) / CAST(n_a + n_b AS DOUBLE))
           * (1.0 / CAST(n_a AS DOUBLE) + 1.0 / CAST(n_b AS DOUBLE))), 6) + 0.0
  END AS z
FROM m
"""


def cuped_adjusted_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUPED-adjusted lift of per-user post-period spend, θ pooled from
    exact decimal moments; see module docstring."""
    ev = load_table(spark, sf_dir, "events")
    dec = F.col("value").cast("decimal(18,2)")
    pre = F.to_date("ts") < F.lit(SPLIT_DATE)
    per_user = ev.groupBy("user_id").agg(
        F.coalesce(F.sum(F.when(pre, dec)), F.lit(0).cast("decimal(18,2)"))
        .cast("decimal(18,2)")
        .alias("x"),
        F.coalesce(F.sum(F.when(~pre, dec)), F.lit(0).cast("decimal(18,2)"))
        .cast("decimal(18,2)")
        .alias("y"),
    )
    arms = per_user.select(_arm(F.col("user_id")).alias("arm"), "x", "y")
    d38 = lambda c: F.col(c).cast("decimal(38,4)")  # noqa: E731
    m = arms.groupBy().agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum((F.col("x") * F.col("y")).cast("decimal(38,4)")).alias("sxy"),
        F.sum((F.col("x") * F.col("x")).cast("decimal(38,4)")).alias("sxx"),
        F.sum((F.col("y") * F.col("y")).cast("decimal(38,4)")).alias("syy"),
        F.sum(F.when(F.col("arm") == "A", 1).otherwise(0))
        .cast("long")
        .alias("n_a"),
        F.sum(F.when(F.col("arm") == "A", F.col("x"))).alias("sx_a"),
        F.sum(F.when(F.col("arm") == "A", F.col("y"))).alias("sy_a"),
        F.sum(F.when(F.col("arm") == "B", 1).otherwise(0))
        .cast("long")
        .alias("n_b"),
        F.sum(F.when(F.col("arm") == "B", F.col("x"))).alias("sx_b"),
        F.sum(F.when(F.col("arm") == "B", F.col("y"))).alias("sy_b"),
    )
    n = F.col("n").cast("double")
    # pooled moments (population form — n divides out of theta)
    cov = F.col("sxy").cast("double") / n - (
        F.col("sx").cast("double") / n
    ) * (F.col("sy").cast("double") / n)
    varx = F.col("sxx").cast("double") / n - (
        F.col("sx").cast("double") / n
    ) * (F.col("sx").cast("double") / n)
    vary = F.col("syy").cast("double") / n - (
        F.col("sy").cast("double") / n
    ) * (F.col("sy").cast("double") / n)
    theta = cov / varx
    mean = lambda s, c: F.col(s).cast("double") / F.col(c).cast("double")  # noqa: E731
    lift_raw = mean("sy_a", "n_a") - mean("sy_b", "n_b")
    lift_cuped = lift_raw - theta * (mean("sx_a", "n_a") - mean("sx_b", "n_b"))
    var_adj = vary - F.lit(2.0) * theta * cov + theta * theta * varx
    return m.select(
        "n_a",
        "n_b",
        F.when(varx > 0, F.round(theta, 6) + F.lit(0.0)).alias("theta"),
        (F.round(lift_raw, 6) + F.lit(0.0)).alias("lift_unadjusted"),
        F.when(varx > 0, F.round(lift_cuped, 6) + F.lit(0.0)).alias(
            "lift_cuped"
        ),
        F.when(
            (varx > 0) & (vary > 0),
            F.round(var_adj / vary, 6) + F.lit(0.0),
        ).alias("var_ratio"),
    )


CUPED_SQL = f"""
WITH per_user AS (
  SELECT user_id,
    CAST(COALESCE(SUM(CASE WHEN CAST(ts AS DATE) < DATE '{SPLIT_DATE}'
      THEN CAST(value AS DECIMAL(18,2)) END), 0) AS DECIMAL(18,2)) AS x,
    CAST(COALESCE(SUM(CASE WHEN CAST(ts AS DATE) >= DATE '{SPLIT_DATE}'
      THEN CAST(value AS DECIMAL(18,2)) END), 0) AS DECIMAL(18,2)) AS y
  FROM events GROUP BY user_id
),
arms AS (SELECT {_ARM_SQL.replace("user_id", "user_id")} AS arm, x, y
         FROM per_user),
m AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n,
    CAST(SUM(x) AS DECIMAL(38,2)) AS sx,
    CAST(SUM(y) AS DECIMAL(38,2)) AS sy,
    CAST(SUM(CAST(x * y AS DECIMAL(38,4))) AS DECIMAL(38,4)) AS sxy,
    CAST(SUM(CAST(x * x AS DECIMAL(38,4))) AS DECIMAL(38,4)) AS sxx,
    CAST(SUM(CAST(y * y AS DECIMAL(38,4))) AS DECIMAL(38,4)) AS syy,
    CAST(SUM(CASE WHEN arm = 'A' THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
    CAST(SUM(CASE WHEN arm = 'A' THEN x END) AS DECIMAL(38,2)) AS sx_a,
    CAST(SUM(CASE WHEN arm = 'A' THEN y END) AS DECIMAL(38,2)) AS sy_a,
    CAST(SUM(CASE WHEN arm = 'B' THEN 1 ELSE 0 END) AS BIGINT) AS n_b,
    CAST(SUM(CASE WHEN arm = 'B' THEN x END) AS DECIMAL(38,2)) AS sx_b,
    CAST(SUM(CASE WHEN arm = 'B' THEN y END) AS DECIMAL(38,2)) AS sy_b
  FROM arms
),
alg AS (
  SELECT n_a, n_b,
    CAST(sxy AS DOUBLE) / CAST(n AS DOUBLE)
      - (CAST(sx AS DOUBLE) / CAST(n AS DOUBLE))
        * (CAST(sy AS DOUBLE) / CAST(n AS DOUBLE)) AS cov,
    CAST(sxx AS DOUBLE) / CAST(n AS DOUBLE)
      - (CAST(sx AS DOUBLE) / CAST(n AS DOUBLE))
        * (CAST(sx AS DOUBLE) / CAST(n AS DOUBLE)) AS varx,
    CAST(syy AS DOUBLE) / CAST(n AS DOUBLE)
      - (CAST(sy AS DOUBLE) / CAST(n AS DOUBLE))
        * (CAST(sy AS DOUBLE) / CAST(n AS DOUBLE)) AS vary,
    CAST(sy_a AS DOUBLE) / CAST(n_a AS DOUBLE)
      - CAST(sy_b AS DOUBLE) / CAST(n_b AS DOUBLE) AS lift_raw,
    CAST(sx_a AS DOUBLE) / CAST(n_a AS DOUBLE)
      - CAST(sx_b AS DOUBLE) / CAST(n_b AS DOUBLE) AS xdiff
  FROM m
)
SELECT n_a, n_b,
  CASE WHEN varx > 0 THEN round(cov / varx, 6) + 0.0 END AS theta,
  round(lift_raw, 6) + 0.0 AS lift_unadjusted,
  CASE WHEN varx > 0
    THEN round(lift_raw - (cov / varx) * xdiff, 6) + 0.0 END AS lift_cuped,
  CASE WHEN varx > 0 AND vary > 0
    THEN round((vary - 2.0 * (cov / varx) * cov
                + (cov / varx) * (cov / varx) * varx) / vary, 6) + 0.0
  END AS var_ratio
FROM alg
"""


QUERIES = {
    "ab_test_proportion_z": ab_test_proportion_z,
    "cuped_adjusted_lift": cuped_adjusted_lift,
}
ORACLES = {
    "ab_test_proportion_z": AB_TEST_SQL,
    "cuped_adjusted_lift": CUPED_SQL,
}


def did_revenue_readout(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Difference-in-differences on per-user spend: (post − pre) change
    in arm A minus the same change in arm B — the observational
    companion to the randomized lift, sharing the CUPED operator's
    pre/post boundary and hash arms.  Four cell means from ONE
    combinable aggregate of exact decimal sums; the DiD is a fixed
    expression over eight exact numbers."""
    ev = load_table(spark, sf_dir, "events")
    dec = F.col("value").cast("decimal(18,2)")
    pre = F.to_date("ts") < F.lit(SPLIT_DATE)
    per_user = ev.groupBy("user_id").agg(
        F.coalesce(F.sum(F.when(pre, dec)), F.lit(0).cast("decimal(18,2)"))
        .cast("decimal(18,2)")
        .alias("x"),
        F.coalesce(F.sum(F.when(~pre, dec)), F.lit(0).cast("decimal(18,2)"))
        .cast("decimal(18,2)")
        .alias("y"),
    )
    arms = per_user.select(_arm(F.col("user_id")).alias("arm"), "x", "y")
    m = arms.groupBy().agg(
        *[
            F.sum(F.when(F.col("arm") == a, 1).otherwise(0))
            .cast("long")
            .alias(f"n_{a.lower()}")
            for a in ("A", "B")
        ],
        *[
            F.sum(F.when(F.col("arm") == a, F.col(c))).alias(f"s{c}_{a.lower()}")
            for a in ("A", "B")
            for c in ("x", "y")
        ],
    )
    mean = lambda s, c: F.col(s).cast("double") / F.col(c).cast("double")  # noqa: E731
    chg_a = mean("sy_a", "n_a") - mean("sx_a", "n_a")
    chg_b = mean("sy_b", "n_b") - mean("sx_b", "n_b")
    return m.select(
        "n_a",
        "n_b",
        (F.round(chg_a, 6) + F.lit(0.0)).alias("change_a"),
        (F.round(chg_b, 6) + F.lit(0.0)).alias("change_b"),
        (F.round(chg_a - chg_b, 6) + F.lit(0.0)).alias("did"),
    )


DID_SQL = f"""
WITH per_user AS (
  SELECT user_id,
    CAST(COALESCE(SUM(CASE WHEN CAST(ts AS DATE) < DATE '{SPLIT_DATE}'
      THEN CAST(value AS DECIMAL(18,2)) END), 0) AS DECIMAL(18,2)) AS x,
    CAST(COALESCE(SUM(CASE WHEN CAST(ts AS DATE) >= DATE '{SPLIT_DATE}'
      THEN CAST(value AS DECIMAL(18,2)) END), 0) AS DECIMAL(18,2)) AS y
  FROM events GROUP BY user_id
),
arms AS (SELECT {_ARM_SQL} AS arm, x, y FROM per_user),
m AS (
  SELECT
    CAST(SUM(CASE WHEN arm = 'A' THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
    CAST(SUM(CASE WHEN arm = 'B' THEN 1 ELSE 0 END) AS BIGINT) AS n_b,
    CAST(SUM(CASE WHEN arm = 'A' THEN x END) AS DECIMAL(38,2)) AS sx_a,
    CAST(SUM(CASE WHEN arm = 'A' THEN y END) AS DECIMAL(38,2)) AS sy_a,
    CAST(SUM(CASE WHEN arm = 'B' THEN x END) AS DECIMAL(38,2)) AS sx_b,
    CAST(SUM(CASE WHEN arm = 'B' THEN y END) AS DECIMAL(38,2)) AS sy_b
  FROM arms
)
SELECT n_a, n_b,
  round(CAST(sy_a AS DOUBLE) / CAST(n_a AS DOUBLE)
        - CAST(sx_a AS DOUBLE) / CAST(n_a AS DOUBLE), 6) + 0.0 AS change_a,
  round(CAST(sy_b AS DOUBLE) / CAST(n_b AS DOUBLE)
        - CAST(sx_b AS DOUBLE) / CAST(n_b AS DOUBLE), 6) + 0.0 AS change_b,
  round((CAST(sy_a AS DOUBLE) / CAST(n_a AS DOUBLE)
         - CAST(sx_a AS DOUBLE) / CAST(n_a AS DOUBLE))
        - (CAST(sy_b AS DOUBLE) / CAST(n_b AS DOUBLE)
           - CAST(sx_b AS DOUBLE) / CAST(n_b AS DOUBLE)), 6) + 0.0 AS did
FROM m
"""


# two-sided alpha = 0.05, power = 0.8: the canonical pair of normal
# quantiles, embedded as fixed literals (both engines consume the same
# numbers; no inverse-CDF evaluation at runtime).
Z_ALPHA = 1.959963984540054
Z_BETA = 0.8416212335729143


def ab_power_mde(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Minimum detectable effect of the per-user spend metric at the
    CURRENT sample sizes (alpha 0.05 two-sided, power 0.8):
    MDE = (z_α/2 + z_β)·σ·√(1/n_A + 1/n_B), with σ² the pooled
    per-user variance from exact decimal moments — the pre-experiment
    sizing number, computed on the live table instead of a spreadsheet.
    Reported both absolute and as a fraction of the pooled mean."""
    ev = load_table(spark, sf_dir, "events")
    dec = F.col("value").cast("decimal(18,2)")
    per_user = ev.groupBy("user_id").agg(
        F.coalesce(F.sum(dec), F.lit(0).cast("decimal(18,2)"))
        .cast("decimal(18,2)")
        .alias("y")
    )
    arms = per_user.select(_arm(F.col("user_id")).alias("arm"), "y")
    m = arms.groupBy().agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("y").cast("decimal(38,2)").alias("sy"),
        F.sum((F.col("y") * F.col("y")).cast("decimal(38,4)")).alias("syy"),
        F.sum(F.when(F.col("arm") == "A", 1).otherwise(0))
        .cast("long")
        .alias("n_a"),
        F.sum(F.when(F.col("arm") == "B", 1).otherwise(0))
        .cast("long")
        .alias("n_b"),
    )
    n = F.col("n").cast("double")
    mean = F.col("sy").cast("double") / n
    var = F.col("syy").cast("double") / n - mean * mean
    mde = (
        F.lit(Z_ALPHA + Z_BETA)
        * F.sqrt(var)
        * F.sqrt(
            F.lit(1.0) / F.col("n_a").cast("double")
            + F.lit(1.0) / F.col("n_b").cast("double")
        )
    )
    return m.select(
        "n_a",
        "n_b",
        (F.round(mean, 6) + F.lit(0.0)).alias("mean_spend"),
        F.when((var > 0) & (F.col("n_a") > 0) & (F.col("n_b") > 0),
               F.round(mde, 6) + F.lit(0.0)).alias("mde_abs"),
        F.when(
            (var > 0) & (mean > 0) & (F.col("n_a") > 0) & (F.col("n_b") > 0),
            F.round(mde / mean, 6) + F.lit(0.0),
        ).alias("mde_rel"),
    )


AB_POWER_SQL = f"""
WITH per_user AS (
  SELECT user_id,
    CAST(COALESCE(SUM(CAST(value AS DECIMAL(18,2))), 0) AS DECIMAL(18,2)) AS y
  FROM events GROUP BY user_id
),
arms AS (SELECT {_ARM_SQL} AS arm, y FROM per_user),
m AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n,
    CAST(SUM(y) AS DECIMAL(38,2)) AS sy,
    CAST(SUM(CAST(y * y AS DECIMAL(38,4))) AS DECIMAL(38,4)) AS syy,
    CAST(SUM(CASE WHEN arm = 'A' THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
    CAST(SUM(CASE WHEN arm = 'B' THEN 1 ELSE 0 END) AS BIGINT) AS n_b
  FROM arms
)
SELECT n_a, n_b,
  round(CAST(sy AS DOUBLE) / CAST(n AS DOUBLE), 6) + 0.0 AS mean_spend,
  CASE WHEN (CAST(syy AS DOUBLE) / CAST(n AS DOUBLE)
             - (CAST(sy AS DOUBLE) / CAST(n AS DOUBLE))
               * (CAST(sy AS DOUBLE) / CAST(n AS DOUBLE))) > 0
        AND n_a > 0 AND n_b > 0
  THEN round({Z_ALPHA + Z_BETA!r}
    * sqrt(CAST(syy AS DOUBLE) / CAST(n AS DOUBLE)
           - (CAST(sy AS DOUBLE) / CAST(n AS DOUBLE))
             * (CAST(sy AS DOUBLE) / CAST(n AS DOUBLE)))
    * sqrt(1.0 / CAST(n_a AS DOUBLE) + 1.0 / CAST(n_b AS DOUBLE)), 6) + 0.0
  END AS mde_abs,
  CASE WHEN (CAST(syy AS DOUBLE) / CAST(n AS DOUBLE)
             - (CAST(sy AS DOUBLE) / CAST(n AS DOUBLE))
               * (CAST(sy AS DOUBLE) / CAST(n AS DOUBLE))) > 0
        AND CAST(sy AS DOUBLE) / CAST(n AS DOUBLE) > 0
        AND n_a > 0 AND n_b > 0
  THEN round(({Z_ALPHA + Z_BETA!r}
    * sqrt(CAST(syy AS DOUBLE) / CAST(n AS DOUBLE)
           - (CAST(sy AS DOUBLE) / CAST(n AS DOUBLE))
             * (CAST(sy AS DOUBLE) / CAST(n AS DOUBLE)))
    * sqrt(1.0 / CAST(n_a AS DOUBLE) + 1.0 / CAST(n_b AS DOUBLE)))
    / (CAST(sy AS DOUBLE) / CAST(n AS DOUBLE)), 6) + 0.0
  END AS mde_rel
FROM m
"""


QUERIES["did_revenue_readout"] = did_revenue_readout
ORACLES["did_revenue_readout"] = DID_SQL
QUERIES["ab_power_mde"] = ab_power_mde
ORACLES["ab_power_mde"] = AB_POWER_SQL


# Poisson(1) CDF thresholds at 12 dp, k = 0..6 (k = 7 is the tail).  The
# Poisson bootstrap (Chamandy et al., Google 2012) replaces
# sample-with-replacement — impossible to coordinate across partitions —
# with an independent Poisson(1) weight per (row, replicate): row-local,
# shuffle-free, the industrial bootstrap at terabyte scale.
_POIS_CDF = [
    "0.367879441171",
    "0.735758882343",
    "0.919698602929",
    "0.981011843124",
    "0.996340153173",
    "0.999405815182",
    "0.999916758851",
]
BOOT_B = 64
_BOOT_U_SCALE = 1_000_000_000_000


def poisson_bootstrap_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    """95% bootstrap CI for mean per-user spend via the Poisson
    bootstrap, fully deterministic: replicate b's weight for a user is
    the inverse-CDF Poisson(1) draw at a (user, b)-seeded hash uniform,
    so both engines materialize the identical 64 resampled means and the
    CI is an exact order statistic over them (percentile_disc — an
    aggregate over the 64-row frame, no global window).

    Scale design (100 TB): the per-user aggregate is one combinable
    pass; replication explodes each user row ×64 into weighted decimal
    sums keyed by replicate — map-side combinable, bounded state of 64
    groups; everything after is O(B)."""
    ev = load_table(spark, sf_dir, "events")
    per_user = ev.groupBy("user_id").agg(
        F.coalesce(F.sum(F.col("value").cast("decimal(18,2)")),
                   F.lit(0).cast("decimal(18,2)"))
        .cast("decimal(18,2)")
        .alias("y")
    )
    rep = per_user.select(
        "user_id",
        "y",
        F.explode(F.array(*[F.lit(b) for b in range(BOOT_B)])).alias("b"),
    )
    u = (
        F.pmod(
            hash60(
                F.concat(
                    F.lit("boot:"), F.col("b"), F.lit(":"), F.col("user_id")
                )
            ),
            F.lit(_BOOT_U_SCALE),
        ).cast("double")
        / F.lit(float(_BOOT_U_SCALE))
    )
    w = F.lit(7)
    for k in reversed(range(len(_POIS_CDF))):
        w = F.when(u < F.lit(float(_POIS_CDF[k])), F.lit(k)).otherwise(w)
    means = (
        rep.select("b", w.alias("w"), "y")
        .groupBy("b")
        .agg(
            F.sum(F.col("w").cast("decimal(38,2)") * F.col("y")).alias("swy"),
            F.sum("w").cast("long").alias("sw"),
        )
        .select(
            (F.col("swy").cast("double") / F.col("sw").cast("double")).alias(
                "mean_b"
            )
        )
    )
    stats = per_user.agg(
        F.count(F.lit(1)).cast("long").alias("n_users"),
        (F.sum("y").cast("double") / F.count(F.lit(1)).cast("double")).alias(
            "mean_spend"
        ),
    )
    ci = means.agg(
        F.expr("percentile_disc(0.025) WITHIN GROUP (ORDER BY mean_b)").alias(
            "lo"
        ),
        F.expr("percentile_disc(0.975) WITHIN GROUP (ORDER BY mean_b)").alias(
            "hi"
        ),
    )
    return stats.crossJoin(F.broadcast(ci)).select(
        "n_users",
        (F.round("mean_spend", 6) + F.lit(0.0)).alias("mean_spend"),
        (F.round("lo", 6) + F.lit(0.0)).alias("ci_lo"),
        (F.round("hi", 6) + F.lit(0.0)).alias("ci_hi"),
    )


def _boot_sql() -> str:
    h = _hash60_sql("'boot:' || b || ':' || user_id")
    u = f"(CAST({h} % {_BOOT_U_SCALE} AS DOUBLE) / {float(_BOOT_U_SCALE)!r})"
    w = "CASE "
    for k, t in enumerate(_POIS_CDF):
        w += f"WHEN {u} < {float(t)!r} THEN {k} "
    w += "ELSE 7 END"
    return f"""
WITH per_user AS (
  SELECT user_id,
    CAST(COALESCE(SUM(CAST(value AS DECIMAL(18,2))), 0) AS DECIMAL(18,2)) AS y
  FROM events GROUP BY user_id
),
rep AS (
  SELECT user_id, y, r.b
  FROM per_user, UNNEST(range(0, {BOOT_B})) AS r(b)
),
means AS (
  SELECT
    CAST(SUM(CAST(({w}) AS DECIMAL(38,2)) * y) AS DECIMAL(38,4)) AS swy,
    CAST(SUM({w}) AS BIGINT) AS sw
  FROM rep GROUP BY b
),
mvals AS (
  SELECT CAST(swy AS DOUBLE) / CAST(sw AS DOUBLE) AS mean_b FROM means
),
stats AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_users,
    CAST(SUM(y) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS mean_spend
  FROM per_user
),
ci AS (
  SELECT percentile_disc(0.025) WITHIN GROUP (ORDER BY mean_b) AS lo,
         percentile_disc(0.975) WITHIN GROUP (ORDER BY mean_b) AS hi
  FROM mvals
)
SELECT n_users,
  round(mean_spend, 6) + 0.0 AS mean_spend,
  round(lo, 6) + 0.0 AS ci_lo,
  round(hi, 6) + 0.0 AS ci_hi
FROM stats CROSS JOIN ci
"""


POISSON_BOOT_SQL = _boot_sql()

QUERIES["poisson_bootstrap_ci"] = poisson_bootstrap_ci
ORACLES["poisson_bootstrap_ci"] = POISSON_BOOT_SQL


N_ACTIVITY_STRATA = 4


def stratified_ate_click_effect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stratified average treatment effect of clicking on per-user
    spend, observational: users stratify by activity (event-count
    quartile — the confounder: active users both click more and spend
    more), and the ATE is the stratum-size-weighted difference of
    treated/control mean spend within each stratum — the classic
    back-door adjustment that a naive treated-vs-untreated difference
    gets wrong.  Emits per-stratum rows plus the naive diff so the
    confounding is visible in one readout.

    Scale/exactness: one per-user aggregate; quartile edges are exact
    order statistics broadcast as one row; per-(stratum, treated) cells
    are integer/decimal sums; the weighting algebra runs on the
    O(strata) frame."""
    ev = load_table(spark, sf_dir, "events")
    per_user = ev.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_events"),
        F.max((F.col("event_type") == "click").cast("long")).alias("treated"),
        F.coalesce(F.sum(F.col("value").cast("decimal(18,2)")),
                   F.lit(0).cast("decimal(18,2)"))
        .cast("decimal(18,2)")
        .alias("y"),
    )
    edges = per_user.agg(
        *[
            F.expr(
                f"percentile_disc({q}) WITHIN GROUP (ORDER BY n_events)"
            ).alias(f"e{i}")
            for i, q in enumerate((0.25, 0.5, 0.75))
        ]
    )
    strat = per_user.crossJoin(F.broadcast(edges)).select(
        (
            (F.col("n_events") > F.col("e0")).cast("int")
            + (F.col("n_events") > F.col("e1")).cast("int")
            + (F.col("n_events") > F.col("e2")).cast("int")
        ).alias("stratum"),
        "treated",
        "y",
    )
    cells = strat.groupBy("stratum").agg(
        F.count(F.lit(1)).cast("long").alias("n_users"),
        F.sum("treated").cast("long").alias("n_treated"),
        F.sum(F.when(F.col("treated") == 1, F.col("y"))).alias("sy_t"),
        F.sum(F.when(F.col("treated") == 0, F.col("y"))).alias("sy_c"),
    )
    n_c = F.col("n_users") - F.col("n_treated")
    mean_t = F.col("sy_t").cast("double") / F.col("n_treated").cast("double")
    mean_c = F.col("sy_c").cast("double") / n_c.cast("double")
    return cells.select(
        "stratum",
        "n_users",
        "n_treated",
        F.when(F.col("n_treated") > 0, F.round(mean_t, 6) + F.lit(0.0)).alias(
            "mean_treated"
        ),
        F.when(n_c > 0, F.round(mean_c, 6) + F.lit(0.0)).alias("mean_control"),
        F.when(
            (F.col("n_treated") > 0) & (n_c > 0),
            F.round(mean_t - mean_c, 6) + F.lit(0.0),
        ).alias("stratum_effect"),
    ).orderBy("stratum")


STRATIFIED_ATE_SQL = """
WITH per_user AS (
  SELECT user_id,
    CAST(COUNT(*) AS BIGINT) AS n_events,
    CAST(MAX(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT)
      AS treated,
    CAST(COALESCE(SUM(CAST(value AS DECIMAL(18,2))), 0) AS DECIMAL(18,2)) AS y
  FROM events GROUP BY user_id
),
edges AS (
  SELECT
    percentile_disc(0.25) WITHIN GROUP (ORDER BY n_events) AS e0,
    percentile_disc(0.5)  WITHIN GROUP (ORDER BY n_events) AS e1,
    percentile_disc(0.75) WITHIN GROUP (ORDER BY n_events) AS e2
  FROM per_user
),
strat AS (
  SELECT
    CAST(CASE WHEN n_events > e0 THEN 1 ELSE 0 END
       + CASE WHEN n_events > e1 THEN 1 ELSE 0 END
       + CASE WHEN n_events > e2 THEN 1 ELSE 0 END AS INTEGER) AS stratum,
    treated, y
  FROM per_user CROSS JOIN edges
),
cells AS (
  SELECT stratum,
    CAST(COUNT(*) AS BIGINT) AS n_users,
    CAST(SUM(treated) AS BIGINT) AS n_treated,
    CAST(SUM(CASE WHEN treated = 1 THEN y END) AS DECIMAL(38,2)) AS sy_t,
    CAST(SUM(CASE WHEN treated = 0 THEN y END) AS DECIMAL(38,2)) AS sy_c
  FROM strat GROUP BY stratum
)
SELECT stratum, n_users, n_treated,
  CASE WHEN n_treated > 0 THEN
    round(CAST(sy_t AS DOUBLE) / CAST(n_treated AS DOUBLE), 6) + 0.0
  END AS mean_treated,
  CASE WHEN n_users - n_treated > 0 THEN
    round(CAST(sy_c AS DOUBLE) / CAST(n_users - n_treated AS DOUBLE), 6) + 0.0
  END AS mean_control,
  CASE WHEN n_treated > 0 AND n_users - n_treated > 0 THEN
    round(CAST(sy_t AS DOUBLE) / CAST(n_treated AS DOUBLE)
          - CAST(sy_c AS DOUBLE) / CAST(n_users - n_treated AS DOUBLE), 6)
    + 0.0
  END AS stratum_effect
FROM cells ORDER BY stratum
"""


def ab_srm_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sample-ratio-mismatch guard: chi-square of the observed arm sizes
    against the designed 50/50 split — THE first validity gate any
    experiment readout must pass (an SRM means the assignment or logging
    is broken and every other metric is garbage).  One per-user
    aggregate, one O(1) algebra row; chi2 from exact integer counts."""
    ev = load_table(spark, sf_dir, "events")
    users = ev.select("user_id").distinct()
    arms = users.select(_arm(F.col("user_id")).alias("arm"))
    m = arms.groupBy().agg(
        F.sum((F.col("arm") == "A").cast("long")).cast("long").alias("n_a"),
        F.sum((F.col("arm") == "B").cast("long")).cast("long").alias("n_b"),
    )
    n = (F.col("n_a") + F.col("n_b")).cast("double")
    e = n / F.lit(2.0)
    chi2 = (
        (F.col("n_a").cast("double") - e) * (F.col("n_a").cast("double") - e)
        / e
        + (F.col("n_b").cast("double") - e) * (F.col("n_b").cast("double") - e)
        / e
    )
    return m.select(
        "n_a",
        "n_b",
        F.when(n > 0, F.round(chi2, 6) + F.lit(0.0)).alias("srm_chi2"),
        F.when(n > 0, chi2 > F.lit(10.828)).alias("srm_flag"),  # p < 0.001
    )


AB_SRM_SQL = f"""
WITH users AS (SELECT DISTINCT user_id FROM events),
arms AS (SELECT {_ARM_SQL} AS arm FROM users),
m AS (
  SELECT
    CAST(SUM(CASE WHEN arm = 'A' THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
    CAST(SUM(CASE WHEN arm = 'B' THEN 1 ELSE 0 END) AS BIGINT) AS n_b
  FROM arms
)
SELECT n_a, n_b,
  CASE WHEN n_a + n_b > 0 THEN
    round((CAST(n_a AS DOUBLE) - CAST(n_a + n_b AS DOUBLE) / 2.0)
          * (CAST(n_a AS DOUBLE) - CAST(n_a + n_b AS DOUBLE) / 2.0)
          / (CAST(n_a + n_b AS DOUBLE) / 2.0)
          + (CAST(n_b AS DOUBLE) - CAST(n_a + n_b AS DOUBLE) / 2.0)
            * (CAST(n_b AS DOUBLE) - CAST(n_a + n_b AS DOUBLE) / 2.0)
            / (CAST(n_a + n_b AS DOUBLE) / 2.0), 6) + 0.0
  END AS srm_chi2,
  CASE WHEN n_a + n_b > 0 THEN
    ((CAST(n_a AS DOUBLE) - CAST(n_a + n_b AS DOUBLE) / 2.0)
     * (CAST(n_a AS DOUBLE) - CAST(n_a + n_b AS DOUBLE) / 2.0)
     / (CAST(n_a + n_b AS DOUBLE) / 2.0)
     + (CAST(n_b AS DOUBLE) - CAST(n_a + n_b AS DOUBLE) / 2.0)
       * (CAST(n_b AS DOUBLE) - CAST(n_a + n_b AS DOUBLE) / 2.0)
       / (CAST(n_a + n_b AS DOUBLE) / 2.0)) > 10.828
  END AS srm_flag
FROM m
"""


QUERIES["stratified_ate_click_effect"] = stratified_ate_click_effect
ORACLES["stratified_ate_click_effect"] = STRATIFIED_ATE_SQL
QUERIES["ab_srm_check"] = ab_srm_check
ORACLES["ab_srm_check"] = AB_SRM_SQL


def uplift_by_score_decile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Uplift (Qini-style) readout: users rank by a targeting score
    (pre-period spend), and each score decile reports the
    treated-minus-control conversion gap plus the cumulative gap over
    the top-k deciles — the curve an uplift model is judged by (under
    the hash A/A assignment the true uplift is ~0, making this the
    null-calibration readout).

    Scale/exactness: decile edges are exact order statistics broadcast
    once; per-(decile, arm) cells are integer counts; the cumulative
    column comes from a bounded triangular self-join over the ≤10-row
    cell frame (never a global window)."""
    ev = load_table(spark, sf_dir, "events")
    pre = F.to_date("ts") < F.lit(SPLIT_DATE)
    per_user = ev.groupBy("user_id").agg(
        F.coalesce(
            F.sum(F.when(pre, F.col("value").cast("decimal(18,2)"))),
            F.lit(0).cast("decimal(18,2)"),
        )
        .cast("decimal(18,2)")
        .alias("score"),
        F.max(
            F.when(
                ~pre & (F.col("event_type") == "purchase"), 1
            ).otherwise(0)
        )
        .cast("long")
        .alias("conv"),
    )
    edges = per_user.agg(
        *[
            F.expr(
                f"percentile_disc({q / 10.0}) WITHIN GROUP (ORDER BY score)"
            ).alias(f"e{q}")
            for q in range(1, 10)
        ]
    )
    dec_expr = None
    for q in range(1, 10):
        term = (F.col("score") > F.col(f"e{q}")).cast("int")
        dec_expr = term if dec_expr is None else dec_expr + term
    cells = (
        per_user.crossJoin(F.broadcast(edges))
        .select(
            dec_expr.alias("decile"),
            _arm(F.col("user_id")).alias("arm"),
            "conv",
        )
        .groupBy("decile")
        .agg(
            F.sum((F.col("arm") == "A").cast("long")).cast("long").alias("n_t"),
            F.sum((F.col("arm") == "B").cast("long")).cast("long").alias("n_c"),
            F.sum(F.when(F.col("arm") == "A", F.col("conv")).otherwise(0))
            .cast("long")
            .alias("conv_t"),
            F.sum(F.when(F.col("arm") == "B", F.col("conv")).otherwise(0))
            .cast("long")
            .alias("conv_c"),
        )
    )
    hi = cells.select(
        F.col("decile").alias("d2"),
        F.col("n_t").alias("n_t2"),
        F.col("n_c").alias("n_c2"),
        F.col("conv_t").alias("conv_t2"),
        F.col("conv_c").alias("conv_c2"),
    )
    cum = (
        cells.join(hi, F.col("d2") >= F.col("decile"))
        .groupBy("decile", "n_t", "n_c", "conv_t", "conv_c")
        .agg(
            F.sum("n_t2").cast("long").alias("cn_t"),
            F.sum("n_c2").cast("long").alias("cn_c"),
            F.sum("conv_t2").cast("long").alias("cconv_t"),
            F.sum("conv_c2").cast("long").alias("cconv_c"),
        )
    )
    rate = lambda c, n: F.col(c).cast("double") / F.col(n).cast("double")  # noqa: E731
    return cum.select(
        "decile",
        "n_t",
        "n_c",
        F.when(
            (F.col("n_t") > 0) & (F.col("n_c") > 0),
            F.round(rate("conv_t", "n_t") - rate("conv_c", "n_c"), 6)
            + F.lit(0.0),
        ).alias("uplift"),
        F.when(
            (F.col("cn_t") > 0) & (F.col("cn_c") > 0),
            F.round(rate("cconv_t", "cn_t") - rate("cconv_c", "cn_c"), 6)
            + F.lit(0.0),
        ).alias("cum_uplift_topk"),
    ).orderBy(F.desc("decile"))


UPLIFT_SQL = f"""
WITH per_user AS (
  SELECT user_id,
    CAST(COALESCE(SUM(CASE WHEN CAST(ts AS DATE) < DATE '{SPLIT_DATE}'
      THEN CAST(value AS DECIMAL(18,2)) END), 0) AS DECIMAL(18,2)) AS score,
    CAST(MAX(CASE WHEN CAST(ts AS DATE) >= DATE '{SPLIT_DATE}'
                   AND event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT)
      AS conv
  FROM events GROUP BY user_id
),
edges AS (
  SELECT
    {", ".join(
        f"percentile_disc({q / 10.0}) WITHIN GROUP (ORDER BY score) AS e{q}"
        for q in range(1, 10)
    )}
  FROM per_user
),
cells AS (
  SELECT
    CAST({" + ".join(
        f"CASE WHEN score > e{q} THEN 1 ELSE 0 END" for q in range(1, 10)
    )} AS INTEGER) AS decile,
    {_ARM_SQL} AS arm, conv
  FROM per_user CROSS JOIN edges
),
agg AS (
  SELECT decile,
    CAST(SUM(CASE WHEN arm = 'A' THEN 1 ELSE 0 END) AS BIGINT) AS n_t,
    CAST(SUM(CASE WHEN arm = 'B' THEN 1 ELSE 0 END) AS BIGINT) AS n_c,
    CAST(SUM(CASE WHEN arm = 'A' THEN conv ELSE 0 END) AS BIGINT) AS conv_t,
    CAST(SUM(CASE WHEN arm = 'B' THEN conv ELSE 0 END) AS BIGINT) AS conv_c
  FROM cells GROUP BY decile
),
cum AS (
  SELECT a.decile, a.n_t, a.n_c, a.conv_t, a.conv_c,
    CAST(SUM(b.n_t) AS BIGINT) AS cn_t,
    CAST(SUM(b.n_c) AS BIGINT) AS cn_c,
    CAST(SUM(b.conv_t) AS BIGINT) AS cconv_t,
    CAST(SUM(b.conv_c) AS BIGINT) AS cconv_c
  FROM agg a JOIN agg b ON b.decile >= a.decile
  GROUP BY a.decile, a.n_t, a.n_c, a.conv_t, a.conv_c
)
SELECT decile, n_t, n_c,
  CASE WHEN n_t > 0 AND n_c > 0 THEN
    round(CAST(conv_t AS DOUBLE) / CAST(n_t AS DOUBLE)
          - CAST(conv_c AS DOUBLE) / CAST(n_c AS DOUBLE), 6) + 0.0
  END AS uplift,
  CASE WHEN cn_t > 0 AND cn_c > 0 THEN
    round(CAST(cconv_t AS DOUBLE) / CAST(cn_t AS DOUBLE)
          - CAST(cconv_c AS DOUBLE) / CAST(cn_c AS DOUBLE), 6) + 0.0
  END AS cum_uplift_topk
FROM cum ORDER BY decile DESC
"""


QUERIES["uplift_by_score_decile"] = uplift_by_score_decile
ORACLES["uplift_by_score_decile"] = UPLIFT_SQL
