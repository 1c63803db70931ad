"""Declarative data-quality constraints — a Deequ/dbt-tests-style check
suite over replicated tables, evaluated in ONE scan per table.

A replication target needs continuous quality gates beyond row counts and
checksums (validation.py): completeness, uniqueness, value ranges, and
accepted domains.  Each table's constraints compile into a single
aggregate projection (every metric is a count/ratio of exact integers —
map-side combinable, deterministic cross-engine), then unpivot into one
(table, column, kind, metric, passed) report row per constraint.

Scale: cost is one scan + one aggregate per table regardless of how many
constraints it carries; `unique` is the only constraint that needs a
distinct (one shuffle on the column) — swap in HLL from sketches.py when
an approximate uniqueness gate is acceptable at 100 TB.  The report is
O(constraints) rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from debezium_server_bigquery_spark.sources.tables import load_table

# (table, column, kind, param) — kinds:
#   not_null            metric = non-null fraction, pass at 1.0
#   unique              metric = distinct/non-null fraction, pass at 1.0
#   min_value(p)        metric = fraction >= p, pass at 1.0
#   range(lo, hi)       metric = fraction in [lo, hi], pass at 1.0
#   accepted_values(vs) metric = fraction in vs (nulls fail), pass at 1.0
CONSTRAINTS = [
    ("orders", "o_orderkey", "unique", None),
    ("orders", "o_custkey", "not_null", None),
    ("orders", "o_totalprice", "min_value", 0.0),
    ("orders", "o_orderstatus", "accepted_values", ("O", "F", "P")),
    ("lineitem", "l_orderkey", "not_null", None),
    ("lineitem", "l_quantity", "range", (1.0, 50.0)),
    ("lineitem", "l_discount", "range", (0.0, 0.1)),
    ("customer", "c_custkey", "unique", None),
    ("documents", "doc_id", "unique", None),
    ("documents", "text", "not_null", None),
    ("documents", "n_chars", "min_value", 0.0),
]


def _metric_col(col: str, kind: str, param):
    total = F.count(F.lit(1))
    if kind == "not_null":
        return F.count(col) / total
    if kind == "unique":
        return F.countDistinct(col) / F.count(col)
    if kind == "min_value":
        ok = F.sum((F.col(col) >= param).cast("long"))
        return ok / total
    if kind == "range":
        lo, hi = param
        ok = F.sum(((F.col(col) >= lo) & (F.col(col) <= hi)).cast("long"))
        return ok / total
    if kind == "accepted_values":
        ok = F.sum(F.col(col).isin(*param).cast("long"))
        return ok / total
    raise ValueError(f"unknown constraint kind: {kind}")


def _violations_col(col: str, kind: str, param):
    """EXACT violating-row count — pass/fail must not run through the
    rounded display metric: on a multi-million-row table a single bad row
    rounds to metric 1.000000 and would report as passed."""
    total = F.count(F.lit(1))
    if kind == "not_null":
        return total - F.count(col)
    if kind == "unique":
        return F.count(col) - F.countDistinct(col)
    # total - ok (the same ok expression the metric uses), so a NULL row
    # counts as violating exactly when the metric counts it as not-ok
    if kind == "min_value":
        return total - F.sum((F.col(col) >= param).cast("long"))
    if kind == "range":
        lo, hi = param
        return total - F.sum(
            ((F.col(col) >= lo) & (F.col(col) <= hi)).cast("long")
        )
    if kind == "accepted_values":
        return total - F.sum(F.col(col).isin(*param).cast("long"))
    raise ValueError(f"unknown constraint kind: {kind}")


def validate_constraints(spark: SparkSession, sf_dir: str) -> DataFrame:
    from functools import reduce

    by_table: dict = {}
    for tbl, col, kind, param in CONSTRAINTS:
        by_table.setdefault(tbl, []).append((col, kind, param))
    reports = []
    for tbl, specs in by_table.items():
        df = load_table(spark, sf_dir, tbl)
        agg = df.agg(
            *[
                expr
                for i, (col, kind, param) in enumerate(specs)
                for expr in (
                    F.round(_metric_col(col, kind, param), 6).alias(f"m_{i}"),
                    _violations_col(col, kind, param).alias(f"v_{i}"),
                )
            ]
        )
        # unpivot the one-row aggregate into report rows
        rows = agg.select(
            F.lit(tbl).alias("table_name"),
            F.expr(
                "stack({}, {})".format(
                    len(specs),
                    ", ".join(
                        f"'{col}', '{kind}', m_{i}, v_{i}"
                        for i, (col, kind, _p) in enumerate(specs)
                    ),
                )
            ).alias("column_name", "constraint", "metric", "n_violations"),
        )
        reports.append(rows)
    out = reduce(lambda a, b: a.unionByName(b), reports)
    return out.select(
        "table_name",
        "column_name",
        "constraint",
        "metric",
        "n_violations",
        (F.col("n_violations") == 0).alias("passed"),
    ).orderBy("table_name", "column_name", "constraint")


def _metric_sql(tbl: str, col: str, kind: str, param) -> str:
    if kind == "not_null":
        expr = f"COUNT({col}) / CAST(COUNT(*) AS DOUBLE)"
        viol = f"COUNT(*) - COUNT({col})"
    elif kind == "unique":
        expr = f"COUNT(DISTINCT {col}) / CAST(COUNT({col}) AS DOUBLE)"
        viol = f"COUNT({col}) - COUNT(DISTINCT {col})"
    elif kind == "min_value":
        ok = f"CAST(SUM(CASE WHEN {col} >= {param} THEN 1 ELSE 0 END) AS BIGINT)"
        expr = f"{ok} / CAST(COUNT(*) AS DOUBLE)"
        viol = f"COUNT(*) - {ok}"
    elif kind == "range":
        lo, hi = param
        ok = (
            f"CAST(SUM(CASE WHEN {col} >= {lo} AND {col} <= {hi} THEN 1 ELSE 0 END)"
            f" AS BIGINT)"
        )
        expr = f"{ok} / CAST(COUNT(*) AS DOUBLE)"
        viol = f"COUNT(*) - {ok}"
    elif kind == "accepted_values":
        vals = ", ".join(f"'{v}'" for v in param)
        ok = f"CAST(SUM(CASE WHEN {col} IN ({vals}) THEN 1 ELSE 0 END) AS BIGINT)"
        expr = f"{ok} / CAST(COUNT(*) AS DOUBLE)"
        viol = f"COUNT(*) - {ok}"
    else:
        raise ValueError(kind)
    return (
        f"SELECT '{tbl}' AS table_name, '{col}' AS column_name, "
        f"'{kind}' AS \"constraint\", round({expr}, 6) AS metric, "
        f"CAST({viol} AS BIGINT) AS n_violations FROM {tbl}"
    )


# passed derives from the EXACT violation count, never the rounded metric
VALIDATE_CONSTRAINTS_SQL = (
    "SELECT table_name, column_name, \"constraint\", metric, n_violations, "
    "n_violations = 0 AS passed FROM ("
    + " UNION ALL ".join(
        _metric_sql(tbl, col, kind, param) for tbl, col, kind, param in CONSTRAINTS
    )
    + ") ORDER BY table_name, column_name, \"constraint\""
)


QUERIES = {"validate_constraints": validate_constraints}
ORACLES = {"validate_constraints": VALIDATE_CONSTRAINTS_SQL}
