"""Column-level data profiling — the Deequ-style table profiler.

For every column of the profiled tables: row count, null count, exact
distinct count, and a uniqueness flag (candidate primary key: every
non-null value distinct, no nulls).  The report a replication pipeline
runs against each destination to catch silent quality drift (nulls
creeping into a key, a dimension losing cardinality) and to SUGGEST
constraints — the discovery twin of plans/constraints.py's validators,
which check constraints already declared.

Plan shape: ONE scan per table — all per-column aggregates ride a single
``agg`` (Spark plans the multi-distinct aggregate with an Expand, one
duplicated pass per distinct column — exact and bounded by column
count); the one wide row then unpivots via ``stack`` into (column,
stats) rows.  At 100 TB swap the exact distinct counts for
``approx_count_distinct`` (the HLL in functions/sketches.py) — same
single-scan shape, no Expand; the exact form is the oracle-checkable
variant.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from debezium_server_bigquery_spark.sources.tables import load_table

# Static column lists (mirrored verbatim in the SQL twin): the fixed star
# schema of the replicated warehouse.
PROFILE_TABLES: dict[str, list[str]] = {
    "orders": [
        "o_orderkey",
        "o_custkey",
        "o_orderstatus",
        "o_totalprice",
        "o_orderdate",
        "o_orderpriority",
    ],
    "customer": [
        "c_custkey",
        "c_name",
        "c_nationkey",
        "c_acctbal",
        "c_mktsegment",
    ],
}


def profile_columns(df: DataFrame, table: str, cols: list[str]) -> DataFrame:
    """(tbl, col_name, n_rows, n_null, n_distinct, is_unique) — one scan."""
    aggs = [F.count(F.lit(1)).alias("__n")]
    for c in cols:
        aggs.append((F.count(F.lit(1)) - F.count(c)).alias(f"__null_{c}"))
        aggs.append(F.countDistinct(c).alias(f"__dist_{c}"))
    one = df.agg(*aggs)
    stack_args = ", ".join(
        f"'{c}', __null_{c}, __dist_{c}" for c in cols
    )
    return (
        one.select(
            F.col("__n").alias("n_rows"),
            F.expr(
                f"stack({len(cols)}, {stack_args}) AS (col_name, n_null, n_distinct)"
            ),
        )
        .select(
            F.lit(table).alias("tbl"),
            "col_name",
            "n_rows",
            "n_null",
            "n_distinct",
            (
                (F.col("n_null") == 0)
                & (F.col("n_distinct") == F.col("n_rows"))
            ).alias("is_unique"),
        )
    )


def profile_table_columns(spark: SparkSession, sf_dir: str) -> DataFrame:
    parts = [
        profile_columns(load_table(spark, sf_dir, t), t, cols)
        for t, cols in PROFILE_TABLES.items()
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out.orderBy("tbl", "col_name")


def _table_profile_sql(table: str, cols: list[str]) -> str:
    selects = [
        f"""SELECT '{table}' AS tbl, '{c}' AS col_name,
  COUNT(*) AS n_rows,
  COUNT(*) - COUNT({c}) AS n_null,
  COUNT(DISTINCT {c}) AS n_distinct,
  (COUNT(*) = COUNT({c}) AND COUNT(DISTINCT {c}) = COUNT(*)) AS is_unique
FROM {table}"""
        for c in cols
    ]
    return "\nUNION ALL\n".join(selects)


PROFILE_SQL = (
    "\nUNION ALL\n".join(
        _table_profile_sql(t, cols) for t, cols in PROFILE_TABLES.items()
    )
    + "\nORDER BY tbl, col_name"
)


QUERIES = {"profile_table_columns": profile_table_columns}
ORACLES = {"profile_table_columns": PROFILE_SQL}


# --------------------------------------------------------------------------
# functional_dependency_audit — exact FD check over candidate pairs.
# --------------------------------------------------------------------------
# (table, LHS cols, RHS col, why it is interesting)
_FD_CANDIDATES = [
    ("orders", ["o_orderkey"], "o_custkey"),          # PK -> attr: must hold
    ("customer", ["c_custkey"], "c_nationkey"),       # PK -> attr: must hold
    ("documents", ["doc_id"], "lang"),                # PK -> attr: must hold
    ("lineitem", ["l_orderkey", "l_linenumber"], "l_partkey"),  # composite PK
    ("lineitem", ["l_orderkey"], "l_suppkey"),        # expected to FAIL
    ("lineitem", ["l_partkey"], "l_suppkey"),         # expected to FAIL
]


def functional_dependency_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact functional-dependency check over a declared candidate list —
    the schema-mining side of the profiler: ``LHS → RHS`` holds iff every
    LHS group maps to exactly one RHS value, i.e. ``|distinct(LHS)| =
    |distinct(LHS, RHS)|``.  PK→attribute rows double as replication
    integrity checks (a violated PK dependency means the CDC pipeline
    merged two sources of truth); the deliberately-false candidates pin
    that the audit can actually fail.

    Scale design (100 TB): each candidate is ONE aggregate of two exact
    distinct counts (hash-partial distinct, map-side combinable); no
    joins, no windows; the union output is O(candidates)."""
    out = None
    for table, lhs, rhs in _FD_CANDIDATES:
        df = load_table(spark, sf_dir, table)
        row = df.agg(
            F.countDistinct(*[F.col(c) for c in lhs]).alias("n_lhs"),
            F.countDistinct(*([F.col(c) for c in lhs] + [F.col(rhs)])).alias(
                "n_lhs_rhs"
            ),
        ).select(
            F.lit(f"{table}: {','.join(lhs)} -> {rhs}").alias("fd"),
            F.col("n_lhs").cast("long").alias("n_lhs_groups"),
            (F.col("n_lhs_rhs") - F.col("n_lhs")).cast("long").alias(
                "n_violating_groups"
            ),
            (F.col("n_lhs_rhs") == F.col("n_lhs")).alias("holds"),
        )
        out = row if out is None else out.unionAll(row)
    return out.orderBy("fd")


def _fd_sql(table: str, lhs: list[str], rhs: str) -> str:
    lhs_expr = ", ".join(lhs)
    return f"""
SELECT '{table}: {','.join(lhs)} -> {rhs}' AS fd,
  CAST((SELECT COUNT(*) FROM (SELECT DISTINCT {lhs_expr} FROM {table}))
    AS BIGINT) AS n_lhs_groups,
  CAST((SELECT COUNT(*) FROM (SELECT DISTINCT {lhs_expr}, {rhs} FROM {table}))
    - (SELECT COUNT(*) FROM (SELECT DISTINCT {lhs_expr} FROM {table}))
    AS BIGINT) AS n_violating_groups,
  (SELECT COUNT(*) FROM (SELECT DISTINCT {lhs_expr}, {rhs} FROM {table}))
    = (SELECT COUNT(*) FROM (SELECT DISTINCT {lhs_expr} FROM {table}))
    AS holds"""


FD_AUDIT_SQL = (
    "\nUNION ALL\n".join(_fd_sql(t, l, r) for t, l, r in _FD_CANDIDATES)
    + "\nORDER BY fd"
)

QUERIES["functional_dependency_audit"] = functional_dependency_audit
ORACLES["functional_dependency_audit"] = FD_AUDIT_SQL


_CORR_COLS = ("l_quantity", "l_extendedprice", "l_discount", "l_tax")


def lineitem_correlation_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise Pearson correlations of the lineitem numeric columns
    from ONE pass of exact decimal moments — the numeric half of the
    column profiler (which column pairs are redundant, which carry
    independent signal for a downstream model).

    Scale/exactness: a single map-side-combinable aggregate computes
    every Σx, Σx², Σxy in DECIMAL (values cast to DECIMAL(18,2) once);
    the C(4,2) correlations are fixed-order expressions over the
    one-row moment frame; zero-variance columns yield NULL."""
    li = load_table(spark, sf_dir, "lineitem")
    dec = {c: F.col(c).cast("decimal(18,2)") for c in _CORR_COLS}
    aggs = [F.count(F.lit(1)).cast("long").alias("n")]
    for c in _CORR_COLS:
        aggs.append(F.sum(dec[c]).cast("decimal(38,2)").alias(f"s_{c}"))
        aggs.append(
            F.sum((dec[c] * dec[c]).cast("decimal(38,4)")).alias(f"ss_{c}")
        )
    for i, a in enumerate(_CORR_COLS):
        for b in _CORR_COLS[i + 1 :]:
            aggs.append(
                F.sum((dec[a] * dec[b]).cast("decimal(38,4)")).alias(
                    f"sp_{a}_{b}"
                )
            )
    m = li.agg(*aggs)
    n = F.col("n").cast("double")
    rows = None
    for i, a in enumerate(_CORR_COLS):
        for b in _CORR_COLS[i + 1 :]:
            cov = F.col(f"sp_{a}_{b}").cast("double") * n - F.col(
                f"s_{a}"
            ).cast("double") * F.col(f"s_{b}").cast("double")
            va = F.col(f"ss_{a}").cast("double") * n - F.col(f"s_{a}").cast(
                "double"
            ) * F.col(f"s_{a}").cast("double")
            vb = F.col(f"ss_{b}").cast("double") * n - F.col(f"s_{b}").cast(
                "double"
            ) * F.col(f"s_{b}").cast("double")
            row = m.select(
                F.lit(f"{a}~{b}").alias("pair"),
                F.col("n").alias("n_rows"),
                F.when(
                    (va > 0) & (vb > 0),
                    F.round(cov / F.sqrt(va * vb), 6) + F.lit(0.0),
                ).alias("pearson"),
            )
            rows = row if rows is None else rows.unionAll(row)
    return rows.orderBy("pair")


def _corr_sql() -> str:
    cols = _CORR_COLS
    moments = ["CAST(COUNT(*) AS BIGINT) AS n"]
    for c in cols:
        moments.append(
            f"CAST(SUM(CAST({c} AS DECIMAL(18,2))) AS DECIMAL(38,2)) AS s_{c}"
        )
        moments.append(
            f"CAST(SUM(CAST(CAST({c} AS DECIMAL(18,2)) * CAST({c} AS DECIMAL(18,2))"
            f" AS DECIMAL(38,4))) AS DECIMAL(38,4)) AS ss_{c}"
        )
    pair_sel = []
    for i, a in enumerate(cols):
        for b in cols[i + 1 :]:
            moments.append(
                f"CAST(SUM(CAST(CAST({a} AS DECIMAL(18,2)) * CAST({b} AS DECIMAL(18,2))"
                f" AS DECIMAL(38,4))) AS DECIMAL(38,4)) AS sp_{a}_{b}"
            )
            cov = (
                f"(CAST(sp_{a}_{b} AS DOUBLE) * CAST(n AS DOUBLE)"
                f" - CAST(s_{a} AS DOUBLE) * CAST(s_{b} AS DOUBLE))"
            )
            va = (
                f"(CAST(ss_{a} AS DOUBLE) * CAST(n AS DOUBLE)"
                f" - CAST(s_{a} AS DOUBLE) * CAST(s_{a} AS DOUBLE))"
            )
            vb = (
                f"(CAST(ss_{b} AS DOUBLE) * CAST(n AS DOUBLE)"
                f" - CAST(s_{b} AS DOUBLE) * CAST(s_{b} AS DOUBLE))"
            )
            pair_sel.append(
                f"SELECT '{a}~{b}' AS pair, n AS n_rows,\n"
                f"  CASE WHEN {va} > 0 AND {vb} > 0 THEN\n"
                f"    round({cov} / sqrt({va} * {vb}), 6) + 0.0 END AS pearson\n"
                f"FROM m"
            )
    return (
        "WITH m AS (\n  SELECT " + ",\n    ".join(moments) + "\n  FROM lineitem\n)\n"
        + "\nUNION ALL\n".join(pair_sel)
        + "\nORDER BY pair"
    )


LINEITEM_CORR_SQL = _corr_sql()

QUERIES["lineitem_correlation_matrix"] = lineitem_correlation_matrix
ORACLES["lineitem_correlation_matrix"] = LINEITEM_CORR_SQL
