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
