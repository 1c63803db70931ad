"""Pin the decimal design of join_cardinality_profile's twins.

Round-11 driver red: the oracle SQL multiplied two DECIMAL(38,0) casts
(combined width 76), which some DuckDB releases silently demote to
DOUBLE — rendering join_rows differently than Spark's exact decimal.
The fix multiplies DECIMAL(19,0) per-key counts (product width 38 —
exact decimal in BOTH engines).  These tests fail if either twin
regresses to a >38-width product or a float join_rows.
"""

from __future__ import annotations

import re

import duckdb
import pytest

from debezium_server_bigquery_spark.plans.diagnostics import (
    JOIN_CARDINALITY_SQL,
    join_cardinality_profile,
)


def test_spark_twin_join_rows_is_decimal_38_0(spark, sf_dir):
    df = join_cardinality_profile(spark, sf_dir)
    dtypes = dict(df.dtypes)
    assert dtypes["join_rows"] == "decimal(38,0)"


def test_oracle_sql_has_no_wide_decimal_product():
    # The width-76 shape that triggered the round-11 red must not return.
    assert "CAST(cl AS DECIMAL(38,0)) * " not in JOIN_CARDINALITY_SQL
    # Every product of per-key counts multiplies width-19 operands.
    products = re.findall(
        r"CAST\(cl AS DECIMAL\((\d+),0\)\) \* CAST\(cr AS DECIMAL\((\d+),0\)\)",
        JOIN_CARDINALITY_SQL,
    )
    assert products, "expected the cl*cr product in the oracle SQL"
    for lw, rw in products:
        assert int(lw) + int(rw) <= 38, (lw, rw)


def test_oracle_twin_join_rows_stays_decimal_and_matches_spark(spark, sf_dir):
    con = duckdb.connect()
    for name in ("customer", "orders", "lineitem", "part", "supplier", "nation"):
        con.execute(
            f"CREATE OR REPLACE VIEW {name} AS "
            f"SELECT * FROM '{sf_dir}/{name}.parquet'"
        )
    desc = {
        r[0]: r[1]
        for r in con.execute(f"DESCRIBE {JOIN_CARDINALITY_SQL}").fetchall()
    }
    assert desc["join_rows"] == "DECIMAL(38,0)", desc["join_rows"]

    duck = con.execute(JOIN_CARDINALITY_SQL).fetchall()
    spark_rows = [tuple(r) for r in join_cardinality_profile(spark, sf_dir).collect()]
    assert spark_rows == duck
