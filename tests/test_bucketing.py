"""Bucketed-layout joins: correctness and the no-exchange plan property."""

from __future__ import annotations

from pyspark.sql import functions as F


def test_bucketed_join_has_no_exchange(spark, sf_dir, tmp_path):
    from debezium_server_bigquery_spark.operators.bucketing import (
        read_bucketed,
        write_bucketed,
    )

    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    lineitem = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    write_bucketed(
        orders, "b_orders", str(tmp_path / "o"), ["o_orderkey"], 8,
        sort_cols=["o_orderkey"],
    )
    write_bucketed(
        lineitem, "b_lineitem", str(tmp_path / "l"), ["l_orderkey"], 8,
        sort_cols=["l_orderkey"],
    )
    try:
        bo, bl = read_bucketed(spark, "b_orders"), read_bucketed(spark, "b_lineitem")
        joined = bo.join(bl, bo.o_orderkey == bl.l_orderkey).groupBy(
            "o_orderpriority"
        ).agg(F.count("*").alias("n"))

        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            plan = joined._jdf.queryExecution().executedPlan().toString()
        finally:
            spark.conf.set(
                "spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024)
            )
        # co-bucketed sides: the join itself needs NO shuffle; the only
        # exchange in the whole plan is the tiny post-join aggregation's
        assert plan.count("Exchange hashpartitioning") == 1, plan

        # correctness: same result as the unbucketed join
        expect = {
            (r.o_orderpriority, r.n)
            for r in orders.join(
                lineitem, orders.o_orderkey == lineitem.l_orderkey
            )
            .groupBy("o_orderpriority")
            .agg(F.count("*").alias("n"))
            .collect()
        }
        got = {(r.o_orderpriority, r.n) for r in joined.collect()}
        assert got == expect
    finally:
        spark.sql("DROP TABLE IF EXISTS b_orders")
        spark.sql("DROP TABLE IF EXISTS b_lineitem")


def test_bucketed_groupby_on_bucket_key_no_exchange(spark, sf_dir, tmp_path):
    from debezium_server_bigquery_spark.operators.bucketing import (
        read_bucketed,
        write_bucketed,
    )

    lineitem = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    write_bucketed(lineitem, "b_li2", str(tmp_path / "l2"), ["l_orderkey"], 8)
    try:
        agg = (
            read_bucketed(spark, "b_li2")
            .groupBy("l_orderkey")
            .agg(F.sum("l_quantity").alias("q"))
        )
        plan = agg._jdf.queryExecution().executedPlan().toString()
        assert "Exchange hashpartitioning" not in plan, plan
    finally:
        spark.sql("DROP TABLE IF EXISTS b_li2")


def test_bucketed_join_e2e_gate_plan_and_rows(spark, sf_dir):
    """The registered gate query: co-located join (single post-join
    exchange in the plan) and the same rollup as the unbucketed twin."""
    from debezium_server_bigquery_spark.operators.bucketing import (
        bucketed_join_e2e,
    )

    out = bucketed_join_e2e(spark, sf_dir)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        plan = out._jdf.queryExecution().executedPlan().toString()
    finally:
        spark.conf.set(
            "spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024)
        )
    assert plan.count("Exchange hashpartitioning") == 1, plan
    rows = {r.o_orderpriority: r for r in out.collect()}
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    expect = {
        r.o_orderpriority: r.n
        for r in orders.join(li, orders.o_orderkey == li.l_orderkey)
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    assert {k: v.n_items for k, v in rows.items()} == expect
