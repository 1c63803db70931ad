from __future__ import annotations

from pyspark.sql import functions as F

from debezium_server_bigquery_spark.operators.rank import global_row_number


def test_global_rank_matches_single_partition_window(spark):
    df = spark.range(0, 997).select(
        F.col("id"),
        F.pmod(F.xxhash64("id"), F.lit(10_000)).alias("v"),
    )
    got = {
        r.id: r.rank
        for r in global_row_number(df, [F.asc("v"), F.asc("id")]).collect()
    }
    rows = sorted(df.collect(), key=lambda r: (r.v, r.id))
    expected = {r.id: i + 1 for i, r in enumerate(rows)}
    assert got == expected


def test_global_rank_descending_and_custom_name(spark):
    df = spark.range(1, 51).select(F.col("id"), (F.col("id") % 7).alias("v"))
    out = global_row_number(df, [F.desc("v"), F.asc("id")], out="r")
    got = sorted((r.r, r.v, r.id) for r in out.collect())
    assert [g[0] for g in got] == list(range(1, 51))  # dense 1..n
    ordered = sorted(df.collect(), key=lambda r: (-r.v, r.id))
    expected = {r.id: i + 1 for i, r in enumerate(ordered)}
    assert all(expected[i] == r for r, _v, i in got)


def test_global_rank_is_dense_and_unique(spark):
    df = spark.range(0, 500).select(F.col("id"), F.lit(1).alias("v"))
    # all-equal values: the unique tiebreak column still yields a dense
    # permutation 1..n
    ranks = [
        r.rank
        for r in global_row_number(df, [F.asc("v"), F.asc("id")]).collect()
    ]
    assert sorted(ranks) == list(range(1, 501))


def test_global_rank_property_random(spark):
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    @settings(
        max_examples=8, deadline=None, suppress_health_check=[HealthCheck.too_slow]
    )
    @given(st.lists(st.integers(min_value=-50, max_value=50), min_size=1, max_size=60))
    def _check(values):
        df = spark.createDataFrame(
            [(i, v) for i, v in enumerate(values)], "id long, v long"
        )
        got = {
            r.id: r.rank
            for r in global_row_number(df, [F.asc("v"), F.asc("id")]).collect()
        }
        expected = {
            idx: i + 1
            for i, (v, idx) in enumerate(
                sorted((v, i) for i, v in enumerate(values))
            )
        }
        assert got == expected

    _check()


def test_global_prefix_sum_matches_single_partition_window(spark):
    from debezium_server_bigquery_spark.operators.rank import global_prefix_sum

    df = spark.range(0, 730).select(
        F.col("id"),
        F.pmod(F.xxhash64("id"), F.lit(100)).alias("v"),
        (F.pmod(F.xxhash64("id", "id"), F.lit(50)) + 1).alias("tokens"),
    )
    got = {
        r.id: r.running
        for r in global_prefix_sum(
            df, [F.asc("v"), F.asc("id")], "tokens"
        ).collect()
    }
    acc, expected = 0, {}
    for r in sorted(df.collect(), key=lambda r: (r.v, r.id)):
        acc += r.tokens
        expected[r.id] = acc
    assert got == expected


def test_global_rank_and_prefix_sum_matches_windows(spark):
    from debezium_server_bigquery_spark.operators.rank import (
        global_rank_and_prefix_sum,
    )

    df = spark.range(0, 733).select(
        F.col("id"),
        F.pmod(F.xxhash64("id"), F.lit(500)).alias("v"),
        (F.pmod(F.col("id"), F.lit(13)) + 1).alias("w"),
    )
    out = {
        r.id: (r.rank, r.running)
        for r in global_rank_and_prefix_sum(
            df, [F.asc("v"), F.asc("id")], "w"
        ).collect()
    }
    rows = sorted(df.collect(), key=lambda r: (r.v, r.id))
    acc = 0
    for i, r in enumerate(rows):
        acc += r.w
        assert out[r.id] == (i + 1, acc), f"mismatch at sorted position {i}"


def test_ordered_output_sorts_and_isolates_the_sampler(spark):
    from debezium_server_bigquery_spark.operators.rank import ordered_output

    df = spark.range(0, 997).select(
        F.pmod(F.xxhash64("id"), F.lit(10_000)).alias("k"), F.col("id")
    )
    out = ordered_output(df, "k", "id")
    # plan shape BEFORE execution (an executed AQE plan string appends the
    # initial plan, double-counting nodes): the range sort samples a
    # materialized hash exchange, not the raw lineage — exactly one range
    # exchange with a hash exchange below it
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange rangepartitioning") == 1
    ix_range = plan.index("Exchange rangepartitioning")
    assert "Exchange hashpartitioning" in plan[ix_range:]
    got = [(r.k, r.id) for r in out.collect()]
    assert got == sorted(got)  # total order preserved
