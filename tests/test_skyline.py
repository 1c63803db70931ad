"""Skyline operator semantics pins on constructed point sets."""

from __future__ import annotations


def _write_parts(spark, tmp_path, rows):
    spark.createDataFrame(
        rows, "p_partkey long, p_retailprice double, p_size int"
    ).write.mode("overwrite").parquet(str(tmp_path / "part.parquet"))
    return str(tmp_path)


def test_skyline_keeps_pareto_front_only(spark, tmp_path):
    from debezium_server_bigquery_spark.operators.skyline import (
        skyline_parts_price_size,
    )

    rows = [
        (1, 10.00, 5),   # front
        (2, 12.00, 3),   # front (pricier but smaller)
        (3, 12.00, 7),   # dominated by 1 (cheaper AND smaller)
        (4, 11.00, 5),   # dominated by 1 (same size, pricier)
        (5, 10.00, 5),   # exact duplicate of 1: co-survives (ties don't dominate)
        (6, 15.00, 3),   # dominated by 2 (same size, pricier)
        (7, 9.00, 9),    # front (cheapest overall)
    ]
    sf = _write_parts(spark, tmp_path, rows)
    keys = sorted(r.p_partkey for r in skyline_parts_price_size(spark, sf).collect())
    assert keys == [1, 2, 5, 7]


def test_skyline_matches_bruteforce_on_random_grid(spark, tmp_path):
    from debezium_server_bigquery_spark.operators.skyline import (
        skyline_parts_price_size,
    )

    # deterministic pseudo-random points spread across many chunks
    pts = [
        (i, 900.0 + ((i * 7919) % 1000) / 10.0, 1 + (i * 104729) % 50)
        for i in range(300)
    ]
    sf = _write_parts(spark, tmp_path, [(i, p, s) for i, p, s in pts])
    got = sorted(r.p_partkey for r in skyline_parts_price_size(spark, sf).collect())
    cents = {i: round(p * 100) for i, p, _ in pts}
    size = {i: s for i, _, s in pts}

    def dominated(i):
        return any(
            (cents[j] <= cents[i] and size[j] <= size[i])
            and (cents[j] < cents[i] or size[j] < size[i])
            for j, _, _ in pts
            if j != i
        )

    expect = sorted(i for i, _, _ in pts if not dominated(i))
    assert got == expect
