"""Interleaved A/B of the co-supply edge builder (round 14).

Old form: distinct -> groupBy count -> join -> self-join -> distinct.
New form: groupBy collect_set -> HOF pair expansion -> distinct.

Both are timed cold-shaped (noop sink over the un-checkpointed edge
DataFrame, so the measured region is exactly the substrate build's data
work), alternating rep-for-rep inside ONE session per the round-13/14
measurement protocol (host weather swings 2-3x between separate runs).
Equivalence is checked first: sorted collect of (a, b) must be identical.

Usage: python tools/r14_cosupply_ab.py [sf_dir] [reps]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F


def old_edges(spark, sf_dir):
    from debezium_server_bigquery_spark.sources.tables import load_table

    cap = 32
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    os_pairs = li.distinct().select(
        F.col("l_orderkey").alias("o"), F.col("l_suppkey").alias("s")
    )
    small = (
        os_pairs.groupBy("o")
        .agg(F.count(F.lit(1)).alias("n_sup"))
        .filter(F.col("n_sup") <= cap)
        .select("o")
    )
    kept = os_pairs.join(small, "o")
    ka = kept.select("o", F.col("s").alias("a"))
    kb = kept.select(F.col("o").alias("o2"), F.col("s").alias("b"))
    return (
        ka.join(kb, (ka["o"] == kb["o2"]) & (ka["a"] < kb["b"]))
        .select("a", "b")
        .distinct()
    )


def new_edges(spark, sf_dir):
    from debezium_server_bigquery_spark.sources.tables import load_table

    cap = 32
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    sets = (
        li.groupBy("l_orderkey")
        .agg(F.collect_set("l_suppkey").alias("ss"))
        .filter(F.size("ss") <= cap)
    )
    return (
        sets.select(
            F.explode(
                F.expr(
                    "flatten(transform(ss, x ->"
                    " transform(filter(ss, y -> y > x),"
                    " y -> struct(x AS a, y AS b))))"
                )
            ).alias("p")
        )
        .select("p.a", "p.b")
        .distinct()
    )


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 6
    from debezium_server_bigquery_spark.session import get_spark

    spark = get_spark("r14-cosupply-ab")

    # equivalence first
    a = sorted(map(tuple, old_edges(spark, sf_dir).collect()))
    b = sorted(map(tuple, new_edges(spark, sf_dir).collect()))
    print(f"edge count old={len(a)} new={len(b)} identical={a == b}", flush=True)
    if a != b:
        sys.exit("NOT EQUIVALENT — aborting timing")

    def run(tag, fn):
        spark.sparkContext.setJobDescription(f"cosupply-{tag}")
        t0 = time.perf_counter()
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        dt = time.perf_counter() - t0
        spark.sparkContext.setJobDescription(None)
        return dt

    # warm both lineages once
    run("warmup-old", old_edges)
    run("warmup-new", new_edges)
    olds, news = [], []
    for i in range(reps):
        olds.append(run("old", old_edges))
        news.append(run("new", new_edges))
    olds.sort(), news.sort()

    def stats(xs):
        return f"min {xs[0]:.3f} med {xs[len(xs) // 2]:.3f} all {[round(x, 3) for x in xs]}"

    print("old:", stats(olds))
    print("new:", stats(news))
    n_ex_old = old_edges(spark, sf_dir)._jdf.queryExecution().executedPlan().toString().count("Exchange")
    n_ex_new = new_edges(spark, sf_dir)._jdf.queryExecution().executedPlan().toString().count("Exchange")
    print(f"Exchange nodes: old={n_ex_old} new={n_ex_new}")


if __name__ == "__main__":
    main()
