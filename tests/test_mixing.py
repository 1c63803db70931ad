"""Tests for functions/mixing.py — domain mix weights + canonical docs."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from debezium_server_bigquery_spark.functions.dedup_clusters import dedup_clusters
from debezium_server_bigquery_spark.functions.mixing import (
    MIX_ALPHA,
    curate_canonical_docs,
    mix_domain_weights,
)

SF_DIR = "/root/testdata/sf0.001"


def test_mix_weights_normalize_and_flatten(spark):
    rows = mix_domain_weights(spark, SF_DIR).collect()
    assert rows, "at least one source domain"
    # Weights are a distribution (rounding leaves ~n*5e-7 slack).
    assert abs(sum(r.weight for r in rows) - 1.0) < 1e-4
    assert abs(sum(r.p_raw for r in rows) - 1.0) < 1e-4
    # alpha < 1 flattens: the biggest domain's weight shrinks vs its raw
    # share, the smallest grows.
    big = max(rows, key=lambda r: r.p_raw)
    small = min(rows, key=lambda r: r.p_raw)
    assert MIX_ALPHA < 1.0
    if big.p_raw > small.p_raw:  # degenerate uniform corpus guard
        assert big.weight < big.p_raw
        assert small.weight > small.p_raw


def test_canonical_docs_consistent_with_clusters(spark):
    clusters = {
        r.cluster_id: r.cluster_size
        for r in dedup_clusters(spark, SF_DIR).collect()
    }
    multi = {cid for cid, size in clusters.items() if size > 1}
    kept = curate_canonical_docs(spark, SF_DIR).collect()
    assert {r.cluster_id for r in kept} == multi
    for r in kept:
        assert r.n_dropped == clusters[r.cluster_id] - 1
        assert r.kept_n_chars >= 0


def test_canonical_pick_is_longest_then_lowest_id(spark):
    docs = (
        spark.createDataFrame(
            [(1, 10), (2, 30), (3, 30), (4, 5)],
            "doc_id long, n_chars long",
        )
    )
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4)], "doc_a long, doc_b long"
    )
    from debezium_server_bigquery_spark.functions.dedup_clusters import (
        connected_components,
    )

    labels = connected_components(docs.select("doc_id"), edges)
    member = labels.join(docs, "doc_id")
    agg = member.groupBy("cluster_id").agg(
        F.count("*").alias("cluster_size"),
        F.max_by(
            F.col("doc_id"), F.struct(F.col("n_chars"), -F.col("doc_id"))
        ).alias("kept_doc_id"),
    )
    row = agg.collect()[0]
    assert row.cluster_size == 4
    assert row.kept_doc_id == 2  # 30 chars tie between 2 and 3 -> lowest id
