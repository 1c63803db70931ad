"""Connected-components cluster assignment and funnel analysis."""

from __future__ import annotations

from pyspark.sql import functions as F


def test_connected_components_two_chains_and_singleton(spark):
    from debezium_server_bigquery_spark.functions.dedup_clusters import (
        connected_components,
    )

    nodes = spark.createDataFrame([(i,) for i in range(7)], "doc_id long")
    # chain 0-1-2-3 (diameter 3, forces multiple rounds), pair 4-5, singleton 6
    edges = spark.createDataFrame(
        [(0, 1), (1, 2), (2, 3), (4, 5)], "doc_a long, doc_b long"
    )
    got = {
        r.doc_id: r.cluster_id for r in connected_components(nodes, edges).collect()
    }
    assert got == {0: 0, 1: 0, 2: 0, 3: 0, 4: 4, 5: 4, 6: 6}


def test_dedup_clusters_consistent_with_pairs(spark, sf_dir):
    from debezium_server_bigquery_spark.functions.dedup_clusters import dedup_clusters
    from debezium_server_bigquery_spark.functions.dedup_fuzzy import dedup_minhash_lsh

    labels = {r.doc_id: r.cluster_id for r in dedup_clusters(spark, sf_dir).collect()}
    pairs = dedup_minhash_lsh(spark, sf_dir).select("doc_a", "doc_b").collect()
    # every candidate pair must land in one cluster, rooted at the min id
    for p in pairs:
        assert labels[p.doc_a] == labels[p.doc_b]
        assert labels[p.doc_a] <= min(p.doc_a, p.doc_b)


def test_funnel_stage_ordering(spark, sf_dir):
    from debezium_server_bigquery_spark.plans.funnel import funnel_view_click_purchase

    r = funnel_view_click_purchase(spark, sf_dir).collect()[0]
    assert r.n_view >= r.n_click_after_view >= r.n_purchase_after_click >= 0
    assert 0.0 <= r.conversion <= 1.0
