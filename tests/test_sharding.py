"""Deterministic shard export (functions/sharding.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from debezium_server_bigquery_spark.functions.sharding import (
    assign_shards,
    export_shards,
    shard_manifest,
)


def test_assignment_is_deterministic_and_complete(spark):
    df = spark.range(0, 200).withColumnRenamed("id", "doc_id")
    a = assign_shards(df, "doc_id", 4).orderBy("doc_id").collect()
    b = assign_shards(df, "doc_id", 4).orderBy("doc_id").collect()
    assert a == b  # rerun reproduces the layout bit-for-bit
    assert len(a) == 200
    assert {r["shard_id"] for r in a} == {0, 1, 2, 3}


def test_shard_pos_is_a_permutation_within_each_shard(spark):
    df = spark.range(0, 100).withColumnRenamed("id", "doc_id")
    rows = assign_shards(df, "doc_id", 3).collect()
    by_shard: dict[int, list[int]] = {}
    for r in rows:
        by_shard.setdefault(r["shard_id"], []).append(r["shard_pos"])
    for shard, positions in by_shard.items():
        assert sorted(positions) == list(range(1, len(positions) + 1))


def test_hash_order_differs_from_key_order(spark):
    # The in-shard order is a (hash-driven) shuffle, not doc_id order.
    df = spark.range(0, 100).withColumnRenamed("id", "doc_id")
    rows = (
        assign_shards(df, "doc_id", 1)
        .orderBy("shard_pos")
        .select("doc_id")
        .collect()
    )
    assert [r["doc_id"] for r in rows] != list(range(100))


def test_single_shard_and_invalid_counts(spark):
    df = spark.range(0, 10).withColumnRenamed("id", "doc_id")
    rows = assign_shards(df, "doc_id", 1).collect()
    assert all(r["shard_id"] == 0 for r in rows)
    with pytest.raises(ValueError, match="n_shards"):
        assign_shards(df, "doc_id", 0)


def test_manifest_consistent_with_assignment(spark, sf_dir):
    per_doc = export_shards(spark, sf_dir)
    manifest = shard_manifest(spark, sf_dir).collect()
    counts = {
        r["shard_id"]: r["count"]
        for r in per_doc.groupBy("shard_id").count().collect()
    }
    firsts = {
        r["shard_id"]: r["doc_id"]
        for r in per_doc.filter(F.col("shard_pos") == 1).collect()
    }
    for m in manifest:
        assert m["n_docs"] == counts[m["shard_id"]]
        assert m["first_doc"] == firsts[m["shard_id"]]
    assert sum(m["n_docs"] for m in manifest) == per_doc.count()
