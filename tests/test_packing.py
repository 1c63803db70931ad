"""Sequence packing + dataset profiling invariants (functions/packing.py)."""

from __future__ import annotations

from collections import defaultdict

from pyspark.sql import functions as F

from debezium_server_bigquery_spark.functions.packing import (
    TOKEN_BUDGET,
    pack_token_budget,
    profile_documents,
)
from debezium_server_bigquery_spark.sources.tables import load_table


def test_pack_assignments_are_quotient_consistent(spark, sf_dir):
    rows = pack_token_budget(spark, sf_dir).collect()
    assert rows
    by_source = defaultdict(list)
    for r in rows:
        by_source[r["source"]].append(r)
    for source, docs in by_source.items():
        docs.sort(key=lambda r: r["doc_id"])
        cum = 0
        for r in docs:
            assert r["bin_id"] == cum // TOKEN_BUDGET
            assert r["bin_offset"] == cum % TOKEN_BUDGET
            cum += r["n_tokens"]
        # streams start at bin 0, offset 0
        assert docs[0]["bin_id"] == 0 and docs[0]["bin_offset"] == 0
        # bins are dense: max one boundary straddle between consecutive bins
        bins = sorted({r["bin_id"] for r in docs})
        assert bins == list(range(bins[-1] + 1))


def test_pack_bin_fill_is_bounded(spark, sf_dir):
    # every bin except a stream's last holds >= budget - max_doc tokens:
    # quotient packing never leaves a gap larger than one document.
    df = pack_token_budget(spark, sf_dir)
    fills = (
        df.groupBy("source", "bin_id")
        .agg(F.sum("n_tokens").alias("fill"))
        .collect()
    )
    max_doc = df.agg(F.max("n_tokens")).collect()[0][0]
    last_bins = {
        (r["source"], r["m"])
        for r in df.groupBy("source").agg(F.max("bin_id").alias("m")).collect()
    }
    for r in fills:
        if (r["source"], r["bin_id"]) not in last_bins:
            assert r["fill"] >= TOKEN_BUDGET - max_doc


def test_profile_counts_match_direct_aggregates(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    got = {r["column_name"]: r for r in profile_documents(spark, sf_dir).collect()}
    assert set(got) == {"doc_id", "text", "lang", "source", "n_chars"}
    n = docs.count()
    for c, r in got.items():
        assert r["n_rows"] == n
        assert r["n_nulls"] == docs.filter(F.col(c).isNull()).count()
        assert r["n_distinct"] == docs.select(c).distinct().dropna().count()


def test_scalable_packing_equals_single_window(spark, sf_dir):
    from debezium_server_bigquery_spark.functions.packing import (
        pack_token_budget,
        pack_token_budget_scalable,
    )

    a = {(r["doc_id"]): (r["bin_id"], r["bin_offset"]) for r in pack_token_budget(spark, sf_dir).collect()}
    b = {(r["doc_id"]): (r["bin_id"], r["bin_offset"]) for r in pack_token_budget_scalable(spark, sf_dir).collect()}
    assert a == b


def test_scalable_packing_windows_are_chunked(spark, sf_dir):
    """No window in the scalable plan may sort a whole pack stream: the
    document-level window partitions on (source, chunk), and the only
    source-level window runs over chunk aggregates (one row per chunk)."""
    from debezium_server_bigquery_spark.functions.packing import (
        pack_token_budget_scalable,
    )

    plan = (
        pack_token_budget_scalable(spark, sf_dir)
        ._jdf.queryExecution()
        .optimizedPlan()
        .toString()
    )
    windows = [l for l in plan.splitlines() if "windowspecdefinition" in l]
    assert windows
    for w in windows:
        # every doc-level window spec carries the chunk key; the chunk-level
        # one aggregates 'chunk_sum', never raw documents
        assert ("chunk" in w)
