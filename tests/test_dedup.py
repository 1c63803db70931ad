"""A1/A2 dedup tests — mirror of testDeduplicateBatch
(StreamBigqueryChangeConsumerMysqlUpsertTest.java:127-166; FIXTURES.md §B6)."""

from __future__ import annotations

from debezium_server_bigquery_spark.operators.dedup import dedup_last_writer

COLS = "id long, first_name string, __op string, __source_ts_ns long"


def test_keep_higher_ts(spark):
    # B6 case 1: same key, (op=r, ts=3) vs (op=u, ts=1) -> ts=3 wins.
    df = spark.createDataFrame([(1, "row1-r", "r", 3), (1, "row1-u", "u", 1)], COLS)
    out = dedup_last_writer(df, ["id"]).collect()
    assert len(out) == 1
    assert out[0].first_name == "row1-r" and out[0]["__op"] == "r"


def test_ts_tie_falls_to_op_priority(spark):
    # B6 case 2: equal ts, ops r vs u -> u wins (priority c<r<u<d).
    df = spark.createDataFrame([(1, "row1-r", "r", 1), (1, "row1-u", "u", 1)], COLS)
    out = dedup_last_writer(df, ["id"]).collect()
    assert len(out) == 1
    assert out[0]["__op"] == "u"


def test_delete_beats_update_on_tie(spark):
    df = spark.createDataFrame([(1, "u", "u", 5), (1, "d", "d", 5)], COLS)
    out = dedup_last_writer(df, ["id"]).collect()
    assert out[0]["__op"] == "d"


def test_multiple_keys_and_empty_keys_passthrough(spark):
    df = spark.createDataFrame(
        [(1, "a", "c", 1), (1, "b", "u", 2), (2, "c", "c", 1)], COLS
    )
    out = {r.id: r.first_name for r in dedup_last_writer(df, ["id"]).collect()}
    assert out == {1: "b", 2: "c"}
    # PK-less: dedup is a no-op (append fallback handles these tables).
    assert dedup_last_writer(df, []).count() == 3


def test_lsh_recall_bounds_and_consistency(spark, sf_dir):
    """Recall/precision are consistent ratios of the hit count, hits can
    never exceed either side, and banded LSH at these parameters should
    recover the large majority of true near-dup pairs."""
    from debezium_server_bigquery_spark.functions.dedup_fuzzy import (
        dedup_lsh_recall,
    )

    r = dedup_lsh_recall(spark, sf_dir).collect()[0]
    assert r.n_hit <= r.n_truth and r.n_hit <= r.n_candidates
    if r.n_truth:
        assert r.recall == round(r.n_hit / r.n_truth, 6)
        assert r.recall >= 0.8  # banding params are tuned for high recall
    if r.n_candidates:
        assert r.precision == round(r.n_hit / r.n_candidates, 6)


def test_containment_catches_embedded_doc(spark):
    """A short doc fully embedded in a longer one must surface with
    containment 1.0 even though symmetric Jaccard would dilute it."""
    import unittest.mock as mock

    from debezium_server_bigquery_spark.functions import dedup_fuzzy

    short = "alpha beta gamma delta epsilon zeta"
    long = short + " " + " ".join(f"filler{i}" for i in range(40))
    docs = spark.createDataFrame(
        [(1, short, "en", "a", len(short)), (2, long, "en", "a", len(long))],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    with mock.patch.object(dedup_fuzzy, "load_table", return_value=docs):
        rows = {
            (r.doc_a, r.doc_b): r.containment
            for r in dedup_fuzzy.dedup_containment_pairs(spark, "x").collect()
        }
    assert rows.get((1, 2)) == 1.0  # short fully contained in long
    assert (2, 1) not in rows  # long is NOT contained in short


def test_cross_source_matrix_counts_match_pairs(spark, sf_dir):
    """The matrix is a lossless regrouping of the LSH candidate pairs:
    its n_pairs sum equals the pair count, and sources are normalized to
    unordered (source_a <= source_b)."""
    from debezium_server_bigquery_spark.functions.dedup_fuzzy import (
        cross_source_dup_matrix,
        dedup_minhash_lsh,
    )

    matrix = cross_source_dup_matrix(spark, sf_dir).collect()
    n_pairs = dedup_minhash_lsh(spark, sf_dir).count()
    assert sum(r.n_pairs for r in matrix) == n_pairs
    assert all(r.source_a <= r.source_b for r in matrix)


def test_substrate_queries_leave_no_persistent_rdds(spark, sf_dir):
    """Round-8 family-wide cache-lifetime sweep: every registered query
    that shares a substrate does it via scratch-parquet checkpoints, so
    nothing survives in the session cache after materialization."""
    from debezium_server_bigquery_spark.functions.dedup_fuzzy import (
        dedup_lsh_recall,
    )
    from debezium_server_bigquery_spark.functions.kmeans import (
        semantic_dedup_pairs,
    )
    from debezium_server_bigquery_spark.functions.similarity import (
        ann_ivf_recall,
    )

    spark.catalog.clearCache()
    dedup_lsh_recall(spark, sf_dir).collect()
    ann_ivf_recall(spark, sf_dir).collect()
    semantic_dedup_pairs(spark, sf_dir).collect()
    # the CacheManager holds exactly the persist()/cache() registrations
    # (localCheckpoint blocks from OTHER tests' rank primitives live in
    # getPersistentRDDs until GC and are not session-lifetime leaks)
    assert spark._jsparkSession.sharedState().cacheManager().isEmpty()


def test_dup_cluster_size_histogram_planted(spark, tmp_path):
    from debezium_server_bigquery_spark.functions.dedup_fuzzy import (
        dup_cluster_size_histogram,
    )

    rows = [
        (1, "copy one", "en", "web", 0),
        (2, "copy one", "en", "web", 0),
        (3, "copy one", "en", "web", 0),  # one cluster of 3
        (4, "copy two", "en", "web", 0),
        (5, "copy two", "en", "web", 0),  # one cluster of 2
        (6, "unique a", "en", "web", 0),
        (7, "unique b", "en", "web", 0),  # two singletons
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    df.write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    out = {r.cluster_size: r for r in dup_cluster_size_histogram(spark, str(tmp_path)).collect()}
    assert out[1].n_clusters == 2 and out[1].n_docs == 2
    assert out[2].n_clusters == 1 and out[2].n_docs == 2
    assert out[3].n_clusters == 1 and out[3].n_docs == 3
    assert abs(sum(r.doc_share for r in out.values()) - 1.0) < 1e-6


def test_keep_priority_source_survivor_policy(spark, tmp_path):
    from debezium_server_bigquery_spark.functions.dedup_fuzzy import (
        dedup_exact_keep_priority_source,
    )

    rows = [
        # one text duplicated across two sources: keeper = source "alpha"
        (5, "same text here", "en", "beta", 14),
        (9, "same text here", "en", "alpha", 14),
        # same-source duplicate: keeper = min doc_id, not cross-source
        (3, "other text", "en", "beta", 10),
        (4, "other text", "en", "beta", 10),
        # unique doc
        (7, "unique", "en", "beta", 6),
    ]
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    out = {
        r.keeper_source: r
        for r in dedup_exact_keep_priority_source(spark, str(tmp_path)).collect()
    }
    a, b = out["alpha"], out["beta"]
    assert a.n_clusters == 1 and a.n_dropped == 1
    assert a.n_cross_source_clusters == 1
    assert b.n_clusters == 2 and b.n_dropped == 1
    assert b.n_cross_source_clusters == 0


def test_threshold_sensitivity_ladder_monotone(spark, tmp_path):
    from debezium_server_bigquery_spark.functions.dedup_fuzzy import (
        dedup_threshold_sensitivity,
    )

    shared = " ".join(f"w{i}" for i in range(12))
    rows = [
        (1, shared, "en", "s", len(shared)),                 # fully contained in 2
        (2, shared + " tail a b c d e f", "en", "s", 40),
        (3, "x y z " + " ".join(f"w{i}" for i in range(6)), "en", "s", 30),
        (4, " ".join(f"q{i}" for i in range(12)), "en", "s", 40),  # no overlap
    ]
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    out = {r.threshold: r for r in dedup_threshold_sensitivity(spark, str(tmp_path)).collect()}
    pairs = [out[t].n_pairs for t in sorted(out)]
    docs = [out[t].n_docs_dropped for t in sorted(out)]
    # the ladder is non-increasing in the threshold
    assert pairs == sorted(pairs, reverse=True)
    assert docs == sorted(docs, reverse=True)
    # doc 1 is 100% contained in doc 2: still firing at 0.9
    assert out[0.9].n_docs_dropped >= 1
