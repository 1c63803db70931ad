"""Benchmark decontamination + split leakage (functions/decontamination.py).

The split label must agree with dataset_splits' hash rule, containment
must be a valid fraction with 1.0 = full embedding, and the leakage
matrix must partition the LSH candidate pairs exactly.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from debezium_server_bigquery_spark.functions.curation import split_of
from debezium_server_bigquery_spark.functions.decontamination import (
    decontaminate_test_overlap,
    split_leakage_matrix,
)
from debezium_server_bigquery_spark.functions.dedup_fuzzy import (
    _lsh_candidate_pairs,
    _shingled,
)
from debezium_server_bigquery_spark.sources.tables import load_table


def test_decontaminate_pairs_are_train_x_test(spark, sf_dir):
    out = decontaminate_test_overlap(spark, sf_dir)
    rows = out.collect()
    # every row is a (train, test) pair under the shared split hash
    labeled = out.select(
        split_of(F.col("train_doc")).alias("sa"),
        split_of(F.col("test_doc")).alias("sb"),
        "n_shared",
        "n_test_sh",
        "containment",
    ).collect()
    assert all(r.sa == "train" and r.sb == "test" for r in labeled)
    assert all(0 < r.n_shared <= r.n_test_sh for r in labeled)
    assert all(0.0 < r.containment <= 1.0 for r in labeled)
    # deterministic: re-run bit-identical
    assert rows == decontaminate_test_overlap(spark, sf_dir).collect()


def test_decontaminate_flags_planted_leak(spark, tmp_path, sf_dir):
    """A train doc that embeds a test doc verbatim must surface at
    containment 1.0."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    labeled = docs.withColumn("split", split_of(F.col("doc_id")))
    test_doc = (
        labeled.filter(
            (F.col("split") == "test") & (F.size(F.split("text", r"\s+")) >= 10)
        )
        .orderBy("doc_id")
        .first()
    )
    train_id = (
        labeled.filter(F.col("split") == "train").orderBy("doc_id").first().doc_id
    )
    # plant: the train doc's text becomes "<test text> plus a suffix"
    planted = docs.withColumn(
        "text",
        F.when(
            F.col("doc_id") == train_id,
            F.concat(F.lit(test_doc.text), F.lit(" extra trailing words here")),
        ).otherwise(F.col("text")),
    )
    path = str(tmp_path / "docs")
    planted.write.parquet(path)
    # point the operator at a dir whose documents.parquet is the planted set
    import os

    sf = str(tmp_path)
    os.rename(path, os.path.join(sf, "documents.parquet"))
    hits = {
        (r.train_doc, r.test_doc): r.containment
        for r in decontaminate_test_overlap(spark, sf).collect()
    }
    assert hits.get((train_id, test_doc.doc_id)) == 1.0


def test_split_leakage_matrix_partitions_candidates(spark, sf_dir):
    out = split_leakage_matrix(spark, sf_dir).collect()
    assert all(r.split_a in ("test", "train", "val") for r in out)
    assert all(r.split_a <= r.split_b for r in out)  # unordered pair canon
    assert all(r.crosses_split == (r.split_a != r.split_b) for r in out)
    total = sum(r.n_pairs for r in out)
    docs = load_table(spark, sf_dir, "documents", spread=True)
    n_cand = _lsh_candidate_pairs(_shingled(docs)).count()
    assert total == n_cand  # exact partition of the candidate set


def test_decontamination_report_accounting(spark, sf_dir):
    from debezium_server_bigquery_spark.functions.decontamination import (
        CONTAM_CONTAINMENT,
        decontamination_report,
    )

    out = decontamination_report(spark, sf_dir).collect()
    assert all(r.n_kept == r.n_train - r.n_contaminated for r in out)
    assert all(0.0 <= r.kept_frac <= 1.0 for r in out)
    # totals reconcile with the raw train-split count
    docs = load_table(spark, sf_dir, "documents")
    n_train = docs.where(split_of(F.col("doc_id")) == "train").count()
    assert sum(r.n_train for r in out) == n_train
    # contaminated total == distinct flagged train docs over the threshold
    flagged = (
        decontaminate_test_overlap(spark, sf_dir)
        .filter(F.col("containment") >= CONTAM_CONTAINMENT)
        .select("train_doc")
        .distinct()
        .count()
    )
    assert sum(r.n_contaminated for r in out) == flagged


def test_events_drift_report_halves_partition(spark, sf_dir):
    from debezium_server_bigquery_spark.plans.diagnostics import (
        events_drift_report,
    )

    out = events_drift_report(spark, sf_dir).collect()
    ev = load_table(spark, sf_dir, "events")
    assert sum(r.n_h1 + r.n_h2 for r in out) == ev.count()
    # the time split is near the middle: both halves non-empty overall
    assert sum(r.n_h1 for r in out) > 0 and sum(r.n_h2 for r in out) > 0
    assert out == sorted(out, key=lambda r: r.event_type)
