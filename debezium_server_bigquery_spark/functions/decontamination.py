"""Benchmark decontamination: train/test n-gram overlap + leakage audits.

The step every LLM training pipeline runs before the tokenizer: find
training documents that contain evaluation-set content (the GPT-3 paper's
13-gram filter, Llama's n-gram decontamination).  Held-out membership
comes from the SAME deterministic doc-id hash that ``dataset_splits``
uses (functions/curation.py ``split_of``), so split assignment and
contamination checks can never disagree.  No reference analog — the
reference replicates tables 1:1; this extends the LLM-pipeline family.

Two operators:

``decontaminate_test_overlap`` — exact word-shingle overlap between every
(train doc, test doc) pair that shares at least one non-boilerplate
shingle, with the test-side containment fraction (n shared / test's
shingle count).  A train doc at containment 1.0 embeds an entire test
document — it must be dropped (or the benchmark is burned).

``split_leakage_matrix`` — the one-page audit number: banded-MinHash
near-dup candidate pairs rolled up by the unordered pair of their
members' splits.  Off-diagonal (train, test) mass = leakage the exact
pass above must then enumerate; the matrix itself is O(splits²).

Scale design (100 TB): both reuse the bounded substrates verbatim —
the df-capped, sh-partitioned inverted index (``stop_shingled_index``)
and the banded LSH pair generator (``_lsh_candidate_pairs``) — so no new
join shape is introduced; the split label is a pure column function of
doc_id (no join against an assignment table, no broadcast).  The
train×test posting join is strictly smaller than the dedup self-join the
audits already ban-check (each posting list splits ~90/5, so bucket
output is ~0.045× the self-join's).  In production the exact pass runs
with the eval suites as the test side — a tiny curated set — making the
test side of the join a broadcast candidate that AQE picks on its own.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from debezium_server_bigquery_spark.functions.curation import (
    split_case_sql,
    split_of,
)
from debezium_server_bigquery_spark.functions.dedup_fuzzy import (
    _INV_CTES,
    _SHINGLES_SQL,
    MINHASH_BAND_CTES,
    _lsh_candidate_pairs,
    _shingled,
    shingles,
    stop_shingled_index,
)
from debezium_server_bigquery_spark.sources.tables import load_table


def decontaminate_test_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(train_doc, test_doc, n_shared, n_test_sh, containment) for every
    train/test pair sharing >= 1 stop-filtered shingle, ordered.  The
    containment denominator is the TEST doc's filtered shingle count —
    1.0 means the training document contains the whole test document."""
    docs = load_table(spark, sf_dir, "documents", spread=True)
    inv, sizes = stop_shingled_index(docs)
    lab = inv.withColumn("split", split_of(F.col("doc_id")))
    train = lab.filter(F.col("split") == "train").select("doc_id", "sh")
    test = lab.filter(F.col("split") == "test").select("doc_id", "sh")
    pairs = (
        train.alias("a")
        # shuffle_hash keeps both sides on the index's sh-partitioning
        # (same reuse rationale as shared_shingle_pairs); at corpus scale
        # with a small curated eval side, AQE may upgrade this to a
        # broadcast of the test postings — either shape is right
        .join(test.hint("shuffle_hash").alias("b"), F.col("a.sh") == F.col("b.sh"))
        .groupBy(
            F.col("a.doc_id").alias("train_doc"),
            F.col("b.doc_id").alias("test_doc"),
        )
        .agg(F.count("*").alias("n_shared"))
    )
    tsz = sizes.select(
        F.col("doc_id").alias("test_doc"), F.col("n_sh").alias("n_test_sh")
    )
    return (
        pairs.join(tsz, "test_doc")
        .select(
            "train_doc",
            "test_doc",
            "n_shared",
            "n_test_sh",
            F.round(
                F.col("n_shared").cast("double") / F.col("n_test_sh"), 6
            ).alias("containment"),
        )
        .orderBy("train_doc", "test_doc")
    )


DECONTAMINATE_SQL = f"""
WITH shingled AS ({_SHINGLES_SQL}),
{_INV_CTES},
lab AS (SELECT doc_id, sh, {split_case_sql("doc_id")} AS split FROM inv),
pairs AS (
  SELECT a.doc_id AS train_doc, b.doc_id AS test_doc, COUNT(*) AS n_shared
  FROM lab a JOIN lab b ON a.sh = b.sh
  WHERE a.split = 'train' AND b.split = 'test'
  GROUP BY 1, 2
)
SELECT train_doc, test_doc, n_shared, sz.n_sh AS n_test_sh,
  round(n_shared::DOUBLE / sz.n_sh, 6) AS containment
FROM pairs JOIN sizes sz ON sz.doc_id = test_doc
ORDER BY train_doc, test_doc
"""


def split_leakage_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup candidate pairs by unordered split pair: (split_a,
    split_b, n_pairs, crosses_split).  The health number a curation team
    tracks per corpus drop — any (train, test) mass means the eval set
    leaks into training through near-duplicates that exact-match
    decontamination misses."""
    docs = load_table(spark, sf_dir, "documents", spread=True)
    pairs = _lsh_candidate_pairs(_shingled(docs)).select("doc_a", "doc_b")
    sa = split_of(F.col("doc_a"))
    sb = split_of(F.col("doc_b"))
    return (
        pairs.select(
            F.least(sa, sb).alias("split_a"), F.greatest(sa, sb).alias("split_b")
        )
        .groupBy("split_a", "split_b")
        .agg(F.count("*").alias("n_pairs"))
        .withColumn("crosses_split", F.col("split_a") != F.col("split_b"))
        .orderBy("split_a", "split_b")
    )


SPLIT_LEAKAGE_SQL = f"""{MINHASH_BAND_CTES},
cand AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM bands a JOIN bands b
    ON a.band = b.band AND a.sig = b.sig AND a.doc_id < b.doc_id
  GROUP BY a.doc_id, b.doc_id
),
lab AS (
  SELECT least({split_case_sql("doc_a")}, {split_case_sql("doc_b")}) AS split_a,
         greatest({split_case_sql("doc_a")}, {split_case_sql("doc_b")}) AS split_b
  FROM cand
)
SELECT split_a, split_b, COUNT(*) AS n_pairs,
  split_a <> split_b AS crosses_split
FROM lab GROUP BY split_a, split_b
ORDER BY split_a, split_b
"""


# A train doc whose shingles cover >= this fraction of some test doc is
# dropped — same bar as dedup_fuzzy's asymmetric containment threshold.
CONTAM_CONTAINMENT = 0.8


def decontamination_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The decontamination pass's OUTPUT summary: per source, how many
    training documents survive the cut (containment >= 0.8 against any
    test doc = dropped).  This is the number a dataset card reports and
    the keep-list the exporter consumes.

    Scale: the contaminated id set is the distinct train side of the
    flagged pairs — bounded by real leakage, tiny by construction — so
    the explicit broadcast left join against the train slice is
    O(contaminated) metadata, never corpus-sized; everything upstream is
    the df-capped posting join documented on
    :func:`decontaminate_test_overlap`."""
    docs = load_table(spark, sf_dir, "documents")
    train = docs.select("doc_id", "source").where(
        split_of(F.col("doc_id")) == "train"
    )
    bad = (
        decontaminate_test_overlap(spark, sf_dir)
        .filter(F.col("containment") >= CONTAM_CONTAINMENT)
        .select(F.col("train_doc").alias("doc_id"))
        .distinct()
        .withColumn("c", F.lit(1))
    )
    return (
        train.join(F.broadcast(bad), "doc_id", "left")
        .groupBy("source")
        .agg(
            F.count("*").alias("n_train"),
            F.sum(F.coalesce(F.col("c"), F.lit(0))).cast("long").alias(
                "n_contaminated"
            ),
        )
        .select(
            "source",
            "n_train",
            "n_contaminated",
            (F.col("n_train") - F.col("n_contaminated")).alias("n_kept"),
            F.round(
                (F.col("n_train") - F.col("n_contaminated")).cast("double")
                / F.col("n_train"),
                6,
            ).alias("kept_frac"),
        )
        .orderBy("source")
    )


DECONTAMINATION_REPORT_SQL = f"""
WITH shingled AS ({_SHINGLES_SQL}),
{_INV_CTES},
lab AS (SELECT doc_id, sh, {split_case_sql("doc_id")} AS split FROM inv),
pairs AS (
  SELECT a.doc_id AS train_doc, b.doc_id AS test_doc, COUNT(*) AS n_shared
  FROM lab a JOIN lab b ON a.sh = b.sh
  WHERE a.split = 'train' AND b.split = 'test'
  GROUP BY 1, 2
),
contaminated AS (
  SELECT DISTINCT train_doc AS doc_id
  FROM pairs JOIN sizes sz ON sz.doc_id = test_doc
  WHERE round(n_shared::DOUBLE / sz.n_sh, 6) >= {CONTAM_CONTAINMENT}
),
train AS (
  SELECT doc_id, source FROM documents
  WHERE {split_case_sql("doc_id")} = 'train'
)
SELECT source, COUNT(*) AS n_train,
  CAST(SUM(CASE WHEN c.doc_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
    AS n_contaminated,
  COUNT(*) - CAST(SUM(CASE WHEN c.doc_id IS NOT NULL THEN 1 ELSE 0 END)
    AS BIGINT) AS n_kept,
  round((COUNT(*) - SUM(CASE WHEN c.doc_id IS NOT NULL THEN 1 ELSE 0 END))
    / CAST(COUNT(*) AS DOUBLE), 6) AS kept_frac
FROM train t LEFT JOIN contaminated c USING (doc_id)
GROUP BY source ORDER BY source
"""


def ngram_novelty_by_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Memorization-vs-generalization audit: the fraction of the TEST
    split's distinct word-trigram vocabulary that never occurs in the
    TRAIN split, per language.  Low novelty means eval perplexity mostly
    measures recall of training n-grams; the number to report next to
    any held-out metric (complement of the pairwise decontamination
    view: corpus-level mass, not per-document culprits).

    Scale design (100 TB): NO join anywhere — one explode of the shared
    trigram shingler feeds ONE hash aggregate keyed on (lang, shingle)
    whose per-split presence flags are MAX(0/1) (map-side combinable),
    then an O(langs) rollup.  Shuffle volume is the distinct-shingle
    count, the same order as the dedup index builds; no df-cap is
    applied because membership, not pairing, is the question — there is
    no quadratic blow-up to guard against."""
    docs = load_table(spark, sf_dir, "documents", spread=True)
    ex = docs.select(
        "lang",
        split_of(F.col("doc_id")).alias("split"),
        F.explode(shingles(F.col("text"))).alias("sh"),
    )
    g = ex.groupBy("lang", "sh").agg(
        F.max((F.col("split") == "train").cast("int")).alias("in_train"),
        F.max((F.col("split") == "test").cast("int")).alias("in_test"),
    )
    return (
        g.filter(F.col("in_test") == 1)
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_test_shingles"),
            F.sum(F.lit(1) - F.col("in_train")).cast("long").alias("n_novel"),
        )
        .select(
            "lang",
            "n_test_shingles",
            "n_novel",
            F.round(
                F.col("n_novel").cast("double")
                / F.col("n_test_shingles").cast("double"),
                6,
            ).alias("novelty_rate"),
        )
        .orderBy("lang")
    )


NGRAM_NOVELTY_SQL = f"""
WITH shingled AS ({_SHINGLES_SQL}),
ex AS (
  SELECT d.lang, {split_case_sql("d.doc_id")} AS split, u.sh
  FROM shingled s
  JOIN documents d ON d.doc_id = s.doc_id,
  unnest(s.sh) AS u(sh)
),
g AS (
  SELECT lang, sh,
    MAX(CASE WHEN split = 'train' THEN 1 ELSE 0 END) AS in_train,
    MAX(CASE WHEN split = 'test'  THEN 1 ELSE 0 END) AS in_test
  FROM ex GROUP BY lang, sh
)
SELECT lang,
  CAST(COUNT(*) AS BIGINT) AS n_test_shingles,
  CAST(SUM(1 - in_train) AS BIGINT) AS n_novel,
  round(CAST(SUM(1 - in_train) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE), 6)
    AS novelty_rate
FROM g WHERE in_test = 1
GROUP BY lang ORDER BY lang
"""


QUERIES = {
    "decontaminate_test_overlap": decontaminate_test_overlap,
    "split_leakage_matrix": split_leakage_matrix,
    "decontamination_report": decontamination_report,
    "ngram_novelty_by_split": ngram_novelty_by_split,
}

ORACLES = {
    "decontaminate_test_overlap": DECONTAMINATE_SQL,
    "split_leakage_matrix": SPLIT_LEAKAGE_SQL,
    "decontamination_report": DECONTAMINATION_REPORT_SQL,
    "ngram_novelty_by_split": NGRAM_NOVELTY_SQL,
}
