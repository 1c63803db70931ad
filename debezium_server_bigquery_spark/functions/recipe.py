"""corpus_recipe — the composed curation pipeline, end to end.

Every stage exists as a standalone operator elsewhere in the package;
this query chains them the way a real pre-training corpus build does:

    quality filter  ->  exact dedup (first-writer)  ->  per-language cap
                    ->  per-(lang, source) corpus summary
                    |->  deterministic shard layout -> export manifest
                         (corpus_export_manifest)

The point under test is *composition*: Catalyst collapses the four
conceptual stages into scan -> project -> two hash aggregations -> one
window per language, with the tokenize computed once (staged selects,
same JIT-bloat guard as functions/text.py).  At 100 TB each stage is
the same plan shape as its standalone twin — no stage materializes an
intermediate corpus.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from debezium_server_bigquery_spark.functions.text import TOKEN_REGEX
from debezium_server_bigquery_spark.sources.tables import load_table

MIN_TOKENS = 20
MAX_PUNCT_RATIO = 0.30
PER_LANG_CAP = 200
EXPORT_SHARDS = 4


def _capped_survivors(docs: DataFrame) -> DataFrame:
    """quality filter -> exact dedup -> per-language cap: the documents a
    corpus build actually ships (columns doc_id, lang, source, n_tokens)."""
    scored = docs.select(
        "doc_id",
        "lang",
        "source",
        "text",
        # coalesce: NULL text counts as an empty document in both engines
        # (Spark size(NULL) and DuckDB len(NULL) disagree on the sentinel).
        F.size(
            F.regexp_extract_all(
                F.coalesce(F.col("text"), F.lit("")), F.lit(TOKEN_REGEX), 0
            )
        )
        .cast("long")
        .alias("n_tokens"),
        (
            F.length(F.regexp_replace(F.col("text"), r"[A-Za-z0-9\s]", ""))
            / F.greatest(F.length(F.col("text")), F.lit(1))
        ).alias("punct_ratio"),
    ).filter(
        (F.col("n_tokens") >= MIN_TOKENS) & (F.col("punct_ratio") <= MAX_PUNCT_RATIO)
    )
    # exact dedup, first-writer-wins (min doc_id per content hash)
    w_dup = Window.partitionBy(F.md5("text"))
    deduped = (
        scored.withColumn("keeper", F.min("doc_id").over(w_dup))
        .filter(F.col("doc_id") == F.col("keeper"))
        .drop("keeper", "text", "punct_ratio")
    )
    # Deterministic per-language cap, two-phase (same pattern as
    # curation.sample_stratified): phase 1 ranks within (lang, salt) so no
    # single sort sees more than ~1/SALTS of a language — a language is one
    # partition otherwise, the classic window skew at 100 TB.  Phase 1's
    # per-salt top-K is a superset of the global top-K, so phase 2 ranks
    # at most SALTS*CAP rows per language.
    salts = 16
    w1 = Window.partitionBy("lang", F.pmod(F.col("doc_id"), F.lit(salts))).orderBy(
        "doc_id"
    )
    pruned = deduped.withColumn("rk1", F.row_number().over(w1)).filter(
        F.col("rk1") <= PER_LANG_CAP
    )
    w_cap = Window.partitionBy("lang").orderBy("doc_id")
    return (
        pruned.withColumn("rk", F.row_number().over(w_cap))
        .filter(F.col("rk") <= PER_LANG_CAP)
        .select("doc_id", "lang", "source", "n_tokens")
    )


def corpus_recipe(spark: SparkSession, sf_dir: str) -> DataFrame:
    capped = _capped_survivors(load_table(spark, sf_dir, "documents", spread=True))
    return (
        capped.groupBy("lang", "source")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_tokens").alias("total_tokens"),
            F.round(
                F.avg(F.col("n_tokens").cast("decimal(18,4)")).cast("double"), 4
            ).alias("avg_tokens"),
        )
        .orderBy("lang", "source")
    )


def corpus_export_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full corpus-build terminal: recipe survivors -> deterministic
    shard layout -> per-shard export manifest (doc count, token budget,
    first doc in hash order).  Composition is the point: curation and
    export chain without materializing an intermediate corpus, and the
    shard stage adds exactly one shuffle (on shard_id) to the recipe plan.
    """
    from debezium_server_bigquery_spark.functions.sharding import assign_shards

    capped = _capped_survivors(load_table(spark, sf_dir, "documents", spread=True))
    assigned = assign_shards(capped, "doc_id", EXPORT_SHARDS)
    return (
        assigned.groupBy("shard_id")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_tokens").alias("total_tokens"),
            F.min(F.when(F.col("shard_pos") == 1, F.col("doc_id"))).alias(
                "first_doc"
            ),
        )
        .orderBy("shard_id")
    )


_RECIPE_CTES = rf"""
WITH scored AS (
  SELECT doc_id, lang, source, text,
    CAST(len(regexp_extract_all(coalesce(text, ''), '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]', 0)) AS BIGINT)
      AS n_tokens,
    len(regexp_replace(text, '[A-Za-z0-9\s]', '', 'g'))
      / greatest(len(text), 1) AS punct_ratio
  FROM documents
),
filtered AS (
  SELECT * FROM scored
  WHERE n_tokens >= {MIN_TOKENS} AND punct_ratio <= {MAX_PUNCT_RATIO}
),
deduped AS (
  SELECT * FROM (
    SELECT doc_id, lang, source, n_tokens,
           MIN(doc_id) OVER (PARTITION BY md5(text)) AS keeper
    FROM filtered
  ) WHERE doc_id = keeper
),
capped AS (
  SELECT * FROM (
    SELECT doc_id, lang, source, n_tokens,
           ROW_NUMBER() OVER (PARTITION BY lang ORDER BY doc_id) AS rk
    FROM deduped
  ) WHERE rk <= {PER_LANG_CAP}
)
"""

CORPUS_RECIPE_SQL = f"""{_RECIPE_CTES}
SELECT lang, source,
  COUNT(*) AS n_docs,
  CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
  round(CAST(AVG(CAST(n_tokens AS DECIMAL(18,4))) AS DOUBLE), 4) AS avg_tokens
FROM capped
GROUP BY lang, source
ORDER BY lang, source
"""

_H60 = "(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT)"

CORPUS_EXPORT_SQL = f"""{_RECIPE_CTES}
, assigned AS (
  SELECT n_tokens, doc_id,
    CAST({_H60} % {{n}} AS INTEGER) AS shard_id,
    CAST(ROW_NUMBER() OVER (
      PARTITION BY {_H60} % {{n}} ORDER BY {_H60}, doc_id) AS INTEGER) AS shard_pos
  FROM capped
)
SELECT shard_id,
  COUNT(*) AS n_docs,
  CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
  MIN(CASE WHEN shard_pos = 1 THEN doc_id END) AS first_doc
FROM assigned GROUP BY shard_id ORDER BY shard_id
"""


QUALITY_CUT = 0.7


def corpus_curation_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The dataset-card attrition table in ONE row: how many documents
    survive each curation stage applied cumulatively —

        raw -> exact dedup (keep min id per content hash)
            -> near-dup dedup (keep each LSH duplicate-cluster's min id)
            -> heuristic quality cut (score >= 0.7)
            -> decontamination (drop train docs containing a test doc)

    Every stage is a per-document boolean flag computed by the standalone
    operator that owns it (exact window, connected-components labels,
    text_quality_score, decontaminate_test_overlap), joined doc-keyed and
    folded by one conditional-sum aggregate — the funnel itself adds no
    new join shape, and the counts are exactly what its feeder operators
    independently report.  Scale notes inherit from the feeders: the
    cluster labels are the bounded iterative min-label join, the
    contaminated set is O(real leakage) and broadcast."""
    from debezium_server_bigquery_spark.functions.decontamination import (
        CONTAM_CONTAINMENT,
        decontaminate_test_overlap,
    )
    from debezium_server_bigquery_spark.functions.dedup_clusters import (
        connected_components,
    )
    from debezium_server_bigquery_spark.functions.dedup_fuzzy import (
        dedup_minhash_lsh,
    )
    from debezium_server_bigquery_spark.functions.text import quality_scores

    docs = load_table(spark, sf_dir, "documents", spread=True)
    w_dup = Window.partitionBy(F.md5("text"))
    exact = docs.select(
        "doc_id",
        (F.col("doc_id") == F.min("doc_id").over(w_dup)).alias("keep_exact"),
    )
    labels = connected_components(
        docs.select("doc_id"),
        dedup_minhash_lsh(spark, sf_dir).select("doc_a", "doc_b"),
    ).select(
        "doc_id", (F.col("doc_id") == F.col("cluster_id")).alias("keep_cluster")
    )
    quality = quality_scores(spark, sf_dir).select(
        "doc_id", (F.col("quality_score") >= QUALITY_CUT).alias("keep_quality")
    )
    contaminated = (
        decontaminate_test_overlap(spark, sf_dir)
        .filter(F.col("containment") >= CONTAM_CONTAINMENT)
        .select(F.col("train_doc").alias("doc_id"))
        .distinct()
        .withColumn("is_contam", F.lit(True))
    )
    flags = (
        exact.join(labels, "doc_id")
        .join(quality, "doc_id")
        .join(F.broadcast(contaminated), "doc_id", "left")
        .select(
            "keep_exact",
            "keep_cluster",
            "keep_quality",
            F.coalesce("is_contam", F.lit(False)).alias("is_contam"),
        )
    )

    def _n(cond) -> F.Column:
        return F.sum(F.when(cond, 1).otherwise(0))

    ke, kc, kq = F.col("keep_exact"), F.col("keep_cluster"), F.col("keep_quality")
    return flags.agg(
        F.count("*").alias("n_raw"),
        _n(ke).alias("n_after_exact"),
        _n(ke & kc).alias("n_after_neardup"),
        _n(ke & kc & kq).alias("n_after_quality"),
        _n(ke & kc & kq & ~F.col("is_contam")).alias("n_after_decontam"),
    )


from debezium_server_bigquery_spark.functions.decontamination import (  # noqa: E402
    CONTAM_CONTAINMENT as _CC,
)
from debezium_server_bigquery_spark.functions.dedup_fuzzy import (  # noqa: E402
    DEDUP_MINHASH_SQL as _MINHASH_SQL,
)
from debezium_server_bigquery_spark.functions.dedup_fuzzy import (  # noqa: E402
    _INV_CTES,
    _SHINGLES_SQL,
)
from debezium_server_bigquery_spark.functions.curation import (  # noqa: E402
    split_case_sql as _split_case,
)

CURATION_FUNNEL_SQL = f"""
WITH RECURSIVE lshpairs AS ( {_MINHASH_SQL} ),
edges AS (
  SELECT doc_a AS s, doc_b AS d FROM lshpairs
  UNION ALL
  SELECT doc_b AS s, doc_a AS d FROM lshpairs
),
reach(node, lbl) AS (
  SELECT doc_id, doc_id FROM documents
  UNION
  SELECT e.s, r.lbl FROM edges e JOIN reach r ON e.d = r.node
),
clusters AS (
  SELECT node AS doc_id, MIN(lbl) AS cluster_id FROM reach GROUP BY node
),
shingled AS ({_SHINGLES_SQL}),
{_INV_CTES},
lab AS (SELECT doc_id, sh, {_split_case("doc_id")} AS split FROM inv),
tpairs AS (
  SELECT a.doc_id AS train_doc, b.doc_id AS test_doc, COUNT(*) AS n_shared
  FROM lab a JOIN lab b ON a.sh = b.sh
  WHERE a.split = 'train' AND b.split = 'test'
  GROUP BY 1, 2
),
contaminated AS (
  SELECT DISTINCT train_doc AS doc_id
  FROM tpairs JOIN sizes sz ON sz.doc_id = test_doc
  WHERE round(n_shared::DOUBLE / sz.n_sh, 6) >= {_CC}
),
toks0 AS (
  SELECT doc_id, text,
    list_filter(string_split_regex(text, '\\s+'), t -> t <> '') AS w,
    list_filter(string_split_regex(lower(text), '\\s+'), t -> t <> '') AS wl
  FROM documents
),
quality AS (
  SELECT doc_id,
    (CASE WHEN len(w) BETWEEN 10 AND 1000 THEN 0.4 ELSE 0.0 END)
    + (CASE WHEN len(list_filter(wl, t -> list_contains(
          ['the','a','and','of','to','in','is','on','for','with'], t)))
        / greatest(len(wl), 1) > 0.01 THEN 0.3 ELSE 0.0 END)
    + (CASE WHEN length(regexp_replace(text, '[A-Za-z0-9\\s]', '', 'g'))
        / greatest(length(text), 1) < 0.1 THEN 0.3 ELSE 0.0 END)
      AS q
  FROM toks0
),
flags AS (
  SELECT d.doc_id,
    d.doc_id = MIN(d.doc_id) OVER (PARTITION BY md5(d.text)) AS ke,
    d.doc_id = cl.cluster_id AS kc,
    round(q.q, 2) >= {QUALITY_CUT} AS kq,
    c.doc_id IS NOT NULL AS contam
  FROM documents d
    JOIN clusters cl ON cl.doc_id = d.doc_id
    JOIN quality q ON q.doc_id = d.doc_id
    LEFT JOIN contaminated c ON c.doc_id = d.doc_id
)
SELECT COUNT(*) AS n_raw,
  CAST(SUM(CASE WHEN ke THEN 1 ELSE 0 END) AS BIGINT) AS n_after_exact,
  CAST(SUM(CASE WHEN ke AND kc THEN 1 ELSE 0 END) AS BIGINT) AS n_after_neardup,
  CAST(SUM(CASE WHEN ke AND kc AND kq THEN 1 ELSE 0 END) AS BIGINT)
    AS n_after_quality,
  CAST(SUM(CASE WHEN ke AND kc AND kq AND NOT contam THEN 1 ELSE 0 END)
    AS BIGINT) AS n_after_decontam
FROM flags
"""


QUERIES = {
    "corpus_recipe": corpus_recipe,
    "corpus_export_manifest": corpus_export_manifest,
    "corpus_curation_funnel": corpus_curation_funnel,
}
ORACLES = {
    "corpus_recipe": CORPUS_RECIPE_SQL,
    "corpus_export_manifest": CORPUS_EXPORT_SQL.format(n=4),
    "corpus_curation_funnel": CURATION_FUNNEL_SQL,
}
