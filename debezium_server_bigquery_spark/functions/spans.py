"""Exact common-span detection — the substring-dedup signal.

"Deduplicating Training Data Makes Language Models Better" (Lee et al.,
2022) removes exact substrings of >= N tokens shared across documents,
found with a suffix array.  A suffix array does not distribute; the
Spark-native equivalent is the rolling window form: every length-N word
window of every document is hashed (stride 1), and a window hash seen in
more than one document marks a shared span.  That is one shingle explode
(narrow) plus one map-side-combinable aggregation on the span hash — the
same plan shape as exact dedup, linear at 100 TB, no suffix array and no
cross-document comparison.

Two operators:

- ``text_common_spans`` — the corpus-level index: every span (as a
  hash) appearing in >= 2 distinct documents, with its document count
  and the id range it infects.  This is the removal work-list of the
  suffix-array method.
- a per-document contamination ratio could join this index back to the
  shingled documents; the existing ``text_contamination_check`` covers
  the against-benchmark variant, so only the corpus index is registered.

Span length is in WORDS (whitespace tokens), matching the shingle
tokenizer the dedup family already uses.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from debezium_server_bigquery_spark.functions.dedup_fuzzy import (
    _hash60_sql,
    hash60,
    shingles,
    shingles_sql,
    words,
)
from debezium_server_bigquery_spark.sources.tables import load_table

SPAN_WORDS = 8  # minimum span length to count as duplication


def text_common_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents", spread=True)
    spans = docs.select(
        "doc_id", F.explode(shingles(F.col("text"), SPAN_WORDS)).alias("span")
    )
    return (
        spans.groupBy(F.md5("span").alias("span_hash"))
        .agg(
            F.countDistinct("doc_id").alias("n_docs"),
            F.min("doc_id").alias("first_doc"),
            F.max("doc_id").alias("last_doc"),
        )
        .filter(F.col("n_docs") >= 2)
        .orderBy("span_hash")
    )


TEXT_COMMON_SPANS_SQL = f"""
WITH shingled AS ({shingles_sql(SPAN_WORDS)}),
exploded AS (
  SELECT doc_id, unnest(sh) AS span FROM shingled
)
SELECT md5(span) AS span_hash,
  COUNT(DISTINCT doc_id) AS n_docs,
  MIN(doc_id) AS first_doc,
  MAX(doc_id) AS last_doc
FROM exploded
GROUP BY span
HAVING COUNT(DISTINCT doc_id) >= 2
ORDER BY span_hash
"""


def text_span_dup_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document duplication ratio: the fraction of a document's
    length-N word windows that also occur in some OTHER document — the
    filter signal substring dedup acts on (drop or trim docs above a
    threshold).

    Plan: one shingle explode, one aggregation building the span->n_docs
    index, one equi-join back on the span hash, one per-doc aggregation.
    Both shuffles key on high-cardinality hashes; no document ever meets
    another document directly.
    """
    docs = load_table(spark, sf_dir, "documents", spread=True)
    spans = docs.select(
        "doc_id", F.explode(shingles(F.col("text"), SPAN_WORDS)).alias("span")
    ).withColumn("span_hash", F.md5("span")).drop("span")
    index = spans.groupBy("span_hash").agg(
        F.countDistinct("doc_id").alias("n_docs")
    )
    joined = spans.join(index, "span_hash")
    return (
        joined.groupBy("doc_id")
        .agg(
            F.count("*").alias("n_spans"),
            F.sum(F.when(F.col("n_docs") >= 2, 1).otherwise(0)).alias("n_shared"),
        )
        .select(
            "doc_id",
            "n_spans",
            F.col("n_shared").cast("long").alias("n_shared"),
            F.round(F.col("n_shared") / F.col("n_spans"), 6).alias("dup_ratio"),
        )
        .orderBy("doc_id")
    )


TEXT_SPAN_DUP_RATIO_SQL = f"""
WITH shingled AS ({shingles_sql(SPAN_WORDS)}),
spans AS (
  SELECT doc_id, md5(unnest(sh)) AS span_hash FROM shingled
),
idx AS (
  SELECT span_hash, COUNT(DISTINCT doc_id) AS n_docs FROM spans GROUP BY span_hash
)
SELECT s.doc_id,
  COUNT(*) AS n_spans,
  CAST(SUM(CASE WHEN i.n_docs >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_shared,
  round(SUM(CASE WHEN i.n_docs >= 2 THEN 1 ELSE 0 END) / COUNT(*), 6) AS dup_ratio
FROM spans s JOIN idx i USING (span_hash)
GROUP BY s.doc_id
ORDER BY s.doc_id
"""


LSS_DF_CAP = 50  # windows with more postings than this are boilerplate
LSS_TOP = 50


def _positional_windows_sql(n: int) -> str:
    """DuckDB twin of the positional window build: (doc_id, pos, h) for
    every stride-1 length-n word window, 60-bit hashed.  range(a, b) is
    half-open, so stop = len(w) - (n - 2) yields pos in [1, len-n+1] and
    an empty set for short docs — no WHERE guard needed."""
    join = " || ' ' || ".join(f"w[i+{j}]" for j in range(n))
    return rf"""
  SELECT doc_id, i AS pos, {_hash60_sql(join)} AS h
  FROM (SELECT doc_id, list_filter(string_split_regex(text, '\s+'), t -> t <> '') AS w
        FROM documents), UNNEST(range(1, len(w) - {n - 2})) AS r(i)
"""


def longest_shared_span_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MAXIMAL shared substring per document pair — the per-pair form of
    the suffix-array dedup signal (Lee et al. 2022): for every pair of
    documents sharing at least one length-N word window, the length in
    words of their longest CONTIGUOUS shared run.  ``text_common_spans``
    lists the infected windows; this ranks the worst offending PAIRS by
    how much verbatim text they actually share — the triage view before
    deciding trim-vs-drop.

    Suffix arrays do not distribute; the Spark-native equivalent chains
    matched windows along match DIAGONALS: a shared run of L consecutive
    windows between doc A and doc B sits at constant (pos_a - pos_b), so
    the longest run is a gaps-and-islands pass (pos_a - row_number) over
    each (pair, diagonal) group — thousands of small window partitions,
    never a single-partition window.

    Scale design (100 TB): the positional window build is one narrow
    explode; the posting self-join is bounded by the same df-cap
    discipline as the Jaccard index (windows with > LSS_DF_CAP postings
    are mega-boilerplate and are dropped, which can only SPLIT a run
    through them — a conservative under-estimate, documented); every
    later stage is keyed on (pair, diagonal) hashes.  No document meets
    another document except through a shared-window posting list."""
    docs = load_table(spark, sf_dir, "documents", spread=True)
    n = SPAN_WORDS
    toks = words(F.col("text"))
    win = (
        docs.filter(F.size(words(F.col("text"))) >= n)
        .select(
            "doc_id",
            F.explode(
                F.transform(
                    F.sequence(F.lit(1), F.size(toks) - (n - 1)),
                    lambda i: F.struct(
                        i.alias("pos"),
                        hash60(
                            F.concat_ws(
                                " ",
                                *[F.element_at(toks, i + j) for j in range(n)],
                            )
                        ).alias("h"),
                    ),
                )
            ).alias("g"),
        )
        .select("doc_id", F.col("g.pos").alias("pos"), F.col("g.h").alias("h"))
    )
    hot = (
        win.groupBy("h")
        .agg(F.count("*").alias("dfreq"))
        .filter(F.col("dfreq") > LSS_DF_CAP)
        .select("h")
    )
    kept = win.join(hot.hint("shuffle_hash"), "h", "left_anti")
    a, b = kept.alias("a"), kept.hint("shuffle_hash").alias("b")
    m = a.join(
        b,
        (F.col("a.h") == F.col("b.h"))
        & (F.col("a.doc_id") < F.col("b.doc_id")),
    ).select(
        F.col("a.doc_id").alias("doc_a"),
        F.col("b.doc_id").alias("doc_b"),
        F.col("a.pos").alias("pos_a"),
        (F.col("a.pos") - F.col("b.pos")).alias("diag"),
    )
    w = Window.partitionBy("doc_a", "doc_b", "diag").orderBy("pos_a")
    runs = m.withColumn("island", F.col("pos_a") - F.row_number().over(w))
    rl = runs.groupBy("doc_a", "doc_b", "diag", "island").agg(
        F.count("*").alias("n_win")
    )
    return (
        rl.groupBy("doc_a", "doc_b")
        .agg((F.max("n_win") + (n - 1)).cast("long").alias("span_words"))
        .orderBy(F.desc("span_words"), F.asc("doc_a"), F.asc("doc_b"))
        .limit(LSS_TOP)
    )


LONGEST_SHARED_SPAN_SQL = f"""
WITH win AS ({_positional_windows_sql(SPAN_WORDS)}),
hot AS (
  SELECT h FROM win GROUP BY h HAVING COUNT(*) > {LSS_DF_CAP}
),
kept AS (
  SELECT * FROM win WHERE h NOT IN (SELECT h FROM hot)
),
m AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, a.pos AS pos_a,
    a.pos - b.pos AS diag
  FROM kept a JOIN kept b ON a.h = b.h AND a.doc_id < b.doc_id
),
runs AS (
  SELECT doc_a, doc_b, diag,
    pos_a - ROW_NUMBER() OVER (
      PARTITION BY doc_a, doc_b, diag ORDER BY pos_a) AS island
  FROM m
),
rl AS (
  SELECT doc_a, doc_b, COUNT(*) AS n_win
  FROM runs GROUP BY doc_a, doc_b, diag, island
)
SELECT doc_a, doc_b, CAST(MAX(n_win) + {SPAN_WORDS - 1} AS BIGINT) AS span_words
FROM rl GROUP BY doc_a, doc_b
ORDER BY span_words DESC, doc_a ASC, doc_b ASC LIMIT {LSS_TOP}
"""


def span_trim_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """How many WORDS would substring dedup actually remove from each
    document?  ``text_span_dup_ratio`` counts shared windows; this
    resolves overlapping shared windows into their interval UNION and
    reports covered words — the real byte-savings estimate behind a
    trim-vs-drop decision (100 windows can cover 107 words or 800
    depending on overlap; the ratio alone cannot tell).

    Plan: positional windows -> hash->doc-count index (aggregate, no
    self-join, no df-cap needed) -> join back on the window hash ->
    per-document interval merge.  Two intervals [p, p+N-1] and
    [p', p'+N-1] (p' > p) are contiguous coverage iff p' - p <= N, so
    the merge is gaps-and-islands over a lag window partitioned by
    doc_id (key-cardinality partitions) and each island covers
    max(pos) - min(pos) + N words — pure integer arithmetic end to
    end."""
    n = SPAN_WORDS
    docs = load_table(spark, sf_dir, "documents", spread=True)
    toks = words(F.col("text"))
    win = (
        docs.filter(F.size(words(F.col("text"))) >= n)
        .select(
            "doc_id",
            F.size(toks).alias("n_words"),
            F.explode(
                F.transform(
                    F.sequence(F.lit(1), F.size(toks) - (n - 1)),
                    lambda i: F.struct(
                        i.alias("pos"),
                        hash60(
                            F.concat_ws(
                                " ",
                                *[F.element_at(toks, i + j) for j in range(n)],
                            )
                        ).alias("h"),
                    ),
                )
            ).alias("g"),
        )
        .select("doc_id", "n_words", F.col("g.pos").alias("pos"), F.col("g.h").alias("h"))
    )
    idx = win.groupBy("h").agg(F.countDistinct("doc_id").alias("n_docs"))
    shared = win.join(idx.filter(F.col("n_docs") >= 2), "h").select(
        "doc_id", "n_words", "pos"
    )
    w = Window.partitionBy("doc_id").orderBy("pos")
    brk = F.when(
        F.col("pos") - F.lag("pos").over(w) > n, 1
    ).otherwise(0)
    islands = shared.withColumn(
        "island", F.sum(brk).over(w.rowsBetween(Window.unboundedPreceding, 0))
    )
    per_island = islands.groupBy("doc_id", "n_words", "island").agg(
        (F.max("pos") - F.min("pos") + n).alias("covered")
    )
    return (
        per_island.groupBy("doc_id", "n_words")
        .agg(F.sum("covered").alias("covered_words"))
        .select(
            "doc_id",
            F.col("n_words").cast("long").alias("n_words"),
            F.col("covered_words").cast("long").alias("covered_words"),
            F.round(
                F.col("covered_words").cast("double") / F.col("n_words"), 6
            ).alias("trim_ratio"),
        )
        .orderBy("doc_id")
    )


SPAN_TRIM_SQL = f"""
WITH win0 AS ({_positional_windows_sql(SPAN_WORDS)}),
wc AS (
  SELECT doc_id, len(list_filter(string_split_regex(text, '\\s+'), t -> t <> ''))
    AS n_words
  FROM documents
),
idx AS (
  SELECT h FROM win0 GROUP BY h HAVING COUNT(DISTINCT doc_id) >= 2
),
shared AS (
  SELECT w.doc_id, w.pos FROM win0 w JOIN idx USING (h)
),
marked AS (
  SELECT doc_id, pos,
    CASE WHEN pos - LAG(pos) OVER (PARTITION BY doc_id ORDER BY pos)
      > {SPAN_WORDS} THEN 1 ELSE 0 END AS brk
  FROM shared
),
islands AS (
  SELECT doc_id, pos,
    SUM(brk) OVER (PARTITION BY doc_id ORDER BY pos
      ROWS UNBOUNDED PRECEDING) AS island
  FROM marked
),
per_island AS (
  SELECT doc_id, island, MAX(pos) - MIN(pos) + {SPAN_WORDS} AS covered
  FROM islands GROUP BY doc_id, island
),
per_doc AS (
  SELECT doc_id, CAST(SUM(covered) AS BIGINT) AS covered_words
  FROM per_island GROUP BY doc_id
)
SELECT p.doc_id, CAST(wc.n_words AS BIGINT) AS n_words, p.covered_words,
  round(CAST(p.covered_words AS DOUBLE) / wc.n_words, 6) AS trim_ratio
FROM per_doc p JOIN wc ON wc.doc_id = p.doc_id
ORDER BY p.doc_id
"""


WINNOW_K = 4  # words per k-gram
WINNOW_W = 4  # consecutive k-gram hashes per winnowing window
WINNOW_DF_CAP = 50  # fingerprints in more docs than this are boilerplate
WINNOW_TOP = 50


def winnowing_dup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document-pair overlap via WINNOWING fingerprints (Schleimer,
    Wilkerson & Aiken, "Winnowing: Local Algorithms for Document
    Fingerprinting", SIGMOD 2003 — the MOSS algorithm): hash every
    word k-gram, then keep only the MINIMUM hash of each window of
    ``WINNOW_W`` consecutive k-grams.  Winnowing's guarantee is what
    distinguishes it from MinHash (a per-document GLOBAL sketch that
    estimates whole-document Jaccard): the selected fingerprints are
    POSITION-LOCAL, so any shared run of at least W + K - 1 words is
    guaranteed to contribute at least one common fingerprint — partial
    overlap between otherwise different documents is found, at ~1/W the
    index size of the full shingle index the span operators build.

    Scale design (100 TB): fingerprint selection is row-local array
    algebra (k-gram hashes -> per-window min -> distinct), one narrow
    stage; the candidate join is an equi-join on the fingerprint through
    df-capped posting lists (same boilerplate discipline as
    ``longest_shared_span_pairs``); per-document fingerprint counts join
    back on the doc key.  No document ever meets another except through a
    <= WINNOW_DF_CAP posting list."""
    k, w = WINNOW_K, WINNOW_W
    docs = load_table(spark, sf_dir, "documents", spread=True)
    toks = words(F.col("text"))
    hs = F.transform(
        F.sequence(F.lit(1), F.size(toks) - (k - 1)),
        lambda i: hash60(
            F.concat_ws(" ", *[F.element_at(toks, i + j) for j in range(k)])
        ),
    )
    base = docs.filter(F.size(words(F.col("text"))) >= k + w - 1).select(
        "doc_id", hs.alias("hs")
    )
    fp = base.select(
        "doc_id",
        F.explode(
            F.array_distinct(
                F.transform(
                    F.sequence(F.lit(1), F.size("hs") - (w - 1)),
                    lambda j: F.array_min(
                        F.transform(
                            F.sequence(F.lit(0), F.lit(w - 1)),
                            lambda d: F.element_at(F.col("hs"), j + d),
                        )
                    ),
                )
            )
        ).alias("fp"),
    )
    hot = (
        fp.groupBy("fp")
        .agg(F.countDistinct("doc_id").alias("dfreq"))
        .filter(F.col("dfreq") > WINNOW_DF_CAP)
        .select("fp")
    )
    kept = fp.join(hot.hint("shuffle_hash"), "fp", "left_anti")
    per_doc = kept.groupBy("doc_id").agg(F.count("*").alias("n_fps"))
    a, b = kept.alias("a"), kept.hint("shuffle_hash").alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.fp") == F.col("b.fp"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .agg(F.count("*").alias("n_shared"))
    )
    na = per_doc.select(
        F.col("doc_id").alias("doc_a"), F.col("n_fps").alias("n_a")
    )
    nb = per_doc.select(
        F.col("doc_id").alias("doc_b"), F.col("n_fps").alias("n_b")
    )
    return (
        pairs.join(na, "doc_a")
        .join(nb, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            "n_shared",
            "n_a",
            "n_b",
            F.round(
                F.col("n_shared").cast("double") / F.least("n_a", "n_b"), 6
            ).alias("containment"),
        )
        .orderBy(F.desc("n_shared"), F.asc("doc_a"), F.asc("doc_b"))
        .limit(WINNOW_TOP)
    )


def _winnow_fp_sql(k: int, w: int) -> str:
    """DuckDB twin of the winnowed-fingerprint build: (doc_id, fp) rows.
    DuckDB list slicing is 1-based inclusive, so hs[j:j+w-1] is the
    window of w consecutive k-gram hashes starting at j."""
    gram = " || ' ' || ".join(f"wd[i+{j}]" for j in range(k))
    return rf"""
  SELECT doc_id, unnest(list_distinct(list_transform(
      range(1, len(hs) - {w - 2}),
      j -> list_min(hs[j:j+{w - 1}])))) AS fp
  FROM (
    SELECT doc_id,
      list_transform(range(1, len(wd) - {k - 2}), i -> {_hash60_sql(gram)}) AS hs
    FROM (SELECT doc_id,
            list_filter(string_split_regex(text, '\s+'), t -> t <> '') AS wd
          FROM documents)
    WHERE len(wd) >= {k + w - 1})
"""


WINNOWING_DUP_SQL = f"""
WITH fp AS ({_winnow_fp_sql(WINNOW_K, WINNOW_W)}),
hot AS (
  SELECT fp FROM fp GROUP BY fp HAVING COUNT(DISTINCT doc_id) > {WINNOW_DF_CAP}
),
kept AS (
  SELECT * FROM fp WHERE fp NOT IN (SELECT fp FROM hot)
),
per_doc AS (
  SELECT doc_id, COUNT(*) AS n_fps FROM kept GROUP BY doc_id
),
pairs AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS n_shared
  FROM kept a JOIN kept b ON a.fp = b.fp AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT doc_a, doc_b, n_shared, na.n_fps AS n_a, nb.n_fps AS n_b,
  round(CAST(n_shared AS DOUBLE) / least(na.n_fps, nb.n_fps), 6)
    AS containment
FROM pairs
JOIN per_doc na ON na.doc_id = doc_a
JOIN per_doc nb ON nb.doc_id = doc_b
ORDER BY n_shared DESC, doc_a ASC, doc_b ASC LIMIT {WINNOW_TOP}
"""


def winnowing_verified_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The candidate -> VERIFY composition production dedup actually runs:
    winnowing proposes its top pairs (a fingerprint-overlap heuristic),
    then each candidate pair is verified with the EXACT k-gram Jaccard
    over the two documents' full shingle sets — the two-stage shape where
    the cheap stage bounds the work and the exact stage bounds the error
    (same discipline as dedup_lsh_recall for MinHash LSH and
    ann_ivf_recall for IVF).

    Scale design (100 TB): the verify stage touches ONLY the candidate
    pairs — a WINNOW_TOP-row broadcast joined twice against the
    doc-keyed shingle-set scan, so exact Jaccard (row-local
    array_intersect, never a shuffle of pairs) costs O(candidates), not
    O(corpus^2).  Candidates inherit the df-capped posting discipline
    from ``winnowing_dup_pairs``; its fingerprint substrate subtree is
    shared by lineage."""
    k = WINNOW_K
    cands = winnowing_dup_pairs(spark, sf_dir).select(
        "doc_a", "doc_b", "n_shared", "containment"
    )
    docs = load_table(spark, sf_dir, "documents", spread=True)
    toks = words(F.col("text"))
    grams = F.array_distinct(
        F.transform(
            F.sequence(F.lit(1), F.size(toks) - (k - 1)),
            lambda i: F.concat_ws(
                " ", *[F.element_at(toks, i + j) for j in range(k)]
            ),
        )
    )
    sets = docs.filter(F.size(words(F.col("text"))) >= k).select(
        "doc_id", grams.alias("sh")
    )
    a = sets.select(F.col("doc_id").alias("doc_a"), F.col("sh").alias("sh_a"))
    b = sets.select(F.col("doc_id").alias("doc_b"), F.col("sh").alias("sh_b"))
    inter = F.size(F.array_intersect("sh_a", "sh_b"))
    return (
        a.join(F.broadcast(cands), "doc_a")
        .join(b, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            "n_shared",
            "containment",
            inter.alias("n_common_grams"),
            F.round(
                inter.cast("double")
                / (F.size("sh_a") + F.size("sh_b") - inter),
                6,
            ).alias("exact_jaccard"),
        )
        .orderBy(F.desc("exact_jaccard"), F.asc("doc_a"), F.asc("doc_b"))
    )


WINNOWING_VERIFIED_SQL = f"""
WITH cands AS ({WINNOWING_DUP_SQL}),
sets AS (
  SELECT doc_id,
    list_distinct(list_transform(range(1, len(wd) - {WINNOW_K - 2}),
      i -> {" || ' ' || ".join(f"wd[i+{j}]" for j in range(WINNOW_K))})) AS sh
  FROM (SELECT doc_id,
          list_filter(string_split_regex(text, '\\s+'), t -> t <> '') AS wd
        FROM documents)
  WHERE len(wd) >= {WINNOW_K}
)
SELECT c.doc_a, c.doc_b, c.n_shared, c.containment,
  CAST(len(list_intersect(a.sh, b.sh)) AS INTEGER) AS n_common_grams,
  round(CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
        / (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh))), 6)
    AS exact_jaccard
FROM cands c
JOIN sets a ON a.doc_id = c.doc_a
JOIN sets b ON b.doc_id = c.doc_b
ORDER BY exact_jaccard DESC, c.doc_a ASC, c.doc_b ASC
"""


QUERIES = {
    "text_common_spans": text_common_spans,
    "text_span_dup_ratio": text_span_dup_ratio,
    "longest_shared_span_pairs": longest_shared_span_pairs,
    "span_trim_estimate": span_trim_estimate,
    "winnowing_dup_pairs": winnowing_dup_pairs,
    "winnowing_verified_pairs": winnowing_verified_pairs,
}
ORACLES = {
    "text_common_spans": TEXT_COMMON_SPANS_SQL,
    "text_span_dup_ratio": TEXT_SPAN_DUP_RATIO_SQL,
    "longest_shared_span_pairs": LONGEST_SHARED_SPAN_SQL,
    "span_trim_estimate": SPAN_TRIM_SQL,
    "winnowing_dup_pairs": WINNOWING_DUP_SQL,
    "winnowing_verified_pairs": WINNOWING_VERIFIED_SQL,
}
