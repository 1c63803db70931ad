"""Context-window chunking and PII scrubbing over the ``documents`` table.

Two operators a retrieval/training corpus pipeline runs between ingest
and training-batch assembly (they compose with dedup, quality scoring,
and packing — see functions/packing.py):

- **chunk_documents** — split each document into fixed-size overlapping
  token windows (the RAG/pre-training chunking step).  Pure column
  algebra: one ``regexp_extract_all`` tokenize, a ``sequence`` of window
  starts, and one ``explode`` — a single codegen'd narrow stage, no
  shuffle, so at 100 TB it scales linearly with input splits.  Windows
  overlap by ``CHUNK_OVERLAP`` tokens so no boundary context is lost
  (stride = size - overlap, the standard sliding-window scheme).
- **text_pii_scrub** — count + redact personally-identifiable patterns
  (emails, phone-ish digit runs, IPv4s).  Patterns are restricted to the
  regex subset Java (Spark) and RE2 (DuckDB) evaluate identically, so
  the redacted output is hash-checkable cross-engine.  Per-row transform,
  zero shuffle.

The reference has no text operators (its data plane is CDC rows —
SURVEY §2.6); these belong to the beyond-reference LLM-pipeline surface
the engine adds on top of the replicated tables.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from debezium_server_bigquery_spark.functions.text import TOKEN_REGEX
from debezium_server_bigquery_spark.operators.rank import ordered_output
from debezium_server_bigquery_spark.sources.tables import load_table

CHUNK_SIZE = 256  # tokens per chunk (context window)
CHUNK_OVERLAP = 32  # tokens shared between consecutive chunks
_STRIDE = CHUNK_SIZE - CHUNK_OVERLAP


def chunk_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Overlapping token-window chunks per document.

    Window starts are ``0, stride, 2*stride, ...`` while ``start <
    n_tokens``; each chunk is ``tokens[start : start+CHUNK_SIZE]`` joined
    with single spaces (training chunks don't preserve original
    whitespace).  Empty documents produce no chunks.
    """
    docs = load_table(spark, sf_dir, "documents", spread=True)
    toks = docs.select(
        "doc_id",
        "source",
        # coalesce: a NULL text must behave like an empty document in BOTH
        # engines (Spark size(NULL) and DuckDB len(NULL) disagree on the
        # sentinel; '' yields 0 tokens in each).
        F.regexp_extract_all(
            F.coalesce(F.col("text"), F.lit("")), F.lit(TOKEN_REGEX), 0
        ).alias("t"),
    ).withColumn("n", F.size("t")).filter(F.col("n") > 0)
    # sequence(0, n-1, stride): last start is the largest multiple of
    # stride strictly below n — same set DuckDB's range(0, n, stride)
    # generates.
    chunks = toks.select(
        "doc_id",
        "source",
        "t",
        "n",
        F.explode(
            F.sequence(F.lit(0), F.col("n") - 1, F.lit(_STRIDE))
        ).alias("start"),
    )
    out = (
        chunks.select(
            "doc_id",
            "source",
            (F.col("start") / _STRIDE).cast("long").alias("chunk_id"),
            F.col("start").cast("long").alias("start_token"),
            F.least(F.lit(CHUNK_SIZE), F.col("n") - F.col("start"))
            .cast("long")
            .alias("n_chunk_tokens"),
            F.concat_ws(
                " ", F.slice(F.col("t"), F.col("start") + 1, CHUNK_SIZE)
            ).alias("chunk_text"),
        )
        .withColumn("chunk_hash", F.md5("chunk_text"))
        .drop("chunk_text")
    )
    return ordered_output(out, "doc_id", "chunk_id")


CHUNK_DOCUMENTS_SQL = rf"""
WITH toks AS (
  SELECT doc_id, source,
         regexp_extract_all(coalesce(text, ''), '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]', 0) AS t
  FROM documents
),
sized AS (
  SELECT doc_id, source, t, len(t) AS n FROM toks WHERE len(t) > 0
),
starts AS (
  SELECT doc_id, source, t, n, unnest(range(0, n, {_STRIDE})) AS start
  FROM sized
)
SELECT doc_id, source,
  CAST(start // {_STRIDE} AS BIGINT) AS chunk_id,
  CAST(start AS BIGINT) AS start_token,
  CAST(least({CHUNK_SIZE}, n - start) AS BIGINT) AS n_chunk_tokens,
  md5(array_to_string(list_slice(t, start + 1, start + {CHUNK_SIZE}), ' '))
    AS chunk_hash
FROM starts
ORDER BY doc_id, chunk_id
"""


BLOCK_WIN = 64  # non-overlapping token window for block-level dedup


def paragraph_dup_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Block-level inter-document duplication: split each document into
    NON-overlapping ``BLOCK_WIN``-token windows, hash each, and report per
    document the share of its blocks that also occur in at least one
    OTHER document — the fine-grained boilerplate detector between
    whole-document dedup (misses partial copies) and shingle containment
    (pairwise; this is the per-document rollup a quality filter thresholds
    on).

    Scale: one scan + block explode (narrow), one hash-keyed doc-frequency
    aggregate (map-side combinable), one shuffle-hash join back on the
    block hash — the inverted-index shape without posting-list joins,
    since only the block's document COUNT matters, never the pairs."""
    docs = load_table(spark, sf_dir, "documents", spread=True)
    toks = (
        docs.select(
            "doc_id",
            F.regexp_extract_all(
                F.coalesce(F.col("text"), F.lit("")), F.lit(TOKEN_REGEX), 0
            ).alias("t"),
        )
        .withColumn("n", F.size("t"))
        .filter(F.col("n") > 0)
    )
    blocks = toks.select(
        "doc_id",
        "t",
        F.explode(
            F.sequence(F.lit(0), F.col("n") - 1, F.lit(BLOCK_WIN))
        ).alias("start"),
    ).select(
        "doc_id",
        F.md5(
            F.concat_ws(" ", F.slice(F.col("t"), F.col("start") + 1, BLOCK_WIN))
        ).alias("h"),
    )
    dfreq = blocks.groupBy("h").agg(
        F.countDistinct("doc_id").alias("n_docs_with_block")
    )
    return (
        blocks.join(dfreq.hint("shuffle_hash"), "h")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_blocks"),
            F.sum(
                F.when(F.col("n_docs_with_block") >= 2, 1).otherwise(0)
            ).alias("n_shared_blocks"),
        )
        .select(
            "doc_id",
            "n_blocks",
            "n_shared_blocks",
            F.round(
                F.col("n_shared_blocks").cast("double") / F.col("n_blocks"), 6
            ).alias("dup_block_rate"),
        )
        .orderBy("doc_id")
    )


PARAGRAPH_DUP_SQL = rf"""
WITH toks AS (
  SELECT doc_id,
    regexp_extract_all(coalesce(text, ''), '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]', 0) AS t
  FROM documents
),
sized AS (SELECT doc_id, t, len(t) AS n FROM toks WHERE len(t) > 0),
blocks AS (
  SELECT doc_id,
    md5(array_to_string(list_slice(t, start + 1, start + {BLOCK_WIN}), ' ')) AS h
  FROM (SELECT doc_id, t, unnest(range(0, n, {BLOCK_WIN})) AS start FROM sized)
),
dfreq AS (
  SELECT h, COUNT(DISTINCT doc_id) AS n_docs_with_block FROM blocks GROUP BY h
)
SELECT doc_id, COUNT(*) AS n_blocks,
  CAST(SUM(CASE WHEN n_docs_with_block >= 2 THEN 1 ELSE 0 END) AS BIGINT)
    AS n_shared_blocks,
  round(SUM(CASE WHEN n_docs_with_block >= 2 THEN 1 ELSE 0 END)
    / CAST(COUNT(*) AS DOUBLE), 6) AS dup_block_rate
FROM blocks JOIN dfreq USING (h)
GROUP BY doc_id ORDER BY doc_id
"""


# Patterns chosen from the Java-regex ∩ RE2 common subset: character
# classes, bounded quantifiers, alternation — no backrefs, no lookaround.
PII_EMAIL = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z][A-Za-z]+"
PII_IPV4 = r"[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}"
PII_PHONE = r"\+[0-9]{7,15}"


def _scrub(col: Column) -> Column:
    out = F.regexp_replace(col, PII_EMAIL, "<EMAIL>")
    out = F.regexp_replace(out, PII_IPV4, "<IP>")
    out = F.regexp_replace(out, PII_PHONE, "<PHONE>")
    return out


def text_pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document PII pattern counts + hash of the scrubbed text.

    Order of redaction matters (an email contains dot-separated digit
    runs); both engines apply email -> ipv4 -> phone so the scrubbed
    bytes agree.
    """
    docs = load_table(spark, sf_dir, "documents")
    t = F.coalesce(F.col("text"), F.lit(""))  # NULL text == empty document
    out = docs.select(
        "doc_id",
        F.size(F.regexp_extract_all(t, F.lit(PII_EMAIL), 0))
        .cast("long")
        .alias("n_emails"),
        F.size(F.regexp_extract_all(t, F.lit(PII_IPV4), 0))
        .cast("long")
        .alias("n_ipv4"),
        F.size(F.regexp_extract_all(t, F.lit(PII_PHONE), 0))
        .cast("long")
        .alias("n_phones"),
        F.md5(_scrub(t)).alias("scrubbed_hash"),
    )
    return ordered_output(out, "doc_id")


TEXT_PII_SCRUB_SQL = rf"""
SELECT doc_id,
  CAST(len(regexp_extract_all(coalesce(text, ''), '{PII_EMAIL}', 0)) AS BIGINT) AS n_emails,
  CAST(len(regexp_extract_all(coalesce(text, ''), '{PII_IPV4}', 0)) AS BIGINT) AS n_ipv4,
  CAST(len(regexp_extract_all(coalesce(text, ''), '\+[0-9]{{7,15}}', 0)) AS BIGINT) AS n_phones,
  md5(
    regexp_replace(
      regexp_replace(
        regexp_replace(coalesce(text, ''), '{PII_EMAIL}', '<EMAIL>', 'g'),
        '{PII_IPV4}', '<IP>', 'g'),
      '\+[0-9]{{7,15}}', '<PHONE>', 'g')
  ) AS scrubbed_hash
FROM documents
ORDER BY doc_id
"""


QUERIES = {
    "chunk_documents": chunk_documents,
    "paragraph_dup_rate": paragraph_dup_rate,
    "text_pii_scrub": text_pii_scrub,
}

ORACLES = {
    "chunk_documents": CHUNK_DOCUMENTS_SQL,
    "paragraph_dup_rate": PARAGRAPH_DUP_SQL,
    "text_pii_scrub": TEXT_PII_SCRUB_SQL,
}
