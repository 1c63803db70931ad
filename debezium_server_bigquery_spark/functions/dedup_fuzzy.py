"""Deduplication operators: exact, MinHash+LSH, SimHash, n-gram Jaccard.

Scale design (the point of each plan):

- **exact**: one hash-aggregate over the corpus; map-side combine makes the
  shuffle proportional to distinct texts, not rows.
- **minhash_lsh**: shingle -> k minhashes -> band signatures -> bucket
  join.  Candidate generation never compares all pairs: cost is
  O(rows x shingles) for signatures plus a self-join on (band, signature)
  whose output is only the colliding pairs.  This is the 100 TB path —
  banding keeps bucket sizes tiny for non-duplicate data.
- **simhash**: 60-bit signature per doc from token-hash bit votes; near-dup
  = hamming <= 3, found via 4x15-bit pigeonhole bands (Manku WWW'07): an
  equi-join on (band_id, band_value) with provably exact recall — a pair
  within hamming 3 cannot differ in all 4 bands.  No all-pairs scan.
- **ngram_jaccard**: exact Jaccard via the shingle inverted index
  (explode -> join on shingle -> count shared), never a full cross join;
  only pairs sharing >= 1 shingle materialize.

Cross-engine hashing: ``bigint(md5)`` — first 15 hex chars of md5 as a
60-bit int — computes identically in Spark (`conv`) and DuckDB
(`'0x'||... ::BIGINT`), so every operator is oracle-checkable.  Production
fast path would swap ``F.xxhash64`` in (same plans, cheaper hash).
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from debezium_server_bigquery_spark.sources.tables import (
    checkpoint_parquet,
    load_table,
)

MINHASH_K = 12  # minhashes per doc
BAND_R = 3  # rows per band -> 4 bands
SIMHASH_BITS = 60  # fits a signed BIGINT, positive
# Manku et al. (WWW'07) configuration: near-dup = hamming <= 3, found by
# splitting the signature into SIMHASH_MAX_HAMMING + 1 = 4 bands of 15 bits.
# Pigeonhole: any pair within hamming 3 has >= 1 band bit-identical, so an
# equi-join on (band_id, band_value) finds EVERY qualifying pair — exact
# recall with no all-pairs scan.
SIMHASH_MAX_HAMMING = 3
SIMHASH_BANDS = SIMHASH_MAX_HAMMING + 1  # 4 bands x 15 bits
SIMHASH_BAND_BITS = SIMHASH_BITS // SIMHASH_BANDS
JACCARD_THRESHOLD = 0.25
# Stop-shingle document-frequency cap: a shingle present in more than this
# many documents is boilerplate; its posting list would drive a quadratic
# candidate join at scale.  Mirrored verbatim in the DuckDB oracle.
JACCARD_DF_CAP = 500


def hash60(col: Column) -> Column:
    """60-bit integer hash from md5 — identical in Spark and DuckDB."""
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")


def _hash60_sql(expr: str) -> str:
    return f"(('0x' || substr(md5({expr}), 1, 15))::BIGINT)"


def words(col: Column) -> Column:
    return F.filter(F.split(col, r"\s+"), lambda t: t != "")


def shingles(col: Column, n: int = 3) -> Column:
    """Distinct word n-gram shingles (1-based indexing to mirror DuckDB
    list semantics).

    Round 14 (guide §4.1, VERDICT r13 ask #8): the per-gram lambda is
    ``array_join(slice(toks, i, n))`` instead of the previous n
    ``element_at`` lookups fed to ``concat_ws`` — one bounds-checked
    copy per gram instead of n interpreted array probes.  The transform
    itself stays an interpreted HOF (no codegen for lambda bodies), but
    the cheaper body measured 1.65x on the shingle corpus pass at sf0.1
    (interleaved 8-rep A/B: med 1.09 s -> 0.65 s, identical 260 388-row
    exploded output; OPTIMIZATION_r14.md).  ``array_join`` equals
    ``concat_ws`` here because ``words()`` never yields null/empty
    tokens, and ``slice(toks, i, n)`` is always a full window since i
    stops at size-n+1.  Shuffle-free by design: a posexplode+lead-window
    formulation was measured no faster locally and adds two shuffles of
    the token table at scale."""
    toks = words(col)
    grams = F.transform(
        F.sequence(F.lit(1), F.size(toks) - (n - 1)),
        lambda i: F.array_join(F.slice(toks, i, n), " "),
    )
    return F.when(F.size(toks) >= n, F.array_distinct(grams)).otherwise(
        F.array().cast("array<string>")
    )


def shingles_sql(n: int = 3) -> str:
    """DuckDB twin of :func:`shingles`, parameterized on n so the span
    operators (functions/spans.py) share the exact same tokenizer —
    one definition, no drift between the dedup family's oracles and the
    substring-dedup oracles."""
    join = " || ' ' || ".join(f"w[i+{j}]" for j in range(n))
    return rf"""
  SELECT doc_id,
    CASE WHEN len(w) >= {n}
         THEN list_distinct(list_transform(range(1, len(w) - {n - 2}), i -> {join}))
         ELSE [] END AS sh
  FROM (SELECT doc_id, list_filter(string_split_regex(text, '\s+'), t -> t <> '') AS w
        FROM documents)
"""


_SHINGLES_SQL = shingles_sql(3)


def _shingled(docs: DataFrame) -> DataFrame:
    """(doc_id, sh) EXPLODED shingle substrate every fuzzy-dedup operator
    derives from.  Factored out so audit queries that need BOTH the exact
    index and the LSH bands (dedup_lsh_recall, split_leakage_matrix) can
    build it once, ``persist()`` it, and feed both sides from cache.

    The explode is INLINE in one select: measured at sf0.1, projecting
    the shingle array first and exploding in a second select made the
    whole LSH query ~3x slower (16.9s vs 5.0s — the extra Project breaks
    the exchange-reuse/codegen shape), so keep the generator fused with
    the shingle expression."""
    return docs.select("doc_id", F.explode(shingles(F.col("text"))).alias("sh"))


# --------------------------------------------------------------------------
# Exact dedup — keep-first by content hash.
# --------------------------------------------------------------------------
def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents", spread=True)
    hashed = docs.select("doc_id", F.md5("text").alias("text_hash"))
    w = Window.partitionBy("text_hash")
    return (
        hashed.withColumn("keeper_id", F.min("doc_id").over(w))
        .withColumn("n_copies", F.count("*").over(w))
        .withColumn("is_kept", F.col("doc_id") == F.col("keeper_id"))
        .orderBy("doc_id")
    )


DEDUP_EXACT_SQL = """
SELECT doc_id, md5(text) AS text_hash,
  MIN(doc_id) OVER (PARTITION BY md5(text)) AS keeper_id,
  COUNT(*) OVER (PARTITION BY md5(text)) AS n_copies,
  doc_id = MIN(doc_id) OVER (PARTITION BY md5(text)) AS is_kept
FROM documents ORDER BY doc_id
"""


def dup_cluster_size_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Datasheet metric: the distribution of exact-duplicate cluster
    sizes — how much of the corpus is singletons vs pairs vs mass-copied
    boilerplate.  The shape drives the dedup policy: a long tail of huge
    clusters means keep-one-per-cluster recovers most of the budget; a
    flat sea of pairs means near-dup methods must carry the weight.

    Plan: two map-side-combinable hash aggregates (hash -> cluster size,
    size -> cluster count) and a one-row total broadcast for the row
    share — no window over the corpus, no self-join, scales linearly."""
    docs = load_table(spark, sf_dir, "documents", spread=True)
    clusters = (
        docs.select(F.md5("text").alias("h"))
        .groupBy("h")
        .agg(F.count("*").alias("cluster_size"))
    )
    total = docs.agg(F.count("*").alias("n_total"))
    return (
        clusters.groupBy("cluster_size")
        .agg(F.count("*").alias("n_clusters"))
        .crossJoin(F.broadcast(total))
        .select(
            "cluster_size",
            "n_clusters",
            (F.col("cluster_size") * F.col("n_clusters")).alias("n_docs"),
            F.round(
                (F.col("cluster_size") * F.col("n_clusters")).cast("double")
                / F.col("n_total"),
                6,
            ).alias("doc_share"),
        )
        .orderBy("cluster_size")
    )


DUP_CLUSTER_HIST_SQL = """
WITH clusters AS (
  SELECT md5(text) AS h, COUNT(*) AS cluster_size
  FROM documents GROUP BY 1
), n AS (SELECT COUNT(*) AS n_total FROM documents)
SELECT cluster_size, COUNT(*) AS n_clusters,
  CAST(cluster_size * COUNT(*) AS BIGINT) AS n_docs,
  round(CAST(cluster_size * COUNT(*) AS DOUBLE) / n_total, 6) AS doc_share
FROM clusters, n
GROUP BY cluster_size, n_total
ORDER BY cluster_size
"""


def dedup_exact_stream(
    docs: DataFrame, ts_col: str = "ts", watermark: str = "1 hour"
) -> DataFrame:
    """Streaming exact dedup: keep the first arrival of each content hash.

    The batch form above ranks every copy; a stream cannot wait for "all
    copies", so the streaming contract is first-writer-wins with bounded
    state: ``dropDuplicatesWithinWatermark`` keys state by the content hash
    and evicts entries once the watermark passes them — at 100 TB/day the
    state store holds only the watermark horizon's worth of hashes, not
    the full corpus (the batch job remains the exhaustive ground truth).
    ``docs`` must be a streaming DataFrame carrying an event-time column.
    """
    from debezium_server_bigquery_spark.timeutil import as_instant

    hashed = docs.select(
        "doc_id",
        F.md5("text").alias("text_hash"),
        # watermarks accept only TIMESTAMP (LTZ); NTZ event time is
        # reinterpreted as a UTC instant
        as_instant(F.col(ts_col), docs.schema[ts_col].dataType).alias("__ts"),
    )
    return (
        hashed.withWatermark("__ts", watermark)
        .dropDuplicatesWithinWatermark(["text_hash"])
        .drop("__ts")
    )


# --------------------------------------------------------------------------
# MinHash + LSH candidate pairs.
# --------------------------------------------------------------------------
def minhash_band_table(docs: DataFrame) -> DataFrame:
    """(doc_id, band, sig) LSH band signatures for ``docs(doc_id, text)``.

    Shingle-explode once, then *one* md5 per shingle: the k seed-hashes
    are derived arithmetically (Broder double hashing,
    ``(h1 + seed*h2) & mask``) so per-row cost is 1 digest + k adds
    instead of k digests.  One map-side-combinable ``groupBy(doc_id)`` of
    k ``min``s follows (the shuffle carries 12 longs per doc per map
    partition).  Shared by the self-join dedup below and the incremental
    cross-corpus index (functions/dedup_incremental.py).
    """
    return minhash_band_table_from(_shingled(docs))


def minhash_band_table_from(shingled: DataFrame) -> DataFrame:
    """Band table from an existing exploded (doc_id, sh) shingle frame —
    the shareable half of :func:`minhash_band_table`."""
    # h1: 60-bit from md5[1:15]; h2: 32-bit from md5[17:24].  seed*h2 stays
    # under 2^36, so h1 + seed*h2 never overflows int64 before the mask.
    md5 = F.md5(F.col("sh"))
    based = shingled.select(
        "doc_id",
        F.conv(F.substring(md5, 1, 15), 16, 10).cast("long").alias("h1"),
        F.conv(F.substring(md5, 17, 8), 16, 10).cast("long").alias("h2"),
    )
    mask = (1 << 60) - 1
    hcols = [
        (F.col("h1") + F.lit(seed) * F.col("h2")).bitwiseAND(F.lit(mask)).alias(f"h{seed}")
        for seed in range(MINHASH_K)
    ]
    sig = (
        based.select("doc_id", *hcols)
        .groupBy("doc_id")
        .agg(*[F.min(f"h{seed}").alias(f"m{seed}") for seed in range(MINHASH_K)])
    )
    # band signature = md5 of the band's r minhashes in seed order
    n_bands = MINHASH_K // BAND_R
    band_sigs = [
        F.md5(
            F.concat_ws(
                ",",
                *[
                    F.col(f"m{band * BAND_R + r}").cast("string")
                    for r in range(BAND_R)
                ],
            )
        ).alias(f"b{band}")
        for band in range(n_bands)
    ]
    return (
        sig.select("doc_id", *band_sigs)
        .select(
            "doc_id",
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(band).cast("long").alias("band"),
                            F.col(f"b{band}").alias("sig"),
                        )
                        for band in range(n_bands)
                    ]
                )
            ).alias("bs"),
        )
        .select(
            "doc_id", F.col("bs.band").alias("band"), F.col("bs.sig").alias("sig")
        )
    )


def dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH candidate pairs via band-signature self-join — the band join is
    the only exchange besides the signature aggregation, on (band, sig)
    whose cardinality is ~4 rows/doc regardless of doc size: that is the
    100 TB path."""
    docs = load_table(spark, sf_dir, "documents", spread=True)
    return _lsh_candidate_pairs(_shingled(docs)).orderBy("doc_a", "doc_b")


def _lsh_candidate_pairs(sh_frame: DataFrame) -> DataFrame:
    """(doc_a, doc_b, n_shared_bands) LSH candidates from a shingle frame."""
    bands = minhash_band_table_from(sh_frame)
    # Self-join via shuffle-hash, NOT broadcast: with a broadcast join the
    # two sides have different exchange types, so Catalyst recomputes the
    # whole shingle->md5->minhash pipeline twice (the dominant CPU).  A
    # shuffle-hash join shuffles both (identical) sides on (band, sig) and
    # the second exchange becomes a ReusedExchange — signatures are computed
    # once.  Broadcasting the full signature table would also be the wrong
    # plan at scale.
    a, b = bands.alias("a"), bands.hint("shuffle_hash").alias("b")
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.sig") == F.col("b.sig"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .agg(F.count("*").alias("n_shared_bands"))
    )


# Shared CTE chain: text -> shingles -> Broder double hashing -> minhash
# signature -> band signatures.  The single source of SQL truth for every
# minhash oracle (the incremental cross-corpus query composes from it too)
# — edits to MINHASH_K/BAND_R/the mask apply everywhere at once.
MINHASH_BAND_CTES = f"""
WITH shingled AS ({_SHINGLES_SQL}),
exploded AS (
  SELECT doc_id, unnest(sh) AS sh FROM shingled WHERE len(sh) > 0
),
based AS (
  SELECT doc_id,
    ('0x' || substr(md5(sh), 1, 15))::BIGINT AS h1,
    ('0x' || substr(md5(sh), 17, 8))::BIGINT AS h2
  FROM exploded
),
hashed AS (
  SELECT doc_id, seed, (h1 + seed * h2) & {(1 << 60) - 1} AS h
  FROM based, (SELECT unnest(range({MINHASH_K})) AS seed)
),
sig AS (
  SELECT doc_id, seed, MIN(h) AS minh FROM hashed GROUP BY doc_id, seed
),
bands AS (
  SELECT doc_id, seed // {BAND_R} AS band,
         md5(string_agg(minh::VARCHAR, ',' ORDER BY seed)) AS sig
  FROM sig GROUP BY doc_id, seed // {BAND_R}
)"""

DEDUP_MINHASH_SQL = f"""{MINHASH_BAND_CTES}
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS n_shared_bands
FROM bands a JOIN bands b
  ON a.band = b.band AND a.sig = b.sig AND a.doc_id < b.doc_id
GROUP BY a.doc_id, b.doc_id
ORDER BY doc_a, doc_b
"""


# --------------------------------------------------------------------------
# SimHash signatures + near-dup pairs by hamming distance.
# --------------------------------------------------------------------------
def _simhash_signature(docs: DataFrame) -> DataFrame:
    toks = docs.select(
        "doc_id", F.explode(words(F.col("text"))).alias("tok")
    ).withColumn("h", hash60(F.col("tok")))
    votes = [
        F.sum(
            F.when(F.col("h").bitwiseAND(F.lit(1 << b)) != 0, 1).otherwise(-1)
        ).alias(f"w{b}")
        for b in range(SIMHASH_BITS)
    ]
    agg = toks.groupBy("doc_id").agg(*votes)
    sig = reduce(
        lambda acc, b: acc
        + F.when(F.col(f"w{b}") > 0, F.lit(1 << b)).otherwise(F.lit(0)),
        range(SIMHASH_BITS),
        F.lit(0).cast("long"),
    )
    return agg.select("doc_id", sig.alias("simhash"))


def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup pairs by simhash, hamming <= 3, via 4x15-bit pigeonhole
    bands (Manku et al., WWW'07 — reference dedup is an unrelated keyed
    reduce, StreamBigqueryChangeConsumer.java:207-223; this operator is the
    LLM-pipeline extension).

    Scale shape: candidate generation is an equi-join on (band_id,
    band_value) — shuffle-partitionable, output only colliding pairs — and
    pigeonhole makes it EXACT for hamming <= SIMHASH_MAX_HAMMING: a pair
    differing in <= 3 bits cannot differ in all 4 bands.  No cartesian
    anywhere; each side of the join is 4 rows per doc.
    """
    docs = load_table(spark, sf_dir, "documents", spread=True)
    sig = _simhash_signature(docs)
    mask = (1 << SIMHASH_BAND_BITS) - 1
    banded = sig.select(
        "doc_id",
        "simhash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(k).alias("band_id"),
                        F.shiftrightunsigned(
                            F.col("simhash"), k * SIMHASH_BAND_BITS
                        )
                        .bitwiseAND(F.lit(mask))
                        .alias("band_val"),
                    )
                    for k in range(SIMHASH_BANDS)
                ]
            )
        ).alias("band"),
    ).select("doc_id", "simhash", "band.band_id", "band.band_val")
    # No join hint: at small scale Catalyst broadcasts the (cheap) signature
    # table; past the broadcast threshold it picks SMJ, where the two
    # identical shuffled sides collapse into one ReusedExchange — the right
    # plan at both ends without forcing either.
    a, b = banded.alias("a"), banded.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band_id") == F.col("b.band_id"))
            & (F.col("a.band_val") == F.col("b.band_val"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.bit_count(
                F.col("a.simhash").bitwiseXOR(F.col("b.simhash"))
            ).alias("hamming"),
        )
        # a pair can collide in several bands — dedup candidates
        .distinct()
    )
    return cand.filter(F.col("hamming") <= SIMHASH_MAX_HAMMING).orderBy(
        "doc_a", "doc_b"
    )


_VOTES_SQL = ",\n    ".join(
    f"SUM(CASE WHEN (h & {1 << b}) <> 0 THEN 1 ELSE -1 END) AS w{b}"
    for b in range(SIMHASH_BITS)
)
_SIG_SQL = " + ".join(
    f"(CASE WHEN w{b} > 0 THEN {1 << b} ELSE 0 END)" for b in range(SIMHASH_BITS)
)

DEDUP_SIMHASH_SQL = f"""
WITH toks AS (
  SELECT doc_id, unnest(list_filter(string_split_regex(text, '\\s+'), t -> t <> '')) AS tok
  FROM documents
),
hashed AS (SELECT doc_id, {_hash60_sql("tok")} AS h FROM toks),
votes AS (
  SELECT doc_id,
    {_VOTES_SQL}
  FROM hashed GROUP BY doc_id
),
sig AS (SELECT doc_id, ({_SIG_SQL})::BIGINT AS simhash FROM votes),
banded AS (
  SELECT doc_id, simhash, k.band_id,
         (simhash >> (k.band_id * {SIMHASH_BAND_BITS})) & {(1 << SIMHASH_BAND_BITS) - 1} AS band_val
  FROM sig, (SELECT unnest(range({SIMHASH_BANDS})) AS band_id) k
)
SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
       CAST(bit_count(xor(a.simhash, b.simhash)) AS INTEGER) AS hamming
FROM banded a JOIN banded b
  ON a.band_id = b.band_id AND a.band_val = b.band_val AND a.doc_id < b.doc_id
WHERE bit_count(xor(a.simhash, b.simhash)) <= {SIMHASH_MAX_HAMMING}
ORDER BY doc_a, doc_b
"""


# --------------------------------------------------------------------------
# Exact n-gram Jaccard over the shingle inverted index.
# --------------------------------------------------------------------------
def dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact Jaccard over the stop-shingled inverted index.

    Scale guard: a shingle appearing in more than ``JACCARD_DF_CAP``
    documents is a stop-shingle — its posting list would contribute a
    quadratic number of candidate pairs while carrying no similarity signal
    (every boilerplate phrase co-shingles everything with everything).
    Dropping it bounds the self-join at |posting list| <= cap per shingle.
    Jaccard is then computed over the *filtered* shingle space in both
    engines (sizes come from the filtered index, not the raw arrays), so
    the Spark result and the DuckDB oracle stay value-identical.  The
    stop-shingle set is a tiny aggregate -> broadcast anti-join.
    """
    # stop_shingled_index shingles ONCE and hash-partitions the inverted
    # index on sh, so the doc-frequency aggregate, the stop-shingle
    # anti-join, sizes, and the postings self-join all hang off the SAME
    # exchange (ReusedExchange in the physical plan); the df-cap drops
    # mega-hot shingles with a scalable count aggregate before any
    # posting list forms.
    docs = load_table(spark, sf_dir, "documents", spread=True)
    return (
        _jaccard_scored_pairs(_shingled(docs))
        .select("doc_a", "doc_b", "n_shared", "jaccard")
        .orderBy("doc_a", "doc_b")
    )


def _jaccard_scored_pairs(sh_frame: DataFrame) -> DataFrame:
    """Threshold-filtered exact-Jaccard pairs from a shingle frame —
    the shareable body of :func:`dedup_ngram_jaccard` (also the exact
    ground-truth side of :func:`dedup_lsh_recall`)."""
    inv, sizes = stop_shingled_index_from(sh_frame)
    shared = shared_shingle_pairs(inv, symmetric=True)
    sa = sizes.select(F.col("doc_id").alias("doc_a"), F.col("n_sh").alias("n_a"))
    sb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("n_sh").alias("n_b"))
    return (
        shared.join(sa, "doc_a")
        .join(sb, "doc_b")
        .withColumn(
            "jaccard",
            F.round(
                F.col("n_shared").cast("double")
                / (F.col("n_a") + F.col("n_b") - F.col("n_shared")),
                6,
            ),
        )
        .filter(F.col("jaccard") >= JACCARD_THRESHOLD)
    )


# Shared SQL CTE fragment: the stop-shingled inverted index + per-doc
# sizes — the single SQL source matching stop_shingled_index(); composes
# after a `WITH shingled AS (...)` head.
_INV_CTES = f"""inv_all AS (SELECT doc_id, unnest(sh) AS sh FROM shingled),
stop AS (SELECT sh FROM inv_all GROUP BY sh HAVING COUNT(*) > {JACCARD_DF_CAP}),
inv AS (SELECT doc_id, sh FROM inv_all WHERE sh NOT IN (SELECT sh FROM stop)),
sizes AS (SELECT doc_id, COUNT(*) AS n_sh FROM inv GROUP BY doc_id)"""


DEDUP_JACCARD_SQL = f"""
WITH shingled AS ({_SHINGLES_SQL}),
{_INV_CTES},
shared AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS n_shared
  FROM inv a JOIN inv b ON a.sh = b.sh AND a.doc_id < b.doc_id
  GROUP BY a.doc_id, b.doc_id
)
SELECT doc_a, doc_b, n_shared,
  round(n_shared::DOUBLE / (sa.n_sh + sb.n_sh - n_shared), 6) AS jaccard
FROM shared
  JOIN sizes sa ON sa.doc_id = doc_a
  JOIN sizes sb ON sb.doc_id = doc_b
WHERE round(n_shared::DOUBLE / (sa.n_sh + sb.n_sh - n_shared), 6) >= {JACCARD_THRESHOLD}
ORDER BY doc_a, doc_b
"""


CONTAINMENT_THRESHOLD = 0.8


def stop_shingled_index(docs: DataFrame):
    """The shared exact-similarity substrate: (inv, sizes) where ``inv``
    is the stop-shingled inverted index (df-capped, sh-partitioned so
    every consumer reuses ONE exchange) and ``sizes`` the per-doc
    filtered shingle counts.  Single source of the index for Jaccard and
    containment — the df-cap/partitioning strategy lives here only."""
    return stop_shingled_index_from(_shingled(docs))


def stop_shingled_index_from(sh_frame: DataFrame):
    """Index from an existing exploded (doc_id, sh) shingle frame — the
    shareable half of :func:`stop_shingled_index`."""
    inv_all = sh_frame.repartition("sh")
    stop = (
        inv_all.groupBy("sh")
        .agg(F.count("*").alias("dfreq"))
        .filter(F.col("dfreq") > JACCARD_DF_CAP)
        .select("sh")
    )
    inv = inv_all.join(stop.hint("shuffle_hash"), "sh", "left_anti")
    sizes = inv.groupBy("doc_id").agg(F.count("*").alias("n_sh"))
    return inv, sizes


def shared_shingle_pairs(inv: DataFrame, symmetric: bool) -> DataFrame:
    """Posting-list self-join → (doc_a, doc_b, n_shared); ``symmetric``
    keeps only doc_a < doc_b, else all ordered pairs."""
    a, b = inv.alias("a"), inv.hint("shuffle_hash").alias("b")
    pair_cond = (
        (F.col("a.doc_id") < F.col("b.doc_id"))
        if symmetric
        else (F.col("a.doc_id") != F.col("b.doc_id"))
    )
    return (
        a.join(b, (F.col("a.sh") == F.col("b.sh")) & pair_cond)
        .groupBy(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .agg(F.count("*").alias("n_shared"))
    )


def dedup_containment_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Asymmetric near-dup detection: containment(A in B) =
    |shingles(A) ∩ shingles(B)| / |shingles(A)|.  Catches a short
    document embedded in a longer one — a quote, a copy with appended
    boilerplate — which symmetric Jaccard dilutes below threshold.
    Emitted per ORDERED pair (doc_a contained in doc_b, doc_a != doc_b),
    over the same stop-shingled inverted index and df-cap as the Jaccard
    query, so the posting-list self-join stays bounded at 100 TB."""
    docs = load_table(spark, sf_dir, "documents", spread=True)
    inv, sizes = stop_shingled_index(docs)
    shared = shared_shingle_pairs(inv, symmetric=False)
    sa = sizes.select(F.col("doc_id").alias("doc_a"), F.col("n_sh").alias("n_a"))
    return (
        shared.join(sa, "doc_a")
        .withColumn(
            "containment",
            F.round(F.col("n_shared").cast("double") / F.col("n_a"), 6),
        )
        .filter(F.col("containment") >= CONTAINMENT_THRESHOLD)
        .select("doc_a", "doc_b", "n_shared", "n_a", "containment")
        .orderBy("doc_a", "doc_b")
    )


DEDUP_CONTAINMENT_SQL = f"""
WITH shingled AS ({_SHINGLES_SQL}),
{_INV_CTES},
shared AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS n_shared
  FROM inv a JOIN inv b ON a.sh = b.sh AND a.doc_id <> b.doc_id
  GROUP BY a.doc_id, b.doc_id
)
SELECT doc_a, doc_b, n_shared, sa.n_sh AS n_a,
  round(n_shared::DOUBLE / sa.n_sh, 6) AS containment
FROM shared JOIN sizes sa ON sa.doc_id = doc_a
WHERE round(n_shared::DOUBLE / sa.n_sh, 6) >= {CONTAINMENT_THRESHOLD}
ORDER BY doc_a, doc_b
"""


def cross_source_dup_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Where does duplication FLOW between sources?  Near-dup candidate
    pairs (banded MinHash) aggregated by the unordered pair of their
    documents' sources — the report that tells a curation team which
    crawls/feeds re-ingest each other's content (high off-diagonal mass =
    cross-source copying; diagonal = within-source boilerplate).  Reuses
    the LSH pair generator verbatim plus two doc-keyed joins to attach
    sources; output is O(sources²)."""
    pairs = dedup_minhash_lsh(spark, sf_dir).select("doc_a", "doc_b")
    src = load_table(spark, sf_dir, "documents").select("doc_id", "source")
    sa = src.select(F.col("doc_id").alias("doc_a"), F.col("source").alias("sa"))
    sb = src.select(F.col("doc_id").alias("doc_b"), F.col("source").alias("sb"))
    return (
        pairs.join(sa, "doc_a")
        .join(sb, "doc_b")
        .select(
            F.least("sa", "sb").alias("source_a"),
            F.greatest("sa", "sb").alias("source_b"),
        )
        .groupBy("source_a", "source_b")
        .agg(F.count("*").alias("n_pairs"))
        .orderBy("source_a", "source_b")
    )


CROSS_SOURCE_DUP_SQL = f"""{MINHASH_BAND_CTES},
cand AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM bands a JOIN bands b
    ON a.band = b.band AND a.sig = b.sig AND a.doc_id < b.doc_id
  GROUP BY a.doc_id, b.doc_id
)
SELECT least(da.source, db.source) AS source_a,
  greatest(da.source, db.source) AS source_b,
  COUNT(*) AS n_pairs
FROM cand
  JOIN documents da ON da.doc_id = cand.doc_a
  JOIN documents db ON db.doc_id = cand.doc_b
GROUP BY 1, 2 ORDER BY source_a, source_b
"""


def dedup_lsh_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality evaluation of the banded-MinHash index: of the TRUE
    near-dup pairs (exact capped-index Jaccard >= threshold), what
    fraction does LSH banding surface as candidates — and how precise is
    the candidate set at that threshold?  One row: counts + recall +
    candidate precision.  The measurement every dedup deployment needs
    before trusting the approximate path; the ann_ivf_recall analog for
    text.

    Scale note: composes the two pair generators (both already
    bucketed/df-capped — no new join shape); at corpus scale this is an
    audit query to run over a sampled slice, since the ground-truth side
    is the expensive exact index.  Round-7 plan fix: the shingle frame is
    built ONCE so the exact-truth index and the LSH bands share one
    substrate instead of each re-scanning + re-shingling the corpus, and
    each pair set is shared because it feeds both its own count and the
    hit semi-join — this roughly halved the query's exchange/scan counts
    (see docs/PLAN_SUMMARY.md).  Round 8 swapped the sharing mechanism
    from ``persist()`` to scratch-parquet checkpoints: same single-build
    guarantee, but nothing is left in the session cache after the query
    materializes (the LM queries' cache-lifetime fix, applied family-wide)."""
    docs = load_table(spark, sf_dir, "documents", spread=True)
    sh_frame = checkpoint_parquet(_shingled(docs), "dsbq_lsh_sh_")
    truth = checkpoint_parquet(
        _jaccard_scored_pairs(sh_frame).select("doc_a", "doc_b"), "dsbq_lsh_truth_"
    )
    cand = checkpoint_parquet(
        _lsh_candidate_pairs(sh_frame).select("doc_a", "doc_b"), "dsbq_lsh_cand_"
    )
    hit = truth.join(cand, ["doc_a", "doc_b"], "left_semi")
    return (
        truth.agg(F.count("*").alias("n_truth"))
        .crossJoin(cand.agg(F.count("*").alias("n_candidates")))
        .crossJoin(hit.agg(F.count("*").alias("n_hit")))
        .select(
            "n_truth",
            "n_candidates",
            "n_hit",
            F.round(
                F.try_divide(F.col("n_hit").cast("double"), F.col("n_truth")), 6
            ).alias("recall"),
            F.round(
                F.try_divide(
                    F.col("n_hit").cast("double"), F.col("n_candidates")
                ),
                6,
            ).alias("precision"),
        )
    )


DEDUP_LSH_RECALL_SQL = f"""{MINHASH_BAND_CTES},
{_INV_CTES},
shared AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS n_shared
  FROM inv a JOIN inv b ON a.sh = b.sh AND a.doc_id < b.doc_id
  GROUP BY a.doc_id, b.doc_id
),
truth AS (
  SELECT doc_a, doc_b FROM shared
    JOIN sizes sa ON sa.doc_id = doc_a
    JOIN sizes sb ON sb.doc_id = doc_b
  WHERE round(n_shared::DOUBLE / (sa.n_sh + sb.n_sh - n_shared), 6)
    >= {JACCARD_THRESHOLD}
),
cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM bands a JOIN bands b
    ON a.band = b.band AND a.sig = b.sig AND a.doc_id < b.doc_id
),
hit AS (SELECT doc_a, doc_b FROM truth INTERSECT SELECT doc_a, doc_b FROM cand)
SELECT
  (SELECT COUNT(*) FROM truth) AS n_truth,
  (SELECT COUNT(*) FROM cand) AS n_candidates,
  (SELECT COUNT(*) FROM hit) AS n_hit,
  round((SELECT COUNT(*) FROM hit)::DOUBLE
    / NULLIF((SELECT COUNT(*) FROM truth), 0), 6) AS recall,
  round((SELECT COUNT(*) FROM hit)::DOUBLE
    / NULLIF((SELECT COUNT(*) FROM cand), 0), 6) AS precision
"""


QUERIES = {
    "dedup_exact": dedup_exact,
    "dup_cluster_size_histogram": dup_cluster_size_histogram,
    "dedup_minhash_lsh": dedup_minhash_lsh,
    "dedup_simhash": dedup_simhash,
    "dedup_ngram_jaccard": dedup_ngram_jaccard,
    "dedup_containment_pairs": dedup_containment_pairs,
    "cross_source_dup_matrix": cross_source_dup_matrix,
    "dedup_lsh_recall": dedup_lsh_recall,
}

ORACLES = {
    "dedup_exact": DEDUP_EXACT_SQL,
    "dup_cluster_size_histogram": DUP_CLUSTER_HIST_SQL,
    "dedup_minhash_lsh": DEDUP_MINHASH_SQL,
    "dedup_simhash": DEDUP_SIMHASH_SQL,
    "dedup_ngram_jaccard": DEDUP_JACCARD_SQL,
    "dedup_containment_pairs": DEDUP_CONTAINMENT_SQL,
    "cross_source_dup_matrix": CROSS_SOURCE_DUP_SQL,
    "dedup_lsh_recall": DEDUP_LSH_RECALL_SQL,
}


def dedup_exact_keep_priority_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Policy-based survivor selection for exact dedup: instead of plain
    keep-first (``dedup_exact``'s min doc_id), each content-hash cluster
    keeps the copy from the HIGHEST-PRIORITY source (the declared mirror
    order — here the lexicographic source rank stands in for a curation
    team's priority list), doc_id ascending as the final tiebreak.  Any
    TEXT-derived score is constant within an exact-dup cluster by
    definition, so a meaningful survivor policy must rank METADATA —
    which mirror, which snapshot — and this is that operator.  Output is
    the per-keeper-source policy summary with the cross-source cluster
    count (the only clusters where the policy differs from keep-first).

    Scale design: ONE min_by-style struct-min aggregate per content hash
    (map-side combinable — no window, no self-join), then an O(sources)
    rollup.  Deterministic: both engines take the field-wise MIN of the
    (source, doc_id) struct — the same lexicographic order."""
    docs = load_table(spark, sf_dir, "documents", spread=True)
    hashed = docs.select(
        "doc_id", "source", F.md5("text").alias("text_hash")
    )
    best = hashed.groupBy("text_hash").agg(
        F.min(
            F.struct(
                F.col("source").alias("keeper_source"),
                F.col("doc_id").alias("keeper_id"),
            )
        ).alias("b"),
        F.count(F.lit(1)).cast("long").alias("n_copies"),
        F.countDistinct("source").cast("long").alias("n_sources"),
    )
    return (
        best.select(
            F.col("b.keeper_source").alias("keeper_source"),
            "n_copies",
            "n_sources",
        )
        .groupBy("keeper_source")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_clusters"),
            F.sum(F.col("n_copies") - 1).cast("long").alias("n_dropped"),
            F.sum((F.col("n_sources") > 1).cast("long"))
            .cast("long")
            .alias("n_cross_source_clusters"),
        )
        .orderBy("keeper_source")
    )


DEDUP_KEEP_PRIORITY_SQL = """
WITH hashed AS (
  SELECT doc_id, source, md5(text) AS text_hash FROM documents
),
best AS (
  SELECT text_hash,
    min(struct_pack(keeper_source := source, keeper_id := doc_id)) AS b,
    CAST(COUNT(*) AS BIGINT) AS n_copies,
    CAST(COUNT(DISTINCT source) AS BIGINT) AS n_sources
  FROM hashed GROUP BY text_hash
)
SELECT b.keeper_source AS keeper_source,
  CAST(COUNT(*) AS BIGINT) AS n_clusters,
  CAST(SUM(n_copies - 1) AS BIGINT) AS n_dropped,
  CAST(SUM(CASE WHEN n_sources > 1 THEN 1 ELSE 0 END) AS BIGINT)
    AS n_cross_source_clusters
FROM best GROUP BY b.keeper_source ORDER BY keeper_source
"""

QUERIES["dedup_exact_keep_priority_source"] = dedup_exact_keep_priority_source
ORACLES["dedup_exact_keep_priority_source"] = DEDUP_KEEP_PRIORITY_SQL


_SENS_THRESHOLDS = ("0.5", "0.6", "0.7", "0.8", "0.9")


def dedup_threshold_sensitivity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dedup-policy sensitivity curve: for each candidate containment
    threshold, how many near-dup pairs fire and how many distinct
    documents would be dropped (the contained side) — the one-page
    answer to "what does moving the knob from 0.7 to 0.9 cost?".

    Scale design: the df-capped posting self-join builds the scored
    pair set ONCE and materializes it to a scratch-parquet checkpoint
    (the shared-substrate rule); the per-threshold numbers then come
    from two bucketed aggregates over the checkpoint — pair counts roll
    up additively across buckets, and the distinct-doc counts roll up
    via each doc's MAX containment (distinct is not bucket-additive;
    the max is) — with a bounded triangular join over the ≤6-bucket
    frame.  No threshold rescans the candidate join."""
    from debezium_server_bigquery_spark.sources.tables import (
        checkpoint_parquet,
    )

    docs = load_table(spark, sf_dir, "documents", spread=True)
    inv, sizes = stop_shingled_index(docs)
    shared = shared_shingle_pairs(inv, symmetric=False)
    sa = sizes.select(F.col("doc_id").alias("doc_a"), F.col("n_sh").alias("n_a"))
    scored = checkpoint_parquet(
        shared.join(sa, "doc_a").select(
            "doc_a",
            F.round(F.col("n_shared").cast("double") / F.col("n_a"), 6).alias(
                "containment"
            ),
        ),
        "dsbq_sens_",
    )
    idx_of = lambda c: sum(  # noqa: E731
        (c >= float(t)).cast("int") for t in _SENS_THRESHOLDS
    )
    pair_b = scored.select(idx_of(F.col("containment")).alias("idx")).groupBy(
        "idx"
    ).agg(F.count(F.lit(1)).cast("long").alias("n_pairs"))
    doc_b = (
        scored.groupBy("doc_a")
        .agg(F.max("containment").alias("mx"))
        .select(idx_of(F.col("mx")).alias("idx"))
        .groupBy("idx")
        .agg(F.count(F.lit(1)).cast("long").alias("n_docs"))
    )
    ladder = None
    for k, t in enumerate(_SENS_THRESHOLDS, start=1):
        row_p = pair_b.filter(F.col("idx") >= k).agg(
            F.coalesce(F.sum("n_pairs"), F.lit(0)).cast("long").alias("n_pairs")
        )
        row_d = doc_b.filter(F.col("idx") >= k).agg(
            F.coalesce(F.sum("n_docs"), F.lit(0))
            .cast("long")
            .alias("n_docs_dropped")
        )
        row = row_p.crossJoin(row_d).select(
            F.lit(float(t)).alias("threshold"), "n_pairs", "n_docs_dropped"
        )
        ladder = row if ladder is None else ladder.unionAll(row)
    return ladder.orderBy("threshold")


def _sens_sql_full() -> str:
    idx = " + ".join(
        f"CASE WHEN containment >= {t} THEN 1 ELSE 0 END"
        for t in _SENS_THRESHOLDS
    )
    idx_mx = " + ".join(
        f"CASE WHEN mx >= {t} THEN 1 ELSE 0 END" for t in _SENS_THRESHOLDS
    )
    selects = "\nUNION ALL\n".join(
        f"""SELECT CAST({t} AS DOUBLE) AS threshold,
  (SELECT CAST(COALESCE(SUM(n_pairs), 0) AS BIGINT)
   FROM pair_b WHERE idx >= {k}) AS n_pairs,
  (SELECT CAST(COALESCE(SUM(n_docs), 0) AS BIGINT)
   FROM doc_b WHERE idx >= {k}) AS n_docs_dropped"""
        for k, t in enumerate(_SENS_THRESHOLDS, start=1)
    )
    return f"""
WITH shingled AS ({_SHINGLES_SQL}),
{_INV_CTES},
shared AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS n_shared
  FROM inv a JOIN inv b ON a.sh = b.sh AND a.doc_id <> b.doc_id
  GROUP BY a.doc_id, b.doc_id
),
scored AS MATERIALIZED (
  SELECT doc_a,
    round(n_shared::DOUBLE / sa.n_sh, 6) AS containment
  FROM shared JOIN sizes sa ON sa.doc_id = doc_a
),
pair_b AS MATERIALIZED (
  SELECT ({idx}) AS idx, CAST(COUNT(*) AS BIGINT) AS n_pairs
  FROM scored GROUP BY 1
),
doc_b AS MATERIALIZED (
  SELECT ({idx_mx}) AS idx, CAST(COUNT(*) AS BIGINT) AS n_docs
  FROM (SELECT doc_a, MAX(containment) AS mx FROM scored GROUP BY doc_a)
  GROUP BY 1
)
{selects}
ORDER BY threshold
"""


DEDUP_SENSITIVITY_SQL = _sens_sql_full()

QUERIES["dedup_threshold_sensitivity"] = dedup_threshold_sensitivity
ORACLES["dedup_threshold_sensitivity"] = DEDUP_SENSITIVITY_SQL
