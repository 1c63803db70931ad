"""Record linkage: token-blocking + edit-distance verification.

Entity resolution over free-text names is the classic blocking problem:
all-pairs edit distance is O(n²) and impossible at 100 TB, so candidate
pairs are generated only where two names share a *blocking key* — here,
any whitespace token whose document frequency is under a cap — and the
expensive verifier (Levenshtein) runs only on those candidates.  This is
the same df-capped posting-list shape as the n-gram/span dedup family
(functions/spans.py), applied to the entity-matching problem:

- candidate volume is bounded by Σ df² over capped tokens (≤ DF_CAP² per
  token), never |names|²;
- the posting self-join is an equi-join on the token, so it hash-
  partitions and both sides reuse the same scan (ReusedExchange);
- Levenshtein is a JVM built-in on both engines (codegen'd in Spark,
  native in DuckDB) — no Python in the loop.

Two registered queries:

- ``entity_match_part_names`` — the matcher: distinct part-name pairs
  that share a capped token AND pass the edit-distance gate, with a
  normalized similarity and each name's part count (how many rows each
  side of the merge would touch).
- ``entity_blocking_stats`` — the cost audit: the block-size histogram
  of the token blocking, with the candidate-pair count each block size
  contributes (n_blocks × C(size, 2)) and the number of tokens dropped
  by the df cap.  This is the query a data engineer runs BEFORE the
  matcher at a new scale: the pair total it reports is the matcher's
  exact join cardinality, so quadratic blow-ups are visible as a report
  row instead of a dead executor.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from debezium_server_bigquery_spark.sources.tables import load_table

DF_CAP = 64  # tokens appearing in more distinct names than this don't block
MAX_LEV = 4  # verifier gate: edit distance above this is not a match


def _name_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(name, n_parts, tok): distinct whitespace tokens per distinct name."""
    part = load_table(spark, sf_dir, "part")
    names = part.groupBy(F.col("p_name").alias("name")).agg(
        F.count(F.lit(1)).alias("n_parts")
    )
    return names.select(
        "name",
        "n_parts",
        F.explode(F.split("name", " ")).alias("tok"),
    ).filter(F.length("tok") > 0).distinct()


def _capped_postings(toks: DataFrame) -> DataFrame:
    """Postings restricted to tokens under the blocking df cap."""
    tok_df = (
        toks.groupBy("tok")
        .agg(F.count_distinct("name").alias("df"))
        .filter(F.col("df") <= DF_CAP)
    )
    return toks.join(tok_df, "tok")


def entity_match_part_names(spark: SparkSession, sf_dir: str) -> DataFrame:
    toks = _name_tokens(spark, sf_dir)
    post = _capped_postings(toks)
    a = post.select(
        F.col("tok"),
        F.col("name").alias("name_a"),
        F.col("n_parts").alias("parts_a"),
    )
    b = post.select(
        F.col("tok"),
        F.col("name").alias("name_b"),
        F.col("n_parts").alias("parts_b"),
    )
    cand = (
        a.join(b, "tok")
        .filter(F.col("name_a") < F.col("name_b"))
        .select("name_a", "parts_a", "name_b", "parts_b")
        .distinct()
    )
    lev = F.levenshtein("name_a", "name_b")
    return (
        cand.withColumn("lev", lev.cast("int"))
        .filter(
            (F.col("lev") <= MAX_LEV)
            & (F.col("lev") < F.least(F.length("name_a"), F.length("name_b")))
        )
        .select(
            "name_a",
            "name_b",
            "lev",
            F.round(
                F.lit(1.0)
                - F.col("lev")
                / F.greatest(F.length("name_a"), F.length("name_b")).cast(
                    "double"
                ),
                6,
            ).alias("sim"),
            "parts_a",
            "parts_b",
        )
        .orderBy("name_a", "name_b")
    )


ENTITY_MATCH_SQL = f"""
WITH names AS (
  SELECT p_name AS name, COUNT(*) AS n_parts FROM part GROUP BY p_name
),
toks AS (
  SELECT DISTINCT n.name, n.n_parts, t.tok
  FROM names n, unnest(string_split(n.name, ' ')) AS t(tok)
  WHERE length(t.tok) > 0
),
tok_df AS (
  SELECT tok FROM toks GROUP BY tok
  HAVING COUNT(DISTINCT name) <= {DF_CAP}
),
post AS (SELECT t.* FROM toks t JOIN tok_df USING (tok)),
cand AS (
  SELECT DISTINCT a.name AS name_a, a.n_parts AS parts_a,
                  b.name AS name_b, b.n_parts AS parts_b
  FROM post a JOIN post b ON a.tok = b.tok AND a.name < b.name
)
SELECT name_a, name_b,
  CAST(levenshtein(name_a, name_b) AS INTEGER) AS lev,
  round(1.0 - levenshtein(name_a, name_b)::DOUBLE
             / greatest(length(name_a), length(name_b)), 6) AS sim,
  parts_a, parts_b
FROM cand
WHERE levenshtein(name_a, name_b) <= {MAX_LEV}
  AND levenshtein(name_a, name_b) < least(length(name_a), length(name_b))
ORDER BY name_a, name_b
"""


def entity_blocking_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Block-size histogram of the token blocking + df-cap drop count.

    One extra row (block_size = NULL→ reported as 0 via the dropped
    marker) would be ambiguous, so dropped tokens are reported as a
    separate block_size = -1 row with candidate_pairs = 0: the audit is a
    single result table the driver can hash.
    """
    toks = _name_tokens(spark, sf_dir)
    sizes = toks.groupBy("tok").agg(F.count_distinct("name").alias("df"))
    kept = (
        sizes.filter(F.col("df") <= DF_CAP)
        .groupBy(F.col("df").alias("block_size"))
        .agg(F.count(F.lit(1)).alias("n_blocks"))
        .withColumn(
            "candidate_pairs",
            (
                F.col("n_blocks")
                * F.col("block_size")
                * (F.col("block_size") - 1)
                / 2
            ).cast("long"),
        )
    )
    dropped = (
        sizes.filter(F.col("df") > DF_CAP)
        .agg(F.count(F.lit(1)).alias("n_blocks"))
        .select(
            F.lit(-1).cast("long").alias("block_size"),
            F.col("n_blocks"),
            F.lit(0).cast("long").alias("candidate_pairs"),
        )
        .filter(F.col("n_blocks") > 0)
    )
    return (
        kept.select(
            F.col("block_size").cast("long"),
            "n_blocks",
            "candidate_pairs",
        )
        .unionByName(dropped)
        .orderBy("block_size")
    )


ENTITY_BLOCKING_SQL = f"""
WITH names AS (
  SELECT p_name AS name, COUNT(*) AS n_parts FROM part GROUP BY p_name
),
toks AS (
  SELECT DISTINCT n.name, t.tok
  FROM names n, unnest(string_split(n.name, ' ')) AS t(tok)
  WHERE length(t.tok) > 0
),
sizes AS (SELECT tok, COUNT(DISTINCT name) AS df FROM toks GROUP BY tok),
kept AS (
  SELECT CAST(df AS BIGINT) AS block_size,
         COUNT(*) AS n_blocks,
         CAST(COUNT(*) * df * (df - 1) / 2 AS BIGINT) AS candidate_pairs
  FROM sizes WHERE df <= {DF_CAP} GROUP BY df
),
dropped AS (
  SELECT CAST(-1 AS BIGINT) AS block_size,
         COUNT(*) AS n_blocks,
         CAST(0 AS BIGINT) AS candidate_pairs
  FROM sizes WHERE df > {DF_CAP}
  HAVING COUNT(*) > 0
)
SELECT * FROM kept UNION ALL SELECT * FROM dropped
ORDER BY block_size
"""


QUERIES = {
    "entity_match_part_names": entity_match_part_names,
    "entity_blocking_stats": entity_blocking_stats,
}

ORACLES = {
    "entity_match_part_names": ENTITY_MATCH_SQL,
    "entity_blocking_stats": ENTITY_BLOCKING_SQL,
}


def entity_reciprocal_best_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reciprocal-best-match filtering over the blocked candidate pairs:
    a pair survives only if each name is the OTHER's single best match
    (lowest edit distance, lexicographic tiebreak) — the classic
    high-precision cut for unsupervised record linkage (one-sided best
    matches chain A→B→C through hub names; mutual bests cannot).

    Scale design (100 TB): candidates come from the same df-capped token
    postings as ``entity_match_part_names`` (never all-pairs); per-name
    argmin is ONE struct-MIN aggregate (map-side combinable) over the
    symmetrized pair list, and mutuality is an equi-join of the
    |names|-sized best table with itself on (name, best) = (best, name).
    Both engines take the field-wise struct minimum, so tie handling is
    identical."""
    toks = _name_tokens(spark, sf_dir)
    post = _capped_postings(toks)
    a = post.select(F.col("tok"), F.col("name").alias("name_a"))
    b = post.select(F.col("tok"), F.col("name").alias("name_b"))
    cand = (
        a.join(b, "tok")
        .filter(F.col("name_a") != F.col("name_b"))
        .select("name_a", "name_b")
        .distinct()
    )
    lev = F.levenshtein("name_a", "name_b")
    scored = cand.withColumn("lev", lev.cast("int")).filter(
        (F.col("lev") <= MAX_LEV)
        & (F.col("lev") < F.least(F.length("name_a"), F.length("name_b")))
    )
    best = scored.groupBy("name_a").agg(
        F.min(F.struct(F.col("lev"), F.col("name_b").alias("best"))).alias("b")
    ).select(
        F.col("name_a").alias("name"),
        F.col("b.best").alias("best"),
        F.col("b.lev").alias("lev"),
    )
    b2 = best.select(
        F.col("name").alias("r_name"), F.col("best").alias("r_best")
    )
    return (
        best.join(
            b2,
            (F.col("best") == F.col("r_name"))
            & (F.col("r_best") == F.col("name")),
        )
        .filter(F.col("name") < F.col("best"))
        .select(
            F.col("name").alias("name_a"),
            F.col("best").alias("name_b"),
            "lev",
            F.round(
                F.lit(1.0)
                - F.col("lev")
                / F.greatest(F.length("name"), F.length("best")).cast("double"),
                6,
            ).alias("sim"),
        )
        .orderBy("name_a", "name_b")
    )


ENTITY_RBM_SQL = f"""
WITH names AS (
  SELECT p_name AS name, COUNT(*) AS n_parts FROM part GROUP BY p_name
),
toks AS (
  SELECT DISTINCT n.name, t.tok
  FROM names n, unnest(string_split(n.name, ' ')) AS t(tok)
  WHERE length(t.tok) > 0
),
tok_df AS (
  SELECT tok FROM toks GROUP BY tok
  HAVING COUNT(DISTINCT name) <= {DF_CAP}
),
capped AS (SELECT t.* FROM toks t JOIN tok_df USING (tok)),
cand AS (
  SELECT DISTINCT a.name AS name_a, b.name AS name_b
  FROM capped a JOIN capped b ON a.tok = b.tok
  WHERE a.name <> b.name
),
scored AS (
  SELECT name_a, name_b, CAST(levenshtein(name_a, name_b) AS INTEGER) AS lev
  FROM cand
  WHERE levenshtein(name_a, name_b) <= {MAX_LEV}
    AND levenshtein(name_a, name_b) < least(length(name_a), length(name_b))
),
best AS (
  SELECT name_a AS name,
    min(struct_pack(lev := lev, best := name_b)) AS b
  FROM scored GROUP BY name_a
),
flat AS (SELECT name, b.best AS best, b.lev AS lev FROM best)
SELECT f.name AS name_a, f.best AS name_b, f.lev,
  round(1.0 - f.lev::DOUBLE / greatest(length(f.name), length(f.best)), 6)
    AS sim
FROM flat f JOIN flat g ON f.best = g.name AND g.best = f.name
WHERE f.name < f.best
ORDER BY name_a, name_b
"""

QUERIES["entity_reciprocal_best_match"] = entity_reciprocal_best_match
ORACLES["entity_reciprocal_best_match"] = ENTITY_RBM_SQL
