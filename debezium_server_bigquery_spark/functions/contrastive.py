"""Contrastive triplet mining over the embeddings table.

Embedding-model training (and hard-negative finetuning of retrievers)
consumes (anchor, positive, negative) triplets.  Mining them at corpus
scale is exactly the bucketed-similarity problem the ANN family already
solves, composed with a deterministic negative draw:

- **positive** — the anchor's best candidate from the OR-of-ANDs
  hyperplane band join (similarity.py's neardup machinery): candidates
  come only from band equi-joins, never an all-pairs scan, and the
  per-anchor argmax is a map-side-combinable ``max(struct(...))`` — no
  window.  Anchors with no band collision yield no triplet (the standard
  LSH recall trade; raise the band count for coverage).
- **negative** — a uniform pseudo-random draw by the cross-engine
  md5-derived hash of the anchor id, modulo the id range; draws that
  miss a real id (sparse spaces) or land on the anchor/positive drop the
  triplet rather than bias it.  At 100 TB the draw is an equi-join on
  the drawn id against the (id-partitioned) corpus — one shuffle.

Determinism: candidate ranking uses the ROUNDED cosine (6 dp) with an
id tie-break, and every emitted float is a rounded deterministic fold —
same conventions as the rest of the similarity family.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from debezium_server_bigquery_spark.functions.dedup_fuzzy import _hash60_sql, hash60
from debezium_server_bigquery_spark.functions.similarity import (
    _dot_sql,
    banded_cte_sql,
    banded_embeddings,
    cosine,
    with_norm,
)
from debezium_server_bigquery_spark.sources.tables import load_table


def contrastive_triplets(spark: SparkSession, sf_dir: str) -> DataFrame:
    raw = load_table(spark, sf_dir, "embeddings", spread=True)
    dim = len(raw.select("embedding").head()["embedding"])
    emb = with_norm(raw)
    banded = banded_embeddings(emb, dim)  # shared LSH banding (similarity.py)
    a, b = banded.alias("a"), banded.alias("b")
    cos = cosine(
        F.col("a.embedding"), F.col("b.embedding"), F.col("a.norm"), F.col("b.norm")
    )
    # both directions (!=, not <): every anchor sees all its band peers
    cand = a.join(
        b,
        (F.col("a.band_id") == F.col("b.band_id"))
        & (F.col("a.bucket") == F.col("b.bucket"))
        & (F.col("a.vec_id") != F.col("b.vec_id")),
    ).select(
        F.col("a.vec_id").alias("anchor_id"),
        F.col("b.vec_id").alias("cand_id"),
        F.round(cos, 6).alias("cos"),
    )
    best_pos = (
        cand.groupBy("anchor_id")
        .agg(F.max(F.struct(F.col("cos"), (-F.col("cand_id")).alias("neg_c"))).alias("m"))
        .select(
            "anchor_id",
            (-F.col("m.neg_c")).alias("pos_id"),
            F.col("m.cos").alias("pos_cos"),
        )
    )
    rng = emb.agg(F.max("vec_id").alias("max_id"))
    drawn = best_pos.crossJoin(F.broadcast(rng)).withColumn(
        "neg_id",
        F.pmod(hash60(F.concat(F.lit("neg:"), F.col("anchor_id").cast("string"))),
               F.col("max_id") + 1),
    )
    anc = emb.select(
        F.col("vec_id").alias("anchor_id"),
        F.col("embedding").alias("a_emb"),
        F.col("norm").alias("a_norm"),
    )
    neg = emb.select(
        F.col("vec_id").alias("neg_id"),
        F.col("embedding").alias("n_emb"),
        F.col("norm").alias("n_norm"),
    )
    out = (
        drawn.join(anc, "anchor_id")
        .join(neg, "neg_id")  # inner: a drawn id missing from the corpus drops
        .filter(
            (F.col("neg_id") != F.col("anchor_id"))
            & (F.col("neg_id") != F.col("pos_id"))
        )
        .select(
            "anchor_id",
            "pos_id",
            "neg_id",
            "pos_cos",
            F.round(
                cosine(
                    F.col("a_emb"), F.col("n_emb"), F.col("a_norm"), F.col("n_norm")
                ),
                6,
            ).alias("neg_cos"),
        )
    )
    return out.select(
        "anchor_id",
        "pos_id",
        "neg_id",
        "pos_cos",
        "neg_cos",
        F.round(F.col("pos_cos") - F.col("neg_cos"), 6).alias("margin"),
    ).orderBy("anchor_id")


def _build_triplets_sql() -> str:
    neg_hash = _hash60_sql("'neg:' || CAST(anchor_id AS VARCHAR)")
    return f"""
WITH {banded_cte_sql()},
cand AS (
  SELECT DISTINCT a.vec_id AS anchor_id, b.vec_id AS cand_id,
    round({_dot_sql("a.embedding", "b.embedding")} / (a.norm * b.norm), 6) AS cos
  FROM banded a JOIN banded b
    ON a.band_id = b.band_id AND a.bucket = b.bucket AND a.vec_id <> b.vec_id
),
best AS (
  SELECT anchor_id, cand_id AS pos_id, cos AS pos_cos
  FROM (
    SELECT *, ROW_NUMBER() OVER (
        PARTITION BY anchor_id ORDER BY cos DESC, cand_id ASC) AS rn
    FROM cand
  ) WHERE rn = 1
),
drawn AS (
  SELECT best.*, {neg_hash} % ((SELECT MAX(vec_id) FROM embeddings) + 1) AS neg_id
  FROM best
)
SELECT d.anchor_id, d.pos_id, d.neg_id, d.pos_cos,
  round({_dot_sql("a.embedding", "n.embedding")} / (a.norm * n.norm), 6) AS neg_cos,
  round(d.pos_cos
    - round({_dot_sql("a.embedding", "n.embedding")} / (a.norm * n.norm), 6), 6) AS margin
FROM drawn d
JOIN normed a ON a.vec_id = d.anchor_id
JOIN normed n ON n.vec_id = d.neg_id
WHERE d.neg_id <> d.anchor_id AND d.neg_id <> d.pos_id
ORDER BY d.anchor_id
"""


TRIPLETS_SQL = _build_triplets_sql()

QUERIES = {"contrastive_triplets": contrastive_triplets}
ORACLES = {"contrastive_triplets": TRIPLETS_SQL}
