"""Embedding covariance + PCA — the dimensionality-reduction prep step of
an embedding-curation pipeline (whitening, compression ahead of ANN).

Two layers:

- :func:`embedding_covariance` / the ``embedding_covariance_upper`` query —
  the d×d covariance matrix of the embedding column as a DataFrame of
  (i, j, cov) upper-triangle entries, computed fully distributed.
- :func:`pca_project` — given the covariance (O(d²) = metadata, collected
  once), eigendecompose on the driver with numpy and project embeddings
  onto the top components as array columns.  Eigenvectors are
  LAPACK-dependent (sign/degenerate-subspace ambiguity), so the
  projection is a tested library function, not a hash-gated registry
  query.

Scale design (100 TB): each row expands to its d(d+1)/2 upper-triangle
products via one in-JVM ``transform``/``flatten``/``explode`` — a narrow
per-row fan-out with NO join and NO shuffle before aggregation; the
following groupBy(i, j) partially aggregates map-side, so every partition
ships at most d(d+1)/2 rows (2080 for d=64) regardless of row count —
the same shuffle volume as tiled Gram-matrix accumulation.  Means ride
the same explode.  Nothing corpus-sized is ever collected; the only
driver data is the d×d matrix itself.

Cross-engine determinism: float×float is widened to double BEFORE the
product (exact: 24-bit mantissas multiply into 53 bits), each product is
cast to DECIMAL(38,20) so the sum is exact and associative (the
functions/graph.py pattern), and the final covariance is a fixed double
expression over those exact sums, rounded for output.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from debezium_server_bigquery_spark.sources.tables import load_table

ROUND_DIGITS = 10

_PAIR_PRODUCTS = """
explode(flatten(transform(sequence(1, size(embedding)), i ->
  transform(sequence(i, size(embedding)), j ->
    struct(i as i, j as j,
      cast(element_at(embedding, i) as double)
        * cast(element_at(embedding, j) as double) as xy)))))
"""


def embedding_covariance(emb: DataFrame) -> DataFrame:
    """(i, j, cov) for 1 <= i <= j <= d — population covariance
    cov(i,j) = E[x_i x_j] - E[x_i]E[x_j] over the embedding column."""
    n_mean = (
        emb.select(F.posexplode("embedding").alias("k", "x"))
        .select((F.col("k") + 1).alias("k"), F.col("x").cast("double").alias("x"))
        .groupBy("k")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.col("x").cast("decimal(38,20)")).alias("sx"),
        )
        .select("k", "n", (F.col("sx").cast("double") / F.col("n")).alias("mu"))
    )
    prods = (
        emb.select(F.expr(_PAIR_PRODUCTS).alias("p"))
        .select("p.i", "p.j", "p.xy")
        .groupBy("i", "j")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.col("xy").cast("decimal(38,20)")).alias("sxy"),
        )
    )
    mi = n_mean.select(F.col("k").alias("i"), F.col("mu").alias("mu_i"))
    mj = n_mean.select(F.col("k").alias("j"), F.col("mu").alias("mu_j"))
    # d-row mean tables: broadcast joins, no shuffle of the 2080-row matrix
    return (
        prods.join(F.broadcast(mi), "i")
        .join(F.broadcast(mj), "j")
        .select(
            "i",
            "j",
            (
                F.col("sxy").cast("double") / F.col("n")
                - F.col("mu_i") * F.col("mu_j")
            ).alias("cov"),
        )
    )


def embedding_covariance_upper(spark: SparkSession, sf_dir: str) -> DataFrame:
    # spread=True: the per-row d(d+1)/2 product fan-out is the costliest
    # narrow compute in the registry — a single-split test file would pin
    # it to one core (no-op on real multi-split layouts)
    emb = load_table(spark, sf_dir, "embeddings", spread=True)
    return (
        embedding_covariance(emb)
        .select("i", "j", F.round("cov", ROUND_DIGITS).alias("cov"))
        .orderBy("i", "j")
    )


EMBEDDING_COVARIANCE_SQL = """
WITH pairs AS (
  -- dimension derived per row from len(embedding): no hardcoded d, the
  -- oracle adapts with the fixture exactly like the Spark side's
  -- size(embedding)
  SELECT i, j,
    CAST(embedding[i] AS DOUBLE) * CAST(embedding[j] AS DOUBLE) AS xy
  FROM embeddings,
    UNNEST(range(1, len(embedding) + 1)) AS r1(i),
    UNNEST(range(1, len(embedding) + 1)) AS r2(j)
  WHERE i <= j
), sums AS (
  SELECT i, j, COUNT(*) AS n,
    CAST(SUM(CAST(xy AS DECIMAL(38,20))) AS DOUBLE) AS sxy
  FROM pairs GROUP BY i, j
), means AS (
  SELECT k, CAST(SUM(CAST(CAST(x AS DOUBLE) AS DECIMAL(38,20))) AS DOUBLE)
      / COUNT(*) AS mu
  FROM (
    SELECT k, embedding[k] AS x
    FROM embeddings, UNNEST(range(1, len(embedding) + 1)) AS r(k)
  ) GROUP BY k
)
SELECT s.i, s.j, round(s.sxy / s.n - mi.mu * mj.mu, 10) AS cov
FROM sums s JOIN means mi ON s.i = mi.k JOIN means mj ON s.j = mj.k
ORDER BY s.i, s.j
"""


def pca_project(emb: DataFrame, n_components: int = 8) -> DataFrame:
    """Project embeddings onto the top-``n_components`` principal axes.

    The covariance matrix is O(d²) metadata — collected ONCE, eigendecomposed
    with numpy on the driver, and the chosen eigenvectors return to the
    executors as a broadcast literal array; the projection itself is an
    in-JVM ``aggregate`` dot product per component, no Python on the hot
    path.  Adds ``pca`` (array<double>, length n_components, components in
    decreasing explained-variance order)."""
    import numpy as np

    # bounded-collect: DxD covariance rows, D = embedding dim (k-row)
    rows = embedding_covariance(emb).collect()
    d = max(r["j"] for r in rows)
    cov = np.zeros((d, d))
    for r in rows:
        cov[r["i"] - 1, r["j"] - 1] = r["cov"]
        cov[r["j"] - 1, r["i"] - 1] = r["cov"]
    vals, vecs = np.linalg.eigh(cov)  # ascending
    top = vecs[:, ::-1][:, :n_components]  # columns = components
    comp_lit = F.array(
        *[
            F.array(*[F.lit(float(top[k, c])) for k in range(d)])
            for c in range(n_components)
        ]
    )
    return emb.withColumn(
        "pca",
        F.transform(
            comp_lit,
            lambda axis: F.aggregate(
                F.zip_with(
                    F.col("embedding").cast("array<double>"),
                    axis,
                    lambda x, w: x * w,
                ),
                F.lit(0.0),
                lambda acc, v: acc + v,
            ),
        ),
    )


QUERIES = {"embedding_covariance_upper": embedding_covariance_upper}
ORACLES = {"embedding_covariance_upper": EMBEDDING_COVARIANCE_SQL}
