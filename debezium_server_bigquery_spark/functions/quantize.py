"""Embedding quantization: per-vector symmetric int8 with error stats.

Storing 100 TB of float32 embeddings costs 4x what int8 does; symmetric
per-vector quantization (scale = max|x| / 127) is the standard first step
of every large ANN deployment.  The operator is pure column algebra — one
codegen'd scan, zero shuffle — emitting the scale and the reconstruction
error so a pipeline can gate on quality before swapping the column.

Determinism: elements cast to double before any arithmetic; the
quantize/dequantize round-trip folds left-to-right in both engines, so the
DuckDB oracle hash-matches bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from debezium_server_bigquery_spark.sources.tables import load_table

INT8_MAX = 127


def _absmax(vec: Column) -> Column:
    return F.array_max(F.transform(vec, lambda x: F.abs(x.cast("double"))))


def embedding_quantize_int8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-vector int8 quantization manifest: scale, quantized extremes,
    and mean squared reconstruction error."""
    emb = load_table(spark, sf_dir, "embeddings", spread=True)
    scale = _absmax(F.col("embedding")) / F.lit(float(INT8_MAX))
    base = emb.select("vec_id", "embedding", scale.alias("scale"))
    # q_i = floor(x_i/scale + 0.5) clamped to [-127, 127].  floor(x + 0.5)
    # instead of round(): both engines' round() differ in half-way/edge
    # handling, while floor is exact and identical on doubles.
    q = F.transform(
        F.col("embedding"),
        lambda x: F.greatest(
            F.lit(-INT8_MAX),
            F.least(
                F.lit(INT8_MAX),
                F.floor(x.cast("double") / F.col("scale") + F.lit(0.5)).cast("int"),
            ),
        ),
    )
    with_q = base.select("vec_id", "embedding", "scale", q.alias("q"))
    sq_err = F.aggregate(
        F.zip_with(
            F.col("embedding"),
            F.col("q"),
            lambda x, qi: (x.cast("double") - qi.cast("double") * F.col("scale"))
            * (x.cast("double") - qi.cast("double") * F.col("scale")),
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    # Materialize sq_err BEFORE the projection that aliases a rounded
    # column as "scale": with both in one select list, Spark's
    # lateral-column-alias resolution binds sq_err's `scale` reference to
    # the ROUNDED alias, silently changing the arithmetic (observed as a
    # 3e-6 relative mse error vs the oracle).
    stats = with_q.select(
        "vec_id",
        "scale",
        F.array_min("q").alias("q_min"),
        F.array_max("q").alias("q_max"),
        sq_err.alias("sq"),
        F.size("embedding").alias("n_dims"),
    )
    from debezium_server_bigquery_spark.operators.rank import ordered_output

    out = stats.select(
        "vec_id",
        F.round("scale", 9).alias("scale"),
        "q_min",
        "q_max",
        F.round(F.col("sq") / F.col("n_dims"), 12).alias("mse"),
    )
    return ordered_output(out, "vec_id")


EMB_QUANTIZE_SQL = f"""
WITH scaled AS (
  SELECT vec_id, embedding,
    list_max(list_transform(embedding, x -> abs(CAST(x AS DOUBLE)))) / {float(INT8_MAX)} AS scale
  FROM embeddings
),
quant AS (
  SELECT vec_id, embedding, scale,
    list_transform(embedding,
      x -> greatest(-{INT8_MAX}, least({INT8_MAX},
             CAST(floor(CAST(x AS DOUBLE) / scale + 0.5) AS INTEGER)))) AS q
  FROM scaled
)
SELECT vec_id,
  round(scale, 9) AS scale,
  list_min(q) AS q_min,
  list_max(q) AS q_max,
  round(
    list_reduce(
      list_prepend(0.0::DOUBLE,
        list_transform(range(1, len(embedding) + 1),
          i -> (CAST(embedding[i] AS DOUBLE) - CAST(q[i] AS DOUBLE) * scale)
             * (CAST(embedding[i] AS DOUBLE) - CAST(q[i] AS DOUBLE) * scale))),
      (acc, x) -> acc + x) / len(embedding), 12) AS mse
FROM quant ORDER BY vec_id
"""


QUERIES = {"embedding_quantize_int8": embedding_quantize_int8}

ORACLES = {"embedding_quantize_int8": EMB_QUANTIZE_SQL}
