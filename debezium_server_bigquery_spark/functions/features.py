"""Feature hashing (the hashing trick) — fixed-width ML feature export.

The last step before text leaves the engine for a trainer: map each
document's bag of words into a FIXED-width integer count vector by
hashing tokens into buckets — no vocabulary to build, broadcast, or keep
consistent across runs (Weinberger et al., ICML'09).  Emitted as scalar
columns ``f0..f{D-1}`` (not an array) per the registry's scalar-output
convention, which is also the columnar layout a parquet-consuming
trainer wants.

Scale: one tokenize + explode, one hash-keyed aggregate with map-side
combine; the pivot to D columns is a conditional-sum aggregate, never a
wide shuffle.  The bucket hash is the dedup family's ``hash60`` (md5 —
identical in Spark and DuckDB), so counts are bit-identical integers.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from debezium_server_bigquery_spark.functions.dedup_fuzzy import _hash60_sql, hash60
from debezium_server_bigquery_spark.sources.tables import load_table

N_FEATURES = 16


def hashed_features(docs: DataFrame, n_features: int = N_FEATURES, text_col: str = "text") -> DataFrame:
    """(doc_id, f0..f{n-1}) — hashed bag-of-words count vector per doc."""
    toks = docs.select(
        "doc_id",
        F.explode(
            F.filter(F.split(F.lower(F.col(text_col)), r"\s+"), lambda t: t != "")
        ).alias("w"),
    )
    bucketed = toks.select("doc_id", F.pmod(hash60(F.col("w")), F.lit(n_features)).alias("b"))
    return bucketed.groupBy("doc_id").agg(
        *[
            F.sum(F.when(F.col("b") == k, 1).otherwise(0)).alias(f"f{k}")
            for k in range(n_features)
        ]
    )


def doc_hashed_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents", spread=True)
    return hashed_features(docs).orderBy("doc_id")


_F_COLS = ",\n  ".join(
    f"CAST(SUM(CASE WHEN b = {k} THEN 1 ELSE 0 END) AS BIGINT) AS f{k}"
    for k in range(N_FEATURES)
)

DOC_HASHED_FEATURES_SQL = rf"""
WITH toks AS (
  SELECT doc_id, w
  FROM documents,
    UNNEST(list_filter(regexp_split_to_array(lower(text), '\s+'),
                       x -> x <> '')) AS t(w)
), bucketed AS (
  SELECT doc_id, {_hash60_sql('w')} % {N_FEATURES} AS b FROM toks
)
SELECT doc_id,
  {_F_COLS}
FROM bucketed GROUP BY doc_id ORDER BY doc_id
"""


QUERIES = {"doc_hashed_features": doc_hashed_features}
ORACLES = {"doc_hashed_features": DOC_HASHED_FEATURES_SQL}


def target_encoding_loo(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leave-one-out target encoding of order priority against order
    value — the classic high-cardinality categorical encoder with the
    classic leakage bug REMOVED: row i's encoding averages every OTHER
    row's target in its category, enc_i = (Σ_cat y − y_i)/(n_cat − 1),
    so a model trained on the feature never sees its own label.
    Singleton categories yield NULL (no peers to average).

    Scale design (100 TB): ONE map-side-combinable per-category
    aggregate broadcast back onto the fact rows (O(categories) rows);
    the encoding is then a row-local decimal expression — no window, no
    self-join.  Sums stay in DECIMAL(38,2); the single division is the
    only float, rounded once."""
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_orderpriority",
        F.col("o_totalprice").cast("decimal(18,2)").alias("y"),
    )
    per_cat = orders.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).cast("long").alias("n_cat"),
        F.sum("y").cast("decimal(38,2)").alias("sum_y"),
    )
    return (
        orders.join(F.broadcast(per_cat), "o_orderpriority")
        .select(
            "o_orderkey",
            "o_orderpriority",
            F.when(
                F.col("n_cat") > 1,
                F.round(
                    (F.col("sum_y") - F.col("y")).cast("double")
                    / (F.col("n_cat") - 1).cast("double"),
                    6,
                ),
            ).alias("loo_encoding"),
        )
        .orderBy("o_orderkey")
    )


TARGET_ENCODING_SQL = """
WITH o AS (
  SELECT o_orderkey, o_orderpriority,
    CAST(o_totalprice AS DECIMAL(18,2)) AS y
  FROM orders
),
per_cat AS (
  SELECT o_orderpriority,
    CAST(COUNT(*) AS BIGINT) AS n_cat,
    CAST(SUM(y) AS DECIMAL(38,2)) AS sum_y
  FROM o GROUP BY o_orderpriority
)
SELECT o.o_orderkey, o.o_orderpriority,
  CASE WHEN p.n_cat > 1 THEN
    round(CAST(p.sum_y - o.y AS DOUBLE) / CAST(p.n_cat - 1 AS DOUBLE), 6)
  END AS loo_encoding
FROM o JOIN per_cat p ON o.o_orderpriority = p.o_orderpriority
ORDER BY o.o_orderkey
"""

QUERIES["target_encoding_loo"] = target_encoding_loo
ORACLES["target_encoding_loo"] = TARGET_ENCODING_SQL


WOE_EDGES = [0.25, 0.5, 0.75]  # quartile bins of event value


def woe_value_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weight-of-evidence binning of event value against the purchase
    label — the standard scorecard-feature audit: per value quartile,
    WOE = ln((events_share)/(non-events_share)), with the bin's
    information-value contribution.  Completes the feature-engineering
    trio (hashed features, LOO target encoding, WOE/IV).

    Scale/exactness design: quartile edges are exact order statistics
    (percentile_disc — actual data values, no interpolation) computed
    once and broadcast as a one-row frame; bin assignment is a
    row-local comparison count; per-bin tallies are ONE combinable
    aggregate.  Counts are integers; WOE/IV are fixed-order expressions
    over four integer totals (bins with a zero cell yield NULL rather
    than ±inf)."""
    ev = load_table(spark, sf_dir, "events").select(
        "value", (F.col("event_type") == "purchase").cast("long").alias("y")
    )
    edges = ev.agg(
        *[
            F.expr(
                f"percentile_disc({q}) WITHIN GROUP (ORDER BY value)"
            ).alias(f"e{i}")
            for i, q in enumerate(WOE_EDGES)
        ]
    )
    binned = ev.crossJoin(F.broadcast(edges)).select(
        (
            (F.col("value") > F.col("e0")).cast("int")
            + (F.col("value") > F.col("e1")).cast("int")
            + (F.col("value") > F.col("e2")).cast("int")
        ).alias("bin"),
        "y",
    )
    per_bin = binned.groupBy("bin").agg(
        F.sum("y").cast("long").alias("n_event"),
        F.sum(F.lit(1) - F.col("y")).cast("long").alias("n_nonevent"),
    )
    tot = per_bin.agg(
        F.sum("n_event").cast("long").alias("te"),
        F.sum("n_nonevent").cast("long").alias("tn"),
    )
    pe = F.col("n_event").cast("double") / F.col("te").cast("double")
    pn = F.col("n_nonevent").cast("double") / F.col("tn").cast("double")
    woe = F.log(pe / pn)
    return (
        per_bin.crossJoin(F.broadcast(tot))
        .select(
            "bin",
            "n_event",
            "n_nonevent",
            F.when(
                (F.col("n_event") > 0) & (F.col("n_nonevent") > 0),
                F.round(woe, 6) + F.lit(0.0),
            ).alias("woe"),
            F.when(
                (F.col("n_event") > 0) & (F.col("n_nonevent") > 0),
                F.round((pe - pn) * woe, 6) + F.lit(0.0),
            ).alias("iv_contrib"),
        )
        .orderBy("bin")
    )


WOE_SQL = f"""
WITH ev AS (
  SELECT value,
    CAST(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS BIGINT) AS y
  FROM events
),
edges AS (
  SELECT
    {", ".join(
        f"percentile_disc({q}) WITHIN GROUP (ORDER BY value) AS e{i}"
        for i, q in enumerate(WOE_EDGES)
    )}
  FROM ev
),
binned AS (
  SELECT
    CAST(CASE WHEN value > e0 THEN 1 ELSE 0 END
       + CASE WHEN value > e1 THEN 1 ELSE 0 END
       + CASE WHEN value > e2 THEN 1 ELSE 0 END AS INTEGER) AS bin,
    y
  FROM ev CROSS JOIN edges
),
per_bin AS (
  SELECT bin,
    CAST(SUM(y) AS BIGINT) AS n_event,
    CAST(SUM(1 - y) AS BIGINT) AS n_nonevent
  FROM binned GROUP BY bin
),
tot AS (
  SELECT CAST(SUM(n_event) AS BIGINT) AS te,
         CAST(SUM(n_nonevent) AS BIGINT) AS tn
  FROM per_bin
)
SELECT bin, n_event, n_nonevent,
  CASE WHEN n_event > 0 AND n_nonevent > 0 THEN
    round(ln((CAST(n_event AS DOUBLE) / CAST(te AS DOUBLE))
             / (CAST(n_nonevent AS DOUBLE) / CAST(tn AS DOUBLE))), 6) + 0.0
  END AS woe,
  CASE WHEN n_event > 0 AND n_nonevent > 0 THEN
    round((CAST(n_event AS DOUBLE) / CAST(te AS DOUBLE)
           - CAST(n_nonevent AS DOUBLE) / CAST(tn AS DOUBLE))
          * ln((CAST(n_event AS DOUBLE) / CAST(te AS DOUBLE))
               / (CAST(n_nonevent AS DOUBLE) / CAST(tn AS DOUBLE))), 6) + 0.0
  END AS iv_contrib
FROM per_bin CROSS JOIN tot
ORDER BY bin
"""

QUERIES["woe_value_bins"] = woe_value_bins
ORACLES["woe_value_bins"] = WOE_SQL
