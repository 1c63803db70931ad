"""Duplicate-cluster assignment: connected components over near-dup pairs.

Pair-level dedup (MinHash/LSH) emits edges; a curation pipeline needs the
transitive closure — "docs A,B,C are one duplicate cluster, keep min id".
This is the one genuinely *iterative* operator in the library: min-label
propagation to a fixpoint, the DataFrame form of the classic connected-
components algorithms (GraphX/Pregel style; large-graph deployments use
the alternating-star contraction variant, which converges in O(log d)
rounds instead of O(d)).

Scale shape per round: one shuffle-join edges->labels + one map-side-
combinable min aggregate; each round's label table is materialized to
the reliable scratch-parquet checkpoint (``checkpoint_parquet``) so
round k's plan does not replay rounds 1..k-1 AND an executor loss costs
a re-read rather than the whole propagation (label/edge tables are
data-sized — the non-reliable ``localCheckpoint`` block store is the
wrong tool; sources/tables.py states the full argument).  Convergence
in graph-diameter rounds; duplicate clusters are near-cliques, so
diameter is tiny in practice.

The DuckDB oracle is a recursive CTE computing min reachable label —
exact agreement including singleton clusters.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from debezium_server_bigquery_spark.functions.dedup_fuzzy import (
    DEDUP_MINHASH_SQL,
    dedup_minhash_lsh,
)
from debezium_server_bigquery_spark.sources.tables import (
    checkpoint_parquet,
    load_table,
)

MAX_ROUNDS = 50  # safety cap; fixpoint is reached at graph diameter


def connected_components(
    nodes: DataFrame, edges: DataFrame, max_rounds: int = MAX_ROUNDS
) -> DataFrame:
    """Min-label propagation.  ``nodes``: (doc_id); ``edges``: (doc_a,
    doc_b) undirected (either orientation).  Returns (doc_id, cluster_id)
    where cluster_id = min doc_id in the component."""
    sym = edges.select("doc_a", "doc_b").union(
        edges.select(F.col("doc_b").alias("doc_a"), F.col("doc_a").alias("doc_b"))
    )
    sym = checkpoint_parquet(sym, "dsbq_cc_")
    labels = nodes.select("doc_id", F.col("doc_id").alias("cluster_id"))
    labels = checkpoint_parquet(labels, "dsbq_cc_")
    for _ in range(max_rounds):
        neigh = (
            sym.join(
                labels.select(
                    F.col("doc_id").alias("doc_b"),
                    F.col("cluster_id").alias("nb_label"),
                ),
                "doc_b",
            )
            .groupBy(F.col("doc_a").alias("doc_id"))
            .agg(F.min("nb_label").alias("neigh_min"))
        )
        new_labels = labels.join(neigh, "doc_id", "left").select(
            "doc_id",
            F.least(
                F.col("cluster_id"), F.coalesce("neigh_min", F.col("cluster_id"))
            ).alias("cluster_id"),
        )
        new_labels = checkpoint_parquet(new_labels, "dsbq_cc_")
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "doc_id")
            .filter(F.col("n.cluster_id") != F.col("o.cluster_id"))
            .count()
        )
        labels = new_labels
        if changed == 0:
            break
    return labels


def dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cluster id + size for every document, clustering by the MinHash/LSH
    candidate-pair graph (singletons keep their own id, size 1)."""
    pairs = dedup_minhash_lsh(spark, sf_dir).select("doc_a", "doc_b")
    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    labels = connected_components(docs, pairs)
    w = Window.partitionBy("cluster_id")
    return (
        labels.withColumn("cluster_size", F.count("*").over(w))
        .select("doc_id", "cluster_id", "cluster_size")
        .orderBy("doc_id")
    )


DEDUP_CLUSTERS_SQL = f"""
WITH RECURSIVE pairs AS (
  {DEDUP_MINHASH_SQL}
),
edges AS (
  SELECT doc_a AS s, doc_b AS d FROM pairs
  UNION ALL
  SELECT doc_b AS s, doc_a AS d FROM pairs
),
reach(node, lbl) AS (
  SELECT doc_id, doc_id FROM documents
  UNION
  SELECT e.s, r.lbl FROM edges e JOIN reach r ON e.d = r.node
),
clusters AS (
  SELECT node AS doc_id, MIN(lbl) AS cluster_id FROM reach GROUP BY node
)
SELECT doc_id, cluster_id,
  COUNT(*) OVER (PARTITION BY cluster_id) AS cluster_size
FROM clusters ORDER BY doc_id
"""


QUERIES = {"dedup_clusters": dedup_clusters}

ORACLES = {"dedup_clusters": DEDUP_CLUSTERS_SQL}
