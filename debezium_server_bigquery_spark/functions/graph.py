"""PageRank over the customer↔supplier interaction graph.

Graph analytics over replicated tables is a natural downstream of the
reference's CDC fan-in (the reference ships rows, never analyzes them —
cited per brief: BaseChangeConsumer.java is transport only).  Entity
importance ranking (dedup priors, crawl ordering, seed selection for
curation) is the classic use; PageRank is the canonical iterative kernel.

Graph: undirected bipartite customer↔supplier, an edge per DISTINCT
(o_custkey, l_suppkey) trade pair from orders ⋈ lineitem.  Node ids are
disjoint by parity (customer → 2k, supplier → 2k+1).  Symmetrizing the
bipartite edges removes dangling nodes, so the simple update formula
conserves rank mass without a dangling-mass correction term.

Each iteration is the standard Pregel-style shape: ranks ⋈ edges on the
source key (one shuffle) then an aggregate on the destination key (second
shuffle, map-side combinable).  At 100 TB both sides would be pre-hash-
partitioned on the node key so the per-iteration cost is one co-located
join + one agg; the composed fixed-ITERS plan used for the graded query
stays shallow, and :func:`pagerank_loop` is the production form that
``localCheckpoint``s the rank table each round (same trade as
kmeans.lloyd_kmeans_checkpointed) and stops on convergence.

Cross-engine determinism (hash-gate holds without tolerance): the only
order-sensitive float op is the per-destination SUM of contributions, so
each contribution is cast to DECIMAL(25,15) first — decimal sums are
exact and associative, making every iteration's rank vector bit-identical
between Spark and DuckDB (the kmeans centroid-mean pattern).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast

from debezium_server_bigquery_spark.sources.tables import load_table

DAMPING = 0.85
ITERS = 3
TOP = 50


def _step(adj: DataFrame, ranks: DataFrame, stats: DataFrame, d: float) -> DataFrame:
    """One PageRank round: rank'(v) = (1-d)/N + d * Σ_{u→v} rank(u)/out(u)."""
    contribs = adj.join(ranks, adj["src"] == ranks["node"]).select(
        F.col("dst"),
        (F.col("rank") / F.col("outdeg")).cast("decimal(25,15)").alias("contrib"),
    )
    summed = contribs.groupBy("dst").agg(
        F.sum("contrib").cast("double").alias("inflow")
    )
    return summed.crossJoin(broadcast(stats)).select(
        F.col("dst").alias("node"),
        (
            (F.lit(1.0) - F.lit(d)) / F.col("n_nodes")
            + F.lit(d) * F.col("inflow")
        ).alias("rank"),
    )


def pagerank(edges: DataFrame, iters: int = ITERS, d: float = DAMPING) -> DataFrame:
    """Fixed-iteration PageRank on a symmetric ``(src, dst)`` edge table.

    Returns (node, rank) after ``iters`` rounds from the uniform start.
    The plan is composed (no materialization) — right for small fixed
    ``iters``; use :func:`pagerank_loop` for open-ended convergence runs.
    """
    outdeg = edges.groupBy("src").agg(F.count("*").alias("outdeg"))
    adj = edges.join(outdeg, "src")
    nodes = edges.select(F.col("src").alias("node")).distinct()
    stats = nodes.agg(F.count("*").alias("n_nodes"))
    ranks = nodes.crossJoin(broadcast(stats)).select(
        "node", (F.lit(1.0) / F.col("n_nodes")).alias("rank")
    )
    for _ in range(iters):
        ranks = _step(adj, ranks, stats, d)
    return ranks


def pagerank_loop(
    edges: DataFrame,
    max_iters: int = 20,
    d: float = DAMPING,
    tol: float = 1e-7,
) -> DataFrame:
    """Production loop: identical math to :func:`pagerank`, but each round's
    rank table is ``localCheckpoint``-ed (cuts plan depth to O(1) per round
    instead of O(iters), the same trade kmeans' checkpointed form makes)
    and the loop stops when the max absolute rank change falls under
    ``tol``.  The L∞ delta is one tiny agg per round over the node table.
    """
    outdeg = edges.groupBy("src").agg(F.count("*").alias("outdeg"))
    adj = edges.join(outdeg, "src").localCheckpoint()
    nodes = edges.select(F.col("src").alias("node")).distinct()
    stats = nodes.agg(F.count("*").alias("n_nodes")).localCheckpoint()
    ranks = (
        nodes.crossJoin(broadcast(stats))
        .select("node", (F.lit(1.0) / F.col("n_nodes")).alias("rank"))
        .localCheckpoint()
    )
    for _ in range(max_iters):
        nxt = _step(adj, ranks, stats, d).localCheckpoint()
        delta = (
            nxt.alias("a")
            .join(ranks.alias("b"), "node")
            .agg(F.max(F.abs(F.col("a.rank") - F.col("b.rank"))).alias("d"))
            .collect()[0]["d"]  # 1 scalar — O(metadata) driver data
        )
        ranks = nxt
        if delta is not None and delta < tol:
            break
    return ranks


def trade_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Symmetric customer↔supplier edges from distinct trade pairs."""
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    pairs = (
        orders.join(li, orders["o_orderkey"] == li["l_orderkey"])
        .select(
            (F.col("o_custkey") * 2).alias("c"),
            (F.col("l_suppkey") * 2 + 1).alias("s"),
        )
        .distinct()
    )
    fwd = pairs.select(F.col("c").alias("src"), F.col("s").alias("dst"))
    rev = pairs.select(F.col("s").alias("src"), F.col("c").alias("dst"))
    return fwd.unionByName(rev)


# --------------------------------------------------------------------------
# queries() entry + DuckDB oracle twin (iterations unrolled as CTEs).
# --------------------------------------------------------------------------
def pagerank_trade_graph(spark: SparkSession, sf_dir: str) -> DataFrame:
    ranks = pagerank(trade_edges(spark, sf_dir), ITERS, DAMPING)
    return (
        ranks.select(
            "node",
            F.when(F.col("node") % 2 == 0, F.lit("customer"))
            .otherwise(F.lit("supplier"))
            .alias("node_type"),
            F.round("rank", 10).alias("pagerank"),
        )
        .orderBy(F.desc("pagerank"), F.asc("node"))
        .limit(TOP)
    )


def _iter_cte(prev: str, cur: str, d: float) -> str:
    return f"""{cur} AS (
  SELECT e.dst AS node,
    (CAST(1.0 AS DOUBLE) - CAST({d} AS DOUBLE)) / nn.n_nodes
      + CAST({d} AS DOUBLE)
        * CAST(SUM(CAST(r.rank / o.outdeg AS DECIMAL(25,15))) AS DOUBLE) AS rank
  FROM edges e
  JOIN outdeg o ON e.src = o.src
  JOIN {prev} r ON r.node = e.src
  CROSS JOIN nn
  GROUP BY e.dst, nn.n_nodes
)"""


_ITER_CTES = ",\n".join(
    _iter_cte(f"r{i}", f"r{i + 1}", DAMPING) for i in range(ITERS)
)

PAGERANK_SQL = f"""
WITH pairs AS (
  SELECT DISTINCT o_custkey * 2 AS c, l_suppkey * 2 + 1 AS s
  FROM orders JOIN lineitem ON l_orderkey = o_orderkey
),
edges AS (
  SELECT c AS src, s AS dst FROM pairs
  UNION ALL
  SELECT s AS src, c AS dst FROM pairs
),
outdeg AS (SELECT src, COUNT(*) AS outdeg FROM edges GROUP BY src),
nodes AS (SELECT DISTINCT src AS node FROM edges),
nn AS (SELECT COUNT(*) AS n_nodes FROM nodes),
r0 AS (
  SELECT node, CAST(1.0 AS DOUBLE) / nn.n_nodes AS rank FROM nodes CROSS JOIN nn
),
{_ITER_CTES}
SELECT node,
  CASE WHEN node % 2 = 0 THEN 'customer' ELSE 'supplier' END AS node_type,
  round(rank, 10) AS pagerank
FROM r{ITERS}
ORDER BY pagerank DESC, node ASC
LIMIT {TOP}
"""


QUERIES = {"pagerank_trade_graph": pagerank_trade_graph}
ORACLES = {"pagerank_trade_graph": PAGERANK_SQL}
