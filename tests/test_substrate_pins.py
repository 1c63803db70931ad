"""Pin the round-12 checkpoint-substrate conversions with a plan audit.

Round 12 converted seven derivation-chain queries from composed
`crossJoin(broadcast(agg))` lineages to shared scratch-parquet substrates
(`sources/tables.checkpoint_parquet`), with A/B-measured wins of
1.16-2.24x at sf0.1 (docs/SCALE.md §Round-12).  Until this audit, those
wins were protected only by bench numbers on two of the queries: a
refactor could silently un-checkpoint any of the seven and nothing would
fail (VERDICT r12 ask #6).  Each query's physical plan must read at
least one scratch-substrate parquet scan (the checkpoint directories all
carry the repo's ``dsbq_`` scratch prefix).

`supplier_cooccurrence_topk` additionally pins the explicit repartition
before its `kept` substrate write: AQE coalesces the filtered join to a
handful of output files and the downstream Σ deg(c)² self-join inherits
that file count as its scan parallelism (measured 5-task stages on a
32-core session; 3.59 s -> 2.00 s after the fix).  The write happens at
plan-build time, so the returned plan cannot show it — the source text
audit pins it instead (same mechanism as the bounded-collect markers).
"""

from __future__ import annotations

import os

import pytest

import __spark_entry__ as E

SF_DIR = "/root/testdata/sf0.001"

# The seven round-12 substrate conversions (VERDICT r12 ask #6), plus the
# two round-12 cross-query substrate extensions that the same regression
# class could silently undo (ann_pq_rerank reads the shared ADC/codebook
# substrate; quality-score consumers read the shared quality table via
# their own checkpoints).
_SUBSTRATE_QUERIES = [
    "spearman_quality_length",
    "source_vocab_overlap",
    "term_ppmi_similarity",
    "supplier_cooccurrence_topk",
    "epoch_repetition_plan",
    "mix_domain_weights",
    "tokenizer_fertility_drift_gate",
    "ann_pq_rerank",
]

_QUERIES = E.queries()


def _physical(df) -> str:
    df.sparkSession.conf.set("spark.sql.debug.maxToStringFields", "1000")
    return df._jdf.queryExecution().executedPlan().toString()


@pytest.mark.parametrize("name", _SUBSTRATE_QUERIES)
def test_plan_reads_scratch_substrate(spark, name):
    """Building the query materializes its substrate(s) once (memoized);
    the returned plan must SCAN the materialized copy, not recompute the
    corpus lineage per branch."""
    plan = _physical(_QUERIES[name](spark, SF_DIR))
    assert "dsbq_" in plan, (
        f"{name}: physical plan reads no scratch-substrate scan — the "
        f"round-12 checkpoint conversion has been undone (see "
        f"docs/SCALE.md §Round-12; derived-aggregate chains re-execute "
        f"corpus lineage once per level without it)"
    )


def test_census_dense_path_reads_bitset_substrate(spark):
    """Round-14 pin (VERDICT r13 ask #7): the triangle census's dense
    path must JOIN both sides against the CHECKPOINTED n-row bitset
    table, not recompute the bitset-build lineage once per join side.
    Dense-gate aware: the assertion on the bitset scan applies only when
    the SF's co-supply graph qualifies for the dense representation
    (compact ids, density ≥ 25%); the edges-substrate scan is pinned
    unconditionally."""
    from pyspark.sql import functions as F

    from debezium_server_bigquery_spark.functions.graph import _cosupply_edges
    from debezium_server_bigquery_spark.sources.tables import checkpoint_parquet

    plan = _physical(_QUERIES["supplier_triangle_census"](spark, SF_DIR))
    assert "dsbq_" in plan, (
        "supplier_triangle_census: plan reads no scratch-substrate scan — "
        "the shared co-supply edge checkpoint has been undone"
    )
    edges = checkpoint_parquet(_cosupply_edges(spark, SF_DIR), "dsbq_cosupply_")
    stats = edges.agg(
        F.count(F.lit(1)).cast("long").alias("m"),
        F.coalesce(F.max(F.greatest("a", "b")), F.lit(-1)).cast("long").alias("max_id"),
    ).collect()[0]
    m_cnt, max_id = stats["m"], stats["max_id"]
    words = (max_id >> 6) + 1 if max_id >= 0 else 0
    dense = m_cnt > 0 and words <= 1024 and (max_id + 1) ** 2 <= 8 * m_cnt
    if dense:
        # the per-edge intersection reads bits_u/bits_v from the
        # checkpointed bitset table on BOTH join sides; if a refactor
        # reverts to recomputing the bitset build per side, the packed
        # bit columns disappear from the scratch parquet scans
        assert "bits" in plan and plan.count("dsbq_") >= 2, (
            "supplier_triangle_census dense path: the r13 bitset-table "
            "checkpoint has been undone — the bitset build would execute "
            "once per join side (OPTIMIZATION_r13.md §census)"
        )


def test_cosupply_edge_builder_is_two_exchange_no_join(spark):
    """Round-14 pin: the co-supply edge builder (the shared cold-build
    substrate of census/k-core/assortativity/modularity) must stay the
    single-aggregation form — one map-side-combined ``collect_set`` per
    order plus the final edge distinct (2 Exchange nodes), with the
    order-local pair fan-out done by HOF expansion, NOT the r13
    ``distinct → groupBy → join → self-join`` chain (10 Exchange nodes,
    incl. a shuffle self-join of the (order, supplier) pair table that
    at 100 TB re-shuffles the fact-table key set)."""
    from debezium_server_bigquery_spark.functions.graph import _cosupply_edges

    plan = _physical(_cosupply_edges(spark, SF_DIR))
    n_exchange = plan.count("Exchange")
    assert n_exchange <= 2, (
        f"_cosupply_edges plans {n_exchange} Exchange nodes (expected 2: "
        "per-order set aggregation + edge distinct) — the round-14 "
        "single-shuffle builder has been undone (OPTIMIZATION_r14.md)"
    )
    assert "Join" not in plan, (
        "_cosupply_edges plans a join — the order-local pair fan-out "
        "must be the in-memory HOF expansion over the per-order "
        "supplier set, not a shuffle self-join"
    )


def test_cooccurrence_substrate_write_is_repartitioned():
    """The `kept` substrate write must fan out across the session's
    parallelism before hitting parquet, or the expensive pair self-join
    downstream inherits AQE's coalesced file count as its scan
    parallelism."""
    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "debezium_server_bigquery_spark",
        "functions",
        "graph.py",
    )
    with open(path) as fh:
        src = fh.read()
    start = src.index("def supplier_cooccurrence_topk")
    end = src.index("COOC_SQL")
    body = src[start:end]
    assert ".repartition(" in body and "dsbq_cooc_kept_" in body, (
        "supplier_cooccurrence_topk no longer repartitions its kept "
        "substrate before the checkpoint write — the downstream pair "
        "join's scan parallelism silently collapses to the coalesced "
        "file count (BENCH_NOTES_r12)"
    )
