"""Global physical-plan audit over the ENTIRE query registry.

tests/test_plans.py locks in per-query plan properties; this module locks
in the one invariant every operator must satisfy at 100 TB: no plan may
contain an unbounded cartesian product.  Every all-pairs scan the engine
ever shipped (simhash round-1, embedding near-dup round-1) would have been
caught here — the audit exists so the next one is.

Mostly build-only: `executedPlan` materializes the physical plan without
running a job, so auditing the registry costs seconds.  Two groups DO run
jobs at build time and are audited on their (small, deterministic)
sf0.001 output plans: the e2e pipeline queries (their write path runs when
the DataFrame is built) and the checkpoint-substrate queries
(``sources/tables.py::checkpoint_parquet`` writes the shared substrate to
scratch parquet at plan build; memoized per logical plan, so this suite
pays each write once per interpreter).  Since round 10 the substrate set
also covers the iterative operators (pagerank, k-core, connected
components, BPE) and the rank primitives — their per-round data-sized
tables moved from non-reliable ``localCheckpoint`` to the reliable
scratch-parquet checkpoint (see test_local_checkpoint_sites_bounded).
"""

from __future__ import annotations

import pytest

import __spark_entry__ as E

SF_DIR = "/root/testdata/sf0.001"

_ALL = sorted(E.queries().items())


def _physical(df) -> str:
    df.sparkSession.conf.set("spark.sql.debug.maxToStringFields", "1000")
    return df._jdf.queryExecution().executedPlan().toString()


# BroadcastNestedLoopJoin is the repo's sanctioned one-row-bounds idiom
# (totals/corpus counts folded in as a broadcast with a constant join
# key), and its hazard is the same as the cartesian's: a DATA-SIZED
# broadcast side is an all-pairs scan in disguise.  The audit proves every
# BNLJ broadcast side bounded from the plan text (a keyless aggregate or
# an explicit limit between the exchange and every scan).  Two queries
# are bounded by CONSTRUCTION instead — the text cannot prove it, the
# docstring does:
_BNLJ_BOUNDED_BY_CONSTRUCTION = {
    # ≤10-row probe set: vec_id < 10 range predicate on the unique key,
    # pushed into the broadcast-side scan (functions/similarity.py)
    "ann_cosine_topk",
    # same ≤10-row probe set, used twice (full-dim and truncated-dim
    # rankings share the vec_id < 10 bound)
    "ann_dim_truncation_eval",
    # ≤ID_PROBES-row probe set (vec_id < 50 range predicate on the
    # unique key) for the Two-NN estimator (functions/similarity.py)
    "embedding_intrinsic_dim",
    # k-row centroid table from the bounded-key iterative aggregate
    # (functions/kmeans.py)
    "kmeans_clusters",
    # IVF cell-centroid table: N_CELLS rows by the bounded-key aggregate
    # (functions/similarity.py — groupBy(cell) over a hash-bucketed cell
    # id with a fixed domain); the recall twin also carries the ≤10-row
    # vec_id probe set
    "ann_ivf",
    "ann_ivf_recall",
    # 1-row target profile: the min-user equality join collapses the
    # profile aggregate to one user before the constant-key broadcast
    # (functions/timeseries.py)
    "ts_similarity_topk",
    # triangular cumulative join over the per-decile cell frame: both
    # sides are keyed aggregates over a 10-value bin domain (the decile
    # id is a sum of 9 fixed comparisons), so the BNLJ is <= 10 x 10
    # rows by construction (plans/experiments.py uplift_by_score_decile)
    "uplift_by_score_decile",
}

_BNLJ_BOUND_MARKERS = (
    "HashAggregate(keys=[], ",
    "SortAggregate(key=[], ",
    "ObjectHashAggregate(keys=[], ",
    "GlobalLimit",
    "TakeOrderedAndProject",
    "CollectLimit",
)
_SCAN_MARKERS = ("FileScan", "Scan ExistingRDD", "Scan parquet")


def _unbounded_bnlj(plan: str) -> list[str]:
    """BNLJ nodes whose broadcast-side subtree reaches a scan with no
    keyless aggregate / limit bounding it on the ancestor path.  Only the
    exchange that is a DIRECT child of the BNLJ is its broadcast side —
    deeper BroadcastExchanges belong to inner hash joins (often on the
    stream side) and are governed by their own operators."""
    lines = plan.splitlines()
    bad = []
    for i, line in enumerate(lines):
        if "BroadcastNestedLoopJoin" not in line:
            continue
        d = _node_depth(line)
        # subtree of this BNLJ; direct children sit at its minimum depth
        j = i + 1
        sub: list[int] = []
        while j < len(lines) and _node_depth(lines[j]) > d:
            sub.append(j)
            j += 1
        if not sub:
            continue
        child_depth = min(_node_depth(lines[k]) for k in sub)
        for k in sub:
            lk = lines[k]
            if _node_depth(lk) != child_depth or (
                "BroadcastExchange" not in lk
                and "BroadcastQueryStage" not in lk
            ):
                continue
            bd = _node_depth(lk)
            m = k + 1
            scans = []
            while m < len(lines) and _node_depth(lines[m]) > bd:
                if any(t in lines[m] for t in _SCAN_MARKERS):
                    scans.append(m)
                m += 1
            for sk in scans:
                depth = _node_depth(lines[sk])
                bounded = False
                for up in range(sk - 1, k, -1):
                    du = _node_depth(lines[up])
                    if du < depth:  # an ancestor of the scan
                        depth = du
                        if any(t in lines[up] for t in _BNLJ_BOUND_MARKERS):
                            bounded = True
                            break
                if not bounded:
                    bad.append(
                        "unbounded scan under BNLJ broadcast side: "
                        + lines[sk].strip()[:120]
                    )
    return bad


@pytest.mark.parametrize("name,fn", _ALL, ids=[n for n, _ in _ALL])
def test_no_cartesian_product(spark, name, fn):
    plan = _physical(fn(spark, SF_DIR))
    assert "CartesianProduct" not in plan, (
        f"{name}: cartesian product in physical plan — unbounded all-pairs "
        f"scan, O(n^2) at scale"
    )
    if name not in _BNLJ_BOUNDED_BY_CONSTRUCTION:
        offenders = _unbounded_bnlj(plan)
        assert not offenders, (
            f"{name}: BroadcastNestedLoopJoin whose broadcast side is not "
            f"provably bounded (no keyless aggregate or limit above its "
            f"scans) — a data-sized broadcast side is an all-pairs scan "
            f"in disguise.  Bound it (one-row aggregate / limit) or, if "
            f"bounded by construction, add it to "
            f"_BNLJ_BOUNDED_BY_CONSTRUCTION with the reason: {offenders}"
        )


def _node_depth(line: str) -> int:
    """Depth of a plan-tree line = column of its '+-'/':-' marker; the
    root line (no marker) is depth -1 so every child is deeper."""
    for marker in ("+- ", ":- "):
        i = line.find(marker)
        if i >= 0:
            return i
    return -1


def _single_partition_windows(plan: str) -> list[str]:
    """Window nodes whose subtree shuffles everything into ONE partition
    without an upstream limit bounding the row count.

    ``Exchange SinglePartition`` feeding a Window is the textbook global-
    sort bottleneck: every row of the input lands on a single task.  The
    one legitimate shape is a window over an already-limited relation
    (TakeOrderedAndProject / GlobalLimit / CollectLimit below the
    exchange): then the exchange moves O(k) rows, not O(n)."""
    lines = plan.splitlines()
    bad = []
    for i, line in enumerate(lines):
        if "Window" not in line:  # matches Window + WindowGroupLimit
            continue
        d = _node_depth(line)
        # Walk the subtree in pre-order and find the FIRST Exchange — the
        # Window sits on a unary chain (Sort/Project/...), so the first
        # exchange below it is the one satisfying the window's
        # distribution requirement.  Deeper exchanges (e.g. a one-row
        # bounds aggregate under a broadcast join) belong to other
        # operators and are not the window's feed.
        j = i + 1
        feed_single = False
        limited = False
        while j < len(lines) and _node_depth(lines[j]) > d:
            ln = lines[j]
            if any(
                tok in ln
                for tok in ("TakeOrderedAndProject", "GlobalLimit", "CollectLimit")
            ):
                limited = True
            if "Exchange" in ln:
                feed_single = "Exchange SinglePartition" in ln
                break
            j += 1
        if feed_single and not limited:
            bad.append(line.strip())
    return bad


def test_local_checkpoint_sites_bounded():
    """``localCheckpoint`` stores blocks on executors NON-reliably: at
    cluster scale a lost executor kills the query instead of recomputing
    (lineage is truncated), which is why the repo's data-sized substrates
    use ``sources/tables.checkpoint_parquet`` (reliable scratch parquet)
    instead.  The only sanctioned remaining sites are PROVABLY BOUNDED
    tables — k-row centroid frames — where a lost block costs a cheap
    query retry, never a data-sized recompute.  Every call site must sit
    in the allowlisted file AND carry a ``bounded-local-checkpoint:``
    justification comment within the five preceding lines (round-9
    verdict ask #4)."""
    import os

    pkg = os.path.join(os.path.dirname(os.path.dirname(__file__)),
                       "debezium_server_bigquery_spark")
    allowed_files = {"functions/kmeans.py"}
    offenders = []
    for root, _dirs, files in os.walk(pkg):
        for fname in files:
            if not fname.endswith(".py"):
                continue
            path = os.path.join(root, fname)
            rel = os.path.relpath(path, pkg)
            with open(path) as f:
                lines = f.readlines()
            for i, line in enumerate(lines):
                if ".localCheckpoint(" not in line:
                    continue
                if rel not in allowed_files:
                    offenders.append(f"{rel}:{i + 1}: file not allowlisted")
                    continue
                ctx = "".join(lines[max(0, i - 5) : i + 1])
                if "bounded-local-checkpoint:" not in ctx:
                    offenders.append(
                        f"{rel}:{i + 1}: missing bounded-local-checkpoint "
                        f"justification comment"
                    )
    assert not offenders, (
        "unsanctioned localCheckpoint call sites (use "
        "sources/tables.checkpoint_parquet for data-sized substrates, or "
        "add a bounded-local-checkpoint: justification for provably tiny "
        f"tables): {offenders}"
    )


def test_collect_sites_bounded():
    """A ``.collect()`` in engine code is a driver-side materialization —
    the one operation that silently stops being distributed.  Every site
    in the package is sanctioned ONLY for O(1) scalars / O(partitions)
    offset maps / O(buckets)/O(destinations) pruning lists / k-row
    frames, and must say so: a ``bounded-collect:`` justification comment
    within the six preceding lines (mirrors the localCheckpoint audit,
    mechanizing what previous rounds' verdicts re-derived by hand).  A
    new unbounded collect therefore cannot land without either a marker
    (visible in review) or failing this test."""
    import os

    pkg = os.path.join(os.path.dirname(os.path.dirname(__file__)),
                       "debezium_server_bigquery_spark")
    offenders = []
    for root, _dirs, files in os.walk(pkg):
        for fname in files:
            if not fname.endswith(".py"):
                continue
            path = os.path.join(root, fname)
            rel = os.path.relpath(path, pkg)
            with open(path) as f:
                lines = f.readlines()
            for i, line in enumerate(lines):
                if ".collect()" not in line:
                    continue
                ctx = "".join(lines[max(0, i - 6) : i + 1])
                if "bounded-collect:" not in ctx:
                    offenders.append(
                        f"{rel}:{i + 1}: missing bounded-collect "
                        f"justification comment"
                    )
    assert not offenders, (
        "collect() sites without a bounded-collect: justification "
        f"comment: {offenders}"
    )


# A bare orderBy over a MAP-ONLY child re-executes the whole lineage in
# the range partitioner's sampling pass (regex projections, JSON parsing,
# even mapInPandas Python stages run twice — measured 2x end-to-end on
# text_quality_score, round 11).  operators/rank.py::ordered_output is
# the fix; tools/scan_range_sampling.py the interactive scanner.  Sorts
# whose child is a tiny just-written/readback table are exempt: the
# double scan is O(result) and an extra exchange would only add latency.
# Explicit allowlist (r12, VERDICT r11 ask #6): every query whose final
# bare sort deliberately samples a map-only lineage, pinned BY NAME so a
# NEW bare sort — even in an e2e query — fails the audit instead of
# hiding in a pattern-skipped class.  The 11 e2e entries sort a parquet
# readback of the tiny result table the e2e run just wrote (double scan
# is O(result)); bpe_train_merges sorts the checkpointed k-row merge
# table.  Regenerate candidates with tools/scan_range_sampling.py.
_MAP_ONLY_SORT_EXEMPT = {
    "bpe_train_merges",
    "cli_run_e2e",
    "incremental_snapshot_e2e",
    "ivm_incremental_agg_e2e",
    "ivm_incremental_join_e2e",
    "pipeline_metrics_e2e",
    "pipeline_schema_history_e2e",
    "pipeline_stream_e2e",
    "pipeline_transform_hook_e2e",
    "pipeline_upsert_e2e",
    "scd2_sink_e2e",
    "stream_window_finalize_e2e",
}

from debezium_server_bigquery_spark.planwalk import (  # noqa: E402
    map_only_range_exchanges as _map_only_range_exchanges,
)


@pytest.mark.parametrize("name,fn", _ALL, ids=[n for n, _ in _ALL])
def test_no_map_only_range_sort(spark, name, fn):
    """Registry-wide ban on the range-sampling double-compute (see the
    module comment above): every sort must sample a materialized stage,
    not a raw scan→projection lineage."""
    if name in _MAP_ONLY_SORT_EXEMPT:
        pytest.skip("allowlisted readback/tiny-table sort: double scan is O(result)")
    hits = _map_only_range_exchanges(_physical(fn(spark, SF_DIR)))
    assert not hits, (
        f"{name}: range sort samples a map-only lineage (use "
        f"operators/rank.py::ordered_output): {hits}"
    )


@pytest.mark.parametrize("name,fn", _ALL, ids=[n for n, _ in _ALL])
def test_no_single_partition_window(spark, name, fn):
    """Registry-wide ban on unpartitioned windows over unbounded inputs —
    the shape ``operators/rank.py`` exists to replace.  Would have caught
    the three pre-round-6 stragglers (q_top_customers, w_spend_quartiles,
    q15_top_supplier) at introduction time."""
    plan = _physical(fn(spark, SF_DIR))
    offenders = _single_partition_windows(plan)
    assert not offenders, (
        f"{name}: Window over Exchange SinglePartition with no upstream "
        f"limit — ALL rows collapse to one task at scale; use "
        f"operators/rank.global_row_number, orderBy().limit(k), or a "
        f"max-aggregate broadcast join instead.  Offending nodes: "
        f"{offenders}"
    )
