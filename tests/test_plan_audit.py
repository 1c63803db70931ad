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
(dedup_lsh_recall, ann_ivf_recall, lm_bigram_topk, doc_lm_quality_bottomk —
``sources/tables.py::checkpoint_parquet`` writes the shared substrate to
scratch parquet at plan build; memoized per logical plan, so this suite
pays each write once per interpreter).
"""

from __future__ import annotations

import pytest

import __spark_entry__ as E

SF_DIR = "/root/testdata/sf0.001"

_ALL = sorted(E.queries().items())


def _physical(df) -> str:
    df.sparkSession.conf.set("spark.sql.debug.maxToStringFields", "1000")
    return df._jdf.queryExecution().executedPlan().toString()


@pytest.mark.parametrize("name,fn", _ALL, ids=[n for n, _ in _ALL])
def test_no_cartesian_product(spark, name, fn):
    plan = _physical(fn(spark, SF_DIR))
    assert "CartesianProduct" not in plan, (
        f"{name}: cartesian product in physical plan — unbounded all-pairs "
        f"scan, O(n^2) at scale"
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
