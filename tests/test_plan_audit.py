"""Global physical-plan audit over the ENTIRE query registry.

tests/test_plans.py locks in per-query plan properties; this module locks
in the one invariant every operator must satisfy at 100 TB: no plan may
contain an unbounded cartesian product.  Every all-pairs scan the engine
ever shipped (simhash round-1, embedding near-dup round-1) would have been
caught here — the audit exists so the next one is.

Build-only (no execution): `executedPlan` materializes the physical plan
without running a job, so auditing all ~86 queries costs seconds.  The
e2e pipeline queries DO run their write path when the DataFrame is built;
they are audited on their (small, deterministic) sf0.001 output plans.
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
