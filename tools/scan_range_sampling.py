"""Find queries whose final sort pays the range-sampling double-compute.

A bare ``orderBy`` compiles to ``Exchange rangepartitioning``; picking the
range split points SAMPLES the exchange's child, re-executing it.  If the
child subtree contains another Exchange (AQE materializes that stage) the
sampling pass is a cheap shuffle read — but a MAP-ONLY child (projection
straight off the scan) is re-executed from parquet, doubling whatever the
projection costs (measured 2x on text_quality_score, fixed in round 11 by
inserting a hash repartition before the sort).

This tool walks every registered query's physical plan at sf0.001 and
reports range exchanges with no Exchange / Aggregate / Join anywhere
below them — the candidates for the same fix.  Indentation-based tree
walk over the plan text (same approach as tests/test_plan_audit.py).

Round-11 sweep: 28 flagged; 16 converted to
``operators/rank.py::ordered_output`` (the text_* family, the CDC
coercion trio, geometry decode, chunking/PII, quantize, bernoulli
sampling, and both mapInPandas multimodal queries, where the sampler
re-executed the Python stage).  The remaining 12 flags are the
e2e/readback class: their sort child is a parquet scan of the tiny
result table the e2e run just wrote, so the sampling re-scan is
O(result) and an extra exchange would only add latency — deliberately
left bare.
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = "/root/testdata/sf0.001"

_MATERIALIZING = re.compile(
    r"Exchange hashpartitioning|Exchange SinglePartition|HashAggregate|"
    r"SortAggregate|ObjectHashAggregate|SortMergeJoin|BroadcastHashJoin|"
    r"ShuffledHashJoin|BroadcastNestedLoopJoin|Window|AQEShuffleRead|"
    r"ShuffleQueryStage|TableCacheQueryStage"
)


def _indent(line: str) -> int:
    return len(line) - len(line.lstrip(" +-:*"))


def map_only_range_exchanges(plan: str) -> list[str]:
    """Range-exchange lines whose subtree has no materializing operator."""
    lines = plan.split("\n")
    hits = []
    for i, line in enumerate(lines):
        if "Exchange rangepartitioning" not in line:
            continue
        base = _indent(line)
        subtree = []
        for nxt in lines[i + 1 :]:
            if not nxt.strip():
                continue
            if _indent(nxt) <= base:
                break
            subtree.append(nxt)
        if not any(_MATERIALIZING.search(s) for s in subtree):
            hits.append(line.strip()[:160])
    return hits


def main() -> int:
    import __spark_entry__ as E
    from debezium_server_bigquery_spark import get_spark

    spark = get_spark("scan-range-sampling")
    spark.sparkContext.setLogLevel("ERROR")
    spark.conf.set("spark.sql.debug.maxToStringFields", "1000")
    flagged = {}
    for name, fn in sorted(E.queries().items()):
        try:
            df = fn(spark, SF_DIR)
            plan = df._jdf.queryExecution().executedPlan().toString()
        except Exception as exc:
            print(f"BUILD-ERR {name}: {exc!r}"[:160], file=sys.stderr)
            continue
        hits = map_only_range_exchanges(plan)
        if hits:
            flagged[name] = hits
            print(f"FLAG {name}: {len(hits)} map-only range exchange(s)")
            for h in hits:
                print(f"     {h}")
    print(f"\n{len(flagged)} queries flagged")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
