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

Round 12: the detector moved to ``debezium_server_bigquery_spark/
planwalk.py`` (shared with the CI gate so the two can't drift), and the
12-name exemption set above is now pinned BY NAME in
``tests/test_plan_audit.py::_MAP_ONLY_SORT_EXEMPT`` — a new bare sort
in ANY query, e2e included, fails the audit until it is either
converted to ``ordered_output`` or deliberately allowlisted there.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from debezium_server_bigquery_spark.planwalk import (  # noqa: E402
    map_only_range_exchanges,
)

SF_DIR = "/root/testdata/sf0.001"


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
