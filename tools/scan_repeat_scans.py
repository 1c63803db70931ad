"""Find queries that scan the same base table multiple times.

Round-12 discovery (the round-11 range-sampling finding's sibling): the
``crossJoin(broadcast(per_group.agg(...)))`` idiom — derive a per-group
aggregate, then a global total from it, then join both back — plans the
per-group aggregate's FULL LINEAGE once per derivation level.  AQE's
exchange reuse recovers some of it, but broadcast subtrees re-execute
the base scan + projection: measured on ``mix_domain_weights`` at
sf0.1, the corpus scan + regexp tokenization runs twice and the query
costs 1.8x what it costs with the O(sources) first-level aggregate
checkpointed (``checkpoint_parquet`` — one corpus scan, every derived
branch re-reads the tiny table).

This tool builds every registered query's physical plan at sf0.001 and
reports queries whose plan contains >= 2 scan nodes of the same
EXPENSIVE base table (documents / lineitem / orders / events /
embeddings — the tables whose scan or row-level projection dominates at
100 TB).  A flag is a CANDIDATE, not a verdict: AQE may reuse the
stage at runtime, double-scans of a dimension table are immaterial, and
e2e queries rescan tables they just wrote.  Convert a flagged query
only when (a) the repeated subtree includes per-row compute (regexp,
hashing, HOF algebra) or a fact-table scan AND (b) the first-level
aggregate is provably bounded (O(groups)), so the checkpoint write is
metadata-sized.
"""

from __future__ import annotations

import os
import re
import sys
from collections import Counter

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = "/root/testdata/sf0.001"

EXPENSIVE = ("documents", "lineitem", "orders", "events", "embeddings")

_PATH_RE = re.compile(r"Location:.*?/(\w+)\.parquet")


def table_scan_counts(plan: str) -> Counter:
    """Count scan nodes per base table from the plan's Location lines."""
    return Counter(m.group(1) for m in _PATH_RE.finditer(plan))


def main() -> int:
    import __spark_entry__ as E
    from debezium_server_bigquery_spark import get_spark

    spark = get_spark("scan-repeat-scans")
    spark.sparkContext.setLogLevel("ERROR")
    spark.conf.set("spark.sql.debug.maxToStringFields", "1000")
    flagged = 0
    for name, fn in sorted(E.queries().items()):
        try:
            df = fn(spark, SF_DIR)
            plan = df._jdf.queryExecution().executedPlan().toString()
        except Exception as exc:
            print(f"BUILD-ERR {name}: {exc!r}"[:160], file=sys.stderr)
            continue
        counts = table_scan_counts(plan)
        hot = {t: c for t, c in counts.items() if t in EXPENSIVE and c >= 2}
        if hot:
            flagged += 1
            print(f"FLAG {name}: " + ", ".join(f"{t} x{c}" for t, c in sorted(hot.items())))
    print(f"\n{flagged} queries flagged")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
