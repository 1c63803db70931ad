"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship query smoke check at sf0.001.
``queries()`` — every implemented operator from SURVEY.md §2 as
(spark, sf_dir) -> DataFrame callables.
``oracle_sql()`` — DuckDB-runnable ANSI-SQL twins for the hash compare.

Registration order is deliberate: one representative of every operator
family (CDC pipeline, sessionization, asof/range/skew joins, dedup,
similarity, sketches, text, multimodal, packing) is registered BEFORE the
long tail of TPC-H-shaped analytics, so a driver that grades a prefix of
the dict still sees every distinct component.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    from debezium_server_bigquery_spark.plans.analytics import q1_pricing_summary

    return q1_pricing_summary(spark, "/root/testdata/sf0.001")


def _collect(attr: str) -> dict:
    """Merge module.<attr> dicts in operator-family-first order.

    An import failure must not silently drop a query group (the gate would
    record nothing at all for it); instead register a callable that raises
    the original error so the failure shows up as an erring row.
    """
    groups = [
        ("debezium_server_bigquery_spark.plans.analytics",),
        ("debezium_server_bigquery_spark.plans.cdc_queries",),
        ("debezium_server_bigquery_spark.plans.pipeline_queries",),
        ("debezium_server_bigquery_spark.streaming.sessions",),
        ("debezium_server_bigquery_spark.streaming.stream_join",),
        ("debezium_server_bigquery_spark.operators.asof",),
        ("debezium_server_bigquery_spark.operators.rangejoin",),
        ("debezium_server_bigquery_spark.operators.skewjoin",),
        ("debezium_server_bigquery_spark.operators.scd",),
        ("debezium_server_bigquery_spark.functions.dedup_fuzzy",),
        ("debezium_server_bigquery_spark.functions.dedup_incremental",),
        ("debezium_server_bigquery_spark.functions.decontamination",),
        ("debezium_server_bigquery_spark.functions.timeseries",),
        ("debezium_server_bigquery_spark.functions.similarity",),
        ("debezium_server_bigquery_spark.functions.pq",),
        ("debezium_server_bigquery_spark.functions.contrastive",),
        ("debezium_server_bigquery_spark.functions.kmeans",),
        ("debezium_server_bigquery_spark.functions.graph",),
        ("debezium_server_bigquery_spark.functions.sketches",),
        ("debezium_server_bigquery_spark.functions.text",),
        ("debezium_server_bigquery_spark.functions.bpe",),
        ("debezium_server_bigquery_spark.functions.bm25",),
        ("debezium_server_bigquery_spark.functions.lm",),
        ("debezium_server_bigquery_spark.functions.pca",),
        ("debezium_server_bigquery_spark.functions.regression",),
        ("debezium_server_bigquery_spark.functions.features",),
        ("debezium_server_bigquery_spark.functions.fusion",),
        ("debezium_server_bigquery_spark.functions.multimodal",),
        ("debezium_server_bigquery_spark.functions.packing",),
        ("debezium_server_bigquery_spark.functions.chunking",),
        ("debezium_server_bigquery_spark.functions.recipe",),
        ("debezium_server_bigquery_spark.functions.spans",),
        ("debezium_server_bigquery_spark.functions.curation",),
        ("debezium_server_bigquery_spark.functions.datacard",),
        ("debezium_server_bigquery_spark.functions.quantize",),
        ("debezium_server_bigquery_spark.functions.dedup_clusters",),
        ("debezium_server_bigquery_spark.functions.mixing",),
        ("debezium_server_bigquery_spark.functions.sharding",),
        ("debezium_server_bigquery_spark.functions.geo",),
        ("debezium_server_bigquery_spark.functions.linkage",),
        ("debezium_server_bigquery_spark.functions.stattests",),
        ("debezium_server_bigquery_spark.operators.zorder",),
        ("debezium_server_bigquery_spark.operators.bucketing",),
        ("debezium_server_bigquery_spark.operators.skyline",),
        ("debezium_server_bigquery_spark.plans.funnel",),
        ("debezium_server_bigquery_spark.plans.experiments",),
        ("debezium_server_bigquery_spark.plans.behavior",),
        ("debezium_server_bigquery_spark.plans.segmentation",),
        ("debezium_server_bigquery_spark.plans.diagnostics",),
        ("debezium_server_bigquery_spark.plans.profiler",),
        ("debezium_server_bigquery_spark.plans.validation",),
        ("debezium_server_bigquery_spark.plans.constraints",),
        ("debezium_server_bigquery_spark.plans.analytics_windows",),
        ("debezium_server_bigquery_spark.plans.analytics_ext",),
        ("debezium_server_bigquery_spark.plans.analytics_tpch2",),
    ]
    import importlib

    out: dict = {}
    for (modname,) in groups:
        try:
            mod = importlib.import_module(modname)
            out.update(getattr(mod, attr))
        except Exception as exc:  # loud, per-group: one broken module must
            if attr == "QUERIES":  # not hide the rest, nor vanish silently
                msg = f"import of {modname} failed: {exc!r}"

                def _raiser(spark, sf_dir, _msg=msg):
                    raise ImportError(_msg)

                out[f"IMPORT_ERROR_{modname.rsplit('.', 1)[-1]}"] = _raiser
    return out


# GRADED-PREFIX ORDER — generated from driver history, not hand-curated.
#
# The driver grades a fixed-size PREFIX of the queries() dict each round,
# so the dict's order IS the rotation schedule.  Through round 9 the order
# was a hand-maintained list (`_TIER1`); per the round-9 verdict's ask #3
# it is now computed from the CORRECTNESS_r*.json files the driver leaves
# on disk.  The policy (unchanged since its round-8 amendment, plus the
# round-9 refresh rule) is encoded in `_policy_key` and asserted by
# tests/test_prefix_policy.py:
#
#   0. FAST LANE — any query whose most recent driver row is red
#      (error, row/schema mismatch, or hash mismatch) re-enters first;
#      the round-7 board looked all-green only because three round-1
#      reds were never re-queued.
#   1. REFRESH CEILING — the CDC parity core (coercion trio +
#      route/dedup/upsert/append/nested-envelope) never goes more than
#      _REFRESH_MAX_AGE rounds without a driver row.
#   2. NEVER GRADED — queries with no driver row yet, e2e gate queries
#      (`*_e2e`: the physical write paths the reference's tests exercise
#      hardest) first, then registration order (operator-family-first,
#      see _collect).
#   3. GRADED GREEN — stalest latest-row first, so every query's latest
#      row keeps aging back toward the prefix and nothing stays ungraded
#      past ~5 rounds once the never-graded backlog drains.  Queries
#      green in the two most recent consecutive rounds sort to the back
#      automatically (they have the freshest rows).
#
# Ties inside each class break by registration order, which _collect
# arranges operator-family-first so a prefix sees every distinct
# component.  A rows-only row (err == "no_oracle" with a spark row
# count) counts as graded-green for ordering: it ran and row-checked;
# the weaker check is the oracle's absence, not a failure.
#
# REGISTRATION CAP (round-10 verdict ask #3): with ~280 queries and 50
# driver slots per round, the steady-state refresh period is ~5.6
# rounds; new registrations are capped at ~10 per round from round 12
# on so the period stays under ~7 rounds and ever-graded coverage
# stays at 100%.  (Rounds 10-11 were a full registration freeze to
# drain the never-graded backlog.)

_REFRESH_CORE = frozenset(
    {
        "cdc_coerce_scalars",
        "cdc_coerce_exotic",
        "cdc_nested_envelope",
        "cdc_route",
        "cdc_dedup_last_writer",
        "cdc_upsert_final_state",
        "cdc_append_stats",
    }
)
_REFRESH_MAX_AGE = 3


def _row_is_green(row: dict) -> bool:
    """Red = the driver recorded an error, any explicit mismatch, or an
    empty/degenerate row carrying no affirmative signal at all (e.g. a
    timeout recorded as ``{}``) — such a row must re-queue via the fast
    lane, not sort to the back as the freshest green."""
    err = row.get("err")
    if err == "no_oracle":  # rows-only row: ran and row-checked
        return row.get("spark_rows") is not None
    if err is not None:
        return False
    if (
        row.get("rows_match") is False
        or row.get("schema_match") is False
        or row.get("hash_match") is False
    ):
        return False
    return (
        row.get("rows_match") is True
        or row.get("schema_match") is True
        or row.get("hash_match") is True
        or row.get("spark_rows") is not None
    )


def grading_history(repo_dir: str | None = None) -> tuple[int, dict]:
    """Parse CORRECTNESS_r*.json -> (current_round, {name: (round, green)}).

    Keeps each query's MOST RECENT driver row only — that is what the
    rotation policy keys on.  current_round = 1 + newest file's round.
    """
    import glob
    import json
    import os
    import re

    repo_dir = repo_dir or os.path.dirname(os.path.abspath(__file__))
    latest: dict[str, tuple[int, bool]] = {}
    max_round = 0
    for path in glob.glob(os.path.join(repo_dir, "CORRECTNESS_r*.json")):
        m = re.search(r"CORRECTNESS_r(\d+)\.json$", path)
        if not m:
            continue
        rnd = int(m.group(1))
        try:
            with open(path) as f:
                rows = json.load(f)
        except Exception:
            # A torn/malformed artifact (driver crash mid-write) must not
            # break queries(), but its ROUND NUMBER still counts toward
            # current_round: otherwise that round's reds never age back
            # into the fast lane and the CDC refresh ceiling loosens.
            import sys

            print(
                f"warning: malformed grading artifact skipped: {path}",
                file=sys.stderr,
            )
            max_round = max(max_round, rnd)
            continue
        if not isinstance(rows, dict):
            import sys

            print(
                f"warning: non-dict grading artifact skipped: {path}",
                file=sys.stderr,
            )
            max_round = max(max_round, rnd)
            continue
        max_round = max(max_round, rnd)
        for name, row in rows.items():
            if not isinstance(row, dict):
                continue
            if name not in latest or rnd > latest[name][0]:
                latest[name] = (rnd, _row_is_green(row))
    return max_round + 1, latest


def _policy_key(name: str, reg_index: int, current_round: int, latest: dict):
    """Sort key implementing the rotation policy above (lower = earlier)."""
    row = latest.get(name)
    if row is not None and not row[1]:
        return (0, 0, reg_index)  # fast lane: latest row red
    if (
        row is not None
        and name in _REFRESH_CORE
        and current_round - row[0] >= _REFRESH_MAX_AGE
    ):
        return (1, 0, reg_index)  # refresh ceiling hit
    if row is None:
        return (2, 0 if name.endswith("_e2e") else 1, reg_index)
    return (3, row[0], reg_index)  # graded green: stalest first


def prefix_order(names: list[str], repo_dir: str | None = None) -> list[str]:
    """All registered names in graded-prefix order under the policy."""
    current_round, latest = grading_history(repo_dir)
    reg = {n: i for i, n in enumerate(names)}
    return sorted(names, key=lambda n: _policy_key(n, reg[n], current_round, latest))


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    qs = _collect("QUERIES")
    return {k: qs[k] for k in prefix_order(list(qs))}


def oracle_sql() -> dict[str, str]:
    # Same order as queries(); entries without an oracle are simply absent.
    oracles = _collect("ORACLES")
    out = {k: oracles[k] for k in prefix_order(list(_collect("QUERIES"))) if k in oracles}
    out.update({k: v for k, v in oracles.items() if k not in out})
    return out
