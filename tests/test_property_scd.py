"""Property-based checks for the SCD2 family.

1. ``scd2_from_changes`` must agree with a plain-Python recomputation of
   the versioning semantics on arbitrary small change streams (the
   independent oracle, the way the DuckDB twin pins fixed data).
2. The incremental sink (``scd2_merge_batch``) applied over an ARBITRARY
   split of the stream into ordered micro-batches must converge to the
   same history as the one-shot batch build — including splits that
   deliver events out of time order across epochs, the case the
   full-key re-window exists for.
"""

from __future__ import annotations

import pytest

import shutil
import tempfile

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from debezium_server_bigquery_spark.operators.scd import (
    scd2_from_changes,
    scd2_merge_batch,
)

_OP_PRI = {"c": 1, "r": 2, "u": 3, "d": 4}

# (key, ts, op); event_id assigned by list position, value derived
_EVENT = st.tuples(
    st.integers(min_value=1, max_value=3),
    st.integers(min_value=0, max_value=20),
    st.sampled_from("crud"),
)
_STREAM = st.lists(_EVENT, min_size=1, max_size=14)


def _rows(events):
    return [
        (k, ts, op, float(i), i) for i, (k, ts, op) in enumerate(events)
    ]


def _py_scd2(rows):
    bykey: dict = {}
    for r in rows:
        bykey.setdefault(r[0], []).append(r)
    out = set()
    for k, evs in bykey.items():
        evs.sort(key=lambda r: (r[1], _OP_PRI[r[2]], r[4]))
        vn = 0
        for i, e in enumerate(evs):
            nxt = evs[i + 1][1] if i + 1 < len(evs) else None
            if e[2] == "d":
                continue
            vn += 1
            out.add((k, vn, e[1], nxt, e[3], e[4]))
    return out


def _spark_df(spark, rows):
    return spark.createDataFrame(
        rows, "user_id long, ts long, __op string, value double, event_id long"
    )


def _hist_set(df):
    return {
        (r.user_id, r.version_num, r.valid_from, r.valid_to, r.value, r.event_id)
        for r in df.select(
            "user_id", "version_num", "valid_from", "valid_to", "value", "event_id"
        ).collect()
    }


@settings(
    max_examples=10, deadline=None, suppress_health_check=[HealthCheck.too_slow]
)
@given(_STREAM)
def test_scd2_matches_python_oracle(spark, events):
    rows = _rows(events)
    got = _hist_set(
        scd2_from_changes(
            _spark_df(spark, rows), ["user_id"], "ts", tiebreak=("event_id",)
        )
    )
    assert got == _py_scd2(rows)


@settings(
    max_examples=6, deadline=None, suppress_health_check=[HealthCheck.too_slow]
)
@given(_STREAM, st.lists(st.integers(min_value=0, max_value=2), min_size=14, max_size=14))
@pytest.mark.heavy
def test_scd2_sink_converges_under_any_split(spark, events, epoch_of):
    """Assign each event to one of three epochs arbitrarily (so epochs can
    be wildly out of time order) — the merged table must equal the one-shot
    batch history."""
    from debezium_server_bigquery_spark.operators.table import ParquetTable

    rows = _rows(events)
    expected = _py_scd2(rows)
    root = tempfile.mkdtemp(prefix="dsbq_scdprop_")
    try:
        table = ParquetTable(
            spark, root + "/dim", key_cols=("user_id",), mode="upsert", n_buckets=2
        )
        for epoch in (0, 1, 2):
            batch = [r for i, r in enumerate(rows) if epoch_of[i] == epoch]
            scd2_merge_batch(
                table, _spark_df(spark, batch), order_col="ts", epoch_id=epoch
            )
        got = _hist_set(table.read().filter(F.col("__op") != "d"))
        assert got == expected
    finally:
        shutil.rmtree(root, ignore_errors=True)
