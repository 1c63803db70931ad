"""T7 — bounded retry/backoff around destination writes.

Budgets mirror the reference: 5 attempts (ConsumerUtil.java:134-147),
500 ms x1.1 backoff (StreamDataWriter.java:73-79), 5-minute elapsed cap.
Injected transient failures must be absorbed with unchanged replay
semantics (epoch markers written exactly once, no duplicate rows).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from debezium_server_bigquery_spark.operators.retry import (
    NO_WAIT_POLICY,
    RetryPolicy,
    with_retry,
)
from debezium_server_bigquery_spark.operators.table import ParquetTable


class Flaky:
    def __init__(self, fail_times: int, exc=OSError("transient fs hiccup")):
        self.fail_times = fail_times
        self.calls = 0
        self.exc = exc

    def __call__(self):
        self.calls += 1
        if self.calls <= self.fail_times:
            raise self.exc
        return "ok"


def test_with_retry_absorbs_transient_failures():
    flaky = Flaky(fail_times=2)
    sleeps: list[float] = []
    assert (
        with_retry(flaky, policy=RetryPolicy(), sleep=sleeps.append) == "ok"
    )
    assert flaky.calls == 3
    # 500ms then 500*1.1ms — the StreamDataWriter.java:73-79 schedule.
    assert sleeps == [0.5, pytest.approx(0.55)]


def test_with_retry_exhausts_budget_and_reraises():
    flaky = Flaky(fail_times=100)
    with pytest.raises(OSError, match="transient"):
        with_retry(flaky, policy=NO_WAIT_POLICY)
    assert flaky.calls == 5  # attempts budget, ConsumerUtil.java:138


def test_with_retry_lets_interrupts_propagate():
    """Ctrl-C during a write must abort immediately, not re-run the
    action for 5 attempts."""
    calls = {"n": 0}

    def interrupted():
        calls["n"] += 1
        raise KeyboardInterrupt

    with pytest.raises(KeyboardInterrupt):
        with_retry(interrupted, policy=NO_WAIT_POLICY)
    assert calls["n"] == 1


def test_with_retry_respects_elapsed_cap():
    flaky = Flaky(fail_times=100)
    t = {"now": 0.0}

    def clock():
        t["now"] += 200.0  # every attempt "takes" 200s
        return t["now"]

    with pytest.raises(OSError):
        with_retry(flaky, policy=RetryPolicy(), sleep=lambda s: None, clock=clock)
    assert flaky.calls < 5  # stopped by the 5-minute elapsed cap, not attempts


def _rows(spark, ids):
    return spark.createDataFrame(
        [(i, f"v{i}") for i in ids], "id long, val string"
    ).select(
        "id",
        "val",
        F.to_timestamp(F.lit("2024-01-15T00:00:00")).alias("__ts_ms"),
        F.lit(0).cast("long").alias("__source_ts_ms"),
    )


def test_append_retries_transient_write_failure(spark, tmp_path, monkeypatch):
    t = ParquetTable(
        spark, str(tmp_path / "t"), mode="append", retry_policy=NO_WAIT_POLICY
    )
    original = ParquetTable._write_append
    state = {"fails": 2, "calls": 0}

    def flaky_write(self, out):
        state["calls"] += 1
        if state["calls"] <= state["fails"]:
            raise OSError("transient fs hiccup")
        return original(self, out)

    monkeypatch.setattr(ParquetTable, "_write_append", flaky_write)
    t.append(_rows(spark, range(10)), epoch_id=0)
    assert state["calls"] == 3
    assert t.read().count() == 10
    # replay of the committed epoch is a no-op (marker, not retry, decides)
    t.append(_rows(spark, range(10)), epoch_id=0)
    assert state["calls"] == 3
    assert t.read().count() == 10


def test_append_fails_loud_after_budget(spark, tmp_path, monkeypatch):
    t = ParquetTable(
        spark, str(tmp_path / "t"), mode="append", retry_policy=NO_WAIT_POLICY
    )

    def always_fail(self, out):
        raise OSError("permanent outage")

    monkeypatch.setattr(ParquetTable, "_write_append", always_fail)
    with pytest.raises(OSError, match="permanent"):
        t.append(_rows(spark, range(10)), epoch_id=0)
    # the epoch never committed -> a later (healed) replay writes the rows
    monkeypatch.undo()
    t.append(_rows(spark, range(10)), epoch_id=0)
    assert t.read().count() == 10


def test_merge_swap_retry_is_idempotent(spark, tmp_path, monkeypatch):
    """A transient failure mid-swap (the overwrite->marker window the
    verdict flagged) replays without duplicating or losing partitions."""
    import os

    t = ParquetTable(
        spark,
        str(tmp_path / "t"),
        key_cols=["id"],
        mode="upsert",
        n_buckets=4,
        retry_policy=NO_WAIT_POLICY,
    )
    t.append(_rows(spark, range(20)), epoch_id=0)
    before = sorted(tuple(r) for r in t.read().collect())

    # Fail the first SWAP os.replace of the compaction, then heal.  Scope
    # the injection to partition-directory renames: epoch-marker commits
    # also publish via os.replace now, and failing one of those would test
    # the wrong code path.
    real_replace = os.replace
    state = {"calls": 0}

    def flaky_replace(src, dst):
        if "_epochs" in str(dst):
            return real_replace(src, dst)
        state["calls"] += 1
        if state["calls"] == 1:
            raise OSError("transient rename failure")
        return real_replace(src, dst)

    monkeypatch.setattr(os, "replace", flaky_replace)
    t.append(_rows(spark, range(20)), epoch_id=1)  # fragment the buckets
    assert t.compact(max_files_per_partition=1) > 0
    rows = sorted(set(tuple(r) for r in t.read().collect()))
    assert rows == before
    assert state["calls"] >= 2  # the swap actually retried


def test_pipeline_retry_e2e_converges_to_no_fault_state(spark):
    """The gate query itself: every destination's first physical append
    attempt fails, the bounded retry re-runs it, and the final state is
    byte-identical to a fault-free append replication."""
    from debezium_server_bigquery_spark.plans.pipeline_queries import (
        pipeline_retry_e2e,
    )

    rows = pipeline_retry_e2e(spark, "/root/testdata/sf0.001").collect()
    assert len(rows) > 0
    # destination tables are intact and complete: totals match the raw feed
    from debezium_server_bigquery_spark.sources.cdc import synthesize_cdc_events
    from debezium_server_bigquery_spark.sources.tables import load_table
    from pyspark.sql import functions as F

    synth = synthesize_cdc_events(
        load_table(spark, "/root/testdata/sf0.001", "events")
    ).filter(~F.col("destination").startswith("__debezium-heartbeat"))
    assert sum(r.n_rows for r in rows) == synth.count()
    assert sum(r.sum_event_id for r in rows) == (
        synth.agg(F.sum("event_id")).collect()[0][0]
    )
