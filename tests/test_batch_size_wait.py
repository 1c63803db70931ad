"""T2-T4 batch-size-wait policy tests (pure logic, no Spark)."""

from __future__ import annotations

from debezium_server_bigquery_spark.streaming.batch_size_wait import (
    DynamicBatchSizeWait,
    MaxBatchSizeWait,
    NoBatchSizeWait,
)


def test_no_wait():
    assert NoBatchSizeWait().wait_ms(100) == 0


def test_max_wait_returns_zero_when_queue_full():
    w = MaxBatchSizeWait(max_batch_size=10, queue_size_fn=lambda: 50)
    assert w.wait_ms(0) == 0


def test_max_wait_bounded_by_max_wait_ms():
    w = MaxBatchSizeWait(
        max_batch_size=10, max_wait_ms=25_000, wait_interval_ms=10_000,
        queue_size_fn=lambda: 0,
    )
    assert w.wait_ms(0) == 25_000  # 10k + 10k + 5k steps


def test_max_wait_skipped_during_snapshot():
    w = MaxBatchSizeWait(
        max_batch_size=10, queue_size_fn=lambda: 0, snapshot_running_fn=lambda: True
    )
    assert w.wait_ms(0) == 0  # MaxBatchSizeWait.java:41-43


def test_dynamic_shrinks_sleep_when_full():
    w = DynamicBatchSizeWait(max_batch_size=100, max_wait_ms=300_000)
    # consistently full batches -> sleep scaled down by 0.5 each round
    first = w.wait_ms(100)
    for _ in range(10):
        last = w.wait_ms(100)
    assert last <= first
    assert last == 0  # decayed under the 2000ms skip threshold (:84-90)


def test_dynamic_grows_sleep_when_starved():
    w = DynamicBatchSizeWait(max_batch_size=100, max_wait_ms=300_000)
    sleeps = [w.wait_ms(5) for _ in range(5)]
    assert sleeps[-1] >= sleeps[0]  # proportional growth below 85% fill
    assert sleeps[-1] <= 300_000  # bounded by max-wait-ms


def test_dynamic_trigger_mapping():
    assert "processingTime" in DynamicBatchSizeWait().trigger_kwargs()
    assert MaxBatchSizeWait().trigger_kwargs() == {"availableNow": True}
