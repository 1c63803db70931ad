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


def test_dynamic_seeds_match_reference_constructor():
    # DynamicBatchSizeWait.java:36-42 seeds 1,1,1 / 100,100,100
    w = DynamicBatchSizeWait(max_batch_size=100)
    assert list(w.batch_size_history) == [1, 1, 1]
    assert list(w.sleep_ms_history) == [100, 100, 100]


def test_dynamic_nonpositive_count_returns_last_sleep_unchanged():
    # DynamicBatchSizeWait.java:52-54
    w = DynamicBatchSizeWait(max_batch_size=100)
    w.sleep_ms_history.append(5000)
    assert w.get_wait_ms(0) == 5000
    assert w.get_wait_ms(-3) == 5000
    assert list(w.batch_size_history) == [1, 1, 1]  # no history mutation


def test_dynamic_85_to_90_band_returns_without_append():
    # DynamicBatchSizeWait.java:71-73 — return last, don't record
    w = DynamicBatchSizeWait(max_batch_size=100)
    w.batch_size_history.extend([87, 87])  # -> avg([1,87,87])... then fill
    w.sleep_ms_history.append(7000)
    before = list(w.sleep_ms_history)
    # batch 87 -> history [87,87,87], avg 87 -> fill 0.87 in [0.85, 0.90)
    assert w.get_wait_ms(87) == 7000
    assert list(w.sleep_ms_history) == before


def test_dynamic_scales_last_sleep_not_average():
    # DynamicBatchSizeWait.java:62-70 scales sleepMsHistory.getLast()
    w = DynamicBatchSizeWait(max_batch_size=100, max_wait_ms=300_000)
    w.sleep_ms_history.extend([10_000, 20_000])  # history [100, 10000, 20000]
    # batch 100 -> fill avg([1,1,100])/100 = 0.34 -> grow from LAST (20000)
    assert w.get_wait_ms(100) == 20_000 * 100 // 100
    w2 = DynamicBatchSizeWait(max_batch_size=100, max_wait_ms=300_000)
    w2.batch_size_history.extend([100, 100])
    w2.sleep_ms_history.extend([10_000, 20_000])
    # fill 1.0 >= 0.97 -> last * 0.5 = 10000 (avg would give 5016)
    assert w2.get_wait_ms(100) == 10_000


def test_dynamic_wait_subtracts_processing_time():
    # DynamicBatchSizeWait.java:84-90
    w = DynamicBatchSizeWait(max_batch_size=100)
    w.sleep_ms_history.append(10_000)
    assert w.wait_ms(0, processing_time_ms=3_000) == 7_000
    w.sleep_ms_history.append(2_500)
    assert w.wait_ms(0, processing_time_ms=1_000) == 0  # 1500 <= 2000 skip


def test_dynamic_trigger_mapping():
    assert "processingTime" in DynamicBatchSizeWait().trigger_kwargs()
    assert MaxBatchSizeWait().trigger_kwargs() == {"availableNow": True}
