"""T2-T4 — batch-size-wait trigger policies (SURVEY §2.7).

The reference throttles its source poll loop so batches arrive full:
``NoBatchSizeWait`` (batchsizewait/NoBatchSizeWait.java:21-26),
``MaxBatchSizeWait`` (MaxBatchSizeWait.java:39-71) and the feedback
controller ``DynamicBatchSizeWait`` (DynamicBatchSizeWait.java:51-90).

In Spark the first-class lever is the trigger (``availableNow`` /
``processingTime``) plus source rate limits, so these classes do double
duty: they compute a wait in ms (pure logic, unit-tested for parity) and
advertise the equivalent trigger configuration via ``trigger_kwargs``.
"""

from __future__ import annotations

from collections import deque


class NoBatchSizeWait:
    """Consume immediately (default trigger)."""

    def wait_ms(self, processed_count: int) -> int:
        return 0

    def trigger_kwargs(self) -> dict:
        return {}  # default micro-batch trigger


class MaxBatchSizeWait:
    """Sleep in ``wait_interval_ms`` steps until the source queue holds
    ``max_batch_size`` events or ``max_wait_ms`` elapses.  Skipped during
    snapshot (MaxBatchSizeWait.java:41-43)."""

    def __init__(
        self,
        max_batch_size: int = 2048,
        max_wait_ms: int = 300_000,
        wait_interval_ms: int = 10_000,
        queue_size_fn=None,
        snapshot_running_fn=None,
    ):
        self.max_batch_size = max_batch_size
        self.max_wait_ms = max_wait_ms
        self.wait_interval_ms = wait_interval_ms
        self.queue_size_fn = queue_size_fn or (lambda: 0)
        self.snapshot_running_fn = snapshot_running_fn or (lambda: False)

    def wait_ms(self, processed_count: int) -> int:
        if self.snapshot_running_fn():
            return 0
        total = 0
        while (
            total < self.max_wait_ms and self.queue_size_fn() < self.max_batch_size
        ):
            step = min(self.wait_interval_ms, self.max_wait_ms - total)
            total += step
            if self.queue_size_fn() >= self.max_batch_size:
                break
        return total

    def trigger_kwargs(self) -> dict:
        # Closest Spark semantic: drain everything available per trigger.
        return {"availableNow": True}


class DynamicBatchSizeWait:
    """Feedback controller: keep average batch fill in the 85-97% band of
    ``max_batch_size`` by scaling the sleep (DynamicBatchSizeWait.java:51-90).

    Exact parity with the reference's ``getWaitMs``: histories seeded
    ``[1,1,1]`` / ``[100,100,100]`` (constructor :36-42), the 3-sample
    *batch* average picks the band but the scale applies to the **last**
    sleep (:62-72), the 0.85-0.90 band returns the last sleep without
    recording it (:71-73), non-positive counts return the last sleep
    unchanged (:52-54), growth is ``last * max_batch_size / numRecords``
    (:76), bounds ``100 <= sleep <= max_wait_ms`` (:79).  ``wait_ms``
    mirrors ``waitMs`` (:84-90): subtract processing time, skip <= 2000 ms.
    """

    def __init__(self, max_batch_size: int = 2048, max_wait_ms: int = 300_000):
        self.max_batch_size = max_batch_size
        self.max_wait_ms = max_wait_ms
        self.batch_size_history: deque[int] = deque([1, 1, 1], maxlen=3)
        self.sleep_ms_history: deque[int] = deque([100, 100, 100], maxlen=3)

    def get_wait_ms(self, num_records: int) -> int:
        if num_records <= 0:
            return self.sleep_ms_history[-1]
        self.batch_size_history.append(num_records)
        fill = (
            sum(self.batch_size_history) / len(self.batch_size_history)
        ) / self.max_batch_size
        last = self.sleep_ms_history[-1]
        if fill >= 0.97:
            sleep = int(last * 0.50)
        elif fill >= 0.95:
            sleep = int(last * 0.65)
        elif fill >= 0.90:
            sleep = int(last * 0.80)
        elif fill >= 0.85:
            return last
        else:
            sleep = (last * self.max_batch_size) // num_records
        self.sleep_ms_history.append(min(max(sleep, 100), self.max_wait_ms))
        return self.sleep_ms_history[-1]

    def wait_ms(self, processed_count: int, processing_time_ms: int = 0) -> int:
        sleep = max(self.get_wait_ms(processed_count) - processing_time_ms, 0)
        return sleep if sleep > 2000 else 0

    def trigger_kwargs(self) -> dict:
        return {"processingTime": "10 seconds"}
