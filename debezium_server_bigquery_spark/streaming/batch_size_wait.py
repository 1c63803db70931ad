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

    3-sample moving averages of batch size and sleep; above 97/95/90% fill
    the sleep is scaled by 0.5/0.65/0.8, below 85% it grows proportionally;
    bounds 100 ms <= sleep <= max_wait_ms, and sleeps <= 2000 ms are skipped
    (:78, :84-90).
    """

    def __init__(self, max_batch_size: int = 2048, max_wait_ms: int = 300_000):
        self.max_batch_size = max_batch_size
        self.max_wait_ms = max_wait_ms
        self.batch_sizes: deque[float] = deque(maxlen=3)
        self.sleeps: deque[float] = deque(maxlen=3)

    def _avg(self, dq: deque[float], default: float) -> float:
        return sum(dq) / len(dq) if dq else default

    def wait_ms(self, processed_count: int) -> int:
        self.batch_sizes.append(processed_count)
        avg_batch = self._avg(self.batch_sizes, 0.0)
        avg_sleep = self._avg(self.sleeps, self.max_wait_ms / 10)
        fill = avg_batch / self.max_batch_size if self.max_batch_size else 0.0
        if fill >= 0.97:
            sleep = avg_sleep * 0.50
        elif fill >= 0.95:
            sleep = avg_sleep * 0.65
        elif fill >= 0.90:
            sleep = avg_sleep * 0.80
        elif fill >= 0.85:
            sleep = avg_sleep
        else:
            # grow proportionally toward a full batch
            sleep = avg_sleep / fill if fill > 0 else self.max_wait_ms / 10
        sleep = max(100.0, min(float(self.max_wait_ms), sleep))
        self.sleeps.append(sleep)
        if sleep <= 2000:
            return 0
        return int(sleep)

    def trigger_kwargs(self) -> dict:
        return {"processingTime": "10 seconds"}
