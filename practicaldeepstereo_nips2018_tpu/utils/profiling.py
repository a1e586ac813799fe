"""Profiling: XLA trace capture and per-step device timing.

The reference's only instrumentation is a synchronized wall clock around the
eval forward (reference ``trainer.py:141-148``). The TPU framework exposes:

* :func:`trace` — context manager around ``jax.profiler`` producing a
  TensorBoard-loadable trace directory (op-level TPU timeline);
* :class:`StepTimer` — dispatch-overhead-robust step timing: measures the
  slope of N chained executions (the transport's fixed per-dispatch cost
  cancels), reporting seconds/step and frames/s;
* :func:`device_memory_stats` — per-device HBM usage snapshot.
"""

from __future__ import annotations

import contextlib
import time

import jax


@contextlib.contextmanager
def trace(log_dir: str):
    """Captures a jax.profiler trace into ``log_dir``."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    """Two-point slope timing of a nullary step function.

    ``step_fn()`` must dispatch device work and return an array;
    the timer blocks via a scalar readback. Reported seconds/step =
    (t(long) - t(short)) / (long - short), cancelling fixed dispatch costs
    (important behind high-latency device transports).
    """

    def __init__(self, step_fn, short: int = 2, long: int = 8):
        self._step_fn = step_fn
        self._short = short
        self._long = long

    def _run(self, iterations: int) -> float:
        start = time.perf_counter()
        out = None
        for _ in range(iterations):
            out = self._step_fn()
        jax.block_until_ready(out)
        return time.perf_counter() - start

    def measure(self, repeats: int = 3) -> dict:
        self._run(1)  # warmup / compile
        slopes = []
        for _ in range(repeats):
            short_time = self._run(self._short)
            long_time = self._run(self._long)
            slopes.append((long_time - short_time) /
                          (self._long - self._short))
        slopes.sort()
        seconds = slopes[len(slopes) // 2]
        return {"seconds_per_step": seconds,
                "steps_per_second": 1.0 / seconds if seconds > 0 else
                float("inf")}


def device_memory_stats() -> list[dict]:
    """Returns per-device memory statistics (bytes in use / limit) where the
    backend exposes them."""
    stats = []
    for device in jax.devices():
        try:
            raw = device.memory_stats() or {}
        except (AttributeError, RuntimeError):
            raw = {}
        stats.append({
            "device": str(device),
            "bytes_in_use": raw.get("bytes_in_use"),
            "bytes_limit": raw.get("bytes_limit"),
        })
    return stats
