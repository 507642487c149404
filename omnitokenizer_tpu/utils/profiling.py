"""Profiling / step-timing utilities (the tracing subsystem the reference
lacks, SURVEY.md 5.1): jax.profiler traces + a step timer with rolling
throughput, replacing ddp_utils.MetricLogger's wall-clock/ETA meters."""

from __future__ import annotations

import contextlib
import time
from collections import deque
from typing import Iterator, Optional

import jax


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/jax-trace") -> Iterator[None]:
    """Capture an XLA profiler trace viewable in TensorBoard/XProf."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named region that shows up in profiler traces."""
    return jax.profiler.TraceAnnotation(name)


class StepTimer:
    """Rolling step-time / items-per-second meter."""

    def __init__(self, window: int = 50):
        self.times = deque(maxlen=window)
        self._last: Optional[float] = None

    def tick(self, items: int = 1):
        now = time.perf_counter()
        if self._last is not None:
            self.times.append((now - self._last, items))
        self._last = now

    @property
    def steps_per_sec(self) -> float:
        if not self.times:
            return 0.0
        total = sum(t for t, _ in self.times)
        return len(self.times) / total if total else 0.0

    @property
    def items_per_sec(self) -> float:
        if not self.times:
            return 0.0
        total_t = sum(t for t, _ in self.times)
        total_i = sum(i for _, i in self.times)
        return total_i / total_t if total_t else 0.0

    def eta_seconds(self, remaining_steps: int) -> float:
        sps = self.steps_per_sec
        return remaining_steps / sps if sps else float("inf")


def device_memory_stats() -> dict:
    """Per-device memory stats where the backend exposes them (the
    max_memory_allocated analogue of ddp_utils.py:182)."""
    out = {}
    for d in jax.devices():
        try:
            out[str(d)] = d.memory_stats()
        except Exception:
            out[str(d)] = None
    return out
