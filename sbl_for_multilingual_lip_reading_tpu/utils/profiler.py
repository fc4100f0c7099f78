"""Profiling / tracing hooks (the reference has none -- SURVEY.md §5).

Wraps ``jax.profiler`` so any training run can capture a device trace for
TensorBoard / Perfetto, plus a lightweight step-time tracker.
"""
from __future__ import annotations

import contextlib
import time
from typing import Iterator, Optional

import jax


@contextlib.contextmanager
def trace(logdir: str) -> Iterator[None]:
    """Capture a device trace: view with TensorBoard or ui.perfetto.dev."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    """Rolling step-time / throughput tracker.

    >>> timer = StepTimer(batch_size=240)
    >>> with timer.step():
    ...     state, metrics = train_step(state, batch, rng)
    >>> timer.clips_per_sec
    """

    def __init__(self, batch_size: int, window: int = 50):
        self.batch_size = batch_size
        self.window = window
        self.times: list = []

    @contextlib.contextmanager
    def step(self):
        t0 = time.perf_counter()
        yield
        self.times.append(time.perf_counter() - t0)
        if len(self.times) > self.window:
            self.times.pop(0)

    @property
    def mean_step_time(self) -> float:
        # drop the first (compile) step when possible
        ts = self.times[1:] if len(self.times) > 1 else self.times
        return sum(ts) / max(len(ts), 1)

    @property
    def clips_per_sec(self) -> float:
        st = self.mean_step_time
        return self.batch_size / st if st > 0 else 0.0


def annotate(name: str):
    """Named trace region (shows up in the profiler timeline)."""
    return jax.profiler.TraceAnnotation(name)
