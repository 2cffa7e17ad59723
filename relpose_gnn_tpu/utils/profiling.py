"""Profiling helpers: step timing + jax.profiler traces.

The reference has no tracing/profiling at all (SURVEY.md §5); these are the
TPU-native equivalents: a cheap steady-state step timer (syncs once per
window, not per step) and a context manager around `jax.profiler.trace` for
capturing XLA execution timelines viewable in TensorBoard/Perfetto.
"""

from __future__ import annotations

import contextlib
import time
from dataclasses import dataclass, field

import jax


@dataclass
class StepTimer:
    """Windowed steady-state throughput measurement."""

    window: int = 50
    _t0: float = field(default=0.0, init=False)
    _count: int = field(default=0, init=False)
    last_steps_per_sec: float = field(default=0.0, init=False)

    def start(self) -> None:
        self._t0 = time.perf_counter()
        self._count = 0

    def step(self, sync_value=None) -> float | None:
        """Call once per step; returns steps/sec at window boundaries.

        `sync_value`: optional device array to block on at the boundary so
        the measurement covers real device time.
        """
        self._count += 1
        if self._count % self.window:
            return None
        if sync_value is not None:
            jax.block_until_ready(sync_value)
        now = time.perf_counter()
        self.last_steps_per_sec = self.window / (now - self._t0)
        self._t0 = now
        return self.last_steps_per_sec


@contextlib.contextmanager
def trace(logdir: str | None):
    """`with trace('/tmp/trace'):` captures a jax profiler trace; no-op when
    logdir is None."""
    if logdir is None:
        yield
        return
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
