"""Profiling and step timing.

Reference analogue: per-kernel EWMA timing + NVML sampling (reference:
src/core/execution/models/gpt_model.cpp:1027-1084,1535-1618 PerformanceStats;
SURVEY.md §5.1). TPU mapping: jax.profiler traces (Perfetto/XProf) for
kernel-level detail, plus host-side EWMA step timers for the serving loop.
"""

from __future__ import annotations

import contextlib
import time
from dataclasses import dataclass
from typing import Dict, Iterator

import jax


@dataclass
class StepTimer:
    """EWMA step timing (reference EWMA 0.9/0.1, gpt_model.cpp:1535-1551)."""

    alpha: float = 0.1
    avg_ms: float = 0.0
    last_ms: float = 0.0
    count: int = 0
    total_ms: float = 0.0

    def record(self, seconds: float) -> None:
        ms = seconds * 1e3
        self.last_ms = ms
        self.total_ms += ms
        self.count += 1
        self.avg_ms = ms if self.count == 1 else (
            (1 - self.alpha) * self.avg_ms + self.alpha * ms)

    @contextlib.contextmanager
    def time(self) -> Iterator[None]:
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.record(time.perf_counter() - t0)


class PerformanceStats:
    """Named step timers (reference: gpt_model.hpp:32-70 PerformanceStats
    {avg attention/ffn/total ms, tokens/s})."""

    def __init__(self):
        self.timers: Dict[str, StepTimer] = {}
        self.tokens_emitted = 0
        self._start = time.monotonic()

    def timer(self, name: str) -> StepTimer:
        if name not in self.timers:
            self.timers[name] = StepTimer()
        return self.timers[name]

    def add_tokens(self, n: int) -> None:
        self.tokens_emitted += n

    @property
    def tokens_per_second(self) -> float:
        dt = time.monotonic() - self._start
        return self.tokens_emitted / dt if dt > 0 else 0.0

    def snapshot(self) -> Dict:
        return {
            "tokens_per_second": self.tokens_per_second,
            "tokens_emitted": self.tokens_emitted,
            **{name: {"avg_ms": t.avg_ms, "last_ms": t.last_ms,
                      "count": t.count}
               for name, t in self.timers.items()},
        }


@contextlib.contextmanager
def trace(name: str) -> Iterator[None]:
    """jax.profiler annotation (shows in Perfetto/XProf traces)."""
    with jax.profiler.TraceAnnotation(name):
        yield


@contextlib.contextmanager
def profile(log_dir: str) -> Iterator[None]:
    """Capture a device trace (reference delegated to vendor tools,
    docs/userguide.md:299; here it is built in)."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
