"""Serving observability: latency percentiles, throughput, errors, alerts.

Mirrors the reference's Monitor (reference: src/core/monitoring/
monitor.hpp:13-115 — LatencyMetrics p50/90/95/99 + histogram,
ThroughputMetrics req/s + tokens/s, ErrorMetrics incl. OOM/timeout counts,
alert thresholds + check_alerts; 1000-sample history) without the 100ms
sampling thread — metrics are recorded at event time and percentiles computed
on read.
"""

from __future__ import annotations

import threading
import time
from collections import deque
from dataclasses import dataclass
from typing import Deque, Dict, List, Optional

import numpy as np

_HISTORY = 1000  # reference: monitor.hpp:83


@dataclass
class LatencySnapshot:
    p50_ms: float = 0.0
    p90_ms: float = 0.0
    p95_ms: float = 0.0
    p99_ms: float = 0.0
    avg_ms: float = 0.0
    max_ms: float = 0.0
    count: int = 0


@dataclass
class AlertThresholds:
    # reference: monitoring_middleware.hpp:22-23 — error rate 5%, latency 1s
    max_error_rate: float = 0.05
    max_latency_ms: float = 1000.0
    max_queue_depth: int = 500


class Monitor:
    def __init__(self, thresholds: Optional[AlertThresholds] = None):
        self._lock = threading.Lock()
        self._latencies: Dict[str, Deque[float]] = {}
        self._requests_done = 0
        self._tokens_out = 0
        self._errors: Dict[str, int] = {}
        self._window_start = time.monotonic()
        self._recent_events: Deque[tuple] = deque(maxlen=4096)  # (t, tokens, error?)
        self.thresholds = thresholds or AlertThresholds()
        self.queue_depth = 0
        self.active_requests = 0

    # -- recording ----------------------------------------------------------
    def record_latency(self, name: str, ms: float) -> None:
        with self._lock:
            self._latencies.setdefault(name, deque(maxlen=_HISTORY)).append(ms)

    def record_request(self, tokens: int, error: Optional[str] = None) -> None:
        now = time.monotonic()
        with self._lock:
            self._requests_done += 1
            self._tokens_out += tokens
            if error:
                self._errors[error] = self._errors.get(error, 0) + 1
            self._recent_events.append((now, tokens, error is not None))

    # -- reading ------------------------------------------------------------
    def latency(self, name: str) -> LatencySnapshot:
        with self._lock:
            vals = list(self._latencies.get(name, ()))
        if not vals:
            return LatencySnapshot()
        arr = np.asarray(vals)
        return LatencySnapshot(
            p50_ms=float(np.percentile(arr, 50)),
            p90_ms=float(np.percentile(arr, 90)),
            p95_ms=float(np.percentile(arr, 95)),
            p99_ms=float(np.percentile(arr, 99)),
            avg_ms=float(arr.mean()),
            max_ms=float(arr.max()),
            count=len(vals),
        )

    def throughput(self, window_s: float = 60.0) -> Dict[str, float]:
        now = time.monotonic()
        with self._lock:
            recent = [(t, n, e) for t, n, e in self._recent_events
                      if now - t <= window_s]
        dt = max(window_s, 1e-6)
        return {
            "requests_per_sec": len(recent) / dt,
            "tokens_per_sec": sum(n for _, n, _ in recent) / dt,
        }

    def error_rate(self, window_s: float = 60.0) -> float:
        now = time.monotonic()
        with self._lock:
            recent = [(t, n, e) for t, n, e in self._recent_events
                      if now - t <= window_s]
        if not recent:
            return 0.0
        return sum(1 for _, _, e in recent if e) / len(recent)

    def check_alerts(self) -> List[str]:
        """reference: monitor.hpp:96-115 check_alerts."""
        alerts = []
        er = self.error_rate()
        if er > self.thresholds.max_error_rate:
            alerts.append(f"error_rate {er:.1%} > {self.thresholds.max_error_rate:.0%}")
        lat = self.latency("request")
        if lat.p99_ms > self.thresholds.max_latency_ms:
            alerts.append(
                f"p99 latency {lat.p99_ms:.0f}ms > {self.thresholds.max_latency_ms:.0f}ms")
        if self.queue_depth > self.thresholds.max_queue_depth:
            alerts.append(f"queue depth {self.queue_depth}")
        return alerts

    def snapshot(self) -> Dict:
        """Full metrics dump for /metrics (reference: deeppowers.proto:34-74
        GetMetrics shape)."""
        with self._lock:
            errors = dict(self._errors)
            done, toks = self._requests_done, self._tokens_out
        return {
            "requests_completed": done,
            "tokens_generated": toks,
            "active_requests": self.active_requests,
            "queue_depth": self.queue_depth,
            "throughput": self.throughput(),
            "latency": {name: vars(self.latency(name))
                        for name in list(self._latencies)},
            "errors": errors,
            "error_rate": self.error_rate(),
            "alerts": self.check_alerts(),
            "uptime_s": time.monotonic() - self._window_start,
        }
