"""Tracing / profiling hooks.

The reference has no tracing, profiling, or metrics of any kind (SURVEY.md
§5: no timers, no spans, a declared-but-unused locust dependency). Here:

- ``trace(path)``: context manager around ``jax.profiler`` — captures a
  TensorBoard-loadable device trace of everything inside the block;
- ``annotate(name)``: named host span that shows up in the trace timeline
  (``jax.profiler.TraceAnnotation``);
- ``Timer``: lightweight named wall-clock accumulator for host-side spans,
  exported by the API's /metrics endpoint (api/app.py Metrics handles the
  per-request layer; this is for engine internals).
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict
from typing import Any, Dict, Iterator

import jax


@contextlib.contextmanager
def trace(log_dir: str) -> Iterator[None]:
    """Capture a jax.profiler device trace into ``log_dir`` (view with
    TensorBoard's profile plugin or xprof)."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named span visible in profiler timelines."""
    return jax.profiler.TraceAnnotation(name)


class Timer:
    """Named wall-clock accumulators (host-side)."""

    def __init__(self) -> None:
        self.total: Dict[str, float] = defaultdict(float)
        self.count: Dict[str, int] = defaultdict(int)

    @contextlib.contextmanager
    def span(self, name: str) -> Iterator[None]:
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.total[name] += time.perf_counter() - t0
            self.count[name] += 1

    def snapshot(self) -> Dict[str, Any]:
        return {
            name: {
                "count": self.count[name],
                "total_s": self.total[name],
                "avg_ms": 1000.0 * self.total[name] / max(self.count[name], 1),
            }
            for name in self.total
        }

    def reset(self) -> None:
        self.total.clear()
        self.count.clear()
