"""Tracing / profiling subsystem.

The reference's only tracing is wall-clock prints per model/request
(run.py:82-94,104-141,188-206). This module keeps those per-path latency
logs (structured) and adds real device tracing via ``jax.profiler`` — the
TPU-native upgrade (SURVEY section 5, Tracing row).
"""

from __future__ import annotations

import contextlib
import json
import sys
import time
from typing import Dict, Optional


class Timer:
    """Accumulating named wall-clock timers with structured log emission."""

    def __init__(self, name: str = "timer", stream=sys.stderr):
        self.name = name
        self.stream = stream
        self.records: Dict[str, float] = {}

    @contextlib.contextmanager
    def section(self, label: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            dt = time.perf_counter() - t0
            self.records[label] = self.records.get(label, 0.0) + dt

    def emit(self, **extra):
        payload = {"event": self.name, **{k: round(v, 4) for k, v in self.records.items()}, **extra}
        print(json.dumps(payload), file=self.stream, flush=True)
        self.records.clear()


@contextlib.contextmanager
def device_trace(log_dir: Optional[str] = None):
    """jax.profiler trace context; inspect with TensorBoard/xprof. No-op when
    log_dir is None."""
    if log_dir is None:
        yield
        return
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """TraceAnnotation decorator for hot functions (shows up in xprof)."""
    import jax

    def deco(fn):
        def wrapped(*args, **kwargs):
            with jax.profiler.TraceAnnotation(name):
                return fn(*args, **kwargs)

        return wrapped

    return deco
