"""Structured logging (SURVEY section 5, metrics/logging row).

The reference logs with bare prints (run.py:94,110-140,206; tqdm postfix in
every trainer). Here the same signals are emitted as JSON lines so they are
machine-parseable in production, with a human-readable prefix preserved.
"""

from __future__ import annotations

import json
import sys
import time
from typing import Any, Dict, Optional


class JsonLogger:
    def __init__(self, component: str, stream=None):
        self.component = component
        self.stream = stream or sys.stderr

    def log(self, event: str, **fields: Any) -> None:
        payload: Dict[str, Any] = {
            "ts": round(time.time(), 3),
            "component": self.component,
            "event": event,
            **fields,
        }
        print(json.dumps(payload), file=self.stream, flush=True)

    def latency(self, event: str, seconds: float, **fields: Any) -> None:
        self.log(event, latency_ms=round(seconds * 1000.0, 2), **fields)


_loggers: Dict[str, JsonLogger] = {}


def get_logger(component: str) -> JsonLogger:
    if component not in _loggers:
        _loggers[component] = JsonLogger(component)
    return _loggers[component]
