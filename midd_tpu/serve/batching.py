"""Dynamic micro-batching for serving.

The reference processes one request at a time, running the 4 models in
threads over one GPU (run.py:85-91). On TPU the right shape is: queue
concurrent requests, coalesce them into ONE batched device program per model
(static bucket sizes so XLA compiles once per bucket), then split the
results. Throughput scales with the batch (bench: batch-8 rollouts are ~4.4x
cheaper per image than batch-1 at 256²) while per-request latency stays
bounded by ``max_wait_ms``.

Design:
- one collector thread; requests arrive with a Future each;
- batches are padded up to the nearest bucket (compiled shapes stay static);
- each model fn runs on the padded batch; JAX dispatch is async so the four
  model programs pipeline on device while the host encodes results.
"""

from __future__ import annotations

import queue
import threading
import time
from concurrent.futures import Future
from typing import Callable, Dict, Optional, Sequence

import jax.numpy as jnp
import numpy as np


class QueueFull(RuntimeError):
    """Raised by submit() when bounded admission rejects a request (the
    server maps it to HTTP 503 — backpressure instead of unbounded latency)."""


class MicroBatcher:
    def __init__(
        self,
        fns: Dict[str, Callable],
        buckets: Sequence[int] = (1, 2, 4, 8),
        max_wait_ms: float = 4.0,
        warmup_shape: Optional[tuple] = None,
        fused_fn: Optional[Callable] = None,
        turbo_fns: Optional[Dict[str, Callable]] = None,
        turbo_queue_depth: int = 3,
        max_queue_depth: Optional[int] = None,
    ):
        self.fns = fns
        # one jitted program returning {model: batch} — used instead of the
        # per-model dispatch loop when set (shared-subgraph serving; per-model
        # isolation is recovered by falling back on exception)
        self.fused_fn = fused_fn
        # LOAD-ADAPTIVE degradation: when the queue depth at dispatch time is
        # >= turbo_queue_depth, the models named in turbo_fns run their
        # quality-gated turbo programs instead (the rest keep the exact
        # paths). The saturated-load pressure valve for 512² serving.
        self.turbo_fns = turbo_fns or {}
        self.turbo_queue_depth = turbo_queue_depth
        # bounded admission: submit() raises QueueFull beyond this depth
        self.max_queue_depth = max_queue_depth
        self.buckets = sorted(buckets)
        self.max_wait = max_wait_ms / 1000.0
        self._q: "queue.Queue" = queue.Queue()
        self._stats = {
            "requests": 0, "batches": 0, "max_batch": 0,
            "turbo_batches": 0, "rejected": 0,
        }
        self._stop = False
        if warmup_shape is not None:
            h, w, c = warmup_shape
            for b in self.buckets:
                x = jnp.zeros((b, h, w, c), jnp.float32)
                # warm the per-model programs even in fused mode: they are
                # the runtime fallback, and compiling them lazily inside the
                # collector loop would stall every queued request
                for fn in fns.values():
                    fn(x).block_until_ready()
                for fn in self.turbo_fns.values():
                    fn(x).block_until_ready()
                if fused_fn is not None:
                    for o in fused_fn(x).values():
                        o.block_until_ready()
        self._thread = threading.Thread(target=self._loop, daemon=True)
        self._thread.start()

    def submit(self, x: np.ndarray) -> Future:
        """x: (1, H, W, C). Returns a Future of {model: (1,H,W,C) ndarray}.
        Raises QueueFull when bounded admission is on and the queue is at
        capacity."""
        if (
            self.max_queue_depth is not None
            and self._q.qsize() >= self.max_queue_depth
        ):
            self._stats["rejected"] += 1
            raise QueueFull(
                f"request queue at capacity ({self.max_queue_depth})"
            )
        fut: Future = Future()
        self._q.put((x, fut))
        return fut

    def process(self, x: np.ndarray, timeout: float = 300.0) -> Dict[str, np.ndarray]:
        return self.submit(x).result(timeout=timeout)

    def stop(self):
        self._stop = True
        self._q.put(None)

    @property
    def stats(self):
        return dict(self._stats)

    def _bucket_for(self, n: int) -> int:
        for b in self.buckets:
            if b >= n:
                return b
        return self.buckets[-1]

    def _drain(self):
        """Fail any queued requests immediately instead of stranding their
        futures when the batcher stops."""
        while True:
            try:
                item = self._q.get_nowait()
            except queue.Empty:
                return
            if item is not None and not item[1].done():
                item[1].set_exception(RuntimeError("batcher stopped"))

    def _loop(self):
        max_b = self.buckets[-1]
        while not self._stop:
            item = self._q.get()
            if item is None:
                break
            batch = [item]
            deadline = time.monotonic() + self.max_wait
            while len(batch) < max_b:
                remaining = deadline - time.monotonic()
                if remaining <= 0:
                    break
                try:
                    nxt = self._q.get(timeout=remaining)
                except queue.Empty:
                    break
                if nxt is None:
                    self._stop = True
                    break
                batch.append(nxt)

            xs = [b[0] for b in batch]
            futs = [b[1] for b in batch]
            n = len(xs)
            bucket = self._bucket_for(n)
            arr = np.concatenate(xs, axis=0)
            if bucket > n:
                pad = np.repeat(arr[-1:], bucket - n, axis=0)
                arr = np.concatenate([arr, pad], axis=0)

            # queue-pressure escalation: depth measured AFTER collecting this
            # batch = requests that will wait at least one more device round
            turbo = bool(self.turbo_fns) and (
                self._q.qsize() >= self.turbo_queue_depth
            )
            fns = {**self.fns, **self.turbo_fns} if turbo else self.fns
            if turbo:
                self._stats["turbo_batches"] += 1

            # per-model exception isolation: a failed model yields None for
            # every request in the batch (mirrors run.py:96-101 semantics)
            xj = jnp.asarray(arr)
            outs = {}
            if self.fused_fn is not None and not turbo:
                # materialise INSIDE the try: device errors surface at
                # np.asarray, not dispatch — only then is the fused result
                # proven good, else fall back to the per-path programs
                try:
                    outs = {
                        k: np.asarray(v)
                        for k, v in dict(self.fused_fn(xj)).items()
                    }
                except Exception:  # noqa: BLE001
                    outs = {}
            if not outs:
                pending = {}
                for name, fn in fns.items():
                    try:
                        pending[name] = fn(xj)  # async dispatch
                    except Exception:  # noqa: BLE001
                        pending[name] = None
                for name, o in pending.items():
                    try:
                        outs[name] = None if o is None else np.asarray(o)
                    except Exception:  # noqa: BLE001
                        outs[name] = None
            for i, fut in enumerate(futs):
                fut.set_result(
                    {
                        k: (None if v is None else v[i : i + 1])
                        for k, v in outs.items()
                    }
                )

            self._stats["requests"] += n
            self._stats["batches"] += 1
            self._stats["max_batch"] = max(self._stats["max_batch"], n)
        self._drain()
