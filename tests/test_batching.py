"""Micro-batching queue tests: concurrent requests coalesce into one padded
device call; per-model failures isolate to null."""

import threading

import numpy as np

import jax.numpy as jnp

from midd_tpu.serve.batching import MicroBatcher


def test_batcher_coalesces_concurrent_requests():
    calls = []

    def fn(x):
        calls.append(int(x.shape[0]))
        return x * 2.0

    batcher = MicroBatcher({"m": fn}, buckets=(1, 2, 4), max_wait_ms=50)
    xs = [np.full((1, 4, 4, 1), i, np.float32) for i in range(4)]
    futs = [batcher.submit(x) for x in xs]
    outs = [f.result(timeout=30) for f in futs]
    batcher.stop()

    for i, out in enumerate(outs):
        np.testing.assert_allclose(out["m"], xs[i] * 2.0)
    # fewer device calls than requests (some coalescing happened)
    assert batcher.stats["requests"] == 4
    assert batcher.stats["batches"] <= 3
    # every executed batch used a bucket shape
    assert all(c in (1, 2, 4) for c in calls)


def test_batcher_pads_to_bucket():
    shapes = []

    def fn(x):
        shapes.append(int(x.shape[0]))
        return x

    batcher = MicroBatcher({"m": fn}, buckets=(4,), max_wait_ms=1)
    out = batcher.process(np.ones((1, 2, 2, 1), np.float32))
    batcher.stop()
    assert shapes == [4]  # padded 1 -> 4
    assert out["m"].shape == (1, 2, 2, 1)


def test_batcher_isolates_model_failure():
    def good(x):
        return x + 1

    def bad(x):
        raise RuntimeError("boom")

    batcher = MicroBatcher({"good": good, "bad": bad}, buckets=(1,), max_wait_ms=1)
    out = batcher.process(np.zeros((1, 2, 2, 1), np.float32))
    batcher.stop()
    assert out["bad"] is None
    np.testing.assert_allclose(out["good"], np.ones((1, 2, 2, 1)))
