"""Microbenchmark: does int8 conv beat bf16 in-graph on v5e?

The TPU tunnel costs ~30 ms per dispatch, so every variant is wrapped in a
20-iteration ``lax.scan`` (ONE dispatch, one device sync) and reported per
iteration — the same harness behind ROADMAP.md's attribution table.

Variants at the rollout's heaviest conv shape (256^2 x 48 -> 48, 3x3, b8):
  A  bf16 conv (the exact-path baseline)
  B  int8 conv + requant epilogue (int8 -> int8 carry: the achievable loop)
  C  bf16 carry: quantize(bf16 math) -> int8 conv -> dequant (qconv static)
  W  wide check at 32^2 x 192 (the deep-stage shape)
"""

import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

N_SCAN = 20


def scan_time(step, x0, n_timed=3):
    """Per-iteration time of ``lax.scan(step)`` — one dispatch per call."""
    fn = jax.jit(
        lambda x: jax.lax.scan(lambda c, _: (step(c), None), x, None, length=N_SCAN)[0]
    )
    float(jnp.sum(fn(x0).astype(jnp.float32)))  # compile + warm
    # distinct inputs per call (the runtime may memoise identical buffers);
    # the perturbation MUST preserve dtype — a python-float add promotes
    # bf16 -> f32 and the conv silently runs at the 8x-slower f32 MXU rate
    xs = [(x0 + jnp.asarray(i, x0.dtype)).astype(x0.dtype) for i in range(1, n_timed + 1)]
    t = time.time()
    _ = sum(float(jnp.sum(fn(x).astype(jnp.float32))) for x in xs)
    return (time.time() - t) / (n_timed * N_SCAN)


def conv(x, w, pe=None):
    kw = dict(window_strides=(1, 1), padding=((1, 1), (1, 1)),
              dimension_numbers=("NHWC", "HWIO", "NHWC"))
    if pe is not None:
        kw["preferred_element_type"] = pe
    return jax.lax.conv_general_dilated(x, w, **kw)


def bench_shape(B, S, C, tag):
    rng = np.random.default_rng(0)
    x_f = jnp.asarray(rng.standard_normal((B, S, S, C)).astype(np.float32))
    x_bf = x_f.astype(jnp.bfloat16)
    w = jnp.asarray(rng.standard_normal((3, 3, C, C)).astype(np.float32)) * (0.2 / C**0.5)
    w_bf = w.astype(jnp.bfloat16)
    w_s = jnp.max(jnp.abs(w), axis=(0, 1, 2)) / 127.0
    wq = jnp.round(w / w_s).astype(jnp.int8)
    a_s = jnp.float32(4.0 / 127.0)
    x_q = jnp.clip(jnp.round(x_f / a_s), -127, 127).astype(jnp.int8)
    inv = (1.0 / a_s).astype(jnp.bfloat16)
    sc = (a_s * w_s).astype(jnp.bfloat16)

    tA = scan_time(lambda x: conv(x, w_bf), x_bf)
    print(f"[{tag}] A bf16 conv:            {tA*1e3:7.3f} ms", file=sys.stderr)

    def step_q(xq):
        y = conv(xq, wq, jnp.int32)  # int8 MXU
        # requant epilogue: int32 -> scaled bf16 -> int8 (what a fused
        # quantized NETWORK would keep in the loop)
        return jnp.clip(jnp.round(y.astype(jnp.bfloat16) * sc * inv), -127, 127).astype(jnp.int8)

    tB = scan_time(step_q, x_q)
    print(f"[{tag}] B int8 conv + requant:  {tB*1e3:7.3f} ms  ({tA/tB:.2f}x vs A)", file=sys.stderr)

    def step_c(x):
        xq = jnp.clip(jnp.round(x * inv), -127, 127).astype(jnp.int8)
        y = conv(xq, wq, jnp.int32)
        return y.astype(jnp.bfloat16) * sc

    tC = scan_time(step_c, x_bf)
    print(f"[{tag}] C q+int8conv+dq (bf16): {tC*1e3:7.3f} ms  ({tA/tC:.2f}x vs A)", file=sys.stderr)


def main():
    print(f"device: {jax.devices()[0]}", file=sys.stderr)
    bench_shape(8, 256, 48, "256x48")
    bench_shape(8, 32, 192, "32x192")


if __name__ == "__main__":
    main()
