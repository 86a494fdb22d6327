"""Probe: does a 3x3 conv at the UNet's narrow stages run faster in a 2x2
space-to-depth layout? (The NAFNet s2d win was 1x1/elementwise-dominated;
the UNet is 3x3-conv-dominated, where s2d turns a (3,3,C,C) conv into a
(2,2,4C,4C) conv with 9/16-block-sparse kernels — lane-padded MXU work
model predicts 1.33x at C=48 and byte traffic 2.67x lower. The model must
be measured: XLA's conv lowering may already amortise the padding
differently.)

Equivalence of the kernel construction is asserted in-process on every run
(CPU or TPU) before timing.

Run: PYTHONPATH=/root/repo:/root/.axon_site python -u examples/s2d_conv_probe.py
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

N_SCAN = 20
N_PASSES = 3


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def s2d_conv_kernel(k: np.ndarray) -> np.ndarray:
    """(3,3,Cin,Cout) stride-1 pad-1 conv -> the equivalent (3,3,4Cin,4Cout)
    conv on phase-major s2d tensors (pad 1).

    Output phase (r1,r2) at s2d pixel (i,j) is original pixel (2i+r1, 2j+r2);
    tap (dy,dx) in {-1,0,1}^2 reads original (2i+r1+dy, ...) = phase
    ((r1+dy)%2, ...) at s2d offset u = floor((r1+dy)/2) in {-1,0,1} — so the
    s2d form needs the FULL 3x3 window over s2d pixels, with 75% of the
    (kernel-pos, phase-block) entries zero. The padded-MXU-work model says
    this form is ~1.75x WORSE at C=48 (K grows 9·4C vs 9·C while M only
    shrinks 4x) — unlike NAFNet's 1x1s, where K stays 1 tap and s2d is a
    pure win. This probe exists to confirm/refute that model with a
    measurement before anyone re-attempts a UNet s2d."""
    cin, cout = k.shape[2], k.shape[3]
    k2 = np.zeros((3, 3, 4 * cin, 4 * cout), k.dtype)
    for r1 in range(2):
        for r2 in range(2):
            p_out = r1 * 2 + r2
            for dy in (-1, 0, 1):
                for dx in (-1, 0, 1):
                    sy, sx = r1 + dy, r2 + dx
                    p_in = (sy % 2) * 2 + (sx % 2)
                    u, v = (sy - sy % 2) // 2, (sx - sx % 2) // 2  # -1..1
                    k2[u + 1, v + 1,
                       p_in * cin : (p_in + 1) * cin,
                       p_out * cout : (p_out + 1) * cout] += k[dy + 1, dx + 1]
    return k2


def main():
    import jax
    import jax.numpy as jnp

    from midd_tpu.ops.naf_s2d import ds2, s2d
    from midd_tpu.utils.compile_cache import enable_persistent_cache

    enable_persistent_cache()
    dev = jax.devices()[0]
    on_tpu = dev.platform in ("tpu", "axon")
    dt = jnp.bfloat16 if on_tpu else jnp.float32
    log(f"device: {dev}")

    results = {}
    rng = np.random.default_rng(0)
    for (size, c, b) in ((256, 48, 8), (128, 96, 8), (512, 48, 2)):
        k = rng.standard_normal((3, 3, c, c)).astype(np.float32) * 0.05
        k2 = s2d_conv_kernel(k)
        x = rng.random((b, size, size, c)).astype(np.float32)

        def conv_plain(x, k):
            return jax.lax.conv_general_dilated(
                x, k, (1, 1), ((1, 1), (1, 1)),
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )

        def conv_s2d(xs, k2):
            return jax.lax.conv_general_dilated(
                xs, k2, (1, 1), ((1, 1), (1, 1)),
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )

        # correctness first (fp32, this process, any backend)
        a = np.asarray(jax.jit(conv_plain)(jnp.asarray(x), jnp.asarray(k)))
        bs = np.asarray(
            ds2(jax.jit(conv_s2d)(s2d(jnp.asarray(x)), jnp.asarray(k2)))
        )
        err = float(np.max(np.abs(a - bs)))
        assert err < 1e-3, f"s2d conv mismatch: {err}"
        log(f"[{size}² C{c} b{b}] equivalence ok (maxerr {err:.2e})")

        xj = jnp.asarray(x).astype(dt)
        xsj = s2d(xj)
        kj, k2j = jnp.asarray(k).astype(dt), jnp.asarray(k2).astype(dt)
        row = {}
        for label, fn, args in (
            ("plain", conv_plain, (xj, kj)),
            ("s2d", conv_s2d, (xsj, k2j)),
        ):
            def scan_conv(z, kk, fn=fn):
                def step(c, _):
                    return fn(c, kk).astype(z.dtype), None

                return jax.lax.scan(step, z, None, length=N_SCAN)[0]

            f = jax.jit(scan_conv)
            t = time.time()
            float(jnp.sum(f(*args).astype(jnp.float32)))
            log(f"  {label}: compile {time.time() - t:.1f}s")
            best = float("inf")
            for i in range(N_PASSES):
                z = (args[0] + jnp.asarray((i + 1) * 1e-3, dt)).astype(dt)
                t = time.time()
                float(jnp.sum(f(z, args[1]).astype(jnp.float32)))
                best = min(best, (time.time() - t) / N_SCAN)
            row[label] = round(best * 1e3, 3)
            log(f"  {label}: {best * 1e3:.3f} ms")
        row["speedup"] = round(row["plain"] / row["s2d"], 3)
        results[f"{size}x{c}xb{b}"] = row

    print(json.dumps(results))


if __name__ == "__main__":
    main()
