"""Benchmark of record: denoised images/sec/chip at 256x256, DDIM-50.

Runs the flagship diffusion path — the conditional UNet (12.8M params,
DDIM/DDIMModel.py:168 topology) rolled out for a full 50-step reverse schedule
as ONE ``lax.scan`` program — on the real TPU chip, bf16 compute / fp32 norms.

Baseline: the reference reports ~0.7 s for a full hybrid request (8 diffusion
steps at 512^2 + NAFNet + router/fusion) on a P100 (README.md:22). Normalised
to this benchmark's config (50 steps at 256^2 == 50/8 * (256/512)^2 = 1.5625x
the diffusion UNet work of the reference's 8-step 512^2 rollout), the P100
reference throughput is ~1/0.7/1.5625 = 0.914 images/sec. ``vs_baseline`` is
ours / 0.914.

Prints exactly ONE JSON line on stdout; diagnostics go to stderr.
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--profile", default=None, help="jax.profiler trace dir")
    ap.add_argument("--turbo", action="store_true",
                    help="also measure the eps-reuse accelerated rollout (stderr only)")
    ap.add_argument("--int8", action="store_true",
                    help="also measure the dynamic-int8 rollout (stderr only; "
                         "quality-gated opt-in, see PARITY.md)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from midd_tpu import config
    from midd_tpu.diffusion import denoise, make_schedule
    from midd_tpu.models import UNetDiffusion
    from midd_tpu.utils.compile_cache import enable_persistent_cache

    # second and later runs load executables from disk instead of paying the
    # 4-minute first compile over the TPU tunnel
    cache_dir = enable_persistent_cache()
    log(f"compilation cache: {cache_dir}")

    size = 256
    steps = 50
    dev = jax.devices()[0]
    log(f"device: {dev}")

    dtype = jnp.bfloat16 if dev.platform != "cpu" else None
    use_flash = dev.platform in ("tpu", "axon")  # Pallas kernel is TPU-only
    model = UNetDiffusion(config.SERVE_DIFFUSION, dtype=dtype, use_flash=use_flash)
    schedule = make_schedule(config.SERVE_SCHEDULE)

    x0 = jnp.zeros((1, size, size, 1), jnp.float32)
    t0 = jnp.zeros((1,), jnp.int32)
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), x0, x0, t0)

    best = 0.0
    best_batch = 1
    rng = np.random.default_rng(0)
    for batch in (1, 8):  # 2/4 never win (measured); keep driver runs fast
        # distinct inputs per timed call: the runtime may memoise repeated
        # executions with identical argument buffers
        n_iter = 3
        inputs = [
            jnp.asarray(
                np.clip(rng.random((batch, size, size, 1)), 0, 1).astype(np.float32)
            )
            for _ in range(n_iter + 1)
        ]

        @jax.jit
        def rollout(x):
            eps = lambda a, c, t: model.apply(variables, a, c, t)
            return denoise(eps, x, schedule, inference_steps=steps)

        # NOTE: block_until_ready() does not actually wait on this runtime's
        # remote platform — force a scalar materialisation instead.
        t = time.time()
        float(jnp.sum(rollout(inputs[-1])))
        log(f"batch {batch}: compile {time.time() - t:.1f}s")

        # best-of-3 timing passes: the tunnel occasionally injects hundreds
        # of ms of transient slowness into a single pass (CLAUDE.md); the
        # metric of record is chip capability, so take the fastest clean pass
        dt = float("inf")
        for _ in range(3):
            t = time.time()
            outs = [rollout(x) for x in inputs[:n_iter]]
            checksum = sum(float(jnp.sum(o)) for o in outs)
            assert checksum == checksum
            dt = min(dt, (time.time() - t) / n_iter)

        if args.profile and batch == 8:
            # separate, UNTIMED iteration: profiling overhead must not
            # contaminate the metric of record
            from midd_tpu.utils.profiling import device_trace

            with device_trace(args.profile):
                float(jnp.sum(rollout(inputs[0])))
        ips = batch / dt
        log(f"batch {batch}: {dt * 1000:.1f} ms/rollout -> {ips:.2f} img/s")
        if ips > best:
            best, best_batch = ips, batch
            best_dt = dt

    if args.turbo:
        batch = best_batch
        xs = [
            jnp.asarray(
                np.clip(rng.random((batch, size, size, 1)), 0, 1).astype(np.float32)
            )
            for _ in range(4)
        ]

        @jax.jit
        def rollout_turbo(x):
            eps = lambda a, c, t: model.apply(variables, a, c, t)
            return denoise(eps, x, schedule, inference_steps=steps, eps_reuse=2)

        float(jnp.sum(rollout_turbo(xs[-1])))
        t = time.time()
        outs = [rollout_turbo(x) for x in xs[:3]]
        _ = sum(float(jnp.sum(o)) for o in outs)
        dt_t = (time.time() - t) / 3
        log(f"turbo (eps_reuse=2) batch {batch}: {dt_t * 1000:.1f} ms -> {batch / dt_t:.2f} img/s")

    if args.int8:
        from midd_tpu.ops.qconv import calibrate_unet_rollout

        batch = best_batch
        xs = [
            jnp.asarray(
                np.clip(rng.random((batch, size, size, 1)), 0, 1).astype(np.float32)
            )
            for _ in range(4)
        ]
        # static-int8: calibrate activation scales on one rollout, then serve
        # with frozen scales (no per-call reductions — see ops/qconv.py)
        model_cal = UNetDiffusion(config.SERVE_DIFFUSION, use_flash=use_flash,
                                  quant="calibrate")
        t = time.time()
        qs = calibrate_unet_rollout(
            model_cal, variables, schedule, [xs[-1]], inference_steps=steps
        )
        log(f"int8 calibration: {time.time() - t:.1f}s")
        model_q = UNetDiffusion(config.SERVE_DIFFUSION, dtype=dtype,
                                use_flash=use_flash, quant="static")
        v_q = {**variables, "qscales": qs}

        @jax.jit
        def rollout_q(x):
            eps = lambda a, c, t: model_q.apply(v_q, a, c, t)
            return denoise(eps, x, schedule, inference_steps=steps)

        float(jnp.sum(rollout_q(xs[-1])))
        t = time.time()
        outs = [rollout_q(x) for x in xs[:3]]
        _ = sum(float(jnp.sum(o)) for o in outs)
        dt_q = (time.time() - t) / 3
        log(f"int8-static batch {batch}: {dt_q * 1000:.1f} ms -> {batch / dt_q:.2f} img/s")

    # MFU of record (round-2 verdict item 7): analytic dense-algebra FLOPs of
    # the rollout (jaxpr walk; flash attention counted via the equivalent XLA
    # attention graph) over the measured wall time, vs published chip peak.
    from midd_tpu.utils.flops import count_flops, device_peak_tflops, mfu

    # count on the PLAIN layout: the canonical model FLOPs. The adopted
    # restructurings change the *executed* MACs (s2d kernels carry 75%
    # structural zeros the MXU really multiplies — more hardware FLOPs;
    # FusedUpDown removes the 4x-area convT — fewer), so counting the
    # restructured jaxpr would make `mfu` incomparable across rounds and
    # inflate it with zero-multiplies. Model MFU = canonical work / time.
    count_model = UNetDiffusion(config.SERVE_DIFFUSION, dtype=dtype, use_flash=False,
                                fuse_updown=False, s2d_stage0=False)
    xb = jnp.zeros((best_batch, size, size, 1), jnp.float32)
    rollout_flops = count_flops(
        lambda x: denoise(
            lambda a, c, t: count_model.apply(variables, a, c, t),
            x, schedule, inference_steps=steps,
        ),
        xb,
    )
    peak = device_peak_tflops(dev)
    achieved_tflops = rollout_flops / best_dt / 1e12
    mfu_frac = mfu(rollout_flops, best_dt, peak)
    log(
        f"MFU: {rollout_flops / 1e12:.2f} TFLOP/rollout in {best_dt * 1000:.1f} ms "
        f"-> {achieved_tflops:.1f} TFLOP/s achieved = {mfu_frac * 100:.1f}% of "
        f"{peak:.0f} TFLOP/s bf16 peak ({dev.device_kind})"
    )

    baseline = 0.914  # P100 reference, normalised (see module docstring)
    result = {
        "metric": f"denoised images/sec/chip, {size}x{size} DDIM-{steps} (batch {best_batch}, bf16)",
        "value": round(best, 3),
        "unit": "images/sec",
        "vs_baseline": round(best / baseline, 2),
        "achieved_tflops": round(achieved_tflops, 1),
        "mfu": round(mfu_frac, 4),
        "peak_tflops_assumed": peak,
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
