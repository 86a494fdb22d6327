"""Diffusion reverse-sampling runtime as a single ``jax.lax.scan``.

The reference drives the reverse loop from Python, issuing one GPU graph per
step with host sync between steps (DDIM/DDIMModel.py:268-289,
hybrid3diffusionspeed.py:400-418, cddpm/cddpmModels.py:281-308). Here the whole
rollout is ONE compiled program: timesteps and (alpha, alpha_hat, beta) gathers
are precomputed arrays, every step stays on device, and XLA pipelines the UNet
across steps.

Semantics replicated exactly:
- the loop starts from the noisy image itself, not N(0, I);
- deterministic variant ("ddim" naming in the reference, actually a DDPM
  posterior-mean iterative restorer): eps clamped to [-5, 5], posterior-mean
  update, x clamped to [0, 1] each step;
- ancestral variant (cddpm): NO eps clamp, additive posterior noise
  sqrt(beta) * (0.5 * N(0, I)) for t > 0 (cddpm/cddpmModels.py:290-303).
"""

from __future__ import annotations

from functools import partial
from typing import Callable, Optional, Sequence

import jax
import jax.numpy as jnp

from midd_tpu.diffusion.schedule import Schedule, timestep_sequence

EpsFn = Callable[[jnp.ndarray, jnp.ndarray, jnp.ndarray], jnp.ndarray]


def denoise(
    eps_fn: EpsFn,
    noisy: jnp.ndarray,
    schedule: Schedule,
    inference_steps: int,
    *,
    stochastic: bool = False,
    clamp_eps: bool = True,
    query_noise_scale: float = 0.5,
    key: Optional[jax.Array] = None,
    eps_reuse: int = 1,
    eps_refresh_idx: Optional[Sequence[int]] = None,
    noise_seq: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Run the reverse rollout. ``eps_fn(x, condition, t)`` is the UNet apply
    (t shape (B,) int32). Returns the denoised image, same shape as ``noisy``.

    ``eps_reuse=k`` (k>1) is an OPT-IN accelerator in the spirit of
    forward-caching diffusion methods (FORA, arXiv:2407.01425): the UNet is
    evaluated only on every k-th step and the predicted noise is reused in
    between (epsilon varies slowly along the short deterministic trajectory).
    k=2 halves UNet evaluations. Default k=1 is exact.

    ``eps_refresh_idx`` generalizes that to an ARBITRARY static set of scan
    indices that compute fresh epsilon (everything else reuses the last one);
    it overrides ``eps_reuse``. Index 0 must be present (there is nothing to
    reuse yet). Rationale: the uniform-stride schedule is measurably the
    wrong one — see ``refresh_schedule`` and the round-3 turbo study in
    PARITY.md (which steps keep fresh eps matters more than how many).
    """
    ts = jnp.asarray(
        timestep_sequence(schedule.noise_steps, inference_steps), jnp.int32
    )
    n_steps = ts.shape[0]
    batch = noisy.shape[0]
    if stochastic and key is None and noise_seq is None:
        raise ValueError("stochastic sampling requires a PRNG key")
    if noise_seq is not None and not stochastic:
        # the injected noise is only consumed by the ancestral update;
        # silently running deterministic would betray the caller's intent
        raise ValueError("noise_seq requires stochastic=True")
    if noise_seq is not None:
        # injected per-step standard normals (n_steps, *x.shape) — used by the
        # golden-parity test to feed the torch loop and this scan IDENTICAL
        # posterior noise (cddpm/cddpmModels.py:295-299 draw order).
        keys = jnp.asarray(noise_seq, jnp.float32)
        assert keys.shape == (n_steps, *noisy.shape), keys.shape
    else:
        keys = (
            jax.random.split(key, n_steps)
            if stochastic
            else jnp.zeros((n_steps, 2), jnp.uint32)
        )
    if eps_refresh_idx is not None:
        if hasattr(eps_refresh_idx, "dtype"):  # np/jnp array or tracer
            # runtime bool mask (length n_steps): lets a study sweep many
            # schedules through ONE compiled program (each static index set
            # would otherwise be its own XLA compile over the TPU tunnel)
            refresh = jnp.asarray(eps_refresh_idx, jnp.bool_)
            if refresh.shape != (n_steps,):
                raise ValueError(
                    f"refresh mask shape {refresh.shape} != ({n_steps},) "
                    f"(the ACTUAL rollout length from timestep_sequence, "
                    f"not the requested inference_steps)"
                )
            reuse_active = True
        else:
            refresh_set = set(int(i) for i in eps_refresh_idx)
            if 0 not in refresh_set:
                raise ValueError("eps_refresh_idx must contain step 0")
            refresh = jnp.asarray(
                [i in refresh_set for i in range(n_steps)], jnp.bool_
            )
            reuse_active = len(refresh_set) < n_steps
    else:
        refresh = (jnp.arange(n_steps, dtype=jnp.int32) % eps_reuse) == 0
        reuse_active = eps_reuse > 1

    def compute_eps(x, t_b):
        eps = eps_fn(x, noisy, t_b)
        if clamp_eps:
            eps = jnp.clip(eps, -5.0, 5.0)
        return eps.astype(jnp.float32)

    def step(carry, scan_in):
        x, eps_prev = carry
        t, k, fresh = scan_in
        t_b = jnp.full((batch,), t, jnp.int32)
        if reuse_active:
            eps = jax.lax.cond(
                fresh,
                lambda operands: compute_eps(*operands),
                lambda operands: eps_prev,
                (x, t_b),
            )
        else:
            eps = compute_eps(x, t_b)
        a = schedule.alpha[t]
        ah = schedule.alpha_hat[t]
        x_f = x.astype(jnp.float32)
        mean = (x_f - ((1.0 - a) / jnp.sqrt(1.0 - ah)) * eps) / jnp.sqrt(a)
        if stochastic:
            raw = (
                k  # injected standard normal for this step
                if noise_seq is not None
                else jax.random.normal(k, x.shape, jnp.float32)
            )
            noise = jnp.where(t > 0, raw * query_noise_scale, 0.0)
            mean = mean + jnp.sqrt(schedule.beta[t]) * noise
        x_next = jnp.clip(mean, 0.0, 1.0).astype(x.dtype)
        return (x_next, eps), None

    eps0 = jnp.zeros(noisy.shape, jnp.float32)
    (x_final, _), _ = jax.lax.scan(step, (noisy, eps0), (ts, keys, refresh))
    return x_final


def refresh_schedule(n_steps: int, n_evals: int, mode: str = "uniform"):
    """Which scan indices compute fresh epsilon, for a budget of ``n_evals``
    UNet evaluations over ``n_steps`` rollout steps.

    Modes (all include index 0; measured against ground truth in the round-3
    turbo study, PARITY.md):
    - "uniform":   evenly spaced (the FORA-style stride schedule);
    - "last":      evenly spaced over the first steps, but the FINAL step is
                   always fresh (the last update has the largest per-step
                   error amplification into the output);
    - "front":     all evals at the start, frozen eps for the tail;
    - "tail":      index 0 plus the last n_evals-1 steps fresh.
    """
    if n_evals >= n_steps:
        return tuple(range(n_steps))
    if n_evals < 1:
        raise ValueError("n_evals must be >= 1")
    if mode == "uniform":
        # even spacing by rounding (n_evals points over [0, n_steps))
        idx = {int(round(i * n_steps / n_evals)) for i in range(n_evals)}
    elif mode == "last":
        idx = {n_steps - 1} | {
            int(round(i * (n_steps - 1) / max(1, n_evals - 1)))
            for i in range(n_evals - 1)
        }
        # rounding can collide with the forced last step; backfill earlier
        # slots until the eval budget is spent
        i = n_steps - 2
        while len(idx) < n_evals and i > 0:
            idx.add(i)
            i -= 1
    elif mode == "front":
        idx = set(range(n_evals))
    elif mode == "tail":
        idx = {0} | set(range(n_steps - (n_evals - 1), n_steps))
    else:
        raise ValueError(f"unknown refresh mode {mode!r}")
    idx.add(0)
    return tuple(sorted(idx))


def noise_images(
    x: jnp.ndarray, t: jnp.ndarray, schedule: Schedule, key: jax.Array
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Forward noising q(x_t | x_0) for training (DDIM/DDIMModel.py:259-263)."""
    ah = schedule.alpha_hat[t][:, None, None, None]
    eps = jax.random.normal(key, x.shape, jnp.float32)
    return jnp.sqrt(ah) * x + jnp.sqrt(1.0 - ah) * eps, eps


def sample_timesteps(key: jax.Array, n: int, noise_steps: int) -> jnp.ndarray:
    """Uniform t in [1, noise_steps) (DDIM/DDIMModel.py:265-266)."""
    return jax.random.randint(key, (n,), 1, noise_steps)


def make_denoise_fn(
    model_apply: Callable,
    variables,
    schedule: Schedule,
    inference_steps: int,
    **kwargs,
) -> Callable[[jnp.ndarray], jnp.ndarray]:
    """Bind a flax UNet apply into a ``denoise(noisy) -> clean`` closure."""
    eps_fn = lambda x, cond, t: model_apply(variables, x, cond, t)
    return partial(
        denoise, eps_fn, schedule=schedule, inference_steps=inference_steps, **kwargs
    )
