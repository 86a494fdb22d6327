"""Sampler tests: scan-vs-python-loop equivalence, stride semantics, and
full parity against the reference torch DiffusionDenoiser with a converted
UNet (SURVEY.md section 4(c))."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

import torch

from tests.torch_ref import load_reference

from midd_tpu import config
from midd_tpu.convert.torch_import import convert_state_dict
from midd_tpu.diffusion import denoise, make_schedule, noise_images, timestep_sequence
from midd_tpu.models import UNetDiffusion


def test_timestep_sequence_matches_reference_stride():
    # "8 steps" over 50 -> stride 6 -> nine iterations 48..0 (DDIM:272-274)
    assert timestep_sequence(50, 8) == [48, 42, 36, 30, 24, 18, 12, 6, 0]
    assert timestep_sequence(50, 25) == list(reversed(range(0, 50, 2)))
    # inference_steps > noise_steps -> stride clamps to 1
    assert timestep_sequence(50, 100) == list(reversed(range(50)))
    assert timestep_sequence(50, 7) == [49, 42, 35, 28, 21, 14, 7, 0]


def test_scan_equals_python_loop(rng):
    """Dummy eps_fn: the scan must reproduce a hand-rolled python loop."""
    sched = make_schedule(config.ScheduleConfig())
    noisy = jnp.asarray(np.clip(rng.random((2, 8, 8, 1), dtype=np.float32), 0, 1))

    def eps_fn(x, cond, t):
        # cheap deterministic function of all inputs incl. t
        return 0.1 * x - 0.05 * cond + 0.001 * t[:, None, None, None].astype(jnp.float32)

    out_scan = denoise(eps_fn, noisy, sched, inference_steps=8)

    x = noisy
    for t in timestep_sequence(50, 8):
        tb = jnp.full((2,), t, jnp.int32)
        eps = jnp.clip(eps_fn(x, noisy, tb), -5, 5)
        a, ah = sched.alpha[t], sched.alpha_hat[t]
        x = (x - ((1 - a) / jnp.sqrt(1 - ah)) * eps) / jnp.sqrt(a)
        x = jnp.clip(x, 0, 1)

    np.testing.assert_allclose(np.asarray(out_scan), np.asarray(x), atol=1e-6)


def test_deterministic_sampler_parity_vs_torch(rng):
    """Converted UNet + scan sampler vs the torch python-loop sampler."""
    ref = load_reference()
    tm = ref["ddim"].UNetDiffusion().eval()
    tsampler = ref["ddim"].DiffusionDenoiser(tm, noise_steps=50)

    noisy = np.clip(rng.random((1, 32, 32, 1), dtype=np.float32), 0, 1)
    jm = UNetDiffusion(config.SERVE_DIFFUSION)
    x = jnp.asarray(noisy)
    variables = convert_state_dict(
        tm.state_dict(), jax.jit(jm.init)(jax.random.PRNGKey(0), x, x, jnp.zeros((1,), jnp.int32))
    )

    eps_fn = lambda a, c, t: jm.apply(variables, a, c, t)
    sched = make_schedule(config.ScheduleConfig())
    denoise_jit = jax.jit(lambda xx: denoise(eps_fn, xx, sched, inference_steps=8))
    ours = np.asarray(denoise_jit(x))

    with torch.no_grad():
        theirs = tsampler.denoise(
            torch.from_numpy(np.transpose(noisy, (0, 3, 1, 2))), inference_steps=8
        )
    theirs = np.transpose(theirs.numpy(), (0, 2, 3, 1))
    np.testing.assert_allclose(ours, theirs, atol=2e-3)


def test_noise_images_statistics(rng):
    sched = make_schedule(config.ScheduleConfig())
    x = jnp.ones((4, 16, 16, 1)) * 0.5
    t = jnp.asarray([1, 10, 25, 49])
    xt, eps = noise_images(x, t, sched, jax.random.PRNGKey(1))
    assert xt.shape == x.shape and eps.shape == x.shape
    # reconstruct x0 exactly from (xt, eps)
    ah = sched.alpha_hat[t][:, None, None, None]
    x0 = (xt - jnp.sqrt(1 - ah) * eps) / jnp.sqrt(ah)
    np.testing.assert_allclose(np.asarray(x0), np.asarray(x), atol=1e-5)


def test_stochastic_sampler_runs_and_clamps(rng):
    sched = make_schedule(config.ScheduleConfig())
    noisy = jnp.asarray(np.clip(rng.random((1, 8, 8, 1), dtype=np.float32), 0, 1))
    eps_fn = lambda x, c, t: 0.1 * x
    out = denoise(
        eps_fn,
        noisy,
        sched,
        inference_steps=5,
        stochastic=True,
        clamp_eps=False,
        key=jax.random.PRNGKey(0),
    )
    assert out.shape == noisy.shape
    assert float(jnp.min(out)) >= 0.0 and float(jnp.max(out)) <= 1.0
    # requires a key
    with pytest.raises(ValueError):
        denoise(eps_fn, noisy, sched, inference_steps=5, stochastic=True)


def test_stochastic_sampler_golden_parity_vs_torch(rng):
    """Ancestral (cDDPM) sampler vs the torch loop with IDENTICAL injected
    posterior noise: a sign/scale error in the 0.5-scaled query noise or the
    sqrt(beta) posterior term (cddpm/cddpmModels.py:290-303) fails this at
    1e-4 — the round-1 gap where only shape/range was checked."""
    ref = load_reference()
    tm = ref["cddpm"].UNetDiffusion().eval()
    tsampler = ref["cddpm"].DiffusionDenoiser(tm, noise_steps=50)

    noisy = np.clip(rng.random((1, 32, 32, 1), dtype=np.float32), 0, 1)
    jm = UNetDiffusion(config.CDDPM_UNET)
    x = jnp.asarray(noisy)
    variables = convert_state_dict(
        tm.state_dict(),
        jax.jit(jm.init)(jax.random.PRNGKey(0), x, x, jnp.zeros((1,), jnp.int32)),
    )

    steps = timestep_sequence(50, 8)
    # one standard normal per reverse step, shared verbatim by both loops
    noise_seq = rng.standard_normal((len(steps), *noisy.shape)).astype(np.float32)

    eps_fn = lambda a, c, t: jm.apply(variables, a, c, t)
    sched = make_schedule(config.ScheduleConfig())
    ours = np.asarray(
        jax.jit(
            lambda xx: denoise(
                eps_fn,
                xx,
                sched,
                inference_steps=8,
                stochastic=True,
                clamp_eps=False,
                noise_seq=jnp.asarray(noise_seq),
            )
        )(x)
    )

    # feed the torch loop the same normals: its randn_like draws happen once
    # per step with i > 0, in reverse-t order — i.e. noise_seq[0..n-2]
    queue = [torch.from_numpy(np.transpose(n, (0, 3, 1, 2))) for n in noise_seq]
    real_randn_like = torch.randn_like
    calls = []

    def fake_randn_like(t, **kw):
        calls.append(t.shape)
        return queue.pop(0).to(t.dtype)

    torch.randn_like = fake_randn_like
    try:
        with torch.no_grad():
            theirs = tsampler.denoise(
                torch.from_numpy(np.transpose(noisy, (0, 3, 1, 2))),
                inference_steps=8,
            )
    finally:
        torch.randn_like = real_randn_like
    assert len(calls) == len(steps) - 1  # t=0 step draws no noise upstream
    theirs = np.transpose(theirs.numpy(), (0, 2, 3, 1))
    np.testing.assert_allclose(ours, theirs, atol=1e-4)


def test_stochastic_noise_seq_matches_key_path(rng):
    """noise_seq must reproduce the key-driven path exactly when fed the same
    normals jax would draw."""
    sched = make_schedule(config.ScheduleConfig())
    noisy = jnp.asarray(np.clip(rng.random((1, 8, 8, 1), dtype=np.float32), 0, 1))
    eps_fn = lambda x, c, t: 0.1 * x
    key = jax.random.PRNGKey(3)
    via_key = denoise(
        eps_fn, noisy, sched, inference_steps=5, stochastic=True,
        clamp_eps=False, key=key,
    )
    steps = timestep_sequence(50, 5)
    keys = jax.random.split(key, len(steps))
    seq = jnp.stack([jax.random.normal(k, noisy.shape, jnp.float32) for k in keys])
    via_seq = denoise(
        eps_fn, noisy, sched, inference_steps=5, stochastic=True,
        clamp_eps=False, noise_seq=seq,
    )
    np.testing.assert_allclose(np.asarray(via_key), np.asarray(via_seq), atol=0)


def test_eps_reuse_modes(rng):
    """eps_reuse=1 must be bit-identical to the original path; k=2 stays
    close for smooth eps functions (the 1.76x eval reduction is measured on
    TPU, see PARITY.md — call counts are not observable through scan/cond)."""
    from midd_tpu.diffusion import denoise as dn

    sched = make_schedule(config.ScheduleConfig())
    noisy = jnp.asarray(np.clip(rng.random((1, 8, 8, 1), dtype=np.float32), 0, 1))

    def eps_fn(x, cond, t):
        return 0.05 * x - 0.02 * cond

    exact = dn(eps_fn, noisy, sched, inference_steps=8)
    exact_again = dn(eps_fn, noisy, sched, inference_steps=8, eps_reuse=1)
    np.testing.assert_allclose(np.asarray(exact), np.asarray(exact_again), atol=0)

    turbo = dn(eps_fn, noisy, sched, inference_steps=8, eps_reuse=2)
    # close but not identical
    diff = float(jnp.max(jnp.abs(turbo - exact)))
    assert 0 < diff < 0.05


def test_eps_refresh_idx_generalizes_eps_reuse(rng):
    """eps_refresh_idx: a static index set equals the equivalent uniform
    stride; an all-fresh set equals the exact rollout; arrays act as runtime
    masks through ONE compiled program; step 0 is mandatory."""
    import pytest as _pytest

    from midd_tpu.diffusion import denoise as dn
    from midd_tpu.diffusion.schedule import timestep_sequence

    sched = make_schedule(config.ScheduleConfig())
    n = len(timestep_sequence(sched.noise_steps, 8))
    noisy = jnp.asarray(np.clip(rng.random((1, 8, 8, 1), dtype=np.float32), 0, 1))

    def eps_fn(x, cond, t):
        return 0.05 * x - 0.02 * cond

    k2 = dn(eps_fn, noisy, sched, inference_steps=8, eps_reuse=2)
    idx = dn(eps_fn, noisy, sched, inference_steps=8,
             eps_refresh_idx=tuple(range(0, n, 2)))
    np.testing.assert_allclose(np.asarray(k2), np.asarray(idx), atol=0)

    exact = dn(eps_fn, noisy, sched, inference_steps=8)
    allf = dn(eps_fn, noisy, sched, inference_steps=8,
              eps_refresh_idx=tuple(range(n)))
    np.testing.assert_allclose(np.asarray(exact), np.asarray(allf), atol=0)

    # runtime bool mask == static index set (and jits as ONE program)
    mask = np.zeros(n, bool)
    mask[::2] = True
    rt = jax.jit(
        lambda x, m: dn(eps_fn, x, sched, inference_steps=8, eps_refresh_idx=m)
    )(noisy, jnp.asarray(mask))
    np.testing.assert_allclose(np.asarray(rt), np.asarray(k2), atol=0)

    with _pytest.raises(ValueError, match="step 0"):
        dn(eps_fn, noisy, sched, inference_steps=8, eps_refresh_idx=(1, 2))
    with _pytest.raises(ValueError, match="mask shape"):
        dn(eps_fn, noisy, sched, inference_steps=8,
           eps_refresh_idx=jnp.ones(n + 1, bool))


def test_refresh_schedule_modes():
    from midd_tpu.diffusion.sampler import refresh_schedule

    for mode in ("uniform", "last", "front", "tail"):
        for n_evals in (2, 3, 5):
            idx = refresh_schedule(9, n_evals, mode)
            assert len(idx) == n_evals, (mode, n_evals, idx)
            assert idx[0] == 0
            assert all(0 <= i < 9 for i in idx)
    assert refresh_schedule(9, 9, "uniform") == tuple(range(9))
    assert refresh_schedule(9, 3, "last")[-1] == 8
    assert refresh_schedule(9, 3, "front") == (0, 1, 2)
    assert refresh_schedule(9, 3, "tail") == (0, 7, 8)
    import pytest as _pytest

    with _pytest.raises(ValueError):
        refresh_schedule(9, 0, "uniform")
    with _pytest.raises(ValueError):
        refresh_schedule(9, 3, "nope")
