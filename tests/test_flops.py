"""Unit tests for the analytic FLOP counter behind the bench's MFU figure."""

import jax
import jax.numpy as jnp
import numpy as np

from midd_tpu.utils.flops import count_flops, device_peak_tflops, mfu


def test_dot_general_flops():
    a = jnp.zeros((4, 8, 16))
    b = jnp.zeros((16, 32))
    f = count_flops(lambda x: x @ b, a)
    assert f == 2 * 4 * 8 * 32 * 16


def test_conv_flops():
    x = jnp.zeros((2, 16, 16, 8))
    k = jnp.zeros((3, 3, 8, 24))
    f = count_flops(
        lambda a: jax.lax.conv_general_dilated(
            a, k, (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        ),
        x,
    )
    assert f == 2 * (2 * 16 * 16 * 24) * 8 * 3 * 3


def test_scan_multiplies_by_length():
    w = jnp.zeros((8, 8))

    def step(c, _):
        return c @ w, None

    def fn(x):
        out, _ = jax.lax.scan(step, x, None, length=7)
        return out

    f = count_flops(fn, jnp.zeros((4, 8)))
    assert f == 7 * 2 * 4 * 8 * 8


def test_grad_counts_backward_matmuls():
    w = jnp.zeros((8, 8))
    f_fwd = count_flops(lambda x: jnp.sum(x @ w), jnp.zeros((4, 8)))
    f_bwd = count_flops(
        jax.grad(lambda x: jnp.sum(x @ w)), jnp.zeros((4, 8))
    )
    assert f_bwd >= f_fwd  # backward adds at least the dL/dx matmul


def test_unet_rollout_scales_with_steps():
    from midd_tpu import config
    from midd_tpu.diffusion import denoise, make_schedule
    from midd_tpu.models import UNetDiffusion

    cfg = config.DiffusionUNetConfig(
        model_channels=8, channel_mult=(1, 2), num_res_blocks=1,
        attention_resolutions=(1,), time_emb_dim=16,
    )
    model = UNetDiffusion(cfg, use_flash=False)
    schedule = make_schedule(config.ScheduleConfig(noise_steps=10))
    x = jnp.zeros((1, 32, 32, 1))
    t = jnp.zeros((1,), jnp.int32)
    shapes = jax.eval_shape(lambda: model.init(jax.random.PRNGKey(0), x, x, t))
    v = jax.tree_util.tree_map(lambda s: jnp.zeros(s.shape, s.dtype), shapes)

    def roll(steps):
        return count_flops(
            lambda a: denoise(
                lambda b, c, tt: model.apply(v, b, c, tt), a, schedule, steps
            ),
            x,
        )

    from midd_tpu.diffusion.schedule import timestep_sequence

    # FLOPs are linear in the ACTUAL scan length (the reference's stride
    # arithmetic can produce more steps than requested)
    n2 = len(timestep_sequence(10, 2))
    n4 = len(timestep_sequence(10, 4))
    f2, f4 = roll(2), roll(4)
    assert f2 > 0 and n2 != n4
    assert f4 * n2 == f2 * n4


def test_peak_and_mfu_helpers():
    assert device_peak_tflops() > 0
    assert abs(mfu(197e12, 1.0, 197.0) - 1.0) < 1e-9
