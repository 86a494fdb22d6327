"""End-to-end training recipes on tiny configs + the DDPM scheduler."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from midd_tpu import config
from midd_tpu.train import data
from midd_tpu.train.recipes import (
    train_diffusion,
    train_expert,
    train_hybrid,
    train_nafnet,
    train_tiny,
)
from midd_tpu.train.trainer import TrainConfig

TINY_NAF = config.NAFNetConfig(
    width=8, middle_blk_num=1, enc_blk_nums=(1, 1), dec_blk_nums=(1, 1)
)
TINY_UNET = config.DiffusionUNetConfig(
    model_channels=8,
    channel_mult=(1, 2),
    num_res_blocks=1,
    attention_resolutions=(1,),
    time_emb_dim=16,
)


def _dataset(rng, n=4, size=16):
    clean = rng.random((n, size, size, 1)).astype(np.float32)
    return data.SyntheticPairedDataset(clean, noise_type="gaussian", is_train=False)


def _cfg(tmp_path, name, **kw):
    return TrainConfig(
        epochs=1, batch_size=2, lr=1e-3, ckpt_dir=str(tmp_path), ckpt_name=name, **kw
    )


def test_train_nafnet_recipe(rng, tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    st = train_nafnet(_dataset(rng), model_cfg=TINY_NAF, train_cfg=_cfg(tmp_path, "n"))
    assert len(st.history["losses"]) == 1 and np.isfinite(st.history["losses"][0])


def test_train_diffusion_recipe(rng, tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    st = train_diffusion(
        _dataset(rng),
        model_cfg=TINY_UNET,
        schedule_cfg=config.ScheduleConfig(noise_steps=10),
        train_cfg=_cfg(tmp_path, "d"),
        val_inference_steps=3,
    )
    assert np.isfinite(st.history["losses"][0])


def test_train_expert_recipe(rng, tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    st = train_expert(
        _dataset(rng),
        model_cfg=config.ExpertConfig(base_channels=8),
        train_cfg=_cfg(tmp_path, "e"),
    )
    assert np.isfinite(st.history["losses"][0])


def test_train_hybrid_recipe_frozen_backends(rng, tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    hcfg = config.HybridConfig(
        nafnet=TINY_NAF,
        diffusion=TINY_UNET,
        schedule=config.ScheduleConfig(noise_steps=10),
        router=config.RouterConfig(base_c=8),
        fusion=config.FusionConfig(base_c=16),
        training_diffusion_steps=3,
        inference_diffusion_steps=3,
    )
    st = train_hybrid(
        _dataset(rng),
        nafnet_ckpt=None,  # random frozen backends
        diffusion_ckpt=None,
        hybrid_cfg=hcfg,
        train_cfg=_cfg(tmp_path, "h"),
    )
    assert np.isfinite(st.history["losses"][0])
    # only router+fusion are trainable param groups
    assert set(st.params) == {"router", "fusion"}


def test_train_tiny_recipe(rng, tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    st = train_tiny(
        _dataset(rng),
        model_cfg=config.TinyUNetConfig(base_ch=8, time_dim=16),
        train_cfg=_cfg(tmp_path, "t"),
    )
    assert np.isfinite(st.history["losses"][0])


def test_ddpm_scheduler_roundtrip(rng):
    from midd_tpu.diffusion.ddpm_scheduler import DDPMScheduler

    sch = DDPMScheduler()
    x0 = jnp.asarray(rng.random((2, 8, 8, 1), dtype=np.float32)) * 2 - 1
    noise = jnp.asarray(rng.standard_normal((2, 8, 8, 1), dtype=np.float32))
    t = jnp.asarray([100, 900])
    xt = sch.add_noise(x0, noise, t)
    # exact x0 reconstruction with the true eps and one no-noise step at t
    ac = sch.alphas_cumprod[t][:, None, None, None]
    rec = (xt - jnp.sqrt(1 - ac) * noise) / jnp.sqrt(ac)
    np.testing.assert_allclose(np.asarray(rec), np.asarray(x0), atol=1e-4)

    # leading spacing, descending
    ts = np.asarray(sch.timesteps(12))
    assert ts[0] > ts[-1] and ts[-1] == 0 and len(ts) == 12

    # a perfect eps-oracle must walk x_T back toward x0
    def eps_oracle(latents, t_b, cond):
        a = sch.alphas_cumprod[t_b][:, None, None, None]
        return (latents - jnp.sqrt(a) * x0) / jnp.sqrt(1 - a)

    x_noisy = sch.add_noise(x0, noise, jnp.asarray([999, 999]))
    out = sch.sample(eps_oracle, x_noisy, steps=12)
    err_before = float(jnp.mean(jnp.abs(x_noisy - x0)))
    err_after = float(jnp.mean(jnp.abs(out - x0)))
    assert err_after < err_before * 0.2


def test_nafnet_s2d_training_trajectory_matches_plain(rng, tmp_path):
    """The space-to-depth stage-0 layout is now a TRAINING lever
    (train_nafnet(s2d_stage0=...)): same param tree, numerically equivalent
    forward AND backward — two 2-epoch runs differing only in layout must
    follow the same loss trajectory and land on the same weights."""
    clean = rng.random((4, 16, 16, 1)).astype(np.float32)

    def run(s2d):
        ds = data.SyntheticPairedDataset(
            clean, noise_type="gaussian", is_train=False, seed=3
        )
        return train_nafnet(
            ds, TINY_NAF,
            TrainConfig(epochs=2, batch_size=2, lr=1e-3,
                        ckpt_dir=str(tmp_path / f"s2d_{s2d}"),
                        ckpt_name="naf", num_workers=0, prefetch=0),
            s2d_stage0=s2d,
        )

    st_plain = run(False)
    st_s2d = run(True)
    np.testing.assert_allclose(
        st_s2d.history["losses"], st_plain.history["losses"], rtol=1e-4
    )
    np.testing.assert_allclose(
        st_s2d.history["psnrs"], st_plain.history["psnrs"], rtol=1e-4
    )
    for a, b in zip(
        jax.tree_util.tree_leaves(st_plain.params),
        jax.tree_util.tree_leaves(st_s2d.params),
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-4)
