"""Trainer engine tests: a tiny NAFNet actually learns on synthetic data,
checkpoints round-trip, resume restores state, NaN batches are skipped."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from midd_tpu import config
from midd_tpu.models import EnhancedNAFNet
from midd_tpu.train import data
from midd_tpu.train.trainer import (
    TrainConfig,
    Trainer,
    finite_update,
    lr_schedule_per_epoch,
    make_optimizer,
    nafnet_loss_fn,
    plot_training_curves,
)

TINY = config.NAFNetConfig(
    width=8, middle_blk_num=1, enc_blk_nums=(1, 1), dec_blk_nums=(1, 1)
)


def _dataset(rng, n=8, size=16):
    # structured "images": smooth gradients, so denoising is learnable
    xs = np.linspace(0, 1, size, dtype=np.float32)
    base = xs[None, :, None] * xs[None, None, :]
    clean = np.stack([np.clip(base[0] * (0.5 + 0.5 * i / n), 0, 1) for i in range(n)])
    return data.SyntheticPairedDataset(
        clean[..., None], noise_type="gaussian", is_train=False
    )


def test_lr_schedule_warmup_cosine():
    cfg = TrainConfig(epochs=10, lr=1e-3, warmup_epochs=2, eta_min_factor=0.01)
    s = lr_schedule_per_epoch(cfg)
    assert s(0) == pytest.approx(5e-4)
    assert s(1) == pytest.approx(1e-3)
    assert s(2) == pytest.approx(1e-3)  # cosine start
    assert s(9) < s(2)
    assert s(9) >= 1e-5


def test_finite_update_skips_nan():
    params = {"w": jnp.ones(3)}
    tx = make_optimizer(TrainConfig(lr=0.1))
    opt_state = tx.init(params)
    grads = {"w": jnp.ones(3)}
    p2, _ = finite_update(jnp.asarray(jnp.nan), grads, params, opt_state, tx)
    np.testing.assert_allclose(np.asarray(p2["w"]), np.asarray(params["w"]))
    p3, _ = finite_update(jnp.asarray(1.0), grads, params, opt_state, tx)
    assert not np.allclose(np.asarray(p3["w"]), np.asarray(params["w"]))


def test_nafnet_training_reduces_loss(rng, tmp_path):
    ds = _dataset(rng)
    model = EnhancedNAFNet(TINY)
    params = jax.jit(model.init)(jax.random.PRNGKey(0), jnp.zeros((1, 16, 16, 1)))[
        "params"
    ]
    cfg = TrainConfig(
        epochs=3,
        batch_size=4,
        lr=2e-3,
        ckpt_dir=str(tmp_path),
        ckpt_name="naf_test",
    )
    trainer = Trainer(
        loss_fn=nafnet_loss_fn(model),
        eval_fn=lambda p, extra, clean, noisy: model.apply({"params": p}, noisy),
        cfg=cfg,
        init_params=params,
    )
    val = [ds[0]]
    state = trainer.fit(ds, val, metadata={"width": 8}, verbose=False)
    assert len(state.history["losses"]) == 3
    assert state.history["losses"][-1] < state.history["losses"][0]
    assert state.best_psnr > 0

    # curves PNG
    plot_training_curves(state.history, str(tmp_path / "curves.png"))
    assert (tmp_path / "curves.png").exists()

    # resume restores epoch/best/history
    trainer2 = Trainer(
        loss_fn=nafnet_loss_fn(model),
        eval_fn=lambda p, extra, clean, noisy: model.apply({"params": p}, noisy),
        cfg=cfg,
        init_params=params,
    )
    trainer2.resume(str(tmp_path / "naf_test"))
    assert trainer2.state.best_psnr == pytest.approx(state.best_psnr)
    assert trainer2.state.epoch >= 1
    assert trainer2.state.history["losses"]


def test_checkpoint_roundtrip(tmp_path):
    from midd_tpu.utils.checkpoint import load_checkpoint, save_checkpoint

    tree = {"params": {"a": jnp.arange(4.0)}, "opt_state": {"m": jnp.zeros(2)}}
    save_checkpoint(str(tmp_path / "ck"), tree, {"best_psnr": 33.3, "epoch": 5})
    tree2, meta = load_checkpoint(str(tmp_path / "ck"))
    np.testing.assert_allclose(np.asarray(tree2["params"]["a"]), np.arange(4.0))
    assert meta["best_psnr"] == 33.3 and meta["epoch"] == 5


def test_remat_grads_match(rng):
    """jax.checkpoint remat must not change the computed update."""
    model = EnhancedNAFNet(TINY)
    x = jnp.zeros((1, 16, 16, 1))
    params = jax.jit(model.init)(jax.random.PRNGKey(0), x)["params"]
    loss_fn = nafnet_loss_fn(model)

    clean = jnp.asarray(np.random.default_rng(0).random((2, 16, 16, 1), dtype=np.float32))
    batch = (clean, jnp.clip(clean + 0.1, 0, 1))

    g_plain = jax.grad(lambda p: loss_fn(p, batch, None)[0])(params)
    g_remat = jax.grad(lambda p: jax.checkpoint(loss_fn)(p, batch, None)[0])(params)
    for a, b in zip(jax.tree_util.tree_leaves(g_plain), jax.tree_util.tree_leaves(g_remat)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_mesh_training_matches_single_device(rng, tmp_path):
    """TrainConfig.mesh_shape (verdict item 4): the SAME recipe trained on a
    dp4 mesh must produce the same loss trajectory as single-device — the
    gradient psum over dp of the same global batch is the same update."""
    model = EnhancedNAFNet(TINY)
    params = jax.jit(model.init)(
        jax.random.PRNGKey(0), jnp.zeros((1, 16, 16, 1))
    )["params"]

    def mk(mesh_shape, name):
        # fresh same-seeded dataset per run: SyntheticPairedDataset's noise
        # stream is mutable state, and both runs must see identical draws
        ds = _dataset(rng)
        cfg = TrainConfig(
            epochs=2, batch_size=4, lr=2e-3, ckpt_dir=str(tmp_path),
            ckpt_name=name, mesh_shape=mesh_shape, num_workers=0, prefetch=0,
        )
        t = Trainer(
            loss_fn=nafnet_loss_fn(model),
            eval_fn=lambda p, e, c, n: model.apply({"params": p}, n),
            cfg=cfg,
            # real copies: fit() donates its params buffers
            init_params=jax.tree_util.tree_map(jnp.array, params),
        )
        return t.fit(ds, [ds[0]], verbose=False)

    st_single = mk(None, "single")
    st_mesh = mk((4, 1, 1), "mesh")
    np.testing.assert_allclose(
        st_mesh.history["losses"], st_single.history["losses"],
        rtol=2e-4,
    )
    np.testing.assert_allclose(
        st_mesh.history["psnrs"], st_single.history["psnrs"], rtol=1e-3
    )


def test_mesh_training_with_prefetch_and_tp(rng, tmp_path):
    """dp2 x tp2 mesh with the device prefetcher: runs and learns."""
    ds = _dataset(rng)
    model = EnhancedNAFNet(TINY)
    params = jax.jit(model.init)(
        jax.random.PRNGKey(0), jnp.zeros((1, 16, 16, 1))
    )["params"]
    cfg = TrainConfig(
        epochs=2, batch_size=4, lr=2e-3, ckpt_dir=str(tmp_path),
        ckpt_name="mesh_tp", mesh_shape=(2, 1, 2), tp_min_size=64,
    )
    t = Trainer(
        loss_fn=nafnet_loss_fn(model),
        eval_fn=lambda p, e, c, n: model.apply({"params": p}, n),
        cfg=cfg,
        init_params=params,
    )
    st = t.fit(ds, [ds[0]], verbose=False)
    assert len(st.history["losses"]) == 2
    assert np.isfinite(st.history["losses"]).all()


def test_mesh_training_validates_divisibility():
    with pytest.raises(ValueError, match="not divisible by dp"):
        Trainer(
            loss_fn=lambda p, b, r: (jnp.zeros(()), {}),
            eval_fn=lambda p, e, c, n: n,
            cfg=TrainConfig(batch_size=3, mesh_shape=(4, 1, 1)),
            init_params={"w": jnp.ones((2, 2))},
        )


def test_load_checkpoint_cross_backend_fallback(tmp_path, monkeypatch):
    """A checkpoint whose sharding sidecar references a foreign device (e.g.
    TPU-saved, CPU-restored) must still load: load_checkpoint falls back to
    explicit single-device restore on the current backend."""
    import orbax.checkpoint as ocp

    from midd_tpu.utils.checkpoint import load_checkpoint, save_checkpoint

    tree = {"params": {"w": jnp.arange(6.0).reshape(2, 3)}}
    save_checkpoint(str(tmp_path / "ck"), tree, {"epoch": 3})

    real_restore = ocp.PyTreeCheckpointer.restore
    calls = {"n": 0}

    def flaky_restore(self, path, *a, **kw):
        calls["n"] += 1
        if calls["n"] == 1 and not a and not kw:
            # simulate orbax's foreign-topology failure on the default path
            raise ValueError(
                "sharding passed to deserialization should be specified, "
                "concrete and an instance of `jax.sharding.Sharding`. Got None"
            )
        return real_restore(self, path, *a, **kw)

    monkeypatch.setattr(ocp.PyTreeCheckpointer, "restore", flaky_restore)
    loaded, meta = load_checkpoint(str(tmp_path / "ck"))
    assert calls["n"] >= 2  # fallback path actually ran
    np.testing.assert_allclose(
        np.asarray(loaded["params"]["w"]), np.arange(6.0).reshape(2, 3)
    )
    assert meta["epoch"] == 3
