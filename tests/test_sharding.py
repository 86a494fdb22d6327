"""Mesh/sharding tests on the 8-device virtual CPU mesh."""

import numpy as np

import jax
import jax.numpy as jnp

from midd_tpu import config
from midd_tpu.models import EnhancedNAFNet
from midd_tpu.parallel import (
    count_tp_sharded,
    make_mesh,
    make_sharded_train_step,
    param_shardings,
)
from midd_tpu.train.losses import combined_loss_nafnet
from midd_tpu.train.trainer import TrainConfig, make_optimizer

TINY_NAF = config.NAFNetConfig(
    width=8, middle_blk_num=1, enc_blk_nums=(1, 1), dec_blk_nums=(1, 1)
)


def test_make_mesh_shapes():
    assert len(jax.devices()) >= 8
    mesh = make_mesh(8)
    assert mesh.shape == {"dp": 2, "sp": 1, "tp": 4}
    mesh2 = make_mesh(8, tp=2)
    assert mesh2.shape == {"dp": 4, "sp": 1, "tp": 2}
    mesh1 = make_mesh(1)
    assert mesh1.shape == {"dp": 1, "sp": 1, "tp": 1}
    mesh_sp = make_mesh(8, tp=1, sp=4)
    assert mesh_sp.shape == {"dp": 2, "sp": 4, "tp": 1}


def test_param_shardings_rules():
    mesh = make_mesh(8, tp=2)
    model = EnhancedNAFNet(TINY_NAF)
    params = jax.jit(model.init)(jax.random.PRNGKey(0), jnp.zeros((1, 16, 16, 1)))[
        "params"
    ]
    shardings = param_shardings(params, mesh, min_size=64)
    leaves = jax.tree_util.tree_leaves(shardings)
    assert len(leaves) > 0  # every leaf got a sharding


def test_sharded_train_step_runs_and_reduces():
    mesh = make_mesh(8, tp=2)
    model = EnhancedNAFNet(TINY_NAF)
    x = jnp.zeros((8, 16, 16, 1))
    params = jax.jit(model.init)(jax.random.PRNGKey(0), x)["params"]

    def loss_fn(p, batch, rng):
        clean, noisy = batch
        pred = model.apply({"params": p}, noisy)
        loss, parts = combined_loss_nafnet(pred, clean)
        return loss, parts

    tx = make_optimizer(TrainConfig(lr=1e-3))
    with mesh:
        step_fn, params_s, opt_state = make_sharded_train_step(
            loss_fn, tx, params, mesh
        )
        # snapshot before the step: params may be donated into the jit
        old = np.asarray(jax.tree_util.tree_leaves(params_s)[0])
        rng = np.random.default_rng(0)
        clean = jnp.asarray(rng.random((8, 16, 16, 1), dtype=np.float32))
        noisy = jnp.clip(
            clean + jnp.asarray(rng.normal(0, 0.1, clean.shape).astype(np.float32)),
            0,
            1,
        )
        new_params, opt_state, loss = step_fn(params_s, opt_state, (clean, noisy), jax.random.PRNGKey(0))
        assert np.isfinite(float(loss))
        # params changed
        new = jax.tree_util.tree_leaves(new_params)[0]
        assert not np.allclose(old, np.asarray(new))


def test_dp_step_matches_single_device():
    """The dp-sharded step must compute the same update as unsharded."""
    model = EnhancedNAFNet(TINY_NAF)
    x = jnp.zeros((8, 16, 16, 1))
    params = jax.jit(model.init)(jax.random.PRNGKey(0), x)["params"]
    tx = make_optimizer(TrainConfig(lr=1e-3))

    def loss_fn(p, batch, rng):
        clean, noisy = batch
        pred = model.apply({"params": p}, noisy)
        loss, parts = combined_loss_nafnet(pred, clean)
        return loss, parts

    rng = np.random.default_rng(1)
    clean = jnp.asarray(rng.random((8, 16, 16, 1), dtype=np.float32))
    noisy = jnp.clip(clean + 0.1, 0, 1)
    batch = (clean, noisy)

    # single device reference
    import optax

    opt0 = tx.init(params)
    (l0, _), g0 = jax.value_and_grad(loss_fn, has_aux=True)(params, batch, None)
    u0, _ = tx.update(g0, opt0, params)
    ref = optax.apply_updates(params, u0)

    mesh = make_mesh(8, tp=1)
    with mesh:
        step_fn, params_s, opt_state = make_sharded_train_step(
            loss_fn, tx, params, mesh
        )
        new_params, _, loss = step_fn(params_s, opt_state, batch, jax.random.PRNGKey(0))

    np.testing.assert_allclose(float(loss), float(l0), rtol=1e-5)
    for a, b in zip(
        jax.tree_util.tree_leaves(ref), jax.tree_util.tree_leaves(new_params)
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_tp_step_matches_single_device():
    """Tensor parallelism must be REAL: with min_size lowered so the tiny
    config's conv kernels actually shard over tp=4, the sharded step must
    still compute the same update as unsharded (a sign/scale error in the
    partitioned convs or their collectives would fail the 1e-5 check)."""
    model = EnhancedNAFNet(TINY_NAF)
    x = jnp.zeros((8, 16, 16, 1))
    params = jax.jit(model.init)(jax.random.PRNGKey(0), x)["params"]
    tx = make_optimizer(TrainConfig(lr=1e-3))

    def loss_fn(p, batch, rng):
        clean, noisy = batch
        pred = model.apply({"params": p}, noisy)
        loss, parts = combined_loss_nafnet(pred, clean)
        return loss, parts

    rng = np.random.default_rng(2)
    clean = jnp.asarray(rng.random((8, 16, 16, 1), dtype=np.float32))
    noisy = jnp.clip(
        clean + jnp.asarray(rng.normal(0, 0.1, clean.shape).astype(np.float32)), 0, 1
    )
    batch = (clean, noisy)

    import optax

    opt0 = tx.init(params)
    (l0, _), g0 = jax.value_and_grad(loss_fn, has_aux=True)(params, batch, None)
    u0, _ = tx.update(g0, opt0, params)
    ref = optax.apply_updates(params, u0)

    mesh = make_mesh(8, tp=4)
    min_size = 64
    shardings = param_shardings(params, mesh, min_size=min_size)
    n_tp = count_tp_sharded(shardings)
    assert n_tp > 0, "test config must actually tp-shard kernels"

    with mesh:
        step_fn, params_s, opt_state = make_sharded_train_step(
            loss_fn, tx, params, mesh, min_size=min_size
        )
        new_params, _, loss = step_fn(params_s, opt_state, batch, jax.random.PRNGKey(0))

    np.testing.assert_allclose(float(loss), float(l0), rtol=1e-5)
    for a, b in zip(
        jax.tree_util.tree_leaves(ref), jax.tree_util.tree_leaves(new_params)
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_count_tp_sharded_thresholds():
    mesh = make_mesh(8, tp=4)
    model = EnhancedNAFNet(TINY_NAF)
    params = jax.jit(model.init)(jax.random.PRNGKey(0), jnp.zeros((1, 16, 16, 1)))[
        "params"
    ]
    assert count_tp_sharded(param_shardings(params, mesh, min_size=64)) > 0
    # serving threshold replicates everything at tiny widths (the round-1 trap)
    assert count_tp_sharded(param_shardings(params, mesh, min_size=1 << 16)) == 0
    # tp=1 mesh never tp-shards
    mesh1 = make_mesh(8, tp=1)
    assert count_tp_sharded(param_shardings(params, mesh1, min_size=64)) == 0


def test_tp_sharded_engine_matches_single_device():
    """Engine with tensor_parallel=True (kernels genuinely sharded over tp)
    must produce the same outputs as the unsharded engine on every path."""
    from midd_tpu import config as c
    from midd_tpu.serve.engine import EngineConfig, InferenceEngine

    kw = dict(
        img_size=16,
        diffusion_steps=2,
        hybrid_diffusion_steps=2,
        nafnet_cfg=c.NAFNetConfig(width=8, middle_blk_num=1, enc_blk_nums=(1, 1), dec_blk_nums=(1, 1)),
        diffusion_cfg=c.DiffusionUNetConfig(model_channels=8, channel_mult=(1, 2), num_res_blocks=1, attention_resolutions=(1,), time_emb_dim=16),
        expert_cfg=c.ExpertConfig(base_channels=8),
        router_cfg=c.RouterConfig(base_c=8),
        fusion_cfg=c.FusionConfig(base_c=16),
        schedule_cfg=c.ScheduleConfig(noise_steps=6),
        ckpt_dir="/nonexistent",
        warmup=False,
        diffusion_eval_bf16=False,  # exact-equality tests pin fp32
        hybrid_rollout_bf16=False,
    )
    plain = InferenceEngine(EngineConfig(**kw))
    tp = InferenceEngine(
        EngineConfig(tensor_parallel=True, tp_min_size=64, **kw)
    )
    # tensor_parallel alone -> tp over ALL devices, dp=1 (single-image serving)
    assert tp.mesh is not None and tp.mesh.shape == {"dp": 1, "sp": 1, "tp": 8}
    # prove the engine's captured weights are genuinely tp-sharded
    assert tp.n_tp_sharded > 0

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.random((2, 16, 16, 1), dtype=np.float32))
    for name in ("nafnet", "diffusion", "expert", "hybrid"):
        a = np.asarray(plain.fns[name](x))
        b = np.asarray(tp.fns[name](x))
        np.testing.assert_allclose(a, b, atol=1e-5)


def test_sp_engine_matches_single_device():
    """Spatial parallelism must be REAL and exact: with the image H axis
    sharded over sp, GSPMD's halo exchanges around every conv (and the
    gathers around attention/resizes) must reproduce the single-device
    outputs on all four paths — including batch 1, the latency case sp
    exists for. sp auto-sizes to the deepest feature-map height (16² with
    2 downs -> sp=4): oversharding past it leaves empty shards, which
    produces WRONG results under GSPMD (measured), hence the engine guard."""
    from midd_tpu import config as c
    from midd_tpu.serve.engine import EngineConfig, InferenceEngine

    kw = dict(
        img_size=16,
        diffusion_steps=2,
        hybrid_diffusion_steps=2,
        nafnet_cfg=c.NAFNetConfig(width=8, middle_blk_num=1, enc_blk_nums=(1, 1), dec_blk_nums=(1, 1)),
        diffusion_cfg=c.DiffusionUNetConfig(model_channels=8, channel_mult=(1, 2), num_res_blocks=1, attention_resolutions=(1,), time_emb_dim=16),
        expert_cfg=c.ExpertConfig(base_channels=8),
        router_cfg=c.RouterConfig(base_c=8),
        fusion_cfg=c.FusionConfig(base_c=16),
        schedule_cfg=c.ScheduleConfig(noise_steps=6),
        ckpt_dir="/nonexistent",
        warmup=False,
        # sharded == single-device equality is asserted at atol 1e-5, which
        # only holds at full precision (the gated bf16-eval serving defaults
        # reassociate differently under GSPMD halo exchanges)
        diffusion_eval_bf16=False,
        hybrid_rollout_bf16=False,
    )
    plain = InferenceEngine(EngineConfig(**kw))
    sp = InferenceEngine(EngineConfig(spatial_parallel=True, **kw))
    # spatial_parallel alone -> dp=1 (batch-1 serving), sp capped at the
    # deepest feature-map height (16 >> 2 downs = 4), spare devices idle
    assert sp.mesh is not None and sp.mesh.shape == {"dp": 1, "sp": 4, "tp": 1}

    rng = np.random.default_rng(0)
    for batch in (1, 2):
        x = jnp.asarray(rng.random((batch, 16, 16, 1), dtype=np.float32))
        for name in ("nafnet", "diffusion", "expert", "hybrid"):
            a = np.asarray(plain.fns[name](x))
            b = np.asarray(sp.fns[name](x))
            np.testing.assert_allclose(a, b, atol=1e-5, err_msg=f"{name} b{batch}")

    # oversharding past the deepest feature map is refused, not silently wrong
    import pytest

    with pytest.raises(ValueError, match="deepest"):
        InferenceEngine(EngineConfig(spatial_parallel=True, sp_size=8, **kw))


def test_sp_composes_with_dp():
    """dp x sp mesh: batch over dp AND rows over sp simultaneously."""
    from midd_tpu import config as c
    from midd_tpu.serve.engine import EngineConfig, InferenceEngine

    kw = dict(
        img_size=16,
        diffusion_steps=2,
        hybrid_diffusion_steps=2,
        nafnet_cfg=c.NAFNetConfig(width=8, middle_blk_num=1, enc_blk_nums=(1, 1), dec_blk_nums=(1, 1)),
        diffusion_cfg=c.DiffusionUNetConfig(model_channels=8, channel_mult=(1, 2), num_res_blocks=1, attention_resolutions=(1,), time_emb_dim=16),
        expert_cfg=c.ExpertConfig(base_channels=8),
        router_cfg=c.RouterConfig(base_c=8),
        fusion_cfg=c.FusionConfig(base_c=16),
        schedule_cfg=c.ScheduleConfig(noise_steps=6),
        ckpt_dir="/nonexistent",
        warmup=False,
        diffusion_eval_bf16=False,  # exact-equality tests pin fp32
        hybrid_rollout_bf16=False,
    )
    plain = InferenceEngine(EngineConfig(**kw))
    eng = InferenceEngine(
        EngineConfig(spatial_parallel=True, data_parallel=True, sp_size=4, **kw)
    )
    assert eng.mesh is not None and eng.mesh.shape == {"dp": 2, "sp": 4, "tp": 1}

    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.random((2, 16, 16, 1), dtype=np.float32))
    for name in ("nafnet", "hybrid"):
        a = np.asarray(plain.fns[name](x))
        b = np.asarray(eng.fns[name](x))
        np.testing.assert_allclose(a, b, atol=1e-5, err_msg=name)


def test_dp_sharded_engine_matches_single_device():
    """Engine with data_parallel=True over the CPU mesh must produce the same
    outputs as the unsharded engine."""
    from midd_tpu import config as c
    from midd_tpu.serve.engine import EngineConfig, InferenceEngine

    kw = dict(
        img_size=16,
        diffusion_steps=2,
        hybrid_diffusion_steps=2,
        nafnet_cfg=c.NAFNetConfig(width=8, middle_blk_num=1, enc_blk_nums=(1, 1), dec_blk_nums=(1, 1)),
        diffusion_cfg=c.DiffusionUNetConfig(model_channels=8, channel_mult=(1, 2), num_res_blocks=1, attention_resolutions=(1,), time_emb_dim=16),
        expert_cfg=c.ExpertConfig(base_channels=8),
        router_cfg=c.RouterConfig(base_c=8),
        fusion_cfg=c.FusionConfig(base_c=16),
        schedule_cfg=c.ScheduleConfig(noise_steps=6),
        ckpt_dir="/nonexistent",
        warmup=False,
        diffusion_eval_bf16=False,  # exact-equality tests pin fp32
        hybrid_rollout_bf16=False,
    )
    plain = InferenceEngine(EngineConfig(**kw))
    dp = InferenceEngine(EngineConfig(data_parallel=True, **kw))
    assert dp.mesh is not None and dp.mesh.shape["dp"] == 8

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.random((8, 16, 16, 1), dtype=np.float32))
    for name in ("nafnet", "hybrid"):
        a = np.asarray(plain.fns[name](x))
        b = np.asarray(dp.fns[name](x))
        np.testing.assert_allclose(a, b, atol=1e-5)
