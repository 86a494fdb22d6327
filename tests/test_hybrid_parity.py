"""Full hybrid-graph parity: the reference HybridDenoisingRouter.forward
(frozen NAFNet + 8-step rollout + router + fusion, eager torch) vs the
midd_tpu fused fan-out DAG with converted weights."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

import torch

from tests.torch_ref import load_reference

from midd_tpu import config
from midd_tpu.convert.torch_import import convert_state_dict
from midd_tpu.diffusion import denoise, make_schedule
from midd_tpu.models import (
    EnhancedNAFNet,
    FusionModule,
    NoiseAnalyzer,
    UNetDiffusion,
)
from midd_tpu.models.hybrid import hybrid_forward


def test_hybrid_full_parity(rng):
    ref = load_reference()
    torch.manual_seed(3)
    tm = ref["hybrid"].HybridDenoisingRouter(
        nafnet_params={}, diffusion_params={}, inference_diffusion_steps=4
    ).eval()

    x = np.clip(rng.random((1, 32, 32, 1), dtype=np.float32), 0, 1)
    xj = jnp.asarray(x)
    t0 = jnp.zeros((1,), jnp.int32)

    naf = EnhancedNAFNet(config.SERVE_NAFNET)
    unet = UNetDiffusion(config.SERVE_DIFFUSION)
    router = NoiseAnalyzer(config.RouterConfig())
    fusion = FusionModule(config.FusionConfig())

    def sub(prefix):
        return {
            k[len(prefix) + 1 :]: v
            for k, v in tm.state_dict().items()
            if k.startswith(prefix + ".")
        }

    v_naf = convert_state_dict(
        sub("nafnet"), jax.jit(naf.init)(jax.random.PRNGKey(0), xj)
    )
    v_unet = convert_state_dict(
        sub("diffusion_unet"),
        jax.jit(unet.init)(jax.random.PRNGKey(0), xj, xj, t0),
    )
    v_router = convert_state_dict(
        sub("router"), jax.jit(router.init)(jax.random.PRNGKey(0), xj)
    )
    v_fusion = convert_state_dict(
        sub("fusion"), jax.jit(fusion.init)(jax.random.PRNGKey(0), xj, xj, xj)
    )

    schedule = make_schedule(config.SERVE_SCHEDULE)

    @jax.jit
    def fused(noisy):
        return hybrid_forward(
            lambda a: naf.apply(v_naf, a),
            lambda a: denoise(
                lambda b, c, t: unet.apply(v_unet, b, c, t), a, schedule, 4
            ),
            lambda a: router.apply(v_router, a),
            lambda a, b, m: fusion.apply(v_fusion, a, b, m),
            noisy,
        )

    ours = np.asarray(fused(xj))

    with torch.no_grad():
        theirs = tm(torch.from_numpy(np.transpose(x, (0, 3, 1, 2))))
    theirs = np.transpose(theirs.numpy(), (0, 2, 3, 1))

    np.testing.assert_allclose(ours, theirs, atol=2e-3)
