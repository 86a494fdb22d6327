"""Sharded training step: data-parallel batches, spatially sharded images,
and tensor-parallel conv kernels over a (dp, sp, tp) mesh.

The train step itself is the single-device one from midd_tpu.train.trainer;
sharding is imposed purely through in/out shardings on ``jax.jit`` — XLA
inserts the psum for dp gradient reduction, the halo exchanges around
spatially sharded convs, and the tp all-gathers/partials.
No NCCL-style code exists anywhere (the reference has none either; this is
the scale-out layer it lacks, SURVEY section 2.5).
"""

from __future__ import annotations

from functools import partial
from typing import Any, Callable, Tuple

import jax
import jax.numpy as jnp
import optax

from midd_tpu.parallel.mesh import (
    batch_sharding,
    image_sharding,
    param_shardings,
    replicated,
)


def make_sharded_train_step(
    loss_fn: Callable,  # (params, batch, rng) -> (loss, aux)
    tx: optax.GradientTransformation,
    params,
    mesh,
    min_size: int = 1 << 16,
) -> Tuple[Callable, Any, Any]:
    """Returns (step_fn, sharded_params, sharded_opt_state).

    ``step_fn(params, opt_state, batch, rng) -> (params, opt_state, loss)``
    with batch sharded over dp (and image rows over sp when the mesh has an
    sp axis > 1) and params/optimizer state sharded per ``param_shardings``.
    ``min_size`` is the tensor-parallel threshold: kernels with at least this
    many elements get their output-channel axis sharded over tp (lower it for
    small test configs so tp does real work).
    """
    p_shard = param_shardings(params, mesh, min_size=min_size)
    params = jax.device_put(params, p_shard)
    opt_state = jax.jit(
        tx.init, out_shardings=None
    )(params)  # opt state inherits layouts from params via XLA

    b_shard = (
        image_sharding(mesh) if mesh.shape.get("sp", 1) > 1 else batch_sharding(mesh)
    )
    r_shard = replicated(mesh)

    def step(params, opt_state, batch, rng):
        (loss, _aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            params, batch, rng
        )
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    step_fn = jax.jit(
        step,
        in_shardings=(p_shard, None, (b_shard, b_shard), r_shard),
        out_shardings=(p_shard, None, r_shard),
        donate_argnums=(0, 1),
    )
    return step_fn, params, opt_state
