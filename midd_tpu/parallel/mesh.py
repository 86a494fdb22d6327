"""Device mesh + sharding layer.

The reference has NO distributed anything (SURVEY section 2.5): one CUDA
device, thread-level request parallelism. This module is the TPU-native
scale-out layer it lacks: a (dp, sp, tp) ``jax.sharding.Mesh`` over ICI,
NamedSharding rules for batches, images and parameters, and helpers that let
XLA insert the collectives (psum for data-parallel gradients, all-gather for
tensor-sharded conv kernels, halo exchanges for spatially sharded convs).

Axes:
- dp: batch data parallelism (throughput);
- sp: SPATIAL parallelism — the image H axis is sharded, GSPMD inserts the
  conv halo exchanges; the latency lever for batch-1 requests, where dp
  cannot help (default size 1);
- tp: tensor parallelism over conv output channels.

Mesh policy: tp is the largest of (4, 2, 1) dividing the device count whose
size divides the model's channel widths (48-multiples for the diffusion UNet,
32-multiples for NAFNet — both divide by 4); dp gets the rest. On a single
host v5e slice all axes ride ICI.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    n_devices: Optional[int] = None,
    tp: Optional[int] = None,
    sp: int = 1,
    devices: Optional[Sequence] = None,
) -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    n = n_devices or len(devices)
    devices = devices[:n]
    if tp is None:
        tp = 1
        for cand in (4, 2):
            if (n // sp) % cand == 0:
                tp = cand
                break
    dp = n // (sp * tp)
    arr = np.asarray(devices).reshape(dp, sp, tp)
    return Mesh(arr, axis_names=("dp", "sp", "tp"))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading batch axis over dp, replicate over sp/tp."""
    return NamedSharding(mesh, P("dp"))


def image_sharding(mesh: Mesh) -> NamedSharding:
    """NHWC layout for spatial parallelism: batch over dp, image ROWS (H)
    over sp. GSPMD partitions every conv spatially and inserts the halo
    exchanges; interior ops stay local. This is how a single large image
    uses the whole slice (batch-1 latency — dp can't help there)."""
    return NamedSharding(mesh, P("dp", "sp"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def param_shardings(params, mesh: Mesh, min_size: int = 1 << 16):
    """Tensor-parallel layout: shard the output-channel axis of large conv /
    dense kernels over tp; replicate everything else. XLA all-gathers shards
    where a consumer needs the full tensor and keeps matmul partials sharded
    where it can — the scaling-book recipe (annotate, let XLA insert
    collectives)."""
    tp = mesh.shape["tp"]

    def rule(x):
        if tp > 1 and hasattr(x, "ndim") and x.ndim >= 2:
            if x.size >= min_size and x.shape[-1] % tp == 0:
                spec = [None] * (x.ndim - 1) + ["tp"]
                return NamedSharding(mesh, P(*spec))
        return NamedSharding(mesh, P())

    return jax.tree_util.tree_map(rule, params)


def shard_params(params, mesh: Mesh, min_size: int = 1 << 16):
    return jax.device_put(params, param_shardings(params, mesh, min_size))


def count_tp_sharded(shardings) -> int:
    """Number of leaves whose PartitionSpec actually names the tp axis.

    Used by tests and the multichip dryrun to prove tensor parallelism is
    doing real work (not silently replicating everything because every
    kernel fell under ``min_size``)."""
    n = 0
    for s in jax.tree_util.tree_leaves(
        shardings, is_leaf=lambda x: isinstance(x, NamedSharding)
    ):
        if isinstance(s, NamedSharding) and "tp" in jax.tree_util.tree_leaves(
            tuple(s.spec)
        ):
            n += 1
    return n
