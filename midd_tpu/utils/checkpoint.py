"""Checkpoint I/O: orbax param trees + a JSON metadata sidecar that preserves
the reference's checkpoint schema.

The reference stores torch dicts with ``model_state_dict`` plus metadata —
arch hyperparams, ``best_psnr``/``best_ssim``, ``epoch``, ``noise_steps``,
metric histories, and (hybrid) optimizer/scheduler state for full resume
(DDIM/DDIMModel.py:429-435, NafNet:566-581, hybrid3diffusionspeed.py:837-852).
Here the array trees go to orbax (fast, sharded-aware) and everything scalar
goes to ``metadata.json`` with the same keys, so tooling that reads the
reference's metadata finds the same fields.
"""

from __future__ import annotations

import json
import os
from typing import Any, Dict, Optional, Tuple

import jax
import numpy as np


def _jsonable(x):
    if isinstance(x, (np.floating, np.integer)):
        return x.item()
    if isinstance(x, (list, tuple)):
        return [_jsonable(v) for v in x]
    if isinstance(x, dict):
        return {k: _jsonable(v) for k, v in x.items()}
    return x


def save_checkpoint(path: str, tree: Any, metadata: Optional[Dict] = None) -> None:
    """Save an arbitrary pytree of arrays (+ JSON metadata) under ``path``."""
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    ckptr = ocp.PyTreeCheckpointer()
    ckptr.save(os.path.join(path, "tree"), tree, force=True)
    with open(os.path.join(path, "metadata.json"), "w") as f:
        json.dump(_jsonable(metadata or {}), f, indent=2)


def load_checkpoint(path: str) -> Tuple[Any, Dict]:
    """Load (tree, metadata) saved by ``save_checkpoint``.

    Cross-backend portable: a checkpoint saved on the TPU records TPU
    shardings in its sidecar, and orbax's default restore then fails on a
    CPU host ("sharding ... Got None"). Restore falls back to explicit
    single-device placement on the CURRENT backend in that case — serving
    and analysis hosts need not match the training topology."""
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    ckptr = ocp.PyTreeCheckpointer()
    tree_path = os.path.join(path, "tree")
    try:
        tree = ckptr.restore(tree_path)
    except ValueError:
        from jax.sharding import SingleDeviceSharding

        dev = jax.devices()[0]
        meta = ckptr.metadata(tree_path)
        item = getattr(meta, "item_metadata", meta)
        item = getattr(item, "tree", item)
        restore_args = jax.tree_util.tree_map(
            lambda _: ocp.ArrayRestoreArgs(
                sharding=SingleDeviceSharding(dev)
            ),
            item,
        )
        tree = ckptr.restore(
            tree_path, args=ocp.args.PyTreeRestore(restore_args=restore_args)
        )
    meta_path = os.path.join(path, "metadata.json")
    metadata: Dict = {}
    if os.path.exists(meta_path):
        with open(meta_path) as f:
            metadata = json.load(f)
    return tree, metadata


def import_reference_checkpoint(
    pth_path: str, model, *example_args
) -> Tuple[Any, Dict]:
    """Convert a reference torch ``.pth`` checkpoint into (variables, metadata)
    for the given midd_tpu model — the torch->JAX bridge run.py implies at
    model load (run.py:34-74)."""
    from midd_tpu.convert.torch_import import convert_state_dict, load_pth

    ckpt = load_pth(pth_path)
    state_dict = ckpt.get("model_state_dict", ckpt)
    variables = model.init(jax.random.PRNGKey(0), *example_args)
    converted = convert_state_dict(state_dict, variables)
    metadata = {k: _jsonable(v) for k, v in ckpt.items() if k != "model_state_dict" and not k.endswith("state_dict")}
    return converted, metadata
