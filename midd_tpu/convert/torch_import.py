"""torch ``.pth`` state_dict -> JAX variable-tree converter.

The serving checkpoints the reference hardcodes (run.py:34-74) are
``torch.save`` dicts keyed ``model_state_dict`` (+ metadata). This module maps
any of those state_dicts onto the matching midd_tpu model's variables.

The mapping is mechanical because midd_tpu module names mirror the torch key
structure (see midd_tpu.models.blocks docstring):

torch key path -> flax path: every *numeric* component merges into its
predecessor with '_' (``encoders.0.1.conv1.weight`` -> ``encoders_0_1 / conv1``,
``sca.1`` -> ``sca_1``). Leaf transforms:

- Conv2d   weight (O, I/g, kH, kW) -> 'kernel'   (kH, kW, I/g, O)
- ConvT2d  weight (I, O, kH, kW)   -> 'kernel_t' (kH, kW, I, O), spatially
  flipped (fractionally-strided-conv form, see blocks.ConvTransposeTorch)
- Linear   weight (O, I)           -> 'kernel' (I, O)
- Norm     weight/bias             -> 'scale'/'bias'
- BatchNorm running_mean/var       -> batch_stats 'mean'/'var'
- NAFBlock beta/gamma (1,C,1,1)    -> (1,1,1,C)
- num_batches_tracked              -> dropped
"""

from __future__ import annotations

import re
from typing import Any, Dict, Mapping, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def _merge_path(torch_key: str) -> Tuple[Tuple[str, ...], str]:
    """Split a torch key into (module path components, leaf name), merging
    numeric components into their predecessor."""
    parts = torch_key.split(".")
    leaf = parts[-1]
    comps: list[str] = []
    for p in parts[:-1]:
        if re.fullmatch(r"\d+", p) and comps:
            comps[-1] = f"{comps[-1]}_{p}"
        else:
            comps.append(p)
    return tuple(comps), leaf


def _to_np(t) -> np.ndarray:
    return np.asarray(t.detach().cpu().numpy() if hasattr(t, "detach") else t)


def _get(tree: Mapping, path: Tuple[str, ...]):
    node: Any = tree
    for p in path:
        if not isinstance(node, Mapping) or p not in node:
            return None
        node = node[p]
    return node


def _set(tree: Dict, path: Tuple[str, ...], value):
    node = tree
    for p in path[:-1]:
        node = node.setdefault(p, {})
    node[path[-1]] = value


def convert_state_dict(
    state_dict: Mapping[str, Any],
    target_variables: Mapping[str, Any],
    strict: bool = True,
) -> Dict[str, Any]:
    """Convert a torch state_dict into a variables dict matching
    ``target_variables`` (as returned by ``model.init``). Every target leaf
    must be covered when ``strict``."""
    out: Dict[str, Any] = {"params": {}, "batch_stats": {}}

    target_params = target_variables.get("params", {})
    target_stats = target_variables.get("batch_stats", {})

    covered = set()
    for key, value in state_dict.items():
        path, leaf = _merge_path(key)
        arr = _to_np(value)

        if leaf == "num_batches_tracked":
            continue

        if leaf in ("running_mean", "running_var"):
            jleaf = "mean" if leaf == "running_mean" else "var"
            tgt = _get(target_stats, path + (jleaf,))
            if tgt is None:
                if strict:
                    raise KeyError(f"no batch_stats target for {key} -> {path}")
                continue
            _set(out["batch_stats"], path + (jleaf,), jnp.asarray(arr, tgt.dtype))
            covered.add(("batch_stats",) + path + (jleaf,))
            continue

        module = _get(target_params, path)
        if module is None:
            if strict:
                raise KeyError(f"no target module for {key} -> {path}")
            continue

        if leaf in ("beta", "gamma") and leaf in module:
            tgt = module[leaf]
            # torch (1,C,1,1) -> NHWC (1,1,1,C)
            conv = arr.transpose(0, 2, 3, 1) if arr.ndim == 4 else arr
            _assign(out, ("params",) + path + (leaf,), conv, tgt, key, covered)
        elif leaf == "weight":
            if "kernel" in module:
                tgt = module["kernel"]
                if arr.ndim == 4:
                    conv = arr.transpose(2, 3, 1, 0)  # conv OIHW -> HWIO
                elif arr.ndim == 2:
                    conv = arr.T  # linear (O,I) -> (I,O)
                else:
                    conv = arr
                _assign(out, ("params",) + path + ("kernel",), conv, tgt, key, covered)
            elif "kernel_t" in module:
                tgt = module["kernel_t"]
                conv = arr.transpose(2, 3, 0, 1)[::-1, ::-1]  # IOHW -> HWIO, flip
                _assign(out, ("params",) + path + ("kernel_t",), conv, tgt, key, covered)
            elif "scale" in module:
                _assign(out, ("params",) + path + ("scale",), arr, module["scale"], key, covered)
            else:
                raise KeyError(f"cannot place weight {key} in {list(module)}")
        elif leaf == "bias":
            _assign(out, ("params",) + path + ("bias",), arr, module["bias"], key, covered)
        else:
            if leaf in module:
                _assign(out, ("params",) + path + (leaf,), arr, module[leaf], key, covered)
            elif strict:
                raise KeyError(f"unhandled torch key {key}")

    if strict:
        flat_t = {
            ("params",) + tuple(k.key for k in kp): v
            for kp, v in jax.tree_util.tree_flatten_with_path(target_params)[0]
        }
        flat_t.update(
            {
                ("batch_stats",) + tuple(k.key for k in kp): v
                for kp, v in jax.tree_util.tree_flatten_with_path(target_stats)[0]
            }
        )
        missing = set(flat_t) - covered
        if missing:
            raise KeyError(f"uncovered target params: {sorted(missing)[:10]} ...")

    result = {"params": out["params"]}
    if out["batch_stats"]:
        result["batch_stats"] = out["batch_stats"]
    return result


def _assign(out, full_path, arr, tgt, torch_key, covered):
    if tuple(arr.shape) != tuple(tgt.shape):
        raise ValueError(
            f"shape mismatch for {torch_key}: torch->{arr.shape} vs target {tgt.shape}"
        )
    _set(out[full_path[0]], full_path[1:], jnp.asarray(arr, tgt.dtype))
    covered.add(full_path)


def load_pth(path: str) -> Dict[str, Any]:
    """Load a reference ``.pth`` checkpoint (torch CPU) and return the dict
    (keys: model_state_dict + metadata, run.py:37)."""
    import torch

    return torch.load(path, map_location="cpu", weights_only=False)
