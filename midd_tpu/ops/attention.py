"""Spatial self-attention core.

The reference computes exact softmax attention over the flattened h*w sequence
in two equivalent variants — query-chunked (DDIM/DDIMModel.py:152-162) and
full-matrix (hybrid3diffusionspeed.py:292-305). Chunking over queries does not
change the math, so ONE exact implementation serves both; the TPU-native
successor of the chunked loop is the Pallas flash-attention kernel in
``midd_tpu.ops.flash_attention`` (blockwise, online softmax), selected via
``use_flash=True`` once shapes qualify.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def mha_reference(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """Exact multi-head attention. q,k,v: (B, N, H, D). Returns (B, N, H, D).

    Scale = D**-0.5 applied to q (as DDIM/DDIMModel.py:149-150). Softmax is
    computed in fp32 regardless of input dtype (TPU-safe; identical for fp32
    inputs).
    """
    d = q.shape[-1]
    scale = jnp.asarray(d, jnp.float32) ** -0.5
    logits = jnp.einsum("bqhd,bkhd->bhqk", q.astype(jnp.float32) * scale, k.astype(jnp.float32))
    probs = jax.nn.softmax(logits, axis=-1)
    out = jnp.einsum("bhqk,bkhd->bqhd", probs, v.astype(jnp.float32))
    return out.astype(q.dtype)


def mha(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray, use_flash: bool = False) -> jnp.ndarray:
    """Dispatch between the XLA reference path and the Pallas flash kernel."""
    if use_flash:
        from midd_tpu.ops import flash_attention

        return flash_attention.mha_flash(q, k, v)
    return mha_reference(q, k, v)
