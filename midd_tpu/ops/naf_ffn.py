"""Fused NAFBlock FFN half as a Pallas TPU kernel.

The second half of every NAFBlock is LayerNorm -> 1x1 expand(x2) ->
SimpleGate -> 1x1 -> + gamma * residual (NafNet/NafnetModel.py:223-229).
Pointwise over pixels, so it flattens to row-wise math on an (N, C) matrix:
LN stats per row, two MXU matmuls with the gate between, scaled residual —
five HBM-materialised tensors under XLA collapse into one VMEM-resident
kernel (reads x once, writes out once).

Channel dims are padded to the 128-lane boundary; LN statistics and the gate
are masked to the true C so padding is inert. Weights live in VMEM replicated
across the row-tile grid. Equivalence vs the unfused path is tested in
interpret mode on CPU; the same kernel compiles via Mosaic on TPU.

Wire-up: ``midd_tpu.ops.naf_fast.nafnet_apply_fused(params, cfg, x)`` — a
functional NAFNet forward that routes every FFN half through this kernel
(adoption is benchmark-gated; see naf_fast.py for the measured numbers).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANE = 128


def _kernel(x_ref, scale_ref, bias_ref, w4_ref, b4_ref, w5_ref, b5_ref, gamma_ref, o_ref, *, c: int):
    x = x_ref[:].astype(jnp.float32)  # (R, Cp)
    cp = x.shape[-1]

    if cp != c:
        col = jax.lax.broadcasted_iota(jnp.int32, x.shape, dimension=1)
        cmask = (col < c).astype(jnp.float32)
    else:
        cmask = None

    # row LayerNorm over the true C channels (biased var, eps 1e-6)
    xs = x if cmask is None else x * cmask
    mean = jnp.sum(xs, axis=-1, keepdims=True) / c
    d = x - mean
    if cmask is not None:
        d = d * cmask
    var = jnp.sum(d * d, axis=-1, keepdims=True) / c
    xn = d / jnp.sqrt(var + 1e-6)
    xn = xn * scale_ref[:].astype(jnp.float32) + bias_ref[:].astype(jnp.float32)
    if cmask is not None:
        xn = xn * cmask  # keep padded channels at 0 into the matmul

    h = jnp.dot(xn, w4_ref[:].astype(jnp.float32), preferred_element_type=jnp.float32)
    h = h + b4_ref[:].astype(jnp.float32)
    # SimpleGate over the true 2c block: first c entries * second c entries.
    # w4/b4 are laid out so the two halves sit at [0:c] and [cp:cp+c].
    g = h[:, : h.shape[-1] // 2] * h[:, h.shape[-1] // 2 :]

    y = jnp.dot(g, w5_ref[:].astype(jnp.float32), preferred_element_type=jnp.float32)
    y = y + b5_ref[:].astype(jnp.float32)

    out = x + y * gamma_ref[:].astype(jnp.float32)
    o_ref[:] = out.astype(o_ref.dtype)


def _pad_cols(a: jnp.ndarray, to: int) -> jnp.ndarray:
    pad = to - a.shape[-1]
    return a if pad == 0 else jnp.pad(a, [(0, 0)] * (a.ndim - 1) + [(0, pad)])


def _pad_rows(a: jnp.ndarray, to: int) -> jnp.ndarray:
    pad = to - a.shape[0]
    return a if pad == 0 else jnp.pad(a, [(0, pad)] + [(0, 0)] * (a.ndim - 1))


@functools.partial(jax.jit, static_argnames=("c", "block_rows", "interpret"))
def _ffn_rows(x, scale, bias, w4, b4, w5, b5, gamma, c, block_rows, interpret):
    n, cp = x.shape
    cp2 = 2 * cp

    grid = (pl.cdiv(n, block_rows),)
    row_spec = pl.BlockSpec((block_rows, cp), lambda i: (i, 0), memory_space=pltpu.VMEM)
    rep = lambda shape: pl.BlockSpec(shape, lambda i: (0, 0), memory_space=pltpu.VMEM)

    return pl.pallas_call(
        functools.partial(_kernel, c=c),
        grid=grid,
        in_specs=[
            row_spec,
            rep((1, cp)),  # scale
            rep((1, cp)),  # bias
            rep((cp, cp2)),  # w4
            rep((1, cp2)),  # b4
            rep((cp, cp)),  # w5
            rep((1, cp)),  # b5
            rep((1, cp)),  # gamma
        ],
        out_specs=row_spec,
        out_shape=jax.ShapeDtypeStruct((n, cp), x.dtype),
        interpret=interpret,
    )(x, scale, bias, w4, b4, w5, b5, gamma)


def naf_ffn_fused(
    y: jnp.ndarray,  # (B, H, W, C) input (the residual source)
    scale: jnp.ndarray,  # LN scale (C,)
    bias: jnp.ndarray,  # LN bias (C,)
    w4: jnp.ndarray,  # conv4 kernel (C, 2C)  [1x1 conv == matmul]
    b4: jnp.ndarray,  # (2C,)
    w5: jnp.ndarray,  # conv5 kernel (C, C)
    b5: jnp.ndarray,  # (C,)
    gamma: jnp.ndarray,  # (C,)
    block_rows: int = 256,
) -> jnp.ndarray:
    b, h, w, c = y.shape
    cp = max(LANE, ((c + LANE - 1) // LANE) * LANE)
    n = b * h * w
    n_pad = ((n + block_rows - 1) // block_rows) * block_rows

    x2 = _pad_rows(_pad_cols(y.reshape(n, c), cp), n_pad)
    # lay the two gate halves at [0:c] and [cp:cp+c] of the padded 2*cp axis
    w4p = jnp.zeros((cp, 2 * cp), w4.dtype)
    w4p = w4p.at[:c, :c].set(w4[:, :c]).at[:c, cp : cp + c].set(w4[:, c:])
    b4p = jnp.zeros((1, 2 * cp), b4.dtype)
    b4p = b4p.at[0, :c].set(b4[:c]).at[0, cp : cp + c].set(b4[c:])
    w5p = jnp.zeros((cp, cp), w5.dtype).at[:c, :c].set(w5)

    out = _ffn_rows(
        x2,
        _pad_cols(scale[None], cp),
        _pad_cols(bias[None], cp),
        w4p,
        b4p,
        w5p,
        _pad_cols(b5[None], cp),
        _pad_cols(gamma[None], cp),
        c=c,
        block_rows=block_rows,
        interpret=jax.default_backend() == "cpu",
    )
    return out[:n, :c].reshape(b, h, w, c)
