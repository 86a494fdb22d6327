"""Per-pixel channel LayerNorm (NAFNet's LayerNorm2d) as a Pallas kernel.

STATUS: built, equivalence-tested, and NOT adopted — measured SLOWER than
the XLA formulation at every NAFNet stage. Kept as the decision record +
reusable infrastructure (repo convention, see ops/naf_fast.py).

The investigation (examples/naf_norm_bench.py + examples/ln_kernel_bench.py,
TPU v5e, b8 bf16):

- Whole-model attribution said LayerNorm2d ≈ 35% of the b8 512^2 NAFNet
  forward (~38 ms of 110), concentrated in the C=32 full-resolution stage.
- Per-stage WITH the consumer 1x1 conv (the real pattern), XLA's LN costs
  2.7 ms at 512^2xC32 and ≈0 everywhere else — XLA fuses the normalize +
  affine chain into the conv's operand read, so a standalone kernel ADDS a
  full HBM write+read it can never win back. Both kernel paths lost:
  matmul-fold 3.3 ms (the fold-pixels-into-lanes reshape physically repacks
  lane-padded HBM data), lane-native 3.3 ms.
- The residual C=32 cost is the HBM layout itself: XLA tiles the minor dim
  to 128 lanes, so C=32 activations move ~4x their logical bytes (measured:
  elementwise copy runs 135 GB/s logical at C=32 vs 303 GB/s at C=128).
  That tax binds every op in the stage equally and no same-layout kernel
  removes it; a space-to-depth stage layout would, but NAFNet is ~10% of
  the 512^2 hybrid serving request, so the complexity isn't paid for.

What WAS adopted from this investigation: one-pass E[x^2]-mean^2 variance
in the XLA path (models/blocks.py::LayerNorm2d, ~4 ms on the 512^2 forward).

Kernel design notes (if revisited for a width/shape where it pays):
- C < 128: lane-native path — collapse major dims only (layout-free even
  for lane-padded HBM arrays), per-row stats via Mosaic's in-vreg lane
  reduce. Do NOT fold pixels into lanes: that reshape is a physical repack.
- C >= 128: row path — stats as (R,C)@(C,1) MXU indicator matmuls.
- Backward: custom_vjp whose bwd is the vjp of the XLA reference forward.

Reference behavior reimplemented: NafNet/NafnetModel.py:159-172
(LayerNorm2d), forced-fp32 variant hybrid3diffusionspeed.py:101-115.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANE = 128
# Rows per grid step (bf16 rows of 128 lanes -> 512 KB blocks). Divisor
# fallbacks keep odd batch*H*W shapes on the kernel where possible.
_ROW_CANDIDATES = (2048, 1024, 512, 256, 128, 64, 32, 16, 8, 4, 2, 1)


def _ln2d_xla(x: jnp.ndarray, scale: jnp.ndarray, bias: jnp.ndarray,
              eps: float) -> jnp.ndarray:
    """Reference XLA path (also the custom_vjp backward's forward)."""
    xf = x.astype(jnp.float32)
    u = xf.mean(axis=-1, keepdims=True)
    s = jnp.maximum(
        jnp.mean(jnp.square(xf), axis=-1, keepdims=True) - jnp.square(u), 0.0
    )
    out = (xf - u) / jnp.sqrt(s + eps) * scale + bias
    return out.astype(x.dtype)


def _kernel_native(x_ref, sb_ref, o_ref, *, eps: float):
    """C-lane-native path: per-row stats via in-VMEM lane reduction.

    Used for C < 128: the fold-pixels-into-lanes reshape the matmul path
    wants is NOT layout-free there (XLA pads the lane dim in HBM, so
    regrouping C-minor data physically repacks the tensor — measured SLOWER
    than the XLA layernorm end-to-end). Collapsing only the major dims is
    layout-free, and Mosaic's masked cross-lane reduce stays in vregs."""
    x = x_ref[:].astype(jnp.float32)                      # (R, C)
    u = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.maximum(
        jnp.mean(x * x, axis=-1, keepdims=True) - u * u, 0.0
    )
    inv = jax.lax.rsqrt(var + eps)
    scale = sb_ref[0, :].astype(jnp.float32)
    bias = sb_ref[1, :].astype(jnp.float32)
    o_ref[:] = ((x - u) * inv * scale + bias).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("eps", "rows", "interpret"))
def _ln2d_native(x2: jnp.ndarray, sb: jnp.ndarray, eps: float, rows: int,
                 interpret: bool) -> jnp.ndarray:
    m, c = x2.shape
    return pl.pallas_call(
        functools.partial(_kernel_native, eps=eps),
        out_shape=jax.ShapeDtypeStruct((m, c), x2.dtype),
        grid=(m // rows,),
        in_specs=[
            pl.BlockSpec((rows, c), lambda i: (i, 0)),
            pl.BlockSpec((2, c), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((rows, c), lambda i: (i, 0)),
        interpret=interpret,
    )(x2, sb)


def _kernel(x_ref, sb_ref, seg_ref, o_ref, *, c: int, eps: float):
    x = x_ref[:].astype(jnp.float32)                      # (R, L)
    seg = seg_ref[:]                                      # (L, F) f32 0/1
    sums = jnp.dot(x, seg, preferred_element_type=jnp.float32)      # (R, F)
    m2 = jnp.dot(x * x, seg, preferred_element_type=jnp.float32)    # (R, F)
    mean = sums * (1.0 / c)
    var = jnp.maximum(m2 * (1.0 / c) - mean * mean, 0.0)
    inv = jax.lax.rsqrt(var + eps)
    mean_l = jnp.dot(mean, seg.T, preferred_element_type=jnp.float32)
    inv_l = jnp.dot(inv, seg.T, preferred_element_type=jnp.float32)
    scale = sb_ref[0, :].astype(jnp.float32)
    bias = sb_ref[1, :].astype(jnp.float32)
    o_ref[:] = ((x - mean_l) * inv_l * scale + bias).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("c", "eps", "rows", "interpret"))
def _ln2d_rows(x2: jnp.ndarray, sb: jnp.ndarray, seg: jnp.ndarray, c: int,
               eps: float, rows: int, interpret: bool) -> jnp.ndarray:
    m, l = x2.shape
    f = l // c
    return pl.pallas_call(
        functools.partial(_kernel, c=c, eps=eps),
        out_shape=jax.ShapeDtypeStruct((m, l), x2.dtype),
        grid=(m // rows,),
        in_specs=[
            pl.BlockSpec((rows, l), lambda i: (i, 0)),
            pl.BlockSpec((2, l), lambda i: (0, 0)),
            pl.BlockSpec((l, f), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((rows, l), lambda i: (i, 0)),
        interpret=interpret,
    )(x2, sb, seg)


def supported(x: jnp.ndarray) -> bool:
    """Kernel coverage: narrow channels take the lane-native path (any C),
    wide ones the row path when C fills whole lanes; the flattened row count
    always hits a grid divisor (candidates go down to 1). NAFNet widths
    (32..512) all qualify."""
    c = x.shape[-1]
    return c < LANE or c % LANE == 0


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def ln2d_fused(x, scale, bias, eps=1e-6):
    """LayerNorm over the channel (minor) axis of an (..., C) tensor via the
    Pallas kernel; call ``supported(x)`` first (no implicit fallback here so
    adoption sites stay explicit). interpret-mode on CPU backends."""
    return _ln2d_apply(x, scale, bias, eps)


def _ln2d_apply(x, scale, bias, eps):
    c = x.shape[-1]
    interpret = jax.default_backend() == "cpu"
    if c < LANE:
        # major-dim collapse only — layout-free for lane-padded HBM arrays
        p = x.size // c
        rows = next(r for r in _ROW_CANDIDATES if p % r == 0)
        sb = jnp.stack([scale.astype(jnp.float32), bias.astype(jnp.float32)])
        y = _ln2d_native(x.reshape(p, c), sb, eps, rows, interpret)
        return y.reshape(x.shape)
    m = x.size // c
    rows = next(r for r in _ROW_CANDIDATES if m % r == 0)
    seg = jnp.ones((c, 1), jnp.float32)
    sb = jnp.stack([scale.astype(jnp.float32), bias.astype(jnp.float32)])
    y = _ln2d_rows(x.reshape(m, c), sb, seg, c, eps, rows, interpret)
    return y.reshape(x.shape)


def _ln2d_fwd(x, scale, bias, eps):
    return _ln2d_apply(x, scale, bias, eps), (x, scale, bias)


def _ln2d_bwd(eps, res, dy):
    x, scale, bias = res
    _, vjp = jax.vjp(lambda a, s, b: _ln2d_xla(a, s, b, eps), x, scale, bias)
    return vjp(dy)


ln2d_fused.defvjp(_ln2d_fwd, _ln2d_bwd)
