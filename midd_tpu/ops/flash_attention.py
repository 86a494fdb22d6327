"""Pallas TPU flash attention for the diffusion UNet's spatial self-attention.

The reference bounds attention memory with a query-chunked softmax loop on the
host schedule (chunk 512 over the h*w=4096 sequence, DDIM/DDIMModel.py:152-162).
This kernel is the TPU-native successor: blockwise ONLINE softmax entirely in
VMEM — O(N) memory instead of the O(N^2) score matrix, with the q@k^T and p@v
contractions on the MXU.

Shapes: q, k, v are (B, N, H, D) with D=96 for the serving config (2 heads of
the 192-channel resolution). D is zero-padded to the 128-lane boundary outside
the kernel (zero features add nothing to scores; padded v columns are sliced
off afterwards). K/V for one (batch, head) fit comfortably in VMEM at N=4096
(4096 x 128 fp32 = 2 MB each), so the kernel streams q blocks over resident
K/V — the right regime for these sizes.

Differentiable: a ``jax.custom_vjp`` supplies the standard flash backward —
the forward additionally emits the per-row logsumexp, and two kernels
recompute the probabilities blockwise to produce dq (q-block grid, K/V
resident) and dk/dv (k-block grid, Q/dO resident). This lets the diffusion /
hybrid TRAINERS run the kernel, not just serving (training attention is the
same hot block, DDIM/DDIMModel.py:135-166).

Falls back to the exact XLA path (midd_tpu.ops.attention.mha_reference) for
shapes the kernel doesn't cover; runs in interpret mode on CPU so tests
exercise the same code path.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANE = 128


def _flash_fwd_kernel(
    q_ref, k_ref, v_ref, o_ref, lse_ref, *, block_k: int, scale: float, block_q: int
):  # noqa: D401
    # MXU operands stay in the INPUT dtype (bf16 from the bf16 serving model
    # runs the systolic array at full rate; fp32 decomposes into multiple
    # passes); softmax statistics and accumulation are always fp32.
    q = q_ref[0]  # (BQ, Dp), native dtype
    mmd = q.dtype
    n = k_ref.shape[1]
    block_q, dp = q.shape

    m = jnp.full((block_q, 1), -jnp.inf, jnp.float32)
    l = jnp.zeros((block_q, 1), jnp.float32)
    acc = jnp.zeros((block_q, dp), jnp.float32)

    def body(j, carry):
        m, l, acc = carry
        kb = k_ref[0, pl.ds(j * block_k, block_k), :]
        vb = v_ref[0, pl.ds(j * block_k, block_k), :]
        s = scale * jnp.dot(q, kb.T, preferred_element_type=jnp.float32)
        m_new = jnp.maximum(m, jnp.max(s, axis=-1, keepdims=True))
        p = jnp.exp(s - m_new)
        alpha = jnp.exp(m - m_new)
        l = l * alpha + jnp.sum(p, axis=-1, keepdims=True)
        acc = acc * alpha + jnp.dot(
            p.astype(mmd), vb, preferred_element_type=jnp.float32
        )
        return m_new, l, acc

    m, l, acc = jax.lax.fori_loop(0, n // block_k, body, (m, l, acc))
    o_ref[0] = (acc / l).astype(o_ref.dtype)
    # lse lives as (bh, 1, n) with a FULL-n block revisited across q-block
    # grid steps (TPU tiling: a (1, block_q) block over (bh, n) is illegal)
    i = pl.program_id(1)
    lse_ref[0, 0, pl.ds(i * block_q, block_q)] = (m + jnp.log(l))[:, 0]


def _flash_bwd_dq_kernel(
    q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref, dq_ref, *, block_k: int, scale: float
):
    """dq for one q block: stream K/V blocks, recompute p from the saved
    logsumexp (no rescaling pass needed), ds = p * (dO v^T - delta)."""
    q = q_ref[0]  # (BQ, Dp), native dtype (see fwd kernel note)
    do = do_ref[0]
    mmd = q.dtype
    n = k_ref.shape[1]
    block_q, dp = q.shape
    i = pl.program_id(1)
    lse = lse_ref[0, 0, pl.ds(i * block_q, block_q)][:, None]  # (BQ, 1)
    delta = delta_ref[0, 0, pl.ds(i * block_q, block_q)][:, None]

    def body(j, acc):
        kb = k_ref[0, pl.ds(j * block_k, block_k), :]
        vb = v_ref[0, pl.ds(j * block_k, block_k), :]
        s = scale * jnp.dot(q, kb.T, preferred_element_type=jnp.float32)
        p = jnp.exp(s - lse)  # exact softmax probs for this block
        dpij = jnp.dot(do, vb.T, preferred_element_type=jnp.float32)
        ds = (p * (dpij - delta)).astype(mmd)
        return acc + jnp.dot(ds, kb, preferred_element_type=jnp.float32)

    acc = jax.lax.fori_loop(0, n // block_k, body, jnp.zeros((block_q, dp), jnp.float32))
    dq_ref[0] = (scale * acc).astype(dq_ref.dtype)


def _flash_bwd_dkv_kernel(
    q_ref, do_ref, lse_ref, delta_ref, k_ref, v_ref, dk_ref, dv_ref,
    *, block_q: int, scale: float,
):
    """dk, dv for one k block: stream Q/dO blocks; dv = p^T dO,
    dk = scale * ds^T q."""
    kb = k_ref[0]  # (BK, Dp), native dtype (see fwd kernel note)
    vb = v_ref[0]
    mmd = kb.dtype
    n = q_ref.shape[1]
    block_k, dp = kb.shape

    def body(i, carry):
        dk, dv = carry
        qb = q_ref[0, pl.ds(i * block_q, block_q), :]
        dob = do_ref[0, pl.ds(i * block_q, block_q), :]
        lse = lse_ref[0, 0, pl.ds(i * block_q, block_q)][:, None]
        delta = delta_ref[0, 0, pl.ds(i * block_q, block_q)][:, None]
        s = scale * jnp.dot(qb, kb.T, preferred_element_type=jnp.float32)
        p = jnp.exp(s - lse)  # (BQ, BK)
        dv = dv + jnp.dot(p.T.astype(mmd), dob, preferred_element_type=jnp.float32)
        dpij = jnp.dot(dob, vb.T, preferred_element_type=jnp.float32)
        ds = (p * (dpij - delta)).astype(mmd)
        dk = dk + jnp.dot(ds.T, qb, preferred_element_type=jnp.float32)
        return dk, dv

    zero = jnp.zeros((block_k, dp), jnp.float32)
    dk, dv = jax.lax.fori_loop(0, n // block_q, body, (zero, zero))
    dk_ref[0] = (scale * dk).astype(dk_ref.dtype)
    dv_ref[0] = dv.astype(dv_ref.dtype)


def _pad_lane(x: jnp.ndarray) -> jnp.ndarray:
    d = x.shape[-1]
    pad = (-d) % LANE
    if pad:
        x = jnp.pad(x, ((0, 0), (0, 0), (0, pad)))
    return x


def _fwd_call(q, k, v, block_q: int, block_k: int, scale: float, interpret: bool):
    bh, n, dp = q.shape
    return pl.pallas_call(
        functools.partial(_flash_fwd_kernel, block_k=block_k, scale=scale, block_q=block_q),
        grid=(bh, n // block_q),
        in_specs=[
            pl.BlockSpec((1, block_q, dp), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n, dp), lambda b, i: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n, dp), lambda b, i: (b, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, block_q, dp), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, n), lambda b, i: (b, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((bh, n, dp), q.dtype),
            jax.ShapeDtypeStruct((bh, 1, n), jnp.float32),
        ],
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=4 * bh * n * n * dp,
            bytes_accessed=bh * n * dp * 4 * 4,
            transcendentals=bh * n * n,
        ),
    )(q, k, v)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6))
def _flash_padded(q, k, v, block_q: int, block_k: int, scale: float, interpret: bool):
    o, _ = _fwd_call(q, k, v, block_q, block_k, scale, interpret)
    return o


def _flash_padded_fwd(q, k, v, block_q, block_k, scale, interpret):
    o, lse = _fwd_call(q, k, v, block_q, block_k, scale, interpret)
    return o, (q, k, v, o, lse)


def _flash_padded_bwd(block_q, block_k, scale, interpret, res, do):
    q, k, v, o, lse = res
    bh, n, dp = q.shape
    # delta_i = sum_d dO_id * O_id (rowwise) — cheap elementwise, XLA fuses it
    delta = jnp.sum(do.astype(jnp.float32) * o.astype(jnp.float32), axis=-1)[
        :, None, :
    ]  # (bh, 1, n): matches the lse layout the kernels expect

    dq = pl.pallas_call(
        functools.partial(_flash_bwd_dq_kernel, block_k=block_k, scale=scale),
        grid=(bh, n // block_q),
        in_specs=[
            pl.BlockSpec((1, block_q, dp), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n, dp), lambda b, i: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n, dp), lambda b, i: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_q, dp), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, n), lambda b, i: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, n), lambda b, i: (b, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, block_q, dp), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((bh, n, dp), q.dtype),
        interpret=interpret,
    )(q, k, v, do, lse, delta)

    dk, dv = pl.pallas_call(
        functools.partial(_flash_bwd_dkv_kernel, block_q=block_q, scale=scale),
        grid=(bh, n // block_k),
        in_specs=[
            pl.BlockSpec((1, n, dp), lambda b, j: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n, dp), lambda b, j: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, n), lambda b, j: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, n), lambda b, j: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_k, dp), lambda b, j: (b, j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_k, dp), lambda b, j: (b, j, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, block_k, dp), lambda b, j: (b, j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_k, dp), lambda b, j: (b, j, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((bh, n, dp), k.dtype),
            jax.ShapeDtypeStruct((bh, n, dp), v.dtype),
        ],
        interpret=interpret,
    )(q, do, lse, delta, k, v)
    return dq, dk, dv


_flash_padded.defvjp(_flash_padded_fwd, _flash_padded_bwd)


@functools.partial(jax.jit, static_argnames=("block_q", "block_k", "interpret"))
def _flash_bhnd(q, k, v, block_q: int, block_k: int, interpret: bool):
    """q,k,v: (BH, N, D) -> (BH, N, D)."""
    bh, n, d = q.shape
    scale = 1.0 / math.sqrt(d)
    qp, kp, vp = _pad_lane(q), _pad_lane(k), _pad_lane(v)
    out = _flash_padded(qp, kp, vp, block_q, block_k, scale, interpret)
    return out[:, :, :d]


def supported(q: jnp.ndarray, block_q: int = 512, block_k: int = 512) -> bool:
    _, n, _, d = q.shape
    return n % block_q == 0 and n % block_k == 0 and n >= block_k


def mha_flash(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    block_q: int = 1024,
    block_k: int = 1024,
) -> jnp.ndarray:
    # block sizes re-tuned round 3 on TPU v5e: standalone at n=4096
    # (1024,1024) beats (512,512) ~9% at b1 AND b8 (2.41 vs 2.65 ms b8);
    # end-to-end forwards confirm neutral-to-better at n=1024 too (256^2
    # base 16.71 vs 16.76, 512^2-b1 15.96 vs 16.04). The round-2 note
    # preferring (512,512) did not reproduce on current code. Caveat kept
    # from the standalone study: at n=1024 b>=8 XLA attention wins
    # STANDALONE (1.26 vs 1.40 ms) yet loses IN-GRAPH (attn_xla stub is
    # +0.6 ms worse) — trust end-to-end attribution over microbenches.
    """(B, N, H, D) attention via the Pallas kernel, with XLA fallback."""
    if not supported(q, block_q, block_k):
        from midd_tpu.ops.attention import mha_reference

        return mha_reference(q, k, v)
    b, n, h, d = q.shape
    to_bhnd = lambda x: x.transpose(0, 2, 1, 3).reshape(b * h, n, d)
    interpret = jax.default_backend() == "cpu"
    out = _flash_bhnd(
        to_bhnd(q), to_bhnd(k), to_bhnd(v), block_q, block_k, interpret
    )
    return out.reshape(b, h, n, d).transpose(0, 2, 1, 3)
