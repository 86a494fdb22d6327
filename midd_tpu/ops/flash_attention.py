"""Pallas TPU flash attention for the diffusion UNet's spatial self-attention.

The reference bounds attention memory with a query-chunked softmax loop on the
host schedule (chunk 512 over the h*w=4096 sequence, DDIM/DDIMModel.py:152-162).
This kernel is the TPU-native successor: blockwise ONLINE softmax entirely in
VMEM — O(N) memory instead of the O(N^2) score matrix, with the q@k^T and p@v
contractions on the MXU.

Shapes: q, k, v are (B, N, H, D) with D=96 for the serving config (2 heads of
the 192-channel resolution). D is zero-padded to the 128-lane boundary outside
the kernel (zero features add nothing to scores; padded v columns are sliced
off afterwards).

Memory shape (round-4 rewrite): K/V stream through VMEM as GRID-indexed
blocks — grid (bh, n_q_blocks, n_k_blocks) with the online-softmax state
(m, l, acc) carried in VMEM scratch across the innermost k dimension. The
earlier resident-K/V form (full (1, N, Dp) VMEM windows, q-grid only) was
fine at the 512²-image shape (n=4096: 2 MB/window) but EXCEEDS Mosaic's
16 MB scoped-VMEM limit at the 1024² shape (n=16384: double-buffered K+V
windows alone are 16 MB) — the driver saw "Ran out of memory in memory
space vmem" from the remote compiler. The streaming form is O(block)
resident at any N, which is what SURVEY §5's long-context row actually
requires.

Differentiable: a ``jax.custom_vjp`` supplies the standard flash backward —
the forward additionally emits the per-row logsumexp, and two kernels
recompute the probabilities blockwise to produce dq (q-block outer grid,
K/V streamed) and dk/dv (k-block outer grid, Q/dO streamed), both with
VMEM-scratch accumulators like the forward. This lets the diffusion /
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
    q_ref, k_ref, v_ref, o_ref, lse_ref, m_scr, l_scr, acc_scr, *, scale: float
):  # noqa: D401
    # MXU operands stay in the INPUT dtype (bf16 from the bf16 serving model
    # runs the systolic array at full rate; fp32 decomposes into multiple
    # passes); softmax statistics and accumulation are always fp32.
    # Grid: (bh, q_block, k_block); the online-softmax state lives in VMEM
    # scratch, carried across the innermost k dimension.
    i = pl.program_id(1)
    j = pl.program_id(2)
    nk = pl.num_programs(2)
    q = q_ref[0]  # (BQ, Dp), native dtype
    mmd = q.dtype
    block_q, dp = q.shape

    @pl.when(j == 0)
    def _init():
        m_scr[...] = jnp.full(m_scr.shape, -jnp.inf, m_scr.dtype)
        l_scr[...] = jnp.zeros(l_scr.shape, l_scr.dtype)
        acc_scr[...] = jnp.zeros(acc_scr.shape, acc_scr.dtype)

    kb = k_ref[0]  # (BK, Dp)
    vb = v_ref[0]
    s = scale * jnp.dot(q, kb.T, preferred_element_type=jnp.float32)
    lanes = m_scr.shape[-1]
    m_prev = m_scr[:, :1]
    m_new = jnp.maximum(m_prev, jnp.max(s, axis=-1, keepdims=True))
    p = jnp.exp(s - m_new)
    alpha = jnp.exp(m_prev - m_new)
    l_new = l_scr[:, :1] * alpha + jnp.sum(p, axis=-1, keepdims=True)
    acc_scr[...] = acc_scr[...] * alpha + jnp.dot(
        p.astype(mmd), vb, preferred_element_type=jnp.float32
    )
    m_scr[...] = jnp.broadcast_to(m_new, (block_q, lanes))
    l_scr[...] = jnp.broadcast_to(l_new, (block_q, lanes))

    @pl.when(j == nk - 1)
    def _finish():
        o_ref[0] = (acc_scr[...] / l_scr[:, :1]).astype(o_ref.dtype)
        # lse lives as (bh, 1, n) with a FULL-n block revisited across
        # q-block grid steps (TPU tiling: a (1, block_q) block over (bh, n)
        # is illegal)
        lse_ref[0, 0, pl.ds(i * block_q, block_q)] = (
            m_scr[:, 0] + jnp.log(l_scr[:, 0])
        )


def _flash_bwd_dq_kernel(
    q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref, dq_ref, acc_scr,
    *, scale: float,
):
    """dq for one q block: K/V blocks stream via grid dim 2 (VMEM scratch
    accumulator), p recomputed from the saved logsumexp (no rescaling pass
    needed), ds = p * (dO v^T - delta)."""
    j = pl.program_id(2)
    nk = pl.num_programs(2)
    q = q_ref[0]  # (BQ, Dp), native dtype (see fwd kernel note)
    do = do_ref[0]
    mmd = q.dtype
    block_q, dp = q.shape
    i = pl.program_id(1)
    lse = lse_ref[0, 0, pl.ds(i * block_q, block_q)][:, None]  # (BQ, 1)
    delta = delta_ref[0, 0, pl.ds(i * block_q, block_q)][:, None]

    @pl.when(j == 0)
    def _init():
        acc_scr[...] = jnp.zeros(acc_scr.shape, acc_scr.dtype)

    kb = k_ref[0]
    vb = v_ref[0]
    s = scale * jnp.dot(q, kb.T, preferred_element_type=jnp.float32)
    p = jnp.exp(s - lse)  # exact softmax probs for this block
    dpij = jnp.dot(do, vb.T, preferred_element_type=jnp.float32)
    ds = (p * (dpij - delta)).astype(mmd)
    acc_scr[...] += jnp.dot(ds, kb, preferred_element_type=jnp.float32)

    @pl.when(j == nk - 1)
    def _finish():
        dq_ref[0] = (scale * acc_scr[...]).astype(dq_ref.dtype)


def _flash_bwd_dkv_kernel(
    q_ref, do_ref, lse_ref, delta_ref, k_ref, v_ref, dk_ref, dv_ref,
    dk_scr, dv_scr, *, scale: float,
):
    """dk, dv for one k block: Q/dO blocks stream via grid dim 2;
    dv = p^T dO, dk = scale * ds^T q."""
    i = pl.program_id(2)
    nq = pl.num_programs(2)
    kb = k_ref[0]  # (BK, Dp), native dtype (see fwd kernel note)
    vb = v_ref[0]
    mmd = kb.dtype
    qb = q_ref[0]
    dob = do_ref[0]
    block_q = qb.shape[0]

    @pl.when(i == 0)
    def _init():
        dk_scr[...] = jnp.zeros(dk_scr.shape, dk_scr.dtype)
        dv_scr[...] = jnp.zeros(dv_scr.shape, dv_scr.dtype)

    lse = lse_ref[0, 0, pl.ds(i * block_q, block_q)][:, None]
    delta = delta_ref[0, 0, pl.ds(i * block_q, block_q)][:, None]
    s = scale * jnp.dot(qb, kb.T, preferred_element_type=jnp.float32)
    p = jnp.exp(s - lse)  # (BQ, BK)
    dv_scr[...] += jnp.dot(p.T.astype(mmd), dob, preferred_element_type=jnp.float32)
    dpij = jnp.dot(dob, vb.T, preferred_element_type=jnp.float32)
    ds = (p * (dpij - delta)).astype(mmd)
    dk_scr[...] += jnp.dot(ds.T, qb, preferred_element_type=jnp.float32)

    @pl.when(i == nq - 1)
    def _finish():
        dk_ref[0] = (scale * dk_scr[...]).astype(dk_ref.dtype)
        dv_ref[0] = dv_scr[...].astype(dv_ref.dtype)


def _pad_lane(x: jnp.ndarray) -> jnp.ndarray:
    d = x.shape[-1]
    pad = (-d) % LANE
    if pad:
        x = jnp.pad(x, ((0, 0), (0, 0), (0, pad)))
    return x


def _fwd_call(q, k, v, block_q: int, block_k: int, scale: float, interpret: bool):
    bh, n, dp = q.shape
    return pl.pallas_call(
        functools.partial(_flash_fwd_kernel, scale=scale),
        grid=(bh, n // block_q, n // block_k),
        in_specs=[
            pl.BlockSpec((1, block_q, dp), lambda b, i, j: (b, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_k, dp), lambda b, i, j: (b, j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_k, dp), lambda b, i, j: (b, j, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, block_q, dp), lambda b, i, j: (b, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, n), lambda b, i, j: (b, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((bh, n, dp), q.dtype),
            jax.ShapeDtypeStruct((bh, 1, n), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((block_q, 128), jnp.float32),  # running max
            pltpu.VMEM((block_q, 128), jnp.float32),  # running sum
            pltpu.VMEM((block_q, dp), jnp.float32),   # output accumulator
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
        functools.partial(_flash_bwd_dq_kernel, scale=scale),
        grid=(bh, n // block_q, n // block_k),
        in_specs=[
            pl.BlockSpec((1, block_q, dp), lambda b, i, j: (b, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_k, dp), lambda b, i, j: (b, j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_k, dp), lambda b, i, j: (b, j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_q, dp), lambda b, i, j: (b, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, n), lambda b, i, j: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, n), lambda b, i, j: (b, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, block_q, dp), lambda b, i, j: (b, i, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((bh, n, dp), q.dtype),
        scratch_shapes=[pltpu.VMEM((block_q, dp), jnp.float32)],
        interpret=interpret,
    )(q, k, v, do, lse, delta)

    dk, dv = pl.pallas_call(
        functools.partial(_flash_bwd_dkv_kernel, scale=scale),
        grid=(bh, n // block_k, n // block_q),
        in_specs=[
            pl.BlockSpec((1, block_q, dp), lambda b, jk, i: (b, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_q, dp), lambda b, jk, i: (b, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, n), lambda b, jk, i: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, n), lambda b, jk, i: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_k, dp), lambda b, jk, i: (b, jk, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_k, dp), lambda b, jk, i: (b, jk, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, block_k, dp), lambda b, jk, i: (b, jk, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_k, dp), lambda b, jk, i: (b, jk, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((bh, n, dp), k.dtype),
            jax.ShapeDtypeStruct((bh, n, dp), v.dtype),
        ],
        scratch_shapes=[
            pltpu.VMEM((block_k, dp), jnp.float32),
            pltpu.VMEM((block_k, dp), jnp.float32),
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
    # Round-4 long-context sweep on the STREAMING kernels at n=16384
    # (longcontext_1024.json): (1024,1024) again optimal (3.42 ms bh2 bf16;
    # (512,512) 5.81, 2048-block cells exceed the 16 MB scoped-VMEM limit)
    # — one default covers both operating points.
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
