"""Space-to-depth stage-0 layout for the diffusion UNet.

The round-4 conv probe (examples/s2d_conv_probe.py, s2d_conv_probe.json)
falsified the "dense restructurings conserve padding waste" rule for NARROW
3x3 convs: the 2x2 space-to-depth form of a 3x3 conv — kernel (3,3,4C,4C),
75% structural zeros — measured 1.09-1.12x FASTER than the plain conv at the
UNet's stage-0 shapes (256² C48 b8, 512² C48 b2) because XLA's narrow-channel
conv lowering wastes more than the padded-work model credits (C=48 fills 48
of 128 lanes; the s2d form's operands fill 192). On top of the conv win,
every stage-0 elementwise/norm op moves ~2x fewer padded bytes
(256²x[48->128 lanes] vs 128²x[192->256 lanes]).

This module runs the UNet's full-resolution region — in_conv, the stage-0
ResBlocks, the stage-0 downsampler, the final up-ResBlock, and the output
head — in a phase-major 2x2 s2d layout (lane = phase*C + c, the naf_s2d
convention), entering at the network input and exiting at the stage-0
downsampler / the final depth-to-space. Everything is numerically equivalent
to the plain layout (fp reassociation only) and the param tree is IDENTICAL
— checkpoints interchange; asserted by tests/test_unet_s2d.py.

Kernel algebra (zero-padding composes exactly in every case; derivations
checked against the plain conv in the tests):

- 3x3 conv, s2d in -> s2d out: output phase q=(qi,qj) at s2d pixel I reads
  natural row u = 2I+qi+di-1 = 2(I+DI)+pi, i.e. di = 2*DI + pi - qi + 1, so
  K[DI+1,DJ+1, p*Ci+c, q*Co+o] = w[2DI+pi-qi+1, 2DJ+pj-qj+1, c, o]
  (taps outside [0,3) are the structural zeros) — still a 3x3 conv, at 1/4
  the output pixels.
- 3x3 stride-2 conv, s2d in -> NATURAL out (the stage-0 downsampler, which
  exits the layout for free): di = 2*DI + pi + 1 with DI in {-1,0} — a 2x2
  stride-1 conv with padding ((1,0),(1,0)):
  K[DI+1,DJ+1, p*Ci+c, o] = w[2DI+pi+1, 2DJ+pj+1, c, o].
- 1x1 conv: phases never mix — kron(I4, W) (naf_s2d.BlockDiag1x1's form),
  here with support for concatenated phase-major segments.
- half-pixel bilinear 2x UP into s2d: the four output phases are the four
  fixed 2-tap stencils of ops/image.py::_up2_conv, minus the interleave —
  fp-identical to s2d(resize_bilinear(x, 2x)).
- GroupNorm: per-(s2d-lane) spatial moments -> average the 4 phases of each
  logical channel -> the usual group combine on tiny (B,C) arrays (equal
  element counts make this exactly the natural-layout statistics).

Reference topology being preserved: DDIM/DDIMModel.py:108-133 (ResBlock),
:168-248 (UNet + the ping-pong skip bookkeeping).
"""

from __future__ import annotations

from typing import Any, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from midd_tpu.ops.naf_s2d import PHASES, ds2, s2d  # noqa: F401  (re-exported)

Dtype = Any


def _phase_tile(v: jnp.ndarray) -> jnp.ndarray:
    """(..., C) -> (..., 4C) phase-major broadcast."""
    reps = (1,) * (v.ndim - 1) + (PHASES,)
    return jnp.tile(v, reps)


def s2d_kernel3(w: jnp.ndarray) -> jnp.ndarray:
    """(3,3,Ci,Co) natural 3x3 kernel -> (3,3,4Ci,4Co) phase-major s2d form."""
    wp = jnp.pad(w, ((2, 2), (2, 2), (0, 0), (0, 0)))
    rows = []
    for p in range(PHASES):
        pi, pj = p // 2, p % 2
        cols = []
        for q in range(PHASES):
            qi, qj = q // 2, q % 2
            ki = [2 * t + pi - qi + 1 for t in range(3)]
            kj = [2 * t + pj - qj + 1 for t in range(3)]
            cols.append(wp[jnp.asarray(ki)][:, jnp.asarray(kj)])
        rows.append(jnp.concatenate(cols, axis=3))
    return jnp.concatenate(rows, axis=2)


def s2d_kernel3_exit(w: jnp.ndarray) -> jnp.ndarray:
    """(3,3,Ci,Co) stride-2 natural kernel -> (2,2,4Ci,Co): the s2d-input,
    natural-output downsampler form (use padding ((1,0),(1,0)), stride 1)."""
    wp = jnp.pad(w, ((1, 1), (1, 1), (0, 0), (0, 0)))
    rows = []
    for p in range(PHASES):
        pi, pj = p // 2, p % 2
        ki = [2 * t + pi for t in range(2)]
        kj = [2 * t + pj for t in range(2)]
        rows.append(wp[jnp.asarray(ki)][:, jnp.asarray(kj)])
    return jnp.concatenate(rows, axis=2)


def _segment_kernel(
    w: jnp.ndarray, segments: Sequence[int], builder
) -> jnp.ndarray:
    """Split a natural kernel along its input axis into the concatenated
    phase-major segments' widths and build each block, concatenating along
    the (transformed) input axis — conv is linear in input channels, so this
    matches an input that is a concat of separately-s2d'd tensors."""
    blocks = []
    off = 0
    for seg in segments:
        blocks.append(builder(w[:, :, off : off + seg]))
        off += seg
    return jnp.concatenate(blocks, axis=2)


def up2_s2d(x: jnp.ndarray) -> jnp.ndarray:
    """Half-pixel bilinear 2x upsample straight into phase-major s2d layout:
    (B,H,W,C) -> (B,H,W,4C). fp-identical to s2d(_up2_conv(x)) — the same
    stencils, minus the interleave reshapes."""
    xp = jnp.concatenate([x[:, :1], x, x[:, -1:]], axis=1)
    xp = jnp.concatenate([xp[:, :, :1], xp, xp[:, :, -1:]], axis=2)
    hi = jnp.asarray(0.75, x.dtype)
    lo = jnp.asarray(0.25, x.dtype)
    r_ev = lo * xp[:, :-2] + hi * xp[:, 1:-1]
    r_od = hi * xp[:, 1:-1] + lo * xp[:, 2:]

    def cols(r):
        c_ev = lo * r[:, :, :-2] + hi * r[:, :, 1:-1]
        c_od = hi * r[:, :, 1:-1] + lo * r[:, :, 2:]
        return c_ev, c_od

    ee, eo = cols(r_ev)
    oe, oo = cols(r_od)
    return jnp.concatenate([ee, eo, oe, oo], axis=-1)


class TconvS2d(nn.Module):
    """A logical 3x3 conv applied in s2d layout. Params identical to
    ``tconv(features, 3)`` (nn.Conv names kernel/bias, natural shapes).
    ``segments``: natural widths of the concatenated phase-major input
    blocks (None = one block of lanes//4)."""

    features: int
    segments: Optional[Tuple[int, ...]] = None
    use_bias: bool = True
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, xs: jnp.ndarray) -> jnp.ndarray:
        segs = self.segments or (xs.shape[-1] // PHASES,)
        in_c = sum(segs)
        k = self.param(
            "kernel", nn.initializers.lecun_normal(), (3, 3, in_c, self.features)
        )
        dt = self.dtype or xs.dtype
        kd = _segment_kernel(k, segs, s2d_kernel3)
        y = jax.lax.conv_general_dilated(
            xs.astype(dt),
            kd.astype(dt),
            window_strides=(1, 1),
            padding=((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        if self.use_bias:
            b = self.param("bias", nn.initializers.zeros, (self.features,))
            y = y + _phase_tile(b).astype(dt)
        return y


class Conv1x1S2d(nn.Module):
    """A logical 1x1 conv in s2d layout: kron(I4, W) per segment. Params
    identical to ``tconv(features, 1)``."""

    features: int
    segments: Optional[Tuple[int, ...]] = None
    use_bias: bool = True
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, xs: jnp.ndarray) -> jnp.ndarray:
        segs = self.segments or (xs.shape[-1] // PHASES,)
        in_c = sum(segs)
        k = self.param(
            "kernel", nn.initializers.lecun_normal(), (1, 1, in_c, self.features)
        )
        dt = self.dtype or xs.dtype
        eye = jnp.eye(PHASES, dtype=k.dtype)
        blocks = []
        off = 0
        for seg in segs:
            blocks.append(jnp.kron(eye, k[0, 0, off : off + seg]))
            off += seg
        kd = jnp.concatenate(blocks, axis=0)
        y = jax.lax.dot_general(
            xs.astype(dt), kd.astype(dt), (((xs.ndim - 1,), (0,)), ((), ()))
        )
        if self.use_bias:
            b = self.param("bias", nn.initializers.zeros, (self.features,))
            y = y + _phase_tile(b).astype(dt)
        return y


class DownS2dExit(nn.Module):
    """The stage-0 stride-2 3x3 downsampler with s2d input and NATURAL
    half-resolution output — exiting the layout for free. Params identical
    to ``tconv(features, 3, stride=2)``."""

    features: int
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, xs: jnp.ndarray) -> jnp.ndarray:
        in_c = xs.shape[-1] // PHASES
        k = self.param(
            "kernel", nn.initializers.lecun_normal(), (3, 3, in_c, self.features)
        )
        b = self.param("bias", nn.initializers.zeros, (self.features,))
        dt = self.dtype or xs.dtype
        kd = s2d_kernel3_exit(k)
        y = jax.lax.conv_general_dilated(
            xs.astype(dt),
            kd.astype(dt),
            window_strides=(1, 1),
            padding=((1, 0), (1, 0)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        return y + b.astype(dt)


class GroupNorm32S2d(nn.Module):
    """GroupNorm32 (fp32 stats, one-pass E[x²]−mean², eps 1e-5) on a
    phase-major s2d tensor, optionally a concat of segments. Per-lane spatial
    moments -> phase average per logical channel -> the usual group combine
    on (B, C): exactly the natural-layout statistics (equal element counts).
    Params identical to GroupNorm32 (scale/bias over logical C)."""

    num_groups: int = 8
    epsilon: float = 1e-5
    segments: Optional[Tuple[int, ...]] = None

    @nn.compact
    def __call__(self, xs: jnp.ndarray) -> jnp.ndarray:
        segs = self.segments or (xs.shape[-1] // PHASES,)
        c = sum(segs)
        scale = self.param("scale", nn.initializers.ones, (c,))
        bias = self.param("bias", nn.initializers.zeros, (c,))
        g = self.num_groups
        cg = c // g
        b = xs.shape[0]
        xf = xs.astype(jnp.float32)
        lane_mean = jnp.mean(xf, axis=(1, 2))  # (B, 4*C_total lanes)
        lane_m2 = jnp.mean(jnp.square(xf), axis=(1, 2))

        def to_channels(lane_stat: jnp.ndarray) -> jnp.ndarray:
            # concat of phase-major segments -> natural channel order (B, C)
            parts = []
            off = 0
            for seg in segs:
                blk = lane_stat[:, off : off + PHASES * seg]
                parts.append(blk.reshape(b, PHASES, seg).mean(axis=1))
                off += PHASES * seg
            return jnp.concatenate(parts, axis=-1)

        def to_lanes(chan: jnp.ndarray) -> jnp.ndarray:
            # natural (B, C) -> the input's segmented phase-major lane order
            parts = []
            off = 0
            for seg in segs:
                parts.append(jnp.tile(chan[:, off : off + seg], (1, PHASES)))
                off += seg
            return jnp.concatenate(parts, axis=-1)[:, None, None, :]

        def group_combine(m_c: jnp.ndarray) -> jnp.ndarray:
            m_g = m_c.reshape(b, g, cg).mean(axis=-1)
            return jnp.repeat(m_g, cg, axis=-1)

        mean = to_lanes(group_combine(to_channels(lane_mean)))
        m2 = to_lanes(group_combine(to_channels(lane_m2)))
        var = jnp.maximum(m2 - jnp.square(mean), 0.0)
        sc = to_lanes(jnp.broadcast_to(scale[None], (b, c)))
        bi = to_lanes(jnp.broadcast_to(bias[None], (b, c)))
        out = (xf - mean) / jnp.sqrt(var + self.epsilon) * sc + bi
        return out.astype(xs.dtype)


class ResidualBlockS2d(nn.Module):
    """Diffusion-UNet ResidualBlock in phase-major s2d layout (optionally a
    segmented concat input). Same param tree as blocks.ResidualBlock —
    checkpoints interchange."""

    out_c: int
    segments: Optional[Tuple[int, ...]] = None
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, xs: jnp.ndarray, t_emb: jnp.ndarray) -> jnp.ndarray:
        segs = self.segments or (xs.shape[-1] // PHASES,)
        in_c = sum(segs)
        dt = self.dtype
        h = GroupNorm32S2d(segments=tuple(segs), name="block1_0")(xs)
        h = nn.silu(h)
        h = TconvS2d(self.out_c, segments=tuple(segs), name="block1_2", dtype=dt)(h)

        te = nn.Dense(self.out_c, name="time_mlp_1", dtype=dt)(nn.silu(t_emb))
        h = h + _phase_tile(te)[:, None, None, :].astype(h.dtype)

        h = GroupNorm32S2d(name="block2_0")(h)
        h = nn.silu(h)
        h = TconvS2d(self.out_c, name="block2_3", dtype=dt)(h)

        if in_c == self.out_c:
            if len(segs) == 1:
                res = xs
            else:
                # identity skip over a segmented concat: merge the segments'
                # phase-major lanes into one phase-major block (param-free —
                # the plain block has no res_conv when in_c == out_c)
                b, h2, w2, _ = xs.shape
                parts = []
                off = 0
                for seg in segs:
                    parts.append(
                        xs[..., off : off + PHASES * seg].reshape(
                            b, h2, w2, PHASES, seg
                        )
                    )
                    off += PHASES * seg
                res = jnp.concatenate(parts, axis=-1).reshape(
                    b, h2, w2, PHASES * in_c
                )
        else:
            res = Conv1x1S2d(
                self.out_c, segments=tuple(segs), name="res_conv", dtype=dt
            )(xs)
        return h + res
