"""Analytic FLOP counting by jaxpr traversal — the auditable basis for the
benchmark's MFU (model-FLOP-utilisation) figure (ROADMAP perf model: the
"~7.8 img/s is near the exact-semantics envelope" claim needed a number).

Counts 2*M*N*K for every ``dot_general`` and 2*numel(out)*Cin_per_group*
prod(kernel_spatial) for every ``conv_general_dilated``, recursing through
scan (multiplied by trip count), while/cond/pjit/remat/custom-vjp wrappers.
Elementwise/norm/resize FLOPs are deliberately EXCLUDED: MFU is defined on
the dense-algebra FLOPs the MXU executes (the convention of the public
scaling literature), so the figure is conservative.

Pallas kernels (``pallas_call``) are opaque to the jaxpr walk — count on a
model built with ``use_flash=False``; the XLA attention path computes the
same logical matmuls the flash kernel fuses.
"""

from __future__ import annotations

import math
from typing import Any

import jax
import numpy as np


def _prod(xs) -> int:
    out = 1
    for x in xs:
        out *= int(x)
    return out


def _pad(x: int, m: Optional[int]) -> int:
    return x if not m else -(-x // m) * m


def _conv_flops(eqn, lane_pad=None) -> int:
    out = eqn.outvars[0].aval
    rhs = eqn.invars[1].aval
    dn = eqn.params["dimension_numbers"]
    kshape = rhs.shape
    # rhs_spec = (out_c_dim, in_c_dim, *spatial): kernel's in_c axis already
    # holds Cin/feature_group_count, so no further division is needed
    cin_per_group = kshape[dn.rhs_spec[1]]
    cout = kshape[dn.rhs_spec[0]]
    k_spatial = _prod(kshape[d] for d in dn.rhs_spec[2:])
    if lane_pad is None:
        return 2 * _prod(out.shape) * cin_per_group * k_spatial
    # MXU-work estimate via the implicit-GEMM model (documented
    # approximation): M = batch*out_spatial (sublane-padded), K =
    # Cin_per_group*prod(kernel) (lane-padded as one contraction dim),
    # N = Cout (lane-padded). This is what the "lane padding binds the
    # narrow-channel UNet" perf model (ROADMAP) puts a number on.
    sub, lane = lane_pad
    m = _prod(out.shape) // cout
    return 2 * _pad(m, sub) * _pad(cin_per_group * k_spatial, lane) * _pad(cout, lane)


def _dot_flops(eqn, lane_pad=None) -> int:
    (lhs_c, _rhs_c), (lhs_b, _rhs_b) = eqn.params["dimension_numbers"]
    lhs = eqn.invars[0].aval
    k = _prod(lhs.shape[d] for d in lhs_c)
    out = eqn.outvars[0].aval
    if lane_pad is None:
        return 2 * _prod(out.shape) * k
    sub, lane = lane_pad
    b = _prod(lhs.shape[d] for d in lhs_b)
    n = out.shape[-1] if out.ndim > len(lhs_b) else 1
    m = _prod(out.shape) // max(1, b * n)
    return 2 * b * _pad(m, sub) * _pad(k, lane) * _pad(n, lane)


def _jaxpr_flops(jaxpr, lane_pad=None) -> int:
    total = 0
    for eqn in jaxpr.eqns:
        name = eqn.primitive.name
        if name == "conv_general_dilated":
            total += _conv_flops(eqn, lane_pad)
        elif name == "dot_general":
            total += _dot_flops(eqn, lane_pad)
        elif name == "scan":
            inner = _jaxpr_flops(eqn.params["jaxpr"].jaxpr, lane_pad)
            total += inner * int(eqn.params["length"])
        elif name == "while":
            # trip count is dynamic; assume 1 (callers should prefer scan)
            total += _jaxpr_flops(eqn.params["body_jaxpr"].jaxpr, lane_pad)
        elif name == "cond":
            branches = eqn.params["branches"]
            total += max(_jaxpr_flops(b.jaxpr, lane_pad) for b in branches)
        elif "jaxpr" in eqn.params:
            inner = eqn.params["jaxpr"]
            total += _jaxpr_flops(getattr(inner, "jaxpr", inner), lane_pad)
        elif "call_jaxpr" in eqn.params:
            inner = eqn.params["call_jaxpr"]
            total += _jaxpr_flops(getattr(inner, "jaxpr", inner), lane_pad)
    return total


def count_flops(fn, *args, lane_pad=None, **kwargs) -> int:
    """Dense-algebra (matmul + conv) FLOPs of one evaluation of ``fn``.

    ``lane_pad=(sublane, lane)`` (e.g. ``(8, 128)`` for the TPU MXU)
    switches to the PADDED-work estimate: each GEMM dimension rounded up to
    its tile boundary — an auditable model of the hardware cycles the MXU
    actually spends on narrow-channel convs. Model FLOPs / padded FLOPs is
    the padding-waste factor the ROADMAP perf model talks about."""
    jaxpr = jax.make_jaxpr(fn)(*args, **kwargs)
    return _jaxpr_flops(jaxpr.jaxpr, lane_pad)


# Peak dense bf16 throughput per chip, published numbers.
PEAK_TFLOPS = {
    "v5e": 197.0,   # TPU v5e: 197 TFLOP/s bf16 (394 int8)
    "v5p": 459.0,
    "v4": 275.0,
}


def device_peak_tflops(device=None) -> float:
    """Best-effort peak bf16 TFLOP/s for the current device (the bench
    prints the assumption alongside the MFU figure so it is auditable)."""
    d = device or jax.devices()[0]
    kind = getattr(d, "device_kind", "").lower()
    for key, peak in PEAK_TFLOPS.items():
        if key in kind:
            return peak
    if "lite" in kind or "v5" in kind:
        return PEAK_TFLOPS["v5e"]
    return PEAK_TFLOPS["v5e"]


def mfu(total_flops: float, seconds: float, peak_tflops: float) -> float:
    return total_flops / seconds / (peak_tflops * 1e12)
