"""Conv weight-gradient reformulated as im2col + dot_general.

XLA's conv backward-filter on low-channel shapes computes dW tap-by-tap as
matmuls with M = Ci ≤ 64, leaving most of the 128-lane MXU dimension padded
(trace analysis: stem/stage-1 dW costs 1.5-1.6 ms each vs ~0.2 ms ideals on
the yolov4-csp-608 step).  Packing all k·k taps into one contraction,

    P[b,h,w, (u,v,ci)] = x_padded[b, h·s+u, w·s+v, ci]
    dW[(u,v,ci), co]   = Σ_{b,h,w} P · g

raises M to k²·Ci (108 for the 12-channel stem, 288/576 for stage-1) so the
matmul tiles onto the MXU near-fully packed.  The patch tensor is produced
by k² shifted slices + concat, which XLA fuses into the dot's operand reads
(no materialized im2col in HBM).

Replaces the cuDNN wgrad the reference gets implicitly from libtorch
autograd (SURVEY §2.7).  Exposed as ``conv2d_packed_wgrad``, a custom-vjp
stride-s dense conv that is numerically identical to the stock conv in both
forward and gradients (tests/test_wgrad.py).
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

Array = jax.Array


def wgrad_im2col(xp: Array, g: Array, k: int, stride: int = 1) -> Array:
    """dW for a dense conv from pre-padded input, as one packed matmul.

    xp: [B, (H−1)s + k, (W−1)s + k, Ci] (already zero-padded)
    g:  [B, H, W, Co] cotangent
    → [k, k, Ci, Co] f32
    """
    b, hp, wp, ci = xp.shape
    _, h, w, co = g.shape
    assert hp == (h - 1) * stride + k and wp == (w - 1) * stride + k, (
        xp.shape, g.shape, k, stride)
    taps = []
    for u in range(k):
        for v in range(k):
            taps.append(jax.lax.slice(
                xp, (0, u, v, 0),
                (b, u + (h - 1) * stride + 1, v + (w - 1) * stride + 1, ci),
                (1, stride, stride, 1)))
    # [B, H, W, k²·Ci]; the concat is fused into the dot's LHS read by XLA.
    patches = jnp.concatenate(taps, axis=-1) if len(taps) > 1 else taps[0]
    dw = jax.lax.dot_general(
        patches, g,
        (((0, 1, 2), (0, 1, 2)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    return dw.reshape(k, k, ci, co)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def conv2d_packed_wgrad(x: Array, w: Array, k: int, stride: int = 1) -> Array:
    """Dense 'same'-padded conv whose dW uses the packed-im2col matmul.

    Semantically identical to lax.conv_general_dilated NHWC/HWIO with
    padding=(k−1)/2; only the backward-filter computation differs.
    """
    pad = (k - 1) // 2
    return jax.lax.conv_general_dilated(
        x, w.astype(x.dtype), (stride, stride), ((pad, pad), (pad, pad)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


def _fwd(x: Array, w: Array, k: int, stride: int):
    pad = (k - 1) // 2
    y = jax.lax.conv_general_dilated(
        x, w.astype(x.dtype), (stride, stride), ((pad, pad), (pad, pad)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    return y, (x, w)


def _bwd(k: int, stride: int, res: Tuple[Array, Array], g: Array):
    x, w = res
    pad = (k - 1) // 2
    # dX: standard transposed conv (XLA's native path is fine here).
    wt = jnp.flip(w, (0, 1)).swapaxes(2, 3).astype(g.dtype)
    lo = k - 1 - pad
    # Pads chosen so the transposed conv reproduces x's spatial size exactly:
    # out = (n−1)·s + 1 + lo + hi − k + 1 must equal x's extent per axis.
    hi_h = x.shape[1] - (g.shape[1] - 1) * stride + k - 2 - lo
    hi_w = x.shape[2] - (g.shape[2] - 1) * stride + k - 2 - lo
    dx = jax.lax.conv_general_dilated(
        g, wt, (1, 1), ((lo, hi_h), (lo, hi_w)),
        lhs_dilation=(stride, stride),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    # dW: packed matmul over pre-padded x.
    xp = jnp.pad(x, ((0, 0), (pad, pad), (pad, pad), (0, 0))) if pad else x
    # Crop so the padded extent matches exactly (h−1)s + k (strided convs
    # may not consume the last padded rows).
    h, w_ = g.shape[1], g.shape[2]
    xp = xp[:, : (h - 1) * stride + k, : (w_ - 1) * stride + k, :]
    dw = wgrad_im2col(xp, g, k, stride).astype(w.dtype)
    return dx, dw


conv2d_packed_wgrad.defvjp(_fwd, _bwd)
