"""Convolution blocks: ConvBn2D / Conv2D / DeconvBn2D.

Equivalent capability to ``tch-modules/src/{conv_bn_2d,conv_nd,deconv_bn_2d}.rs``.
The load-bearing quirk preserved from the reference: the forward order is
**conv → activation → batch-norm** (conv_bn_2d.rs:88-101), not the usual
conv→bn→act.

TPU design: activations are NHWC, kernels HWIO, so the channel axis sits on
the 128-wide lane dimension and XLA maps the conv onto the MXU directly;
the activation and BN are elementwise/cheap and fuse into the conv's
epilogue.  Compute dtype is configurable (bf16 inputs with f32 accumulation
via ``preferred_element_type``).
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from .. import activations
from ..config import newslab as cfg
from . import initializers
from .norm import batch_norm_apply, batch_norm_init

Array = jax.Array

# NHWC activations / HWIO kernels.
DIMSPEC = ("NHWC", "HWIO", "NHWC")


def conv2d_apply(
    x: Array,
    w: Array,
    b: Optional[Array] = None,
    stride: int = 1,
    padding: int = 0,
    dilation: int = 1,
    groups: int = 1,
    accum_dtype=jnp.float32,
) -> Array:
    """Grouped 2-D convolution, symmetric padding in pixels."""
    # Kernels are cast to the activation dtype; no explicit
    # preferred_element_type — the TPU MXU accumulates bf16 convolutions in
    # f32 natively, and a f32-accumulate+downcast dance breaks the conv VJP
    # under mixed dtypes.
    out = jax.lax.conv_general_dilated(
        x,
        w.astype(x.dtype),
        window_strides=(stride, stride),
        padding=((padding, padding), (padding, padding)),
        rhs_dilation=(dilation, dilation),
        dimension_numbers=DIMSPEC,
        feature_group_count=groups,
    )
    if b is not None:
        out = out + b.astype(out.dtype)
    return out


def conv_bn_init(key: jax.Array, layer: cfg.ConvBn2D, in_c: int):
    """Init params/state for a ConvBn2D node."""
    k_w, k_b = jax.random.split(key)
    shape = (layer.k, layer.k, in_c // layer.g, layer.c)
    params: Dict[str, Any] = {"w": initializers.conv_kernel(k_w, shape, layer.g)}
    if layer.bias:
        params["b"] = initializers.conv_bias(k_b, layer.c, layer.k * layer.k * in_c // layer.g)
    state: Dict[str, Any] = {}
    if layer.bn.enabled:
        bn_p, bn_s = batch_norm_init(layer.c, affine=layer.bn.affine)
        params["bn"] = bn_p
        state["bn"] = bn_s
    return params, state


def conv_bn_apply(
    params: Dict[str, Any],
    state: Dict[str, Any],
    x: Array,
    layer: cfg.ConvBn2D,
    train: bool,
) -> Tuple[Array, Dict[str, Any]]:
    """conv → activation → BN (NEWSLAB order, conv_bn_2d.rs:88-101), or
    conv → BN → activation when ``layer.order == "bn_act"`` (darknet)."""
    out = conv2d_apply(
        x, params["w"], params.get("b"),
        stride=layer.s, padding=layer.padding, dilation=layer.d, groups=layer.g,
    )
    new_state = state
    if layer.order == "act_bn":
        out = activations.apply(layer.act, out)
        if layer.bn.enabled:
            out, bn_s = batch_norm_apply(params["bn"], state["bn"], out, train)
            new_state = {**state, "bn": bn_s}
    elif layer.order == "bn_act":
        if layer.bn.enabled:
            out, bn_s = batch_norm_apply(params["bn"], state["bn"], out, train)
            new_state = {**state, "bn": bn_s}
        out = activations.apply(layer.act, out)
    else:
        raise ValueError(f"unknown conv order {layer.order!r}")
    return out, new_state


def deconv_bn_init(key: jax.Array, layer: cfg.DeconvBn2D, in_c: int):
    k_w, k_b = jax.random.split(key)
    # Kernel stored HWIO with I=in/g, O=out; torch's deconv fan_in uses out-side.
    shape = (layer.k, layer.k, in_c // layer.g, layer.c)
    params: Dict[str, Any] = {"w": initializers.conv_kernel(k_w, shape, layer.g)}
    if layer.bias:
        params["b"] = initializers.conv_bias(k_b, layer.c, layer.k * layer.k * in_c // layer.g)
    state: Dict[str, Any] = {}
    if layer.bn.enabled:
        bn_p, bn_s = batch_norm_init(layer.c, affine=layer.bn.affine)
        params["bn"] = bn_p
        state["bn"] = bn_s
    return params, state


def deconv_bn_apply(
    params: Dict[str, Any],
    state: Dict[str, Any],
    x: Array,
    layer: cfg.DeconvBn2D,
    train: bool,
) -> Tuple[Array, Dict[str, Any]]:
    """Transposed conv with torch-compatible padding/output-padding semantics:
    out = (in-1)*s - 2p + d*(k-1) + op + 1 (deconv_bn_2d.rs:164-165)."""
    p, op, d, k, s = layer.padding, layer.op, layer.d, layer.k, layer.s
    if layer.g != 1:
        raise NotImplementedError(
            "grouped transposed conv is not supported (lax.conv_transpose "
            "has no feature_group_count)")
    # lax.conv_transpose padding is on the *output* grid; torch-style padding
    # p maps to (d*(k-1) - p) lo and (d*(k-1) - p + op) hi.
    pad_lo = d * (k - 1) - p
    pad_hi = d * (k - 1) - p + op
    # Spatial flip: ConvTranspose2d is the ADJOINT of the forward conv, which
    # correlates with the flipped kernel; lax.conv_transpose with
    # transpose_kernel=False is a fractionally-strided *correlation* and
    # would apply the kernel unflipped (verified numerically vs torch —
    # max|Δ| ~10 unflipped, 0 flipped on random k=3 s=2 cases).
    out = jax.lax.conv_transpose(
        x,
        jnp.flip(params["w"], (0, 1)).astype(x.dtype),
        strides=(s, s),
        padding=((pad_lo, pad_hi), (pad_lo, pad_hi)),
        rhs_dilation=(d, d),
        dimension_numbers=DIMSPEC,
    )
    if "b" in params:
        out = out + params["b"].astype(out.dtype)
    out = activations.apply(layer.act, out)
    new_state = state
    if layer.bn.enabled:
        out, bn_s = batch_norm_apply(params["bn"], state["bn"], out, train)
        new_state = {**state, "bn": bn_s}
    return out, new_state
