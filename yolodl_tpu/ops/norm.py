"""Darknet-flavoured batch normalization as pure functions.

Equivalent capability to ``tch-modules/src/dark_batch_norm.rs``: defaults
eps=1e-4 and momentum=0.03 (dark_batch_norm.rs:31-43), optional affine,
``clamp_running_var`` applied after each optimizer step (:148-172), and
``fold_batch_norm`` (the reference's ``denormalize``) to fold running stats
into conv weights for inference.

Functional form: parameters (scale/bias) are trainable; running stats are
separate state.  Training mode normalizes with **batch** statistics (biased
variance) and updates running stats with the **unbiased** variance — exact
torch ``Tensor::batch_norm`` semantics, which the reference calls directly.

Layout: activations NHWC; stats/params are [C] vectors on the last axis.
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp

Array = jax.Array
Params = Dict[str, Array]
State = Dict[str, Array]

DEFAULT_EPS = 1e-4
DEFAULT_MOMENTUM = 0.03


def batch_norm_init(channels: int, affine: bool = True) -> Tuple[Params, State]:
    """scale=1, bias=0 (dark_batch_norm.rs ws_init/bs_init Const defaults)."""
    params: Params = {}
    if affine:
        params = {
            "scale": jnp.ones((channels,), jnp.float32),
            "bias": jnp.zeros((channels,), jnp.float32),
        }
    state: State = {
        "mean": jnp.zeros((channels,), jnp.float32),
        "var": jnp.ones((channels,), jnp.float32),
    }
    return params, state


def batch_norm_apply(
    params: Params,
    state: State,
    x: Array,
    train: bool,
    eps: float = DEFAULT_EPS,
    momentum: float = DEFAULT_MOMENTUM,
) -> Tuple[Array, State]:
    """Normalize over all axes but the last (channel) one.

    Returns (output, new_state); in eval mode state is returned unchanged.
    """
    c = x.shape[-1]
    reduce_axes = tuple(range(x.ndim - 1))

    if train:
        x32 = x.astype(jnp.float32)
        batch_mean = jnp.mean(x32, axis=reduce_axes)
        batch_var = jnp.mean(jnp.square(x32), axis=reduce_axes) - jnp.square(batch_mean)
        batch_var = jnp.maximum(batch_var, 0.0)
        n = x.size // c
        unbiased = batch_var * (n / max(n - 1, 1))
        new_state = {
            "mean": (1.0 - momentum) * state["mean"] + momentum * batch_mean,
            "var": (1.0 - momentum) * state["var"] + momentum * unbiased,
        }
        mean, var = batch_mean, batch_var
    else:
        new_state = state
        mean, var = state["mean"], state["var"]

    inv = jax.lax.rsqrt(var + eps)
    scale = params.get("scale")
    bias = params.get("bias")
    if scale is not None:
        inv = inv * scale
    shift = -mean * inv + (bias if bias is not None else 0.0)
    return (x * inv.astype(x.dtype) + shift.astype(x.dtype)), new_state


def batch_norm_apply_sync(
    params: Params,
    state: State,
    x: Array,
    train: bool,
    axis_names,
    eps: float = DEFAULT_EPS,
    momentum: float = DEFAULT_MOMENTUM,
) -> Tuple[Array, State]:
    """Cross-shard batch norm: statistics are psum-synchronized over the
    named mesh axes, so training on sharded activations normalizes exactly
    like the unsharded batch (equal shard sizes assumed).  Used by the
    spatially-sharded train step for prefix convolutions whose batch AND
    height axes are distributed."""
    if not train:
        return batch_norm_apply(params, state, x, train, eps, momentum)
    c = x.shape[-1]
    reduce_axes = tuple(range(x.ndim - 1))
    x32 = x.astype(jnp.float32)
    mean = jnp.mean(x32, axis=reduce_axes)
    meansq = jnp.mean(jnp.square(x32), axis=reduce_axes)
    n_shards = 1
    for ax in axis_names:
        mean = jax.lax.pmean(mean, ax)
        meansq = jax.lax.pmean(meansq, ax)
        n_shards *= jax.lax.axis_size(ax)
    var = jnp.maximum(meansq - jnp.square(mean), 0.0)
    n = (x.size // c) * n_shards
    unbiased = var * (n / max(n - 1, 1))
    new_state = {
        "mean": (1.0 - momentum) * state["mean"] + momentum * mean,
        "var": (1.0 - momentum) * state["var"] + momentum * unbiased,
    }
    inv = jax.lax.rsqrt(var + eps)
    scale = params.get("scale")
    bias = params.get("bias")
    if scale is not None:
        inv = inv * scale
    shift = -mean * inv + (bias if bias is not None else 0.0)
    return (x * inv.astype(x.dtype) + shift.astype(x.dtype)), new_state


def clamp_running_var(
    state: State, var_min: Optional[float], var_max: Optional[float]
) -> State:
    """Clamp the running variance (dark_batch_norm.rs:148-172), applied after
    every optimizer step in the training loop."""
    if var_min is None and var_max is None:
        return state
    var = state["var"]
    if var_min is not None:
        var = jnp.maximum(var, var_min)
    if var_max is not None:
        var = jnp.minimum(var, var_max)
    return {**state, "var": var}


def fold_batch_norm(
    params: Params,
    state: State,
    conv_w: Array,
    conv_b: Optional[Array],
    eps: float = DEFAULT_EPS,
) -> Tuple[Array, Array]:
    """Fold BN into the preceding conv for inference (reference `denormalize`).

    conv_w is HWIO; returns (folded_w, folded_b) such that
    ``conv(x, fw) + fb == bn(conv(x, w) + b)`` in eval mode.

    Note the reference applies activation *between* conv and BN
    (conv_bn_2d.rs:88-101), so folding is only valid for the darknet
    conv→BN→act order.  Consumed by the BN-folding export
    (:mod:`yolodl_tpu.models.fold`, ``yolo-tool fold-weights``), whose
    numpy mirror ``fold_conv_bn_arrays`` is lockstep-tested against this.
    """
    inv = jax.lax.rsqrt(state["var"] + eps)
    scale = params.get("scale")
    if scale is not None:
        inv = inv * scale
    bias = params.get("bias", jnp.zeros_like(state["mean"]))
    folded_w = conv_w * inv  # broadcast over HWIO's O (last) axis
    b0 = conv_b if conv_b is not None else 0.0
    folded_b = (b0 - state["mean"]) * inv + bias
    return folded_w, folded_b


def instance_norm_apply(
    params: Params, x: Array, eps: float = 1e-5
) -> Array:
    """Instance norm over spatial dims of NHWC (tch-modules instance_norm.rs
    equivalent; stateless inference form)."""
    mean = jnp.mean(x, axis=(1, 2), keepdims=True)
    var = jnp.var(x, axis=(1, 2), keepdims=True)
    out = (x - mean) * jax.lax.rsqrt(var + eps)
    scale = params.get("scale")
    bias = params.get("bias")
    if scale is not None:
        out = out * scale
    if bias is not None:
        out = out + bias
    return out


def group_norm_apply(
    params: Params, x: Array, num_groups: int, eps: float = 1e-5
) -> Array:
    """Group norm over NHWC (tch-modules group_norm.rs equivalent)."""
    b, h, w, c = x.shape
    if c % num_groups:
        raise ValueError(f"channels {c} not divisible by groups {num_groups}")
    g = x.reshape(b, h, w, num_groups, c // num_groups)
    mean = jnp.mean(g, axis=(1, 2, 4), keepdims=True)
    var = jnp.var(g, axis=(1, 2, 4), keepdims=True)
    out = ((g - mean) * jax.lax.rsqrt(var + eps)).reshape(b, h, w, c)
    scale = params.get("scale")
    bias = params.get("bias")
    if scale is not None:
        out = out * scale
    if bias is not None:
        out = out + bias
    return out
