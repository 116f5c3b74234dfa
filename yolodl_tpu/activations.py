"""Darknet activation family as pure jnp functions.

Equivalent capability to the reference ``tch-act`` crate
(``tch-act/src/lib.rs:14-40`` — the 22-variant ``Activation`` enum — and
``tch-act/src/impls.rs``).  Unlike the reference, which leaves several darknet
variants unimplemented (``todo!()``), every variant here has a definition
following AlexeyAB darknet's ``activations.c`` semantics.

All functions are elementwise jnp ops, so XLA fuses them into the surrounding
convolution; no special kernels are needed for the VPU.
"""

from __future__ import annotations

from typing import Callable, Dict

import jax
import jax.numpy as jnp

Array = jax.Array

# Canonical snake_case names, matching the reference serde encoding
# (tch-act/src/lib.rs `rename_all = "snake_case"`).
MISH = "mish"
HARD_MISH = "hard_mish"
SWISH = "swish"
NORMALIZE_CHANNELS = "normalize_channels"
NORMALIZE_CHANNELS_SOFTMAX = "normalize_channels_softmax"
NORMALIZE_CHANNELS_SOFTMAX_MAXVAL = "normalize_channels_softmax_maxval"
LOGISTIC = "logistic"
LOGGY = "loggy"
RELU = "relu"
LRELU = "l_relu"
ELU = "elu"
SELU = "selu"
GELU = "gelu"
RELIE = "relie"
RAMP = "ramp"
LINEAR = "linear"
TANH = "tanh"
PLSE = "plse"
LEAKY = "leaky"
STAIR = "stair"
HARDTAN = "hardtan"
LHTAN = "lhtan"
RELU6 = "relu6"


def mish(x: Array) -> Array:
    """x * tanh(softplus(x)) — the YOLOv4 default."""
    return x * jnp.tanh(jax.nn.softplus(x))


def hard_mish(x: Array) -> Array:
    """Piecewise-quadratic mish approximation (tch-act/src/impls.rs:31-36)."""
    case1 = jnp.clip(x, -2.0, 0.0)
    case2 = jnp.maximum(x, 0.0)
    return (case1 * case1 / 2.0 + case1) + case2


def swish(x: Array) -> Array:
    return x * jax.nn.sigmoid(x)


def leaky(x: Array) -> Array:
    """Darknet leaky: slope 0.1 (tch-act/src/impls.rs:27-29)."""
    return jnp.maximum(x, 0.0) + jnp.minimum(x, 0.0) * 0.1


def lrelu(x: Array) -> Array:
    """Leaky with slope 0.2 (tch-act/src/impls.rs:42-44)."""
    return jnp.maximum(x, x * 0.2)


def loggy(x: Array) -> Array:
    return 2.0 * jax.nn.sigmoid(x) - 1.0


def relie(x: Array) -> Array:
    return jnp.where(x > 0, x, 0.01 * x)


def ramp(x: Array) -> Array:
    return x * (x > 0) + 0.1 * x


def plse(x: Array) -> Array:
    return jnp.where(
        x < -4.0,
        0.01 * (x + 4.0),
        jnp.where(x > 4.0, 0.01 * (x - 4.0) + 1.0, 0.125 * x + 0.5),
    )


def stair(x: Array) -> Array:
    n = jnp.floor(x)
    half = jnp.floor(x / 2.0)
    is_even = jnp.mod(n, 2) == 0
    return jnp.where(is_even, half, (x - n) + half)


def hardtan(x: Array) -> Array:
    return jnp.clip(x, -1.0, 1.0)


def lhtan(x: Array) -> Array:
    return jnp.where(x < 0.0, 0.001 * x, jnp.where(x > 1.0, 0.001 * (x - 1.0) + 1.0, x))


def relu6(x: Array) -> Array:
    return jnp.clip(x, 0.0, 6.0)


def normalize_channels(x: Array, channel_axis: int = -1) -> Array:
    """Relu then divide by the channel-sum (darknet activations.c).

    Default axis −1: activations are NHWC on device (conv.py DIMSPEC), so
    dispatch through ``apply`` must normalize the LAST axis.
    """
    relu_x = jnp.maximum(x, 0.0)
    total = jnp.sum(relu_x, axis=channel_axis, keepdims=True)
    return relu_x / jnp.maximum(total, 1e-6)


def normalize_channels_softmax(x: Array, channel_axis: int = -1) -> Array:
    return jax.nn.softmax(x, axis=channel_axis)


def normalize_channels_softmax_maxval(x: Array, channel_axis: int = -1) -> Array:
    sm = jax.nn.softmax(x, axis=channel_axis)
    maxval = jnp.max(sm, axis=channel_axis, keepdims=True)
    return sm / jnp.maximum(maxval, 1e-6)


_TABLE: Dict[str, Callable[[Array], Array]] = {
    LINEAR: lambda x: x,
    MISH: mish,
    HARD_MISH: hard_mish,
    SWISH: swish,
    RELU: jax.nn.relu,
    LEAKY: leaky,
    LOGISTIC: jax.nn.sigmoid,
    LOGGY: loggy,
    LRELU: lrelu,
    ELU: jax.nn.elu,
    SELU: jax.nn.selu,
    GELU: jax.nn.gelu,
    RELIE: relie,
    RAMP: ramp,
    TANH: jnp.tanh,
    PLSE: plse,
    STAIR: stair,
    HARDTAN: hardtan,
    LHTAN: lhtan,
    RELU6: relu6,
    NORMALIZE_CHANNELS: normalize_channels,
    NORMALIZE_CHANNELS_SOFTMAX: normalize_channels_softmax,
    NORMALIZE_CHANNELS_SOFTMAX_MAXVAL: normalize_channels_softmax_maxval,
}

# Darknet .cfg spelling → canonical name (darknet uses e.g. `activation=leaky`).
DARKNET_NAMES: Dict[str, str] = {
    "mish": MISH,
    "hard_mish": HARD_MISH,
    "swish": SWISH,
    "normalize_channels": NORMALIZE_CHANNELS,
    "normalize_channels_softmax": NORMALIZE_CHANNELS_SOFTMAX,
    "normalize_channels_softmax_maxval": NORMALIZE_CHANNELS_SOFTMAX_MAXVAL,
    "logistic": LOGISTIC,
    "loggy": LOGGY,
    "relu": RELU,
    "lrelu": LRELU,
    "elu": ELU,
    "selu": SELU,
    "gelu": GELU,
    "relie": RELIE,
    "ramp": RAMP,
    "linear": LINEAR,
    "tanh": TANH,
    "plse": PLSE,
    "leaky": LEAKY,
    "stair": STAIR,
    "hardtan": HARDTAN,
    "lhtan": LHTAN,
    "relu6": RELU6,
}


def resolve(name: str) -> Callable[[Array], Array]:
    """Look up an activation function by canonical or darknet name."""
    key = name.lower()
    key = DARKNET_NAMES.get(key, key)
    if key not in _TABLE:
        raise KeyError(f"unknown activation: {name!r}")
    return _TABLE[key]


def apply(name: str, x: Array) -> Array:
    return resolve(name)(x)


ALL_ACTIVATIONS = tuple(_TABLE.keys())
