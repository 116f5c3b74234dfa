"""Parameter initializers matching torch's conv defaults.

The reference inherits tch/libtorch initialization (kaiming-uniform with
a=sqrt(5) for conv weights, fan-in uniform for biases), so models trained
from scratch start from the same distribution family.
"""

from __future__ import annotations

import math
from typing import Tuple

import jax
import jax.numpy as jnp

Array = jax.Array


def conv_kernel(key: jax.Array, shape_hwio: Tuple[int, int, int, int],
                groups: int = 1, dtype=jnp.float32) -> Array:
    """HWIO kernel; fan_in = kh*kw*in_per_group (torch kaiming_uniform a=√5 →
    bound = 1/√fan_in)."""
    kh, kw, in_pg, _out = shape_hwio
    fan_in = kh * kw * in_pg
    bound = 1.0 / math.sqrt(fan_in) if fan_in > 0 else 0.0
    return jax.random.uniform(key, shape_hwio, dtype, minval=-bound, maxval=bound)


def conv_bias(key: jax.Array, out_c: int, fan_in: int, dtype=jnp.float32) -> Array:
    bound = 1.0 / math.sqrt(fan_in) if fan_in > 0 else 0.0
    return jax.random.uniform(key, (out_c,), dtype, minval=-bound, maxval=bound)


def linear_weight(key: jax.Array, in_f: int, out_f: int, dtype=jnp.float32) -> Array:
    bound = 1.0 / math.sqrt(in_f) if in_f > 0 else 0.0
    return jax.random.uniform(key, (in_f, out_f), dtype, minval=-bound, maxval=bound)
