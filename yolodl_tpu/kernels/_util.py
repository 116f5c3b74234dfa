"""Shared helpers for the Pallas kernel modules."""

from __future__ import annotations

import jax
import jax.numpy as jnp


def pad_axis(x: jax.Array, size: int, axis: int) -> jax.Array:
    """Zero-pad ``x`` up to ``size`` along ``axis`` (no-op if large enough).

    Kernels pad operands to lane/sublane-aligned tile sizes before
    ``pallas_call`` and slice the result back.
    """
    pad = size - x.shape[axis]
    if pad <= 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths)
