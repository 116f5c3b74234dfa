"""Tensor utility extensions.

Equivalent capability to the remaining ``TensorExt`` helpers in
``tch-goodies/src/tensor.rs`` that aren't already first-class elsewhere:
``crop_by_ratio`` (:716), ``multi_softmax``, ``cartesian_product_nd``,
``sum_tensors`` / ``weighted_mean_tensors`` (:44-80), and NaN/finite checks
(:10-12, 283-289).  Plus ``resize2d_exact`` (non-letterbox stretch resize)
for completeness of the resize family (:254-261).
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp

Array = jax.Array


def crop_by_ratio(image: Array, t: float, b: float, l: float, r: float) -> Array:
    """Crop [..., H, W] by 0-1 ratio bounds (tensor.rs:716)."""
    if not (0.0 <= t < b <= 1.0 and 0.0 <= l < r <= 1.0):
        raise ValueError(f"invalid crop ratios {(t, b, l, r)}")
    h, w = image.shape[-2], image.shape[-1]
    return image[..., int(t * h):int(b * h), int(l * w):int(r * w)]


def resize2d_exact(image: Array, out_h: int, out_w: int) -> Array:
    """Stretch-resize [..., H, W] with bilinear sampling (resize2d_exact)."""
    return jax.image.resize(
        image, (*image.shape[:-2], out_h, out_w), method="bilinear"
    )


def multi_softmax(x: Array, num_groups: int, axis: int = -1) -> Array:
    """Softmax over equal-sized groups along an axis (darknet grouped softmax)."""
    size = x.shape[axis]
    if size % num_groups:
        raise ValueError(f"axis size {size} not divisible by {num_groups}")
    moved = jnp.moveaxis(x, axis, -1)
    grouped = moved.reshape(*moved.shape[:-1], num_groups, size // num_groups)
    out = jax.nn.softmax(grouped, axis=-1).reshape(moved.shape)
    return jnp.moveaxis(out, -1, axis)


def cartesian_product_nd(*arrays: Array) -> Array:
    """All index combinations of 1-D arrays → [prod(len), n] (tensor.rs helper)."""
    grids = jnp.meshgrid(*arrays, indexing="ij")
    return jnp.stack([g.reshape(-1) for g in grids], axis=-1)


def sum_tensors(tensors: Sequence[Array]) -> Array:
    if not tensors:
        raise ValueError("sum_tensors needs at least one tensor")
    out = tensors[0]
    for t in tensors[1:]:
        out = out + t
    return out


def weighted_mean_tensors(pairs: Sequence[Tuple[Array, float]]) -> Array:
    """Σ wᵢ·tᵢ / Σ wᵢ (tensor.rs:44-80)."""
    if not pairs:
        raise ValueError("weighted_mean_tensors needs at least one pair")
    total_w = sum(w for _, w in pairs)
    if total_w == 0:
        raise ValueError("weighted_mean_tensors weights sum to zero")
    out = pairs[0][0] * (pairs[0][1] / total_w)
    for t, w in pairs[1:]:
        out = out + t * (w / total_w)
    return out


def has_nan(x: Array) -> Array:
    return jnp.isnan(x).any()


def all_finite(tree) -> Array:
    """True iff every leaf of a pytree is finite (the train-loop guard)."""
    leaves = jax.tree_util.tree_leaves(tree)
    ok = jnp.asarray(True)
    for leaf in leaves:
        ok = ok & jnp.isfinite(leaf).all()
    return ok
