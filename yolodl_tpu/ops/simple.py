"""Shape-plumbing ops: upsample, maxpool, sum, concat, pad.

Equivalent capability to ``tch-modules/src/{up_sample_2d,sum_2d,concat_2d,
max_pool,dynamic_pad_nd}.rs``.  NHWC layout throughout.
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp

Array = jax.Array


def upsample2d(x: Array, scale: float) -> Array:
    """Nearest-neighbour upsample by an integer-effective scale
    (up_sample_2d.rs:18-25)."""
    b, h, w, c = x.shape
    out_h, out_w = int(h * scale), int(w * scale)
    if out_h % h == 0 and out_w % w == 0:
        ry, rx = out_h // h, out_w // w
        # repeat is cheaper than gather for exact integer scales
        return jnp.repeat(jnp.repeat(x, ry, axis=1), rx, axis=2)
    rows = (jnp.arange(out_h) * h // out_h).astype(jnp.int32)
    cols = (jnp.arange(out_w) * w // out_w).astype(jnp.int32)
    return x[:, rows][:, :, cols]


def downsample2d(x: Array, stride: int) -> Array:
    """UpSample2D ByStride reverse=true: strided subsample."""
    return x[:, ::stride, ::stride, :]


def max_pool2d(
    x: Array,
    size: int,
    stride_y: int,
    stride_x: int,
    padding: int = 0,
    total_padding: int = None,
    pool_kind: str = "max",
) -> Array:
    """Max-pool with -inf padding.

    ``padding`` is symmetric per side (torch style); ``total_padding`` when
    given uses darknet's asymmetric split lo=tp//2, hi=tp-tp//2
    (darknet maxpool_layer semantics, out = (in+tp-size)//stride+1).
    """
    if total_padding is not None:
        lo, hi = total_padding // 2, total_padding - total_padding // 2
    else:
        lo = hi = padding
    if pool_kind == "avg":
        summed = jax.lax.reduce_window(
            x, 0.0, jax.lax.add,
            window_dimensions=(1, size, size, 1),
            window_strides=(1, stride_y, stride_x, 1),
            padding=((0, 0), (lo, hi), (lo, hi), (0, 0)),
        )
        # darknet local_avgpool divides by the count of IN-BOUNDS cells
        # per window (forward_local_avgpool_layer's `counter`), not size²
        # — border windows under padding would otherwise be scaled down
        ones = jnp.ones(x.shape[1:3], x.dtype)[None, :, :, None]
        counts = jax.lax.reduce_window(
            ones, 0.0, jax.lax.add,
            window_dimensions=(1, size, size, 1),
            window_strides=(1, stride_y, stride_x, 1),
            padding=((0, 0), (lo, hi), (lo, hi), (0, 0)),
        )
        return summed / counts
    # Large-window stride-1 max-pools (the SPP block: k=5/9/13 over the same
    # map, yolov4 [maxpool] / SppCsp2D) compose exactly from chained 3×3
    # stride-1 pools with -inf padding: max over [i-m, i+m] = m-fold max over
    # [i-1, i+1].  The win is the backward pass: XLA lowers maxpool VJP to
    # select-and-scatter, whose cost scales with the window area (k² = 169
    # probes at k=13); the chain replaces it with k//2 cheap 3×3
    # select-and-scatters (measured ~29 ms/step → ~3 ms on yolov4-csp-608).
    if (
        pool_kind == "max"
        and stride_y == 1
        and stride_x == 1
        and size > 3
        and size % 2 == 1
        and lo == hi == size // 2
    ):
        out = x
        for _ in range(size // 2):
            out = jax.lax.reduce_window(
                out,
                -jnp.inf,
                jax.lax.max,
                window_dimensions=(1, 3, 3, 1),
                window_strides=(1, 1, 1, 1),
                padding=((0, 0), (1, 1), (1, 1), (0, 0)),
            )
        return out
    # -inf identity keeps reduce_window differentiable (select-and-scatter VJP)
    return jax.lax.reduce_window(
        x,
        -jnp.inf,
        jax.lax.max,
        window_dimensions=(1, size, size, 1),
        window_strides=(1, stride_y, stride_x, 1),
        padding=((0, 0), (lo, hi), (lo, hi), (0, 0)),
    )


def sum2d(xs: Sequence[Array]) -> Array:
    out = xs[0]
    for x in xs[1:]:
        out = out + x
    return out


def concat2d(xs: Sequence[Array]) -> Array:
    """Channel concat (last axis in NHWC)."""
    return jnp.concatenate(list(xs), axis=-1)


def dynamic_pad2d(x: Array, t: int, b: int, l: int, r: int, kind: str = "zero") -> Array:
    """Zero/replication/reflection padding (dynamic_pad_nd.rs:11)."""
    widths = ((0, 0), (t, b), (l, r), (0, 0))
    mode = {"zero": "constant", "replication": "edge", "reflection": "reflect"}[kind]
    return jnp.pad(x, widths, mode=mode)
