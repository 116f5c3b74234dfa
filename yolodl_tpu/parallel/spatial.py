"""Spatial sharding: halo-exchange convolution over a device mesh.

The reference's only scaling axis is the batch (SURVEY §2.8); for very
large inputs (e.g. 1216² satellite tiles) batch parallelism stops helping
at batch < n_devices.  This module shards the **height** axis across the
mesh and runs convolutions with halo exchange: each shard sends its
boundary rows to its neighbors with ``lax.ppermute`` (compiled to ICI
point-to-point transfers), concatenates the halos, and convolves — bitwise
equal to the unsharded convolution.

Usable inside any ``shard_map``-ped function; :func:`spatial_conv2d` is the
building block, :func:`make_spatial_forward` wraps a whole conv stack.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
from jax.sharding import Mesh
from jax.sharding import PartitionSpec as P

Array = jax.Array

SPACE_AXIS = "space"


def halo_exchange(x_local: Array, halo: int, axis_name: str = SPACE_AXIS,
                  fill: float = 0.0) -> Array:
    """Extend a height-sharded NHWC block with ``halo`` rows from each
    neighbor: [B, Hl, W, C] → [B, Hl + 2·halo, W, C].

    ``fill`` is the global-boundary value: 0 for convolution padding,
    -inf for max pooling."""
    if halo == 0:
        return x_local
    n = jax.lax.axis_size(axis_name)
    idx = jax.lax.axis_index(axis_name)

    top_rows = x_local[:, :halo]
    bot_rows = x_local[:, -halo:]
    # rows flowing downward (shard i → i+1) and upward (i → i−1)
    from_prev = jax.lax.ppermute(
        bot_rows, axis_name, [(i, (i + 1) % n) for i in range(n)]
    )
    from_next = jax.lax.ppermute(
        top_rows, axis_name, [(i, (i - 1) % n) for i in range(n)]
    )
    pad = jnp.full_like(from_prev, fill)
    from_prev = jnp.where(idx == 0, pad, from_prev)
    from_next = jnp.where(idx == n - 1, pad, from_next)
    return jnp.concatenate([from_prev, x_local, from_next], axis=1)


def spatial_conv2d(
    x_local: Array,
    w: Array,
    padding: int,
    stride: int = 1,
    axis_name: str = SPACE_AXIS,
) -> Array:
    """Convolution of a height-sharded NHWC tensor, exact vs unsharded.

    Requires ``padding == (k-1)//2`` ("same"-family) and each local height
    divisible by ``stride`` — the YOLO conv family (k3s1, k3s2, k1s1)
    satisfies both when shards are even-sized.
    """
    kh = w.shape[0]
    if padding != (kh - 1) // 2:
        raise ValueError("spatial_conv2d supports same-padding convs only")
    halo = padding
    x_ext = halo_exchange(x_local, halo, axis_name)
    # height is now locally padded by the halo; pad width normally.  The
    # global top/bottom shards received zero halos = the global zero padding.
    return jax.lax.conv_general_dilated(
        x_ext,
        w.astype(x_local.dtype),
        window_strides=(stride, stride),
        padding=((0, 0), (padding, padding)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )


def make_spatial_forward(
    forward: Callable, mesh: Mesh, axis_name: str = SPACE_AXIS
) -> Callable:
    """shard_map a height-local forward fn over the mesh.

    ``forward(x_local)`` must be built from spatial_conv2d / elementwise ops
    (anything without cross-row reductions).  The returned fn takes the full
    NHWC tensor and returns the full output.
    """
    mapped = jax.shard_map(
        forward,
        mesh=mesh,
        in_specs=P(None, axis_name),
        out_specs=P(None, axis_name),
        check_vma=False,
    )
    return jax.jit(mapped)


def make_space_mesh(n_devices: int) -> Mesh:
    import numpy as np

    return Mesh(np.asarray(jax.devices()[:n_devices]), (SPACE_AXIS,))
