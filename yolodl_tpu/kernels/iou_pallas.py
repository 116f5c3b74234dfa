"""Pallas TPU kernel: tiled pairwise IoU matrix.

Replaces the role of the reference's external CUDA NMS kernel ``tch-nms``
(yolo-dl/src/loss/nms.rs:142-148): the O(K²) IoU matrix is the compute core
of batched NMS.  The kernel tiles the K×K output into (TILE, TILE) VMEM
blocks; each grid cell reads two row-blocks of boxes laid out as four
coordinate planes [4, K] (t/l/b/r on the sublane axis, boxes on the
128-wide lane axis) and emits one IoU tile on the VPU.

For small K the jnp broadcast version is already fused well by XLA; the
Pallas path wins once K² stops fitting in a single fusion (K ≥ ~1k) and is
exposed behind the same signature with a ``backend`` switch.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ._util import pad_axis

Array = jax.Array

EPSILON = 1e-16
TILE = 256


def _iou_tile_kernel(rows_ref, cols_ref, out_ref):
    """rows_ref/cols_ref: [4, TILE] coordinate planes; out_ref: [TILE, TILE]."""
    rt = rows_ref[0, :]
    rl = rows_ref[1, :]
    rb = rows_ref[2, :]
    rr = rows_ref[3, :]
    ct = cols_ref[0, :]
    cl = cols_ref[1, :]
    cb = cols_ref[2, :]
    cr = cols_ref[3, :]

    # rows vary on the sublane axis, cols on the lane axis
    max_t = jnp.maximum(rt[:, None], ct[None, :])
    max_l = jnp.maximum(rl[:, None], cl[None, :])
    min_b = jnp.minimum(rb[:, None], cb[None, :])
    min_r = jnp.minimum(rr[:, None], cr[None, :])
    inter = jnp.maximum(min_b - max_t, 0.0) * jnp.maximum(min_r - max_l, 0.0)

    area_r = (rb - rt) * (rr - rl)
    area_c = (cb - ct) * (cr - cl)
    union = area_r[:, None] + area_c[None, :] - inter + EPSILON
    out_ref[:, :] = inter / union


@functools.partial(jax.jit, static_argnames=("interpret",))
def pairwise_iou_pallas(tlbr: Array, interpret: bool = False) -> Array:
    """[K, 4] TLBR boxes → [K, K] IoU matrix via the tiled TPU kernel."""
    k = tlbr.shape[0]
    k_pad = max(TILE, ((k + TILE - 1) // TILE) * TILE)
    planes = pad_axis(tlbr.astype(jnp.float32), k_pad, 0).T  # [4, Kpad]
    planes = jnp.asarray(planes)

    grid = (k_pad // TILE, k_pad // TILE)
    out = pl.pallas_call(
        _iou_tile_kernel,
        out_shape=jax.ShapeDtypeStruct((k_pad, k_pad), jnp.float32),
        grid_spec=pl.GridSpec(
            grid=grid,
            in_specs=[
                pl.BlockSpec((4, TILE), lambda i, j: (0, i), memory_space=pltpu.VMEM),
                pl.BlockSpec((4, TILE), lambda i, j: (0, j), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(
                (TILE, TILE), lambda i, j: (i, j), memory_space=pltpu.VMEM
            ),
        ),
        interpret=interpret,
    )(planes, planes)
    return out[:k, :k]
