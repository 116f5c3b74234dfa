"""Pallas conv weight-gradient kernel for low-channel layers (TPU).

XLA's conv wgrad on shapes with few channels runs far from both the MXU
and HBM-bandwidth roofs: measured on the yolov4-csp-608 step (trace,
scripts/trace_ops.py), dW for the stem/stage-1 convs costs 1.5-1.6 ms each
against ~0.2-0.6 ms ideals.  The root cause is lane padding: XLA computes
dW[u,v,ci,co] tap-by-tap as matmuls with M=ci, N=co ≤ 64, wasting most of
the 128×128 systolic array.

This kernel packs all k·k taps into the contraction's M dimension with an
on-the-fly im2col in VMEM:

    P[s, (u,v,ci)] = x_padded[b, h+u, w+v, ci]   built per row-block
    dW[(u,v,ci), co] += P^T @ G                   f32 accumulate in VMEM

so M = k²·ci (e.g. 576 for k3 ci=64) and the MXU runs near fully packed.
x is consumed **pre-padded** (the custom-vjp wrapper pads once in the
forward and runs the forward conv with padding=0 on the same buffer, so no
extra pass over the activation is paid) and is read by manual DMA because
row blocks overlap by the k−1 halo; g streams through the normal Pallas
pipeline.

Replaces the reference's reliance on cuDNN wgrad (libtorch autograd,
SURVEY §2.7); used via ``conv2d_lowch_vjp`` below for eligible shapes.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ._util import interpret_default, make_conv2d_with_wgrad

Array = jax.Array


def _pick_rows(h: int) -> int:
    for rows in (8, 4, 2):
        if h % rows == 0:
            return rows
    return 1


def _wgrad_kernel(x_hbm, g_ref, out_ref, xbuf, sem, *, k, rows, w_in, ci):
    b = pl.program_id(0)
    r = pl.program_id(1)

    cp = pltpu.make_async_copy(
        x_hbm.at[b, pl.ds(r * rows, rows + k - 1)], xbuf, sem)
    cp.start()
    cp.wait()

    xv = xbuf[:]                      # [rows+k-1, w_in, ci] bf16
    ow = w_in - (k - 1)
    g = g_ref[0]                      # [rows, ow, co]

    cols = []
    for u in range(k):
        for v in range(k):
            cols.append(jax.lax.slice(
                xv, (u, v, 0), (u + rows, v + ow, ci)))
    patches = jnp.concatenate(cols, axis=-1) if len(cols) > 1 else cols[0]
    p2 = patches.reshape(rows * ow, k * k * ci)
    g2 = g.reshape(rows * ow, g.shape[-1])

    acc = jax.lax.dot_general(
        p2, g2, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)

    @pl.when((b == 0) & (r == 0))
    def _init():
        out_ref[:] = acc

    @pl.when((b > 0) | (r > 0))
    def _accum():
        out_ref[:] = out_ref[:] + acc


def wgrad_lowch(xp: Array, g: Array, k: int, interpret=None) -> Array:
    """dW for a stride-1 dense conv from pre-padded input.

    xp: [B, H + k−1, W + k−1, Ci] (already zero-padded by (k−1)/2 per side)
    g:  [B, H, W, Co] cotangent
    → [k, k, Ci, Co] f32
    """
    if interpret is None:
        interpret = interpret_default()
    b, hp, wp, ci = xp.shape
    _, h, w, co = g.shape
    assert hp == h + k - 1 and wp == w + k - 1
    rows = _pick_rows(h)

    out = pl.pallas_call(
        functools.partial(_wgrad_kernel, k=k, rows=rows, w_in=wp, ci=ci),
        grid=(b, h // rows),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),  # xp stays in HBM; manual DMA
            pl.BlockSpec((1, rows, w, co), lambda i, j: (i, j, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((k * k * ci, co), lambda i, j: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((k * k * ci, co), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((rows + k - 1, wp, ci), xp.dtype),
            pltpu.SemaphoreType.DMA,
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * b * h * w * k * k * ci * co,
            bytes_accessed=xp.size * xp.dtype.itemsize
            + g.size * g.dtype.itemsize + 4 * k * k * ci * co,
            transcendentals=0,
        ),
        interpret=interpret,
    )(xp, g)
    return out.reshape(k, k, ci, co)


# custom-vjp conv wrapper: XLA forward + XLA dX + Pallas dW (shared algebra
# in kernels/_util.make_conv2d_with_wgrad)
conv2d_lowch = make_conv2d_with_wgrad(
    wgrad_lowch, "Dense stride-1 'same' conv whose dW uses the Pallas kernel.")
