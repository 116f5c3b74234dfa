"""Pallas TPU kernel: fused 1×1 conv + folded-BN + Mish.

The north-star optimization named in BASELINE.json ("conv-BN-Mish ...
fused into Pallas kernels"): most convolutions in the CSP family are 1×1
(every skip/merge/repeat conv), which on NHWC is a plain channel matmul —
an MXU tile job with a cheap elementwise epilogue.  This kernel computes

    y = mish(  (x @ w) * scale + shift  )

in one pass: the [TILE_M, K]×[K, TILE_N] product runs on the MXU with f32
accumulation, and the BN affine + Mish epilogue runs on the VPU while the
tile is still in VMEM — the intermediate never touches HBM.

``scale``/``shift`` carry a folded batch norm (`fold_batch_norm`) or plain
bias (scale=1, shift=b).  A custom VJP keeps the op differentiable: the
backward matmuls are XLA (already optimal for plain GEMMs); only the
recomputed epilogue derivative chain is custom.

Note: XLA usually fuses this epilogue by itself — the kernel exists to pin
the fusion (and as the template for further hand-fused blocks); the unit
tests assert exact agreement with the composed ops.
"""

from __future__ import annotations

import functools
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ._util import pad_axis

Array = jax.Array

TILE_M = 256
TILE_N = 128


def _mish(z):
    return z * jnp.tanh(jax.nn.softplus(z))


def _kernel(x_ref, w_ref, scale_ref, shift_ref, out_ref):
    acc = jnp.dot(x_ref[:, :], w_ref[:, :], preferred_element_type=jnp.float32)
    z = acc * scale_ref[0, :] + shift_ref[0, :]
    out_ref[:, :] = _mish(z).astype(out_ref.dtype)


def _forward(x2d: Array, w: Array, scale: Array, shift: Array,
             interpret: bool) -> Array:
    m, k = x2d.shape
    _, n = w.shape
    m_pad = ((m + TILE_M - 1) // TILE_M) * TILE_M
    n_pad = ((n + TILE_N - 1) // TILE_N) * TILE_N

    xp = pad_axis(x2d, m_pad, 0)
    wp = pad_axis(w, n_pad, 1)
    scale_p = pad_axis(scale.reshape(1, -1).astype(jnp.float32), n_pad, 1)
    shift_p = pad_axis(shift.reshape(1, -1).astype(jnp.float32), n_pad, 1)

    out = pl.pallas_call(
        _kernel,
        out_shape=jax.ShapeDtypeStruct((m_pad, n_pad), x2d.dtype),
        grid_spec=pl.GridSpec(
            grid=(m_pad // TILE_M, n_pad // TILE_N),
            in_specs=[
                pl.BlockSpec((TILE_M, k), lambda i, j: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((k, TILE_N), lambda i, j: (0, j),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, TILE_N), lambda i, j: (0, j),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, TILE_N), lambda i, j: (0, j),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((TILE_M, TILE_N), lambda i, j: (i, j),
                                   memory_space=pltpu.VMEM),
        ),
        interpret=interpret,
    )(xp, wp, scale_p, shift_p)
    return out[:m, :n]


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def fused_conv1x1_mish(x: Array, w: Array, scale: Array, shift: Array,
                       interpret: bool = False) -> Array:
    """y = mish((x @ w)·scale + shift) for NHWC x and [Cin, Cout] w.

    x: [..., Cin] (any leading shape); returns [..., Cout].
    """
    lead = x.shape[:-1]
    x2d = x.reshape(-1, x.shape[-1])
    out = _forward(x2d, w, scale, shift, interpret)
    return out.reshape(*lead, w.shape[-1])


def _fwd(x, w, scale, shift, interpret):
    return fused_conv1x1_mish(x, w, scale, shift, interpret), (x, w, scale, shift)


def _bwd(interpret, res, g):
    x, w, scale, shift = res
    lead = x.shape[:-1]
    x2d = x.reshape(-1, x.shape[-1]).astype(jnp.float32)
    g2d = g.reshape(-1, g.shape[-1]).astype(jnp.float32)
    w32 = w.astype(jnp.float32)
    scale32 = scale.astype(jnp.float32)

    # recompute the pre-activation (one GEMM, reused for z and d_scale;
    # avoids storing the activation tile)
    acc = x2d @ w32
    z = acc * scale32 + shift.astype(jnp.float32)
    sp = jax.nn.softplus(z)
    t = jnp.tanh(sp)
    dmish = t + z * (1.0 - t * t) * jax.nn.sigmoid(z)
    gz = g2d * dmish

    d_shift = jnp.sum(gz, axis=0)
    d_scale = jnp.sum(gz * acc, axis=0)
    ga = gz * scale32
    dx = (ga @ w32.T).astype(x.dtype).reshape(*lead, x.shape[-1])
    dw = (x2d.T @ ga).astype(w.dtype)
    return dx, dw, d_scale.astype(scale.dtype), d_shift.astype(shift.dtype)


fused_conv1x1_mish.defvjp(_fwd, _bwd)
