"""Double-buffered Pallas conv weight-gradient kernel (TPU).

Round-2 rework of ``wgrad_pallas.py`` per VERDICT #3: the round-1 kernel
was DMA-latency-bound by construction — one *synchronous* halo copy per
grid step (cp.start(); cp.wait() back-to-back) stalled the MXU for the
full HBM round trip × every row block.  This version pipelines: at grid
step s it starts the DMA for step s+1's row block into the other half of a
double buffer, then waits on the copy issued one step earlier, so the halo
load of block s+1 overlaps the matmul of block s (pallas_guide.md
"Patterns: Double Buffering", adapted to cross-grid-step scratch
persistence).

Second round-1 failure fixed: the k>1 path concatenated k² tap slices of
ci=64 lanes — a non-128-aligned lane concat that Mosaic rejects (opaque
HTTP 500 through the axon tunnel).  Here each tap contracts separately
into its own ``out_ref[t]`` slab ([k², ci, co] accumulator, leading-dim
indexing only), so no lane-axis concatenation ever happens.

dW math (stride-1 dense conv, pre-padded input):

    dW[u, v, ci, co] = Σ_{b,h,w} xp[b, h+u, w+v, ci] · g[b, h, w, co]

i.e. per tap a [S, ci]ᵀ[S, co] GEMM with S = rows·W streamed over row
blocks, f32 accumulation in VMEM.

The cotangent ``g`` streams through the normal Pallas pipeline (which the
compiler double-buffers itself); only the halo-overlapped ``xp`` needs the
manual DMA.

MEASURED VERDICT (2026-08-17, v5e, scripts/exp_wgrad_db.py, dW-only device
time, b16 bf16) — **conclusive negative result; not wired into the model**:

    304p 64->32 k1   xla 6.26 ms   pallasdb 7.82 ms  (0.80x)
    304p 32->64 k3   xla 6.45 ms   pallasdb 12.2 ms  (0.53x)
    152p 128->64 k1  xla 0.63 ms   pallasdb 0.67 ms  (0.94x)
    152p 64->64 k1   xla 1.23 ms   pallasdb 1.57 ms  (0.78x)
    76p 256->128 k1  xla 0.09 ms   pallasdb 0.43 ms  (0.22x)

Double buffering did its job — 1.56x over the round-1 synchronous kernel
on the one shape both compile (1.051 → 0.674 ms) — but XLA still wins
everywhere.  Root cause (isolated probe, /tmp-style microkernel over
[4864,128]x[4864,64]): skinny GEMMs with M,N ≤ 128 run at ~9 TFLOP/s on
the MXU *regardless of contraction order* (dim-0 contraction and a
pre-transposed native matmul time identically), and XLA's backward-filter
conv sits at the same ~10 TFLOP/s wall while additionally fusing with
neighboring ops in the full step.  There is no headroom for a hand kernel
in this regime; the wgrad bucket's cost is intrinsic to the shapes.
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


def _pick_rows(h: int, wp: int, ci: int, itemsize: int = 2,
               budget: int = 6 << 20) -> int:
    """Largest divisor of h whose double buffer fits the VMEM budget —
    fewer, bigger grid steps amortize the per-step overhead (~2 µs each:
    304 steps cost ~0.6 ms, the measured floor of the first version)."""
    best = 1
    for rows in range(1, h + 1):
        if h % rows:
            continue
        if 2 * (rows + 2) * wp * ci * itemsize <= budget:
            best = rows
    return best


def _wgrad_db_kernel(x_hbm, g_ref, out_ref, xbuf, sems, *, k, rows, ow, ci):
    b = pl.program_id(0)
    r = pl.program_id(1)
    n_b = pl.num_programs(0)
    n_r = pl.num_programs(1)
    step = b * n_r + r
    total = n_b * n_r
    slot = jax.lax.rem(step, 2)
    nslot = jax.lax.rem(step + 1, 2)

    def dma(dst_slot, bb, rr):
        return pltpu.make_async_copy(
            x_hbm.at[bb, pl.ds(rr * rows, rows + k - 1)],
            xbuf.at[dst_slot], sems.at[dst_slot])

    @pl.when(step == 0)
    def _warmup():
        dma(slot, b, r).start()

    @pl.when(step + 1 < total)
    def _prefetch():
        nxt = step + 1
        dma(nslot, nxt // n_r, jax.lax.rem(nxt, n_r)).start()

    dma(slot, b, r).wait()

    xv = xbuf[slot]                   # [rows+k-1, wp_pad, ci] bf16
    g2 = g_ref[0].reshape(rows * ow, g_ref.shape[-1])

    for u in range(k):
        for v in range(k):
            tap = jax.lax.slice(xv, (u, v, 0), (u + rows, v + ow, ci))
            p2 = tap.reshape(rows * ow, ci)
            acc = jax.lax.dot_general(
                p2, g2, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            t = u * k + v

            @pl.when(step == 0)
            def _init(t=t, acc=acc):
                out_ref[t] = acc

            @pl.when(step > 0)
            def _accum(t=t, acc=acc):
                out_ref[t] = out_ref[t] + acc


def wgrad_db(xp: Array, g: Array, k: int, interpret=None) -> Array:
    """dW for a stride-1 dense conv from pre-padded input (double-buffered).

    xp: [B, H + k−1, W + k−1, Ci] (already zero-padded by (k−1)/2 per side)
    g:  [B, H, W, Co] cotangent
    → [k, k, Ci, Co] f32
    """
    if interpret is None:
        interpret = interpret_default()
    b, hp, wp, ci = xp.shape
    _, h, w, co = g.shape
    assert hp == h + k - 1 and wp == w + k - 1

    # Mosaic alignment for the manual-DMA memref slice: the lane dim (ci)
    # must be a multiple of 128 and the sublane dim (width) a multiple of 8
    # ("Slice shape along dimension 3 must be aligned to tiling (128)").
    # Zero-pad; the pad channels contribute exact zero rows to dW, sliced
    # off at the end, and pad columns are never read (taps stop at v+ow).
    ci_pad = ((ci + 127) // 128) * 128
    wp_pad = ((wp + 7) // 8) * 8
    if ci_pad != ci or wp_pad != wp:
        xp = jnp.pad(xp, ((0, 0), (0, 0), (0, wp_pad - wp),
                          (0, ci_pad - ci)))
    rows = _pick_rows(h, wp_pad, ci_pad, itemsize=xp.dtype.itemsize)

    out = pl.pallas_call(
        functools.partial(_wgrad_db_kernel, k=k, rows=rows, ow=w, ci=ci_pad),
        grid=(b, h // rows),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),  # xp in HBM; manual DMA
            pl.BlockSpec((1, rows, w, co), lambda i, j: (i, j, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((k * k, ci_pad, co), lambda i, j: (0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((k * k, ci_pad, co), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((2, rows + k - 1, wp_pad, ci_pad), xp.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * b * h * w * k * k * ci_pad * co,
            bytes_accessed=xp.size * xp.dtype.itemsize
            + g.size * g.dtype.itemsize + 4 * k * k * ci_pad * co,
            transcendentals=0,
        ),
        interpret=interpret,
    )(xp, g)
    return out.reshape(k, k, ci_pad, co)[:, :, :ci, :]


# ----------------------------------------------------------------------
# custom-vjp conv wrapper: XLA forward + XLA dX + double-buffered Pallas dW


# shared custom-vjp algebra (kernels/_util.make_conv2d_with_wgrad); only
# the backward-filter kernel differs from conv2d_lowch
conv2d_db = make_conv2d_with_wgrad(
    wgrad_db,
    "Dense stride-1 'same' conv whose dW uses the double-buffered kernel.")
