"""Width-fold execution regions (TPU MXU lane-packing optimization).

Low-channel convolutions waste most of the MXU's 128-wide lanes: a
1×1 64→32 conv pads its contraction dim 2× and its output dim 4×, an
8× efficiency loss on both the forward matmul and the dW backward.
Measured on the chip (scripts/exp_lowchannel.py), the yolov4-csp stage-1
chain (1×1 64→32 → 3×3 32→64 → shortcut at 304²) costs 9.5 ms/step of
the training step; executing it **W-folded** costs 5.7 ms.

The rewrite packs 4 adjacent width positions into channels:

    fold:   [B, H, W, C] → [B, H, W/4, 4·C]      (pure row-major reshape!)
    1×1 conv → block-diagonal 1×1 conv, 4C → 4C'
    3×3 conv → 3×3 conv over folded cells, 4C → 4C' (structured weights:
               output phase b, tap v reads phase (b+v−1) mod 4 of cell
               ⌊(b+v−1)/4⌋ — all taps fall within ±1 folded cell)
    shortcut/sum → elementwise on folded tensors
    unfold: inverse reshape

Unlike 2-D space-to-depth this needs **no transposes** — NHWC keeps W and C
adjacent in memory, so fold/unfold are free-ish reshapes.  Executed FLOPs
are 4× the canonical conv but run at full lane utilization, a net win
whenever the canonical form pads by more than 4× (in_c·out_c ≤ 2048 for
128-lane hardware).  The transform is mathematically exact (zero padding of
the folded conv corresponds exactly to the canonical conv's zero padding);
batch-norm statistics are combined across the 4 phases, reproducing
canonical full-width statistics bit-for-bit up to reassociation.

Weights stay in canonical layout in params/checkpoints — folding happens
inside the traced step, so this is a pure execution-plan change, like the
space-to-depth stem (ops/spd_stem.py) that precedes it in the graph.

**Status: off by default — end-to-end it does NOT pay.**  Inside the full
flagship train step the measured effect is −1 ms (unscanned) / −6 ms
(5-step scan): XLA's layout assignment already mitigates low-channel convs
by putting a *spatial* dim on the 128-lane axis (layouts like
{1,3,2,0} in the step trace), and the fold/unfold reshapes force C-minor
layouts at the region edges, materializing ~5 ms of layout-copy ops
(4× bf16[16,304,304,64] copies) that the isolated comparison doesn't see.
The module is kept as a verified-exact building block (tests/
test_fold_region.py) and a record of the measurement; enable with
``GraphModel(graph, fold_region="on")`` / ``BENCH_FOLD=on``.
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp

from .. import activations
from ..config import newslab as cfg
from .conv import conv2d_apply
from .spd_stem import phase_grouped_bn

Array = jax.Array

FOLD = 4  # lane width 128 / smallest efficient channel count 32

# a conv is worth folding when its canonical padding waste exceeds the 4×
# FLOP cost of folded execution: (128/in_c)·(128/out_c) > 4, i.e.
# in_c·out_c < 4096; at exactly 4096 (64→64) the measured fold is a slight
# loss, so the margin requires a clear 2× predicted win
MAX_CHANNEL_PRODUCT = 2048


def fold_w(x: Array, f: int = FOLD) -> Array:
    """[B, H, W, C] → [B, H, W/f, f·C]; channel index = phase·C + c."""
    b, h, w, c = x.shape
    # row-major [W, C] → [W/f, f·C] keeps (phase, c) adjacency: index
    # (w0·f + p)·C + c maps to folded (w0, p·C + c)
    return x.reshape(b, h, w // f, f * c)


def unfold_w(x: Array, f: int = FOLD) -> Array:
    b, h, wf, cf = x.shape
    return x.reshape(b, h, wf * f, cf // f)


def fold_conv1x1_weights(w: Array, f: int = FOLD) -> Array:
    """[1, 1, C, C'] → [1, 1, f·C, f·C'] block-diagonal over phases."""
    c, co = w.shape[2], w.shape[3]
    out = jnp.zeros((1, 1, f * c, f * co), w.dtype)
    for p in range(f):
        out = out.at[0, 0, p * c:(p + 1) * c, p * co:(p + 1) * co].set(w[0, 0])
    return out


def fold_conv3x3_weights(w: Array, f: int = FOLD) -> Array:
    """[3, 3, C, C'] (s=1, pad=1) → [3, 3, f·C, f·C'] in the folded domain.

    Output phase b at folded cell j is canonical w-position j·f + b; its
    tap v∈{0,1,2} reads canonical position j·f + b + v − 1 = folded cell
    j + ⌊(b+v−1)/f⌋, phase (b+v−1) mod f.  For f ≥ 2 the cell offset is
    in {−1, 0, 1}, so a 3-wide folded kernel holds every tap.
    """
    k = w.shape[0]
    c, co = w.shape[2], w.shape[3]
    out = jnp.zeros((k, 3, f * c, f * co), w.dtype)
    for b in range(f):
        for v in range(3):
            t = b + v - 1
            dj, dx = t // f, t % f
            out = out.at[:, dj + 1, dx * c:(dx + 1) * c,
                         b * co:(b + 1) * co].set(w[:, v])
    return out


def conv_is_foldable(layer: cfg.ModuleCfg, in_c: int) -> bool:
    """Static eligibility: shape-preserving dense conv whose canonical lane
    padding exceeds the folded 4× FLOP cost (measured crossover,
    scripts/exp_lowchannel.py).  min channel 32 so the folded form itself
    runs fully lane-packed (4·32 = 128)."""
    return (
        isinstance(layer, cfg.ConvBn2D)
        and layer.s == 1
        and layer.d == 1
        and layer.g == 1
        and (layer.k, layer.padding) in ((1, 0), (3, 1))
        and min(in_c, layer.c) * FOLD >= 128
        and in_c * layer.c <= MAX_CHANNEL_PRODUCT
    )


def fold_conv_bn_apply(
    params: Dict[str, Any],
    state: Dict[str, Any],
    x: Array,
    layer: cfg.ConvBn2D,
    train: bool,
) -> Tuple[Array, Dict[str, Any]]:
    """conv_bn_apply (ops/conv.py) semantics on W-folded activations."""
    w = params["w"]
    wf = fold_conv1x1_weights(w) if layer.k == 1 else fold_conv3x3_weights(w)
    out = conv2d_apply(x, wf, padding=0 if layer.k == 1 else 1)
    if "b" in params:
        out = out + jnp.tile(params["b"], FOLD).astype(out.dtype)

    new_state = state

    def bn(h):
        out_bn, bn_s = phase_grouped_bn(
            params["bn"], state["bn"], h, train, phases=FOLD)
        return out_bn, {**state, "bn": bn_s}

    if layer.order == "act_bn":
        out = activations.apply(layer.act, out)
        if layer.bn.enabled:
            out, new_state = bn(out)
    elif layer.order == "bn_act":
        if layer.bn.enabled:
            out, new_state = bn(out)
        out = activations.apply(layer.act, out)
    else:  # pragma: no cover
        raise ValueError(f"unknown conv order {layer.order!r}")
    return out, new_state
