"""Space-to-depth stem rewrite (TPU MXU optimization).

The first two convolutions of YOLOv4-family models run at full input
resolution with 3→32→64 channels — the MXU's 128-wide systolic array is
>90% idle there, and profiling shows them costing ~40% of the whole forward
pass.  This module rewrites the stem pair

    conv(k=3, s=1, 3→C0) → BN → act → conv(k=3, s=2, C0→C1) → BN → act

into two half-resolution convolutions over a space-to-depth (2×2 → channel)
input layout:

    SPD(x): [B, H, W, 3] → [B, H/2, W/2, 12]
    conv(k=3, 12→4·C0)  — output channels are the 4 phases of the original y
    BN (phase-grouped) → act
    conv(k=3, 4·C0→C1) — phase selection folds the stride-2 sampling
    BN → act → [B, H/2, W/2, C1]   (exactly layer1's output)

The transformed weights are scattered from the original kernels inside the
traced function, so checkpoints/weights files keep the canonical layout and
the rewrite is a pure execution-plan change.  The result is mathematically
exact: phase-grouped BN combines batch statistics across the 4 phases of
each original channel, reproducing full-resolution statistics.

Channel order convention: SPD channel index = (dy·2 + dx)·C + c, matching
``space_to_depth``'s reshape.
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp

from .. import activations
from ..config import newslab as cfg
from .conv import conv2d_apply
from .norm import DEFAULT_EPS, DEFAULT_MOMENTUM

Array = jax.Array


def space_to_depth(x: Array, block: int = 2) -> Array:
    """[B, H, W, C] → [B, H/b, W/b, b·b·C], channel index (dy, dx, c)."""
    b, h, w, c = x.shape
    x = x.reshape(b, h // block, block, w // block, block, c)
    x = jnp.transpose(x, (0, 1, 3, 2, 4, 5))
    return x.reshape(b, h // block, w // block, block * block * c)


def depth_to_space(x: Array, block: int = 2) -> Array:
    """Inverse of :func:`space_to_depth`: [B, H, W, b·b·C] → [B, bH, bW, C]."""
    b, h, w, c4 = x.shape
    c = c4 // (block * block)
    x = x.reshape(b, h, w, block, block, c)
    x = jnp.transpose(x, (0, 1, 3, 2, 4, 5))
    return x.reshape(b, h * block, w * block, c)


def build_spd_s1_weights(w: Array) -> Array:
    """[3, 3, C, C'] (k3 s1) → [3, 3, 4C, 4C']: the stride-1 3×3 conv
    expressed over SPD cells.

    Derivation: y[2i+a, 2j+b] = Σ_uv w[u,v]·x[2i+a+u−1, 2j+b+v−1]; writing
    the row as 2(i+di)+dy gives di = ⌊(a+u−1)/2⌋, dy = (a+u−1) mod 2, so
    W'[di+1, dj+1, (dy,dx,·), (a,b,·)] = w[u, v] — a 3×3 conv over SPD
    cells."""
    k, _, c_in, c0 = w.shape
    assert k == 3
    wp = jnp.zeros((3, 3, 4 * c_in, 4 * c0), w.dtype)
    for a in range(2):
        for b in range(2):
            for u in range(3):
                for v in range(3):
                    ry, rx = a + u - 1, b + v - 1
                    di, dy = ry // 2, ry % 2
                    dj, dx = rx // 2, rx % 2
                    wp = wp.at[
                        di + 1, dj + 1,
                        (dy * 2 + dx) * c_in:(dy * 2 + dx + 1) * c_in,
                        (a * 2 + b) * c0:(a * 2 + b + 1) * c0,
                    ].set(w[u, v])
    return wp


def build_spd_1x1_weights(w: Array) -> Array:
    """[1, 1, C, C'] → [1, 1, 4C, 4C'] block-diagonal over SPD phases (a
    pointwise conv touches no neighbors, so each phase maps to itself)."""
    _, _, c, co = w.shape
    wp = jnp.zeros((1, 1, 4 * c, 4 * co), w.dtype)
    for ph in range(4):
        wp = wp.at[0, 0, ph * c:(ph + 1) * c, ph * co:(ph + 1) * co].set(
            w[0, 0])
    return wp


def build_spd_stem_weights(w0: Array, w1: Array) -> Tuple[Array, Array]:
    """Transform the two stem kernels into the SPD domain.

    w0: [3, 3, C_in, C0] (k3 s1) → W0': [3, 3, 4·C_in, 4·C0]
    w1: [3, 3, C0, C1]   (k3 s2) → W1': [3, 3, 4·C0, C1]

    W0' is the generic stride-1 SPD transform (build_spd_s1_weights);
    layer1's stride-2 sampling is its (a,b) = (0,0) output case.
    """
    k, _, c_in, c0 = w0.shape
    _, _, _, c1 = w1.shape
    assert k == 3 and w1.shape[0] == 3

    w0p = build_spd_s1_weights(w0)

    w1p = jnp.zeros((3, 3, 4 * c0, c1), w1.dtype)
    for u in range(3):
        for v in range(3):
            ry, rx = u - 1, v - 1
            di, dy = ry // 2, ry % 2
            dj, dx = rx // 2, rx % 2
            w1p = w1p.at[
                di + 1, dj + 1,
                (dy * 2 + dx) * c0:(dy * 2 + dx + 1) * c0,
                :,
            ].set(w1[u, v])
    return w0p, w1p


def phase_grouped_bn(
    params: Dict[str, Array],
    state: Dict[str, Array],
    x: Array,
    train: bool,
    eps: float = DEFAULT_EPS,
    momentum: float = DEFAULT_MOMENTUM,
    phases: int = 4,
) -> Tuple[Array, Dict[str, Array]]:
    """BN over packed phases: x has ``phases``·C channels in (phase, c)
    order; params and state are per original channel [C].  Batch statistics
    are combined across the phases, exactly reproducing the canonical BN.
    Used by both the space-to-depth stem and W-fold regions
    (ops/fold_region.py)."""
    c4 = x.shape[-1]
    c = c4 // phases

    if train:
        x32 = x.astype(jnp.float32)
        # per (phase, c) moments, then combine phases (equal counts)
        mean_pc = jnp.mean(x32, axis=(0, 1, 2)).reshape(phases, c)
        sq_pc = jnp.mean(jnp.square(x32), axis=(0, 1, 2)).reshape(phases, c)
        mean = jnp.mean(mean_pc, axis=0)
        var = jnp.mean(sq_pc, axis=0) - jnp.square(mean)
        var = jnp.maximum(var, 0.0)
        n = x.size // c  # full-resolution element count per channel
        unbiased = var * (n / max(n - 1, 1))
        new_state = {
            "mean": (1.0 - momentum) * state["mean"] + momentum * mean,
            "var": (1.0 - momentum) * state["var"] + momentum * unbiased,
        }
    else:
        new_state = state
        mean, var = state["mean"], state["var"]

    inv = jax.lax.rsqrt(var + eps)
    scale = params.get("scale")
    bias = params.get("bias")
    if scale is not None:
        inv = inv * scale
    shift = -mean * inv + (bias if bias is not None else 0.0)
    inv4 = jnp.tile(inv, phases)
    shift4 = jnp.tile(shift, phases)
    return x * inv4.astype(x.dtype) + shift4.astype(x.dtype), new_state


def spd_stem_apply(
    params0: Dict[str, Any],
    state0: Dict[str, Any],
    layer0: cfg.ConvBn2D,
    params1: Dict[str, Any],
    state1: Dict[str, Any],
    layer1: cfg.ConvBn2D,
    x: Array,
    train: bool,
) -> Tuple[Array, Dict[str, Any], Dict[str, Any]]:
    """Run the rewritten stem; returns (layer1 output, new_state0, new_state1)."""
    w0p, w1p = build_spd_stem_weights(params0["w"], params1["w"])

    h = space_to_depth(x, 2)
    h = conv2d_apply(h, w0p, padding=1)
    if "b" in params0:
        h = h + jnp.tile(params0["b"], 4).astype(h.dtype)
    new_state0 = state0
    if layer0.bn.enabled:
        out_bn, bn_s = phase_grouped_bn(params0["bn"], state0["bn"], h, train)
        h = out_bn
        new_state0 = {**state0, "bn": bn_s}
    h = activations.apply(layer0.act, h)

    h = conv2d_apply(h, w1p, padding=1)
    if "b" in params1:
        h = h + params1["b"].astype(h.dtype)
    new_state1 = state1
    if layer1.bn.enabled:
        from .norm import batch_norm_apply

        h, bn_s = batch_norm_apply(params1["bn"], state1["bn"], h, train)
        new_state1 = {**state1, "bn": bn_s}
    h = activations.apply(layer1.act, h)
    return h, new_state0, new_state1


def _packed_conv_bn_act(params, state, layer, wp, x, train):
    """One packed conv → (tiled bias) → phase-grouped BN → act."""
    pad = (wp.shape[0] - 1) // 2
    h = conv2d_apply(x, wp, padding=pad)
    if "b" in params:
        h = h + jnp.tile(params["b"], 4).astype(h.dtype)
    new_state = state
    if layer.bn.enabled:
        h, bn_s = phase_grouped_bn(params["bn"], state["bn"], h, train)
        new_state = {**state, "bn": bn_s}
    h = activations.apply(layer.act, h)
    return h, new_state


def spd_res_block_apply(
    params2: Dict[str, Any],
    state2: Dict[str, Any],
    layer2: cfg.ConvBn2D,
    params3: Dict[str, Any],
    state3: Dict[str, Any],
    layer3: cfg.ConvBn2D,
    shortcut_act: str,
    y1: Array,
    train: bool,
) -> Tuple[Array, Dict[str, Any], Dict[str, Any]]:
    """Stage-1 residual pair executed in the SPD (2×2 → channel) domain.

    The CSP-family stage-1 chain  conv(1×1, s1) → conv(3×3, s1) →
    shortcut(+input)  runs at half-input resolution with ≤64 channels —
    3–40% MXU efficiency (scripts/conv_roofline.py; the 128-lane dimension
    is padded 2–4×).  Packing 2×2 spatial phases into channels makes both
    convs dense 4C-wide programs: 4× the nominal FLOPs, but at near-full
    lane utilization the isolated 1×1 measured 3.79 → 0.73 ms fwd+bwd
    ([16,304,304,64]→32, scripts/exp_lowchannel.py E1).  Unlike the closed
    2-D-SPD/W-fold experiments (negative ledger), this region adds only
    one pack and one unpack on the region boundary — the stride-2
    absorption and fold boundaries that ate those wins are not involved.

    Exact rewrite: packed convs are the same linear maps (weights
    scattered at trace time from the canonical layout), BN is phase-
    grouped (full-resolution statistics), the shortcut add and activations
    are elementwise in either layout.

    Returns (shortcut output, new_state2, new_state3).
    """
    w2p = build_spd_1x1_weights(params2["w"])
    w3p = build_spd_s1_weights(params3["w"])

    y1p = space_to_depth(y1, 2)
    h, new_state2 = _packed_conv_bn_act(params2, state2, layer2, w2p, y1p, train)
    h, new_state3 = _packed_conv_bn_act(params3, state3, layer3, w3p, h, train)
    out = activations.apply(shortcut_act, h + y1p)
    return depth_to_space(out, 2), new_state2, new_state3


def res_block_is_eligible(layer2: cfg.ModuleCfg, layer3: cfg.ModuleCfg) -> bool:
    """conv(1×1,s1) → conv(3×3,s1), conv→BN→act order, no dilation/groups —
    the stage-1 residual pair the SPD region rewrite covers."""
    return (
        isinstance(layer2, cfg.ConvBn2D)
        and isinstance(layer3, cfg.ConvBn2D)
        and layer2.order == "bn_act"
        and layer3.order == "bn_act"
        and layer2.k == 1 and layer2.s == 1 and layer2.padding == 0
        and layer3.k == 3 and layer3.s == 1 and layer3.padding == 1
        and layer2.d == layer3.d == 1
        and layer2.g == layer3.g == 1
    )


def stem_is_eligible(layer0: cfg.ModuleCfg, layer1: cfg.ModuleCfg) -> bool:
    """The rewrite applies to the darknet conv(k3,s1)→conv(k3,s2) stem with
    conv→BN→act order and no dilation/groups."""
    return (
        isinstance(layer0, cfg.ConvBn2D)
        and isinstance(layer1, cfg.ConvBn2D)
        and layer0.order == "bn_act"
        and layer1.order == "bn_act"
        and layer0.k == 3 and layer0.s == 1 and layer0.padding == 1
        and layer1.k == 3 and layer1.s == 2 and layer1.padding == 1
        and layer0.d == layer1.d == 1
        and layer0.g == layer1.g == 1
    )
