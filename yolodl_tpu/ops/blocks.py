"""Composite CSP blocks: DarkCsp2D and SppCsp2D.

Equivalent capability to ``tch-modules/src/{dark_csp_2d,spp_csp_2d}.rs``:

- DarkCsp2D (dark_csp_2d.rs:17-120): skip 1×1 ‖ (1×1 → repeat×[1×1, 3×3
  (+residual)] → 1×1), channel-concat, merge 1×1.  mid_c = floor(in_c·c_mul).
- SppCsp2D (spp_csp_2d.rs:16-140): 1×1 reduce, skip 1×1 ‖ (1×1→3×3→1×1 →
  **sum** of parallel max-pools over kernel set k (not concat!,
  spp_csp_2d.rs:121-132) → 1×1→3×3), concat, 1×1 out.

Every sub-conv is a ConvBn2D with the block's `bn` config and default Mish.
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import jax

from ..config import newslab as cfg
from .conv import conv_bn_apply, conv_bn_init
from .simple import concat2d, max_pool2d

Array = jax.Array


def _sub(c: int, k: int, bn: cfg.BatchNormConfig) -> cfg.ConvBn2D:
    return cfg.ConvBn2D(c=c, k=k, bn=bn)


def dark_csp_init(key: jax.Array, layer: cfg.DarkCsp2D, in_c: int):
    mid_c = int(in_c * layer.c_mul)
    keys = jax.random.split(key, 4 + 2 * layer.repeat)
    params: Dict[str, Any] = {}
    state: Dict[str, Any] = {}

    def make(name, k_key, in_ch, out_ch, ksize):
        p, s = conv_bn_init(k_key, _sub(out_ch, ksize, layer.bn), in_ch)
        params[name] = p
        if s:
            state[name] = s

    make("skip_conv", keys[0], in_c, mid_c, 1)
    make("merge_conv", keys[1], mid_c * 2, layer.c, 1)
    make("before_repeat_conv", keys[2], in_c, mid_c, 1)
    make("after_repeat_conv", keys[3], mid_c, mid_c, 1)
    for i in range(layer.repeat):
        make(f"repeat_{i}_first", keys[4 + 2 * i], mid_c, mid_c, 1)
        make(f"repeat_{i}_second", keys[5 + 2 * i], mid_c, mid_c, 3)
    return params, state


def dark_csp_apply(
    params: Dict[str, Any],
    state: Dict[str, Any],
    x: Array,
    layer: cfg.DarkCsp2D,
    in_c: int,
    train: bool,
) -> Tuple[Array, Dict[str, Any]]:
    mid_c = int(in_c * layer.c_mul)
    new_state: Dict[str, Any] = dict(state)

    def run(name, inp, sub_cfg):
        out, s = conv_bn_apply(params[name], state.get(name, {}), inp, sub_cfg, train)
        if s:
            new_state[name] = s
        return out

    skip = run("skip_conv", x, _sub(mid_c, 1, layer.bn))
    h = run("before_repeat_conv", x, _sub(mid_c, 1, layer.bn))
    for i in range(layer.repeat):
        y = run(f"repeat_{i}_first", h, _sub(mid_c, 1, layer.bn))
        y = run(f"repeat_{i}_second", y, _sub(mid_c, 3, layer.bn))
        h = h + y if layer.shortcut else y
    h = run("after_repeat_conv", h, _sub(mid_c, 1, layer.bn))
    merged = concat2d([skip, h])
    out = run("merge_conv", merged, _sub(layer.c, 1, layer.bn))
    return out, new_state


_SPP_CONVS = (
    # (name, kernel, is_3x3_second)
    ("spp_conv_1", 1),
    ("spp_conv_2", 3),
    ("spp_conv_3", 1),
    ("spp_conv_4", 1),
    ("spp_conv_5", 3),
)


def spp_csp_init(key: jax.Array, layer: cfg.SppCsp2D, in_c: int):
    mid_c = int(in_c * layer.c_mul)
    keys = jax.random.split(key, 8)
    params: Dict[str, Any] = {}
    state: Dict[str, Any] = {}

    def make(name, k_key, in_ch, out_ch, ksize):
        p, s = conv_bn_init(k_key, _sub(out_ch, ksize, layer.bn), in_ch)
        params[name] = p
        if s:
            state[name] = s

    make("first_conv", keys[0], in_c, mid_c, 1)
    make("last_conv", keys[1], mid_c * 2, layer.c, 1)
    make("skip_conv", keys[2], mid_c, mid_c, 1)
    for i, (name, ksize) in enumerate(_SPP_CONVS):
        make(name, keys[3 + i], mid_c, mid_c, ksize)
    return params, state


def spp_csp_apply(
    params: Dict[str, Any],
    state: Dict[str, Any],
    x: Array,
    layer: cfg.SppCsp2D,
    in_c: int,
    train: bool,
) -> Tuple[Array, Dict[str, Any]]:
    mid_c = int(in_c * layer.c_mul)
    new_state: Dict[str, Any] = dict(state)

    def run(name, inp, ksize, out_ch=None):
        sub_cfg = _sub(out_ch if out_ch is not None else mid_c, ksize, layer.bn)
        out, s = conv_bn_apply(params[name], state.get(name, {}), inp, sub_cfg, train)
        if s:
            new_state[name] = s
        return out

    first = run("first_conv", x, 1)
    skip = run("skip_conv", first, 1)

    h = run("spp_conv_1", first, 1)
    h = run("spp_conv_2", h, 3)
    h = run("spp_conv_3", h, 1)
    # parallel max-pools over k, summed (spp_csp_2d.rs:121-132)
    pooled = None
    for k in layer.k:
        p = max_pool2d(h, size=k, stride_y=1, stride_x=1, padding=k // 2)
        pooled = p if pooled is None else pooled + p
    h = run("spp_conv_4", pooled, 1)
    h = run("spp_conv_5", h, 3)

    merged = concat2d([skip, h])
    out = run("last_conv", merged, 1, out_ch=layer.c)
    return out, new_state
