"""BN-folding export: produce a BN-free darknet cfg+weights pair.

The reference exposes BN folding as ``denormalize`` on the live module tree
(tch-modules/src/dark_batch_norm.rs:174+, module.rs:233-275) but has no
export path.  Here the fold goes all the way to the deployment artifact: a
new ``.cfg`` with ``batch_normalize`` stripped and a ``.weights`` file whose
conv kernels/biases absorb the running statistics, loadable by darknet-C
and by this framework alike.

Valid only for darknet's conv→BN→activation order, which every
``[convolutional]`` section uses (our NEWSLAB path keeps the reference's
conv→act→BN quirk, conv_bn_2d.rs:88-101, where folding into the conv is
impossible).  BN inside [crnn] sub-convs and [connected] layers is left
in place — darknet stores those stats inline and folding them buys nothing
at the deployment batch sizes.  On TPU the fold is a file-level
convenience, not a speed lever: XLA already fuses the per-channel affine
into the conv epilogue (see docs/performance.md), so folded and unfolded
models run at the same speed — the win is a smaller artifact and
compatibility with BN-less consumers.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Tuple

import numpy as np

from ..config import darknet_cfg as dk
from ..ops.norm import DEFAULT_EPS


def fold_conv_bn_arrays(
    w: np.ndarray,
    scale: np.ndarray,
    bias: np.ndarray,
    mean: np.ndarray,
    var: np.ndarray,
    eps: float = DEFAULT_EPS,
) -> Tuple[np.ndarray, np.ndarray]:
    """Numpy mirror of :func:`yolodl_tpu.ops.fold_batch_norm` (kept in sync
    by a unit test): conv(x, fw) + fb == bn(conv(x, w)) in eval mode.
    ``w`` is HWIO; the fold broadcasts over the output-channel (last) axis.
    """
    w = np.asarray(w, np.float64)
    inv = np.asarray(scale, np.float64) / np.sqrt(
        np.asarray(var, np.float64) + eps
    )
    fw = w * inv
    fb = np.asarray(bias, np.float64) - np.asarray(mean, np.float64) * inv
    return fw.astype(np.float32), fb.astype(np.float32)


def _share_sources(darknet: dk.Darknet) -> set:
    """Absolute indices of layers whose weights another conv shares."""
    out = set()
    for i, layer in enumerate(darknet.layers):
        if isinstance(layer, dk.Convolutional) and layer.share_index is not None:
            try:
                out.add(dk.resolve_index(layer.share_index, i))
            except ValueError:
                pass  # out-of-range reference: the graph build rejects it
    return out


def fold_darknet(
    darknet: dk.Darknet,
    params: Dict[str, Any],
    state: Dict[str, Any],
    eps: float = DEFAULT_EPS,
) -> Tuple[dk.Darknet, Dict[str, Any], Dict[str, Any]]:
    """Fold every plain ``[convolutional]``'s BN into its kernel/bias.

    Returns (cfg', params', state') where cfg' has ``batch_normalize=0`` on
    the folded layers.  Keys follow the darknet graph's ``layer{i}`` naming
    (graph/from_darknet.py).  Shared-weight convs (``share_index``, either
    end) are skipped — folding one alias would corrupt the other.
    """
    shared = _share_sources(darknet)
    new_layers = []
    new_params = dict(params)
    new_state = dict(state)
    for i, layer in enumerate(darknet.layers):
        key = f"layer{i}"
        foldable = (
            isinstance(layer, dk.Convolutional)
            and layer.batch_normalize
            and layer.share_index is None
            and i not in shared
            and key in params
            and "bn" in params[key]
            # params/state skew (e.g. a pruned state tree) skips the layer
            # instead of crashing on the stats lookup below
            and "bn" in state.get(key, {})
        )
        if not foldable:
            new_layers.append(layer)
            continue
        p = params[key]
        bn_s = state[key]["bn"]
        fw, fb = fold_conv_bn_arrays(
            np.asarray(p["w"], np.float32),
            np.asarray(p["bn"]["scale"], np.float32),
            np.asarray(p["bn"].get("bias", np.zeros_like(bn_s["mean"])),
                       np.float32),
            np.asarray(bn_s["mean"], np.float32),
            np.asarray(bn_s["var"], np.float32),
            eps,
        )
        new_params[key] = {"w": fw, "b": fb}
        rest = {k: v for k, v in state[key].items() if k != "bn"}
        if rest:
            new_state[key] = rest
        else:
            del new_state[key]
        new_layers.append(dataclasses.replace(layer, batch_normalize=False))
    return (
        dataclasses.replace(darknet, layers=tuple(new_layers)),
        new_params,
        new_state,
    )


def fold_darknet_files(
    cfg_path,
    weights_path,
    out_cfg_path,
    out_weights_path,
    eps: float = DEFAULT_EPS,
) -> Tuple[int, int]:
    """File-level fold: cfg+weights in, BN-free cfg+weights out.

    Pure host-side numpy — no device, no jit.  Returns
    (n_folded, n_kept_bn) layer counts.
    """
    from .weights import load_darknet_weights, save_darknet_weights

    darknet = dk.Darknet.load(cfg_path)
    params, state, seen = load_darknet_weights(darknet, weights_path)
    folded_cfg, fp, fs = fold_darknet(darknet, params, state, eps)
    n_folded = sum(
        1
        for a, b in zip(darknet.layers, folded_cfg.layers)
        if getattr(a, "batch_normalize", False)
        and not getattr(b, "batch_normalize", True)
    )
    n_kept = sum(
        1
        for lyr in folded_cfg.layers
        if getattr(lyr, "batch_normalize", False)
    )
    with open(out_cfg_path, "w") as f:
        f.write(dk.to_cfg_string(folded_cfg))
    save_darknet_weights(folded_cfg, fp, fs, out_weights_path, seen=seen)
    return n_folded, n_kept
