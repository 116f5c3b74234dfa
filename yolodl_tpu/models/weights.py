"""AlexeyAB darknet ``.weights`` binary loader/saver.

The reference *lost* this capability (its darknet→trainable path is
``todo!()``, train/src/model.rs:31-33; the old loader was removed from
darknet-config — SURVEY §2.3).  Re-implemented here from the darknet binary
layout so cfg+weights pairs run end-to-end:

    header:  int32 major, int32 minor, int32 revision,
             seen = uint64 if major*10+minor >= 2 else uint32
    per [convolutional] (in cfg order):
             if batch_normalize: beta[f], gamma[f], mean[f], var[f]
             else:               bias[f]
             conv weights f32[f, in/g, k, k]   (OIHW)
    per [connected]: bias[out], weights[out*in]

Conv kernels are transposed OIHW→HWIO into the NHWC/HWIO param layout used
on TPU.  ``save_darknet_weights`` writes the inverse for round-trip tests
and darknet-C parity harnesses.
"""

from __future__ import annotations

import struct
from typing import Any, Dict, Tuple

import numpy as np

from ..config import darknet_cfg as dk


class WeightsReader:
    def __init__(self, data: bytes):
        self.data = data
        self.off = 0

    def ints(self, n: int, size: int = 4) -> Tuple[int, ...]:
        fmt = "<" + ("i" if size == 4 else "q") * n
        out = struct.unpack_from(fmt, self.data, self.off)
        self.off += size * n
        return out

    def floats(self, n: int) -> np.ndarray:
        out = np.frombuffer(self.data, dtype="<f4", count=n, offset=self.off).copy()
        self.off += 4 * n
        return out

    @property
    def remaining(self) -> int:
        return len(self.data) - self.off


def load_darknet_weights(
    darknet: dk.Darknet, path, strict: bool = True
) -> Tuple[Dict[str, Any], Dict[str, Any], int]:
    """Read a .weights file → (params, state, seen) keyed "layer{i}".

    params/state match the builder's tree for a graph from
    :func:`yolodl_tpu.graph.from_darknet.graph_from_darknet`.
    """
    with open(path, "rb") as f:
        reader = WeightsReader(f.read())

    major, minor, _rev = reader.ints(3)
    if major * 10 + minor >= 2:
        (seen,) = reader.ints(1, size=8)
    else:
        (seen,) = reader.ints(1)

    shapes = darknet.output_shapes()
    params: Dict[str, Any] = {}
    state: Dict[str, Any] = {}

    for i, layer in enumerate(darknet.layers):
        if isinstance(layer, dk.Connected):
            # darknet connected: bias[out], weights[out, in] row-major
            prev = darknet.net.input_shape_hwc if i == 0 else shapes[i - 1]
            in_f = prev[0] * prev[1] * prev[2]
            out_f = layer.output
            b = reader.floats(out_f)
            w = reader.floats(out_f * in_f).reshape(out_f, in_f)
            params[f"layer{i}"] = {"w": np.ascontiguousarray(w.T), "b": b}
            continue
        if not isinstance(layer, dk.Convolutional):
            continue
        if layer.share_index is not None:
            continue  # shared weights: resolved at build time
        in_c = (darknet.net.channels if i == 0 else shapes[i - 1][2]) // layer.groups
        f, k = layer.filters, layer.size

        p: Dict[str, Any] = {}
        if layer.batch_normalize:
            beta = reader.floats(f)
            gamma = reader.floats(f)
            mean = reader.floats(f)
            var = reader.floats(f)
            p["bn"] = {"scale": gamma, "bias": beta}
            state[f"layer{i}"] = {"bn": {"mean": mean, "var": var}}
        else:
            p["b"] = reader.floats(f)
        w = reader.floats(f * in_c * k * k).reshape(f, in_c, k, k)  # OIHW
        p["w"] = np.ascontiguousarray(w.transpose(2, 3, 1, 0))  # HWIO
        params[f"layer{i}"] = p

    if strict and reader.remaining != 0:
        raise ValueError(
            f"{reader.remaining} bytes left after loading weights — cfg/weights mismatch"
        )
    return params, state, seen


def save_darknet_weights(
    darknet: dk.Darknet,
    params: Dict[str, Any],
    state: Dict[str, Any],
    path,
    seen: int = 0,
) -> None:
    """Write params back to the darknet binary layout (round-trip/testing)."""
    chunks = [struct.pack("<iii", 0, 2, 0), struct.pack("<q", seen)]
    for i, layer in enumerate(darknet.layers):
        if isinstance(layer, dk.Connected):
            p = params[f"layer{i}"]
            chunks.append(np.asarray(p["b"], "<f4").tobytes())
            chunks.append(np.ascontiguousarray(np.asarray(p["w"], "<f4").T).tobytes())
            continue
        if not isinstance(layer, dk.Convolutional) or layer.share_index is not None:
            continue
        p = params[f"layer{i}"]
        if layer.batch_normalize:
            s = state[f"layer{i}"]["bn"]
            for arr in (p["bn"]["bias"], p["bn"]["scale"], s["mean"], s["var"]):
                chunks.append(np.asarray(arr, "<f4").tobytes())
        else:
            chunks.append(np.asarray(p["b"], "<f4").tobytes())
        w = np.asarray(p["w"], "<f4").transpose(3, 2, 0, 1)  # HWIO → OIHW
        chunks.append(np.ascontiguousarray(w).tobytes())
    with open(path, "wb") as f:
        f.write(b"".join(chunks))


def merge_into_model_tree(
    loaded_params: Dict[str, Any],
    loaded_state: Dict[str, Any],
    init_params: Dict[str, Any],
    init_state: Dict[str, Any],
) -> Tuple[Dict[str, Any], Dict[str, Any]]:
    """Overlay loaded darknet tensors onto a freshly-initialized tree,
    validating shapes (a partial-load helper like VarStore::load_partial)."""
    import jax.numpy as jnp

    params = dict(init_params)
    state = dict(init_state)
    for name, p in loaded_params.items():
        if name not in params:
            raise KeyError(f"weights for unknown node {name!r}")
        ref = params[name]
        merged = {}
        for k, v in p.items():
            if k == "bn":
                merged["bn"] = {kk: jnp.asarray(vv) for kk, vv in v.items()}
            else:
                merged[k] = jnp.asarray(v)
            expect = ref.get(k)
            if expect is not None and not isinstance(v, dict):
                if tuple(expect.shape) != tuple(np.shape(v)):
                    raise ValueError(
                        f"{name}.{k}: shape {np.shape(v)} != expected {tuple(expect.shape)}"
                    )
        params[name] = {**ref, **merged}
    for name, s in loaded_state.items():
        ref = state.get(name, {})
        state[name] = {
            **ref,
            "bn": {kk: jnp.asarray(vv) for kk, vv in s["bn"].items()},
        }
    return params, state
