"""AOT deployment artifacts via ``jax.export`` (StableHLO).

A deployment problem the reference cannot solve: its models exist only as
a live libtorch module graph — serving requires the whole Rust stack.
Here the jitted inference function (weights baked in as constants) is
serialized to a **portable StableHLO artifact** that any JAX runtime can
deserialize and run with zero model-building code, plus a ``meta.json``
carrying the static head layout needed to reconstruct a
:class:`~yolodl_tpu.ops.detect.MergedDetection` for NMS.

Artifact layout (a directory):

    model.stablehlo   — serialized jax.export artifact (cpu+tpu lowerings)
    meta.json         — input shape/dtype, class count, per-head
                        DetectionInfo fields, format version

Produced by ``yolo-tool export`` and consumed by :func:`load_exported`.
"""

from __future__ import annotations

import dataclasses
import json
import os
from typing import Callable, Tuple

import jax
import jax.numpy as jnp

from ..ops.detect import DetectionInfo, MergedDetection

_FORMAT_VERSION = 1


def export_inference(
    model,
    params,
    state,
    path: str,
    batch_size: int = 1,
    image_size: int = 0,
    dtype: str = "float32",
    data_format: str = "NCHW",
    serving: bool = False,
) -> str:
    """Serialize ``model.apply(params, state, ·, train=False)`` to ``path``.

    Weights are baked into the program as constants: the artifact is the
    whole deployable model.  Lowering targets both cpu and tpu so the same
    file serves local smoke tests and fleet deployment.

    ``serving=True`` produces a *serving* artifact matching the
    :class:`~yolodl_tpu.serve.DetectionService` ingest exactly: input is
    ``[B, S, S, 3] uint8`` NHWC (pixels stay uint8 over the host→device
    wire) with the bf16/255 normalization baked into the program.
    """
    from jax import export as jax_export

    if not image_size:
        raise ValueError("image_size is required (e.g. the cfg net height)")
    if serving:
        data_format = "NHWC"
        in_shape = (batch_size, image_size, image_size, 3)
        in_dtype = jnp.dtype(jnp.uint8)
    elif data_format == "NCHW":
        in_shape = (batch_size, 3, image_size, image_size)
        in_dtype = jnp.dtype(dtype)
    elif data_format == "NHWC":
        in_shape = (batch_size, image_size, image_size, 3)
        in_dtype = jnp.dtype(dtype)
    else:
        raise ValueError(f"unknown data_format {data_format!r}")

    def apply_fn(p, s, images):
        if serving:  # the service's on-device normalize, baked in
            images = images.astype(jnp.bfloat16) / jnp.bfloat16(255.0)
        return model.apply(p, s, images, train=False,
                           data_format=data_format)

    # infos / class count / head layout are STATIC pytree aux data — capture
    # them during the (single) export trace instead of paying a second
    # full abstract trace of the model just to read them
    static = {}

    def fn(images):
        pred, _ = apply_fn(params, state, images)
        static["infos"] = pred.infos
        static["num_classes"] = pred.class_logit.shape[-1]
        static["has_uncertainty"] = pred.uncertainty is not None
        outs = (pred.cycxhw, pred.obj_logit, pred.class_logit)
        if pred.uncertainty is not None:
            outs = outs + (pred.uncertainty,)
        return outs

    exp = jax_export.export(
        jax.jit(fn), platforms=("cpu", "tpu"))(
        jax.ShapeDtypeStruct(in_shape, in_dtype))
    infos = static["infos"]

    os.makedirs(path, exist_ok=True)
    with open(os.path.join(path, "model.stablehlo"), "wb") as f:
        f.write(exp.serialize())
    meta = {
        "format_version": _FORMAT_VERSION,
        "input_shape": list(in_shape),
        "input_dtype": str(in_dtype),
        "data_format": data_format,
        "serving": serving,
        "num_classes": static["num_classes"],
        "has_uncertainty": static["has_uncertainty"],
        "infos": [dataclasses.asdict(i) for i in infos],
    }
    with open(os.path.join(path, "meta.json"), "w") as f:
        json.dump(meta, f, indent=1)
    return path


def load_exported(path: str) -> Tuple[Callable, dict]:
    """Load an exported artifact: (infer, meta).

    ``infer(images) -> MergedDetection`` — feed the result straight to
    ``non_max_suppression`` / ``yolo_inference`` like a live model's output.
    """
    from jax import export as jax_export

    with open(os.path.join(path, "model.stablehlo"), "rb") as f:
        exp = jax_export.deserialize(f.read())
    with open(os.path.join(path, "meta.json")) as f:
        meta = json.load(f)
    if meta.get("format_version") != _FORMAT_VERSION:
        raise ValueError(
            f"{path}: artifact format {meta.get('format_version')} != "
            f"supported {_FORMAT_VERSION}")
    infos = tuple(
        DetectionInfo(
            feature_h=i["feature_h"], feature_w=i["feature_w"],
            anchors=tuple(tuple(a) for a in i["anchors"]),
            flat_begin=i["flat_begin"], flat_end=i["flat_end"],
            class_act=i.get("class_act", "sigmoid"),
        )
        for i in meta["infos"]
    )

    call = jax.jit(exp.call)

    def infer(images) -> MergedDetection:
        outs = call(images)
        uncertainty = outs[3] if meta["has_uncertainty"] else None
        return MergedDetection(
            cycxhw=outs[0], obj_logit=outs[1], class_logit=outs[2],
            infos=infos, uncertainty=uncertainty)

    return infer, meta
