"""Post-NMS per-instance class selection.

Equivalent capability to ``yolo-dl/src/loss/inference.rs``: the reference
groups NMS survivors by (batch, instance) on the CPU with a hash map and
keeps the argmax-confidence class per group (inference.rs:50-77).  Here the
group-argmax is a device-side segment max over the flat-instance axis — no
host round-trip, fixed shapes.
"""

from __future__ import annotations

import dataclasses
from typing import List

import jax
import jax.numpy as jnp
import numpy as np

from .nms import NmsOutput

Array = jax.Array


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class YoloInferenceOutput(NmsOutput):
    """Same layout as NmsOutput, but at most one class per (batch, instance)."""


def yolo_inference(nms_out: NmsOutput, num_flats: int) -> YoloInferenceOutput:
    """Keep only the best-confidence class per surviving instance."""

    def per_image(conf: Array, instances: Array, valid: Array) -> Array:
        # segment-max of confidence over instance ids
        masked = jnp.where(valid, conf, -1.0)
        best = jnp.full((num_flats,), -2.0, masked.dtype).at[instances].max(masked)
        is_best = valid & (masked >= best[instances]) & (masked > -1.0)
        # break exact ties deterministically: keep the first candidate
        k = conf.shape[0]
        order = jnp.arange(k)
        first = jnp.full((num_flats,), k, jnp.int32).at[instances].min(
            jnp.where(is_best, order, k).astype(jnp.int32)
        )
        return is_best & (order == first[instances])

    valid = jax.vmap(per_image)(nms_out.confidence, nms_out.instances, nms_out.valid)
    return YoloInferenceOutput(
        tlbr=nms_out.tlbr,
        confidence=nms_out.confidence,
        classes=nms_out.classes,
        instances=nms_out.instances,
        valid=valid,
    )


def to_host_detections(out: NmsOutput) -> List[List[dict]]:
    """Unpack fixed-shape output into per-image python lists (host side)."""
    tlbr = np.asarray(out.tlbr)
    conf = np.asarray(out.confidence)
    classes = np.asarray(out.classes)
    valid = np.asarray(out.valid)
    result: List[List[dict]] = []
    for b in range(tlbr.shape[0]):
        dets = []
        for k in np.nonzero(valid[b])[0]:
            t, l, bb, r = tlbr[b, k]
            dets.append(
                {
                    "tlbr": (float(t), float(l), float(bb), float(r)),
                    "confidence": float(conf[b, k]),
                    "class": int(classes[b, k]),
                }
            )
        dets.sort(key=lambda d: -d["confidence"])
        result.append(dets)
    return result
