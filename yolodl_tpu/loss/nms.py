"""Fixed-shape batched NMS.

Equivalent capability to ``yolo-dl/src/loss/nms.rs`` (confidence gating on
obj AND obj·class, batch or batch·class grouping, greedy IoU suppression) —
but TPU-native: the reference collects a dynamic candidate list with
``nonzero()`` and calls the external CUDA kernel ``tch_nms::nms_by_scores``
(nms.rs:97-148); XLA forbids dynamic shapes, so here:

1. candidates are pre-filtered to a **static** ``max_dets`` per image via
   top-k on masked confidence (mirrors the reference's MAX_DETS chunking
   discipline, nms.rs:8),
2. greedy suppression runs as a ``fori_loop`` over the sorted candidates
   with a full IoU matrix — O(K²) elementwise work on the VPU, no
   host↔device sync,
3. the output is fixed-shape with a validity mask instead of ragged lists.

Suppression is per group: same batch (and same class when
``suppress_by_class``), exactly like nms.rs:129-133.
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp

from ..geometry.boxes import box_iou_pairwise, cycxhw_to_tlbr
from ..ops.detect import MergedDetection

Array = jax.Array

DEFAULT_IOU_THRESHOLD = 0.6
DEFAULT_CONFIDENCE_THRESHOLD = 0.1


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class NmsOutput:
    """Fixed-size survivors per image; ``valid`` masks live entries.

    Mirrors NmsOutput {batches, classes, instances, bbox, confidence}
    (nms.rs:49-62) with batch as the leading axis instead of a ragged list.
    """

    tlbr: Array        # [B, K, 4]
    confidence: Array  # [B, K]
    classes: Array     # [B, K] int32
    instances: Array   # [B, K] int32 flat cell index
    valid: Array       # [B, K] bool

    def tree_flatten(self):
        return (self.tlbr, self.confidence, self.classes, self.instances, self.valid), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)

    def num_valid(self) -> Array:
        return jnp.sum(self.valid.astype(jnp.int32), axis=-1)


def _suppress(tlbr: Array, scores: Array, group: Array, valid: Array,
              iou_threshold: float, backend: str = "xla",
              kind: str = "greedy") -> Array:
    """Greedy NMS over score-sorted candidates (single image).

    tlbr [K,4], scores [K] (descending), group [K], valid [K] → keep [K].
    ``backend="pallas"`` computes the IoU matrix with the tiled TPU kernel
    (kernels/iou_pallas.py) — the tch-nms replacement path.
    ``kind="diou"`` subtracts the normalized center distance from the IoU
    before thresholding (darknet nms_kind=diounms).
    """
    k = tlbr.shape[0]
    if backend == "pallas":
        from ..kernels import pairwise_iou_pallas

        iou = pairwise_iou_pallas(tlbr)
    else:
        iou = box_iou_pairwise(tlbr, tlbr)
    if kind == "diou":
        cy = (tlbr[:, 0] + tlbr[:, 2]) / 2
        cx = (tlbr[:, 1] + tlbr[:, 3]) / 2
        dist = (cy[:, None] - cy[None, :]) ** 2 + (cx[:, None] - cx[None, :]) ** 2
        enc_t = jnp.minimum(tlbr[:, None, 0], tlbr[None, :, 0])
        enc_l = jnp.minimum(tlbr[:, None, 1], tlbr[None, :, 1])
        enc_b = jnp.maximum(tlbr[:, None, 2], tlbr[None, :, 2])
        enc_r = jnp.maximum(tlbr[:, None, 3], tlbr[None, :, 3])
        diag = (enc_b - enc_t) ** 2 + (enc_r - enc_l) ** 2 + 1e-16
        iou = iou - dist / diag
    elif kind != "greedy":
        raise ValueError(f"unknown nms kind {kind!r}")
    same_group = group[:, None] == group[None, :]
    conflict = (iou > iou_threshold) & same_group
    # conflict[i, j]: candidate j conflicts with higher-scored candidate i

    keep = valid

    def body(i, keep):
        # if candidate i survives, kill all lower-ranked conflicting candidates
        row = conflict[i]
        alive_i = keep[i]
        later = jnp.arange(k) > i
        kill = alive_i & row & later
        return keep & ~kill

    return jax.lax.fori_loop(0, k, body, keep)


def non_max_suppression(
    prediction: MergedDetection,
    iou_threshold: float = DEFAULT_IOU_THRESHOLD,
    confidence_threshold: float = DEFAULT_CONFIDENCE_THRESHOLD,
    suppress_by_class: bool = False,
    max_dets: int = 512,
    backend: str = "xla",
    kind: str = "greedy",
) -> NmsOutput:
    """Batched NMS on a merged detection tensor.

    Candidate gating matches nms.rs:97-103: obj_prob ≥ τ AND confidence ≥ τ,
    per (instance, class) pair.
    """
    b = prediction.batch_size
    n = prediction.num_flats
    c = prediction.num_classes

    obj = prediction.obj_prob()          # [B, N]
    conf = prediction.confidence()       # [B, N, C]
    mask = (obj[..., None] >= confidence_threshold) & (conf >= confidence_threshold)
    masked_conf = jnp.where(mask, conf, 0.0)

    k = min(max_dets, n * c)
    flat_conf = masked_conf.reshape(b, n * c)
    top_conf, top_idx = jax.lax.top_k(flat_conf, k)  # sorted descending
    instances = (top_idx // c).astype(jnp.int32)
    classes = (top_idx % c).astype(jnp.int32)
    valid = top_conf > 0.0

    boxes = jnp.take_along_axis(prediction.cycxhw, instances[..., None], axis=1)
    tlbr = cycxhw_to_tlbr(boxes)  # [B, K, 4]

    group = classes if suppress_by_class else jnp.zeros_like(classes)

    keep = jax.vmap(
        lambda t, s, g, v: _suppress(t, s, g, v, iou_threshold, backend, kind)
    )(tlbr, top_conf, group, valid)

    return NmsOutput(
        tlbr=tlbr,
        confidence=top_conf,
        classes=classes,
        instances=instances,
        valid=keep,
    )
