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
              kind: str = "greedy", beta: float = 0.6) -> Array:
    """Greedy NMS over score-sorted candidates (single image).

    tlbr [K,4], scores [K] (descending), group [K], valid [K] → keep [K].
    ``backend="pallas"`` computes the IoU matrix with the tiled TPU kernel
    (kernels/iou_pallas.py) — the tch-nms replacement path.  Measured A/B
    inside the full postprocess (scripts/ab_pallas.py, 2026-08-17, v5e,
    csp-608 shapes): xla 1.270 / pallas 1.303 ms at b16, 4.761 / 4.622 ms
    at b64, bit-identical keep decisions — a wash, so XLA stays the
    default and the kernel remains an explicit opt-in.
    ``kind="diou"`` subtracts the normalized center distance raised to
    ``beta`` from the IoU before thresholding, matching darknet's
    box_diou: iou − (d²/c²)^β with β = beta_nms (default 0.6)
    (darknet src/box.c:166-177 dia_box_diou).
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
        iou = iou - (dist / diag) ** beta
    elif kind != "greedy":
        raise ValueError(f"unknown nms kind {kind!r}")
    same_group = group[:, None] == group[None, :]
    order = jnp.arange(k)
    lower = order[:, None] < order[None, :]  # j strictly higher-ranked than i
    conflict = (iou > iou_threshold) & same_group & lower
    # conflict[j, i]: candidate i conflicts with higher-scored candidate j

    # Greedy NMS solves the triangular recurrence
    #   keep[i] = valid[i] ∧ ∀ j<i: ¬(keep[j] ∧ conflict[j,i]).
    # A K-step sequential loop is latency-bound; a global Jacobi fixpoint
    # does K² work per pass and degenerates on deep suppression chains.
    # Block-sequential greedy is exact with bounded work: march over blocks
    # of BLK candidates in rank order; each block is first masked by the
    # already-decided prefix (one K×BLK reduction), then resolved internally
    # with a small Jacobi fixpoint over its BLK×BLK conflict submatrix
    # (converges in ≤ BLK passes, usually ~2-4).
    blk = min(64, k)
    num_blocks = (k + blk - 1) // blk
    pad = num_blocks * blk - k
    if pad:
        conflict = jnp.pad(conflict, ((0, pad), (0, pad)))
        valid = jnp.pad(valid, (0, pad))
    kp = valid.shape[0]

    def outer(b, keep):
        start = b * blk
        cols = jax.lax.dynamic_slice(conflict, (0, start), (kp, blk))  # [K, BLK]
        sub = jax.lax.dynamic_slice(conflict, (start, start), (blk, blk))
        valid_blk = jax.lax.dynamic_slice(valid, (start,), (blk,))
        # prefix suppression: decided candidates before this block
        prefix_mask = jnp.arange(kp) < start
        sup_prefix = jnp.any(cols & (keep & prefix_mask)[:, None], axis=0)
        base = valid_blk & ~sup_prefix

        def cond(state):
            t, kb, changed = state
            return changed & (t < blk)

        def body(state):
            t, kb, _ = state
            sup = jnp.any(sub & kb[:, None], axis=0)
            new = base & ~sup
            return t + 1, new, jnp.any(new != kb)

        _, kb, _ = jax.lax.while_loop(
            cond, body, (jnp.int32(0), base, jnp.asarray(True))
        )
        return jax.lax.dynamic_update_slice(keep, kb, (start,))

    keep = jax.lax.fori_loop(0, num_blocks, outer, valid)
    return keep[:k]


def nms_options_from_darknet(darknet) -> tuple:
    """(kind, beta) for NMS from a parsed darknet cfg's yolo layers.

    Mirrors detector.c:774: diounms_sort is used when any yolo layer sets
    nms_kind=diounms, with that layer's beta_nms (parser.c:490, default .6).
    """
    for layer in darknet.layers:
        if getattr(layer, "nms_kind", "") == "diounms":
            return "diou", float(getattr(layer, "beta_nms", 0.6))
    return "greedy", 0.6


def non_max_suppression(
    prediction: MergedDetection,
    iou_threshold: float = DEFAULT_IOU_THRESHOLD,
    confidence_threshold: float = DEFAULT_CONFIDENCE_THRESHOLD,
    suppress_by_class: bool = False,
    max_dets: int = 512,
    backend: str = "xla",
    kind: str = "greedy",
    class_mode: str = "pairs",
    beta: float = 0.6,
) -> NmsOutput:
    """Batched NMS on a merged detection tensor.

    Candidate gating matches nms.rs:97-103: obj_prob ≥ τ AND confidence ≥ τ,
    per (instance, class) pair.

    ``class_mode``: "pairs" considers every (instance, class) pair as a
    candidate (exact reference semantics — nms.rs keeps multi-label
    candidates); "argmax" pre-selects each instance's best class before the
    top-k.  The argmax path is the production default downstream of
    ``yolo_inference`` (which keeps only the best class anyway) and sorts an
    80× smaller tensor — the full N·C top-k hits a pathological slow path in
    XLA's TPU TopK for near-degenerate confidence distributions.
    """
    b = prediction.batch_size
    n = prediction.num_flats
    c = prediction.num_classes

    obj = prediction.obj_prob()          # [B, N]
    conf = prediction.confidence()       # [B, N, C]
    mask = (obj[..., None] >= confidence_threshold) & (conf >= confidence_threshold)
    masked_conf = jnp.where(mask, conf, 0.0)

    if class_mode == "argmax":
        best_class = jnp.argmax(masked_conf, axis=-1).astype(jnp.int32)  # [B, N]
        best_conf = jnp.max(masked_conf, axis=-1)                        # [B, N]
        k = min(max_dets, n)
        top_conf, instances = jax.lax.top_k(best_conf, k)
        instances = instances.astype(jnp.int32)
        classes = jnp.take_along_axis(best_class, instances, axis=1)
        valid = top_conf > 0.0
    elif class_mode == "pairs":
        k = min(max_dets, n * c)
        flat_conf = masked_conf.reshape(b, n * c)
        top_conf, top_idx = jax.lax.top_k(flat_conf, k)  # sorted descending
        instances = (top_idx // c).astype(jnp.int32)
        classes = (top_idx % c).astype(jnp.int32)
        valid = top_conf > 0.0
    else:
        raise ValueError(f"unknown class_mode {class_mode!r}")

    boxes = jnp.take_along_axis(prediction.cycxhw, instances[..., None], axis=1)
    tlbr = cycxhw_to_tlbr(boxes)  # [B, K, 4]

    group = classes if suppress_by_class else jnp.zeros_like(classes)

    keep = jax.vmap(
        lambda t, s, g, v: _suppress(t, s, g, v, iou_threshold, backend, kind,
                                     beta)
    )(tlbr, top_conf, group, valid)

    return NmsOutput(
        tlbr=tlbr,
        confidence=top_conf,
        classes=classes,
        instances=instances,
        valid=keep,
    )
