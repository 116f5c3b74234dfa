"""YOLO detection head: decode + multi-scale merge.

Equivalent capability to ``tch-modules/src/detect_2d.rs`` (grid decode),
``tch-modules/src/merge_detect_2d.rs`` and the detection-tensor family in
``tch-goodies/src/detection/`` (DenseDetectionTensor[List],
MergedDenseDetection with per-layer DetectionInfo and flat⇄instance index
conversion).

TPU design notes:

- The reference caches grid-offset/anchor tensors per feature size at runtime
  (detect_2d.rs:162-237); here they are generated inside the traced function
  with ``broadcasted_iota`` so XLA constant-folds them — no cache needed.
- Layout is "entries last": a head tensor is [b, A, H, W, 5+C]; the merged
  tensor is [b, N, ...] with N = Σ A·H·W flattened in (anchor, row, col)
  order per layer, matching the reference's merged flat index
  (merged_dense_detection.rs:39-103) so index-parity tests carry over.
- Two decode variants:
  * "scaled": scaled-YOLOv4 power decode, the reference's only variant
    (detect_2d.rs:66-139): cy = (σ(t)·2−0.5+row)/H, h = (σ(t)·2)²·anchor_h.
  * "darknet": classic darknet yolo layer (for .weights parity):
    cy = (σ(t)·scale_xy − 0.5·(scale_xy−1) + row)/H, h = exp(t)·anchor_h.
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

Array = jax.Array


@dataclasses.dataclass(frozen=True)
class DetectionInfo:
    """Static per-head metadata (tch-goodies DetectionInfo equivalent)."""

    feature_h: int
    feature_w: int
    anchors: Tuple[Tuple[float, float], ...]  # (h, w) in image-ratio units
    flat_begin: int
    flat_end: int
    class_act: str = "sigmoid"  # "sigmoid" | "softmax" (region heads)

    @property
    def num_anchors(self) -> int:
        return len(self.anchors)

    @property
    def num_flats(self) -> int:
        return self.num_anchors * self.feature_h * self.feature_w


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class DenseDetection:
    """One head's decoded output; fields [b, A, H, W, ...], boxes in ratio units.

    ``uncertainty`` is the Gaussian-YOLO per-box mean sigma (None for plain
    heads)."""

    cycxhw: Array  # [b, A, H, W, 4]
    obj_logit: Array  # [b, A, H, W]
    class_logit: Array  # [b, A, H, W, C]
    anchors: Tuple[Tuple[float, float], ...]  # static
    class_act: str = "sigmoid"
    uncertainty: Optional[Array] = None  # [b, A, H, W] (mean sigma)
    sigmas: Optional[Array] = None  # [b, A, H, W, 4] per-coord (y, x, h, w)

    def tree_flatten(self):
        return (self.cycxhw, self.obj_logit, self.class_logit,
                self.uncertainty, self.sigmas), (self.anchors, self.class_act)

    @classmethod
    def tree_unflatten(cls, aux, children):
        anchors, class_act = aux
        cycxhw, obj_logit, class_logit, uncertainty, sigmas = children
        return cls(cycxhw=cycxhw, obj_logit=obj_logit, class_logit=class_logit,
                   anchors=anchors, class_act=class_act,
                   uncertainty=uncertainty, sigmas=sigmas)

    @property
    def num_classes(self) -> int:
        return self.class_logit.shape[-1]


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class MergedDetection:
    """All heads merged on the flat cell axis (MergedDenseDetection parity).

    N = Σ_layers A·H·W, per-layer flat order = (anchor, row, col).
    """

    cycxhw: Array  # [b, N, 4]
    obj_logit: Array  # [b, N]
    class_logit: Array  # [b, N, C]
    infos: Tuple[DetectionInfo, ...]  # static
    uncertainty: Optional[Array] = None  # [b, N] (Gaussian-YOLO heads)
    sigmas: Optional[Array] = None  # [b, N, 4] per-coord (y, x, h, w)

    def tree_flatten(self):
        return (self.cycxhw, self.obj_logit, self.class_logit,
                self.uncertainty, self.sigmas), self.infos

    @classmethod
    def tree_unflatten(cls, aux, children):
        cycxhw, obj_logit, class_logit, uncertainty, sigmas = children
        return cls(cycxhw=cycxhw, obj_logit=obj_logit, class_logit=class_logit,
                   infos=aux, uncertainty=uncertainty, sigmas=sigmas)

    @property
    def batch_size(self) -> int:
        return self.cycxhw.shape[0]

    @property
    def num_flats(self) -> int:
        return self.cycxhw.shape[1]

    @property
    def num_classes(self) -> int:
        return self.class_logit.shape[-1]

    def obj_prob(self) -> Array:
        return jax.nn.sigmoid(self.obj_logit)

    def class_prob(self) -> Array:
        if self.infos and self.infos[0].class_act == "softmax":
            return jax.nn.softmax(self.class_logit, axis=-1)
        return jax.nn.sigmoid(self.class_logit)

    def confidence(self) -> Array:
        """obj_prob × class_prob, [b, N, C] (merged_dense_detection.rs:143-153).
        Gaussian heads additionally scale by (1 − uncertainty)
        (gaussian_yolo_layer.c:823-825)."""
        conf = self.obj_prob()[..., None] * self.class_prob()
        if self.uncertainty is not None:
            conf = conf * (1.0 - self.uncertainty)[..., None]
        return conf


def detect_decode(
    x: Array,
    anchors: Sequence[Tuple[float, float]],
    num_classes: int,
    order: str = "entry_major",
    variant: str = "scaled",
    scale_xy: float = 2.0,
    entry_layout: str = "cycxhw",
    gaussian: bool = False,
    class_activation: str = "sigmoid",
) -> DenseDetection:
    """Decode a head feature map [b, H, W, A*(5+C)] into boxes.

    ``order`` selects the channel grouping: "entry_major" (channel =
    entry*A + anchor — the reference's view at detect_2d.rs:65) or
    "anchor_major" (channel = anchor*(5+C) + entry — darknet layout).

    ``entry_layout`` selects the meaning of the first four entries:
    "cycxhw" (NEWSLAB: cy, cx, h, w) or "xywh" (darknet: tx, ty, tw, th).
    """
    b, fh, fw, c = x.shape
    a = len(anchors)
    e = (9 if gaussian else 5) + num_classes
    if c != a * e:
        raise ValueError(f"head channels {c} != anchors*entries = {a * e}")

    if order == "entry_major":
        x = x.reshape(b, fh, fw, e, a)
        x = jnp.transpose(x, (0, 4, 1, 2, 3))  # [b, A, H, W, E]
    elif order == "anchor_major":
        x = x.reshape(b, fh, fw, a, e)
        x = jnp.transpose(x, (0, 3, 1, 2, 4))
    else:
        raise ValueError(f"unknown channel order {order!r}")

    uncertainty = None
    sigmas = None
    if gaussian:
        # interleaved mean/sigma entries (gaussian_yolo_layer.c:809-816):
        # mu_x, s_x, mu_y, s_y, mu_w, s_w, mu_h, s_h, obj, classes.
        # sigmas kept per-coordinate in cycxhw order (y, x, h, w) so the
        # Gaussian NLL loss can train them (loss/yolo_loss.py)
        tx, ty, tw, th = x[..., 0], x[..., 2], x[..., 4], x[..., 6]
        sigmas = jax.nn.sigmoid(
            jnp.stack([x[..., 3], x[..., 1], x[..., 7], x[..., 5]], axis=-1)
        )
        uncertainty = jnp.mean(sigmas, axis=-1)
        obj_logit = x[..., 8]
        class_logit = x[..., 9:]
    elif entry_layout == "cycxhw":
        ty, tx, th, tw = x[..., 0], x[..., 1], x[..., 2], x[..., 3]
        obj_logit = x[..., 4]
        class_logit = x[..., 5:]
    elif entry_layout == "xywh":
        tx, ty, tw, th = x[..., 0], x[..., 1], x[..., 2], x[..., 3]
        obj_logit = x[..., 4]
        class_logit = x[..., 5:]
    else:
        raise ValueError(f"unknown entry layout {entry_layout!r}")

    rows = jax.lax.broadcasted_iota(x.dtype, (fh, fw), 0)
    cols = jax.lax.broadcasted_iota(x.dtype, (fh, fw), 1)
    anchor_h = jnp.asarray([ah for ah, _ in anchors], dtype=x.dtype).reshape(1, a, 1, 1)
    anchor_w = jnp.asarray([aw for _, aw in anchors], dtype=x.dtype).reshape(1, a, 1, 1)

    if variant == "scaled":
        # scaled-YOLOv4 power decode.  The NEWSLAB reference hardcodes the
        # xy scale to 2 (detect_2d.rs:66-139, scale_xy=2 in its configs);
        # darknet new_coords heads carry scale_x_y in the cfg (2.0 for
        # yolov4-csp, 1.05 for cspx-p7) and apply x·s − 0.5(s−1)
        # (yolo_layer.c forward_yolo_layer scal_add). wh is s-independent:
        # (σ·2)² · a == σ²·4·a (get_yolo_box new_coords branch).
        cy = (jax.nn.sigmoid(ty) * scale_xy - 0.5 * (scale_xy - 1.0) + rows) / fh
        cx = (jax.nn.sigmoid(tx) * scale_xy - 0.5 * (scale_xy - 1.0) + cols) / fw
        h = jnp.square(jax.nn.sigmoid(th) * 2.0) * anchor_h
        w = jnp.square(jax.nn.sigmoid(tw) * 2.0) * anchor_w
    elif variant == "darknet":
        cy = (jax.nn.sigmoid(ty) * scale_xy - 0.5 * (scale_xy - 1.0) + rows) / fh
        cx = (jax.nn.sigmoid(tx) * scale_xy - 0.5 * (scale_xy - 1.0) + cols) / fw
        h = jnp.exp(th) * anchor_h
        w = jnp.exp(tw) * anchor_w
    else:
        raise ValueError(f"unknown decode variant {variant!r}")

    cycxhw = jnp.stack([cy, cx, h, w], axis=-1)
    return DenseDetection(
        cycxhw=cycxhw,
        obj_logit=obj_logit,
        class_logit=class_logit,
        anchors=tuple((float(ah), float(aw)) for ah, aw in anchors),
        class_act=class_activation,
        uncertainty=uncertainty,
        sigmas=sigmas,
    )


def merge_detections(heads: Sequence[DenseDetection]) -> MergedDetection:
    """Concatenate heads on the flat axis (merged_dense_detection.rs:19-119)."""
    if not heads:
        raise ValueError("merge_detections needs at least one head")
    num_classes = heads[0].num_classes
    infos: List[DetectionInfo] = []
    boxes, objs, classes, uncs, sigs = [], [], [], [], []
    begin = 0
    for head in heads:
        if head.num_classes != num_classes:
            raise ValueError("all heads must share num_classes")
        b, a, fh, fw, _ = head.cycxhw.shape
        n = a * fh * fw
        infos.append(
            DetectionInfo(
                feature_h=fh, feature_w=fw, anchors=head.anchors,
                flat_begin=begin, flat_end=begin + n,
                class_act=head.class_act,
            )
        )
        begin += n
        boxes.append(head.cycxhw.reshape(b, n, 4))
        objs.append(head.obj_logit.reshape(b, n))
        classes.append(head.class_logit.reshape(b, n, num_classes))
        if head.uncertainty is not None:
            uncs.append(head.uncertainty.reshape(b, n))
        if head.sigmas is not None:
            sigs.append(head.sigmas.reshape(b, n, 4))

    if uncs and len(uncs) != len(heads):
        raise ValueError("either all heads are gaussian or none")
    return MergedDetection(
        cycxhw=jnp.concatenate(boxes, axis=1),
        obj_logit=jnp.concatenate(objs, axis=1),
        class_logit=jnp.concatenate(classes, axis=1),
        infos=tuple(infos),
        uncertainty=jnp.concatenate(uncs, axis=1) if uncs else None,
        sigmas=jnp.concatenate(sigs, axis=1) if sigs else None,
    )


def instance_to_flat(
    infos: Sequence[DetectionInfo], layer: int, anchor, row, col
):
    """(layer, anchor, row, col) → flat index (instances_to_flats parity,
    merged_dense_detection.rs:417).  anchor/row/col may be arrays."""
    info = infos[layer]
    return info.flat_begin + (anchor * info.feature_h + row) * info.feature_w + col


def flat_to_instance(infos: Sequence[DetectionInfo], flat: int):
    """flat index → (layer, anchor, row, col) (flats_to_instances parity,
    merged_dense_detection.rs:384).  Python ints (host-side debugging)."""
    for layer, info in enumerate(infos):
        if info.flat_begin <= flat < info.flat_end:
            local = flat - info.flat_begin
            anchor, rest = divmod(local, info.feature_h * info.feature_w)
            row, col = divmod(rest, info.feature_w)
            return layer, anchor, row, col
    raise IndexError(f"flat index {flat} out of range")
