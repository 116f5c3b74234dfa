"""COCO-style interpolated average precision.

Equivalent capability to ``yolo-dl/src/loss/average_precision.rs`` (the
101-point COCO integration strategy, ``new_coco`` at :68-70; precision
envelope at :87-138; ``compute_by_detections`` at :157+ sorting by
confidence and marking TPs by IoU with first-match-wins) and the
``pred_gt_matching.rs`` detection/GT pairing.

Host-side numpy: evaluation is per-epoch, not per-step, so it does not need
to live in the jitted path.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np


@dataclasses.dataclass(frozen=True)
class Detection:
    image_id: int
    class_id: int
    confidence: float
    tlbr: Tuple[float, float, float, float]


@dataclasses.dataclass(frozen=True)
class GroundTruth:
    image_id: int
    class_id: int
    tlbr: Tuple[float, float, float, float]


def _iou(a, b) -> float:
    t = max(a[0], b[0])
    l = max(a[1], b[1])
    bb = min(a[2], b[2])
    r = min(a[3], b[3])
    inter = max(bb - t, 0.0) * max(r - l, 0.0)
    area_a = (a[2] - a[0]) * (a[3] - a[1])
    area_b = (b[2] - b[0]) * (b[3] - b[1])
    union = area_a + area_b - inter + 1e-16
    return inter / union


def match_detections(
    detections: Sequence[Detection],
    ground_truths: Sequence[GroundTruth],
    iou_threshold: float,
) -> Tuple[np.ndarray, np.ndarray, int]:
    """Sort by confidence desc; greedily mark TP/FP (first match wins).

    Returns (tp_flags, confidences, num_gt) for one class.
    """
    order = sorted(range(len(detections)), key=lambda i: -detections[i].confidence)
    gt_by_image: Dict[int, List[int]] = {}
    for gi, gt in enumerate(ground_truths):
        gt_by_image.setdefault(gt.image_id, []).append(gi)
    used = set()

    tp = np.zeros(len(detections), bool)
    conf = np.zeros(len(detections), np.float64)
    for rank, di in enumerate(order):
        det = detections[di]
        conf[rank] = det.confidence
        best_iou, best_gi = 0.0, None
        for gi in gt_by_image.get(det.image_id, ()):
            if gi in used:
                continue
            iou = _iou(det.tlbr, ground_truths[gi].tlbr)
            if iou > best_iou:
                best_iou, best_gi = iou, gi
        if best_gi is not None and best_iou >= iou_threshold:
            used.add(best_gi)
            tp[rank] = True
    return tp, conf, len(ground_truths)


def interpolated_ap(
    tp: np.ndarray, num_gt: int, num_points: int = 101
) -> float:
    """N-point interpolated AP over the precision envelope
    (average_precision.rs:87-155)."""
    if num_gt == 0:
        return 0.0
    if len(tp) == 0:
        return 0.0
    cum_tp = np.cumsum(tp)
    recall = cum_tp / num_gt
    precision = cum_tp / np.arange(1, len(tp) + 1)

    # precision envelope: running max from the right
    envelope = np.maximum.accumulate(precision[::-1])[::-1]

    points = np.linspace(0.0, 1.0, num_points)
    interpolated = np.zeros_like(points)
    for i, r in enumerate(points):
        mask = recall >= r
        interpolated[i] = envelope[mask].max() if mask.any() else 0.0
    return float(interpolated.mean())


def average_precision(
    detections: Sequence[Detection],
    ground_truths: Sequence[GroundTruth],
    iou_threshold: float = 0.5,
    num_points: int = 101,
    num_classes: Optional[int] = None,
) -> Dict[str, object]:
    """Per-class AP + mAP at one IoU threshold (COCO 101-point)."""
    class_ids = sorted(
        {d.class_id for d in detections} | {g.class_id for g in ground_truths}
    )
    per_class: Dict[int, float] = {}
    for cid in class_ids:
        dets = [d for d in detections if d.class_id == cid]
        gts = [g for g in ground_truths if g.class_id == cid]
        tp, _conf, num_gt = match_detections(dets, gts, iou_threshold)
        per_class[cid] = interpolated_ap(tp, num_gt, num_points)
    if num_classes is not None:
        mean = sum(per_class.values()) / num_classes if num_classes else 0.0
    else:
        mean = float(np.mean(list(per_class.values()))) if per_class else 0.0
    return {"per_class": per_class, "mAP": mean}


def coco_map_50_95(
    detections: Sequence[Detection],
    ground_truths: Sequence[GroundTruth],
    num_points: int = 101,
    num_classes: Optional[int] = None,
) -> float:
    """mAP averaged over IoU 0.50:0.05:0.95 (the COCO headline metric).

    ``num_classes`` uses the same fixed denominator as
    :func:`average_precision` so both reported metrics are consistent.
    """
    thresholds = np.arange(0.5, 1.0, 0.05)
    vals = [
        average_precision(detections, ground_truths, float(t), num_points,
                          num_classes)["mAP"]
        for t in thresholds
    ]
    return float(np.mean(vals))
