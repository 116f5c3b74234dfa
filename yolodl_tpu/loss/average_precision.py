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
    #: box area in ORIGINAL-image pixels for COCO size buckets; < 0 means
    #: "derive from tlbr" (whatever units tlbr is in)
    area: float = -1.0


@dataclasses.dataclass(frozen=True)
class GroundTruth:
    image_id: int
    class_id: int
    tlbr: Tuple[float, float, float, float]
    area: float = -1.0


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


# COCO size buckets in original-image pixel area (pycocotools convention:
# closed intervals; "all" spans everything)
AREA_RANGES = {
    "all": (0.0, 1e10),
    "small": (0.0, 32.0 ** 2),
    "medium": (32.0 ** 2, 96.0 ** 2),
    "large": (96.0 ** 2, 1e10),
}


def _area_of(obj) -> float:
    if obj.area >= 0:
        return float(obj.area)
    t, l, b, r = obj.tlbr
    return float(max(b - t, 0.0) * max(r - l, 0.0))


def _iou_matrix(dets, gts) -> np.ndarray:
    """[D, G] pairwise IoU — computed once per (image, class) and shared
    by all 10 IoU thresholds."""
    d = np.asarray([det.tlbr for det in dets], np.float64).reshape(-1, 4)
    g = np.asarray([gt.tlbr for gt in gts], np.float64).reshape(-1, 4)
    t = np.maximum(d[:, None, 0], g[None, :, 0])
    l = np.maximum(d[:, None, 1], g[None, :, 1])
    b = np.minimum(d[:, None, 2], g[None, :, 2])
    r = np.minimum(d[:, None, 3], g[None, :, 3])
    inter = np.clip(b - t, 0, None) * np.clip(r - l, 0, None)
    area_d = (d[:, 2] - d[:, 0]) * (d[:, 3] - d[:, 1])
    area_g = (g[:, 2] - g[:, 0]) * (g[:, 3] - g[:, 1])
    return inter / (area_d[:, None] + area_g[None, :] - inter + 1e-16)


def _match_with_ignores(ious, gt_ig, thr):
    """Greedy conf-descending match with COCO ignore semantics.

    ``ious`` is the [D, G] IoU matrix with detections pre-sorted by
    confidence desc; ``gt_ig`` marks ground truths outside the area
    range.  Non-ignored GTs are preferred: a detection only falls back to
    an ignored GT when no eligible non-ignored GT clears ``thr`` (GTs are
    scanned non-ignored first, and once a non-ignored match is held the
    scan stops at the ignored tail).
    Returns (matched_gt_index_or_-1, det_matched_to_ignored_gt) per det.
    """
    n_det, n_gt = ious.shape
    order = sorted(range(n_gt), key=lambda g: gt_ig[g])  # ignored last
    gt_matched = [False] * n_gt
    dtm = np.full(n_det, -1, np.int64)
    dt_ig = np.zeros(n_det, bool)
    for di in range(n_det):
        best, m = thr, -1
        for gi in order:
            if gt_matched[gi]:
                continue
            if gt_ig[gi] and m > -1 and not gt_ig[m]:
                break  # only ignored GTs remain and we already hold a match
            iou = ious[di, gi]
            if iou < best:
                continue
            best, m = iou, gi
        if m > -1:
            gt_matched[m] = True
            dtm[di] = m
            dt_ig[di] = gt_ig[m]
    return dtm, dt_ig


def coco_summary(
    detections: Sequence[Detection],
    ground_truths: Sequence[GroundTruth],
    num_points: int = 101,
    max_dets: Tuple[int, ...] = (1, 10, 100),
) -> Dict[str, float]:
    """The 12-number COCO detection summary (pycocotools semantics).

    AP / AP50 / AP75 / AP_{small,medium,large} and AR@{1,10,100} /
    AR_{small,medium,large}: AP and AR average over IoU 0.50:0.05:0.95 and
    over classes **present** in the ground truth of each area range
    (pycocotools' convention — unlike :func:`average_precision`, which can
    take a fixed class denominator).  Size buckets use each box's ``area``
    field (original-image pixels) with COCO's ignore semantics: GTs outside
    the range are ignored (matching one neither scores nor penalizes) and
    unmatched detections outside the range are discarded rather than
    counted as false positives.

    The reference ships only the single-threshold calculator
    (yolo-dl/src/loss/average_precision.rs:62-155); this extends it to the
    full COCO protocol.
    """
    thresholds = [round(0.5 + 0.05 * i, 2) for i in range(10)]
    top = max(max_dets)
    class_ids = sorted(
        {d.class_id for d in detections} | {g.class_id for g in ground_truths}
    )
    # bucket by (image, class), detections conf-desc capped at max(max_dets)
    dets_by: Dict[Tuple[int, int], List[Detection]] = {}
    for d in detections:
        dets_by.setdefault((d.image_id, d.class_id), []).append(d)
    for key in dets_by:
        dets_by[key] = sorted(dets_by[key], key=lambda d: -d.confidence)[:top]
    gts_by: Dict[Tuple[int, int], List[GroundTruth]] = {}
    for g in ground_truths:
        gts_by.setdefault((g.image_id, g.class_id), []).append(g)
    images = sorted({i for i, _ in dets_by} | {i for i, _ in gts_by})

    # ap[area][thr] / ar[area][maxdet][thr] = list over classes-with-GT
    ap = {a: {t: [] for t in thresholds} for a in AREA_RANGES}
    ar = {a: {k: {t: [] for t in thresholds} for k in max_dets}
          for a in AREA_RANGES}
    for cid in class_ids:
        # pairwise IoUs once per (image, class), shared by all thresholds
        # and area ranges
        ious = {
            img: _iou_matrix(dets_by.get((img, cid), []),
                             gts_by.get((img, cid), []))
            for img in images
            if (img, cid) in dets_by or (img, cid) in gts_by
        }
        for aname, (lo, hi) in AREA_RANGES.items():
            npig = 0
            # per threshold: (conf, tp, ignore) fragments across images
            frags = {t: [] for t in thresholds}
            for img in images:
                dets = dets_by.get((img, cid), [])
                gts = gts_by.get((img, cid), [])
                if not dets and not gts:
                    continue
                gt_ig = [not (lo <= _area_of(g) <= hi) for g in gts]
                npig += sum(1 for ig in gt_ig if not ig)
                d_out = [not (lo <= _area_of(d) <= hi) for d in dets]
                for t in thresholds:
                    dtm, dt_ig = _match_with_ignores(ious[img], gt_ig, t)
                    # unmatched dets outside the range are ignored too
                    dt_ig |= (dtm == -1) & np.asarray(d_out, bool)
                    frags[t].append((
                        np.asarray([d.confidence for d in dets], np.float64),
                        (dtm > -1) & ~dt_ig,
                        dt_ig,
                    ))
            if npig == 0:
                continue  # class absent from this area range
            for t in thresholds:
                if frags[t]:
                    conf = np.concatenate([f[0] for f in frags[t]])
                    tp = np.concatenate([f[1] for f in frags[t]])
                    ig = np.concatenate([f[2] for f in frags[t]])
                else:
                    conf = np.zeros(0)
                    tp = ig = np.zeros(0, bool)
                order = np.argsort(-conf, kind="stable")
                tp, ig = tp[order], ig[order]
                ap[aname][t].append(
                    interpolated_ap(tp[~ig], npig, num_points))
                # recall at each max-det cap; the per-image cap was applied
                # when bucketing, so re-cap per image for smaller k
                for k in max_dets:
                    if k == top:
                        nmatch = int(tp.sum())
                    else:
                        nmatch = 0
                        for f_conf, f_tp, f_ig in frags[t]:
                            kept = f_tp[:k]
                            nmatch += int(kept.sum())
                    ar[aname][k][t].append(nmatch / npig)

    def _mean(lists) -> float:
        vals = [v for lst in lists for v in lst]
        return float(np.mean(vals)) if vals else 0.0

    out = {
        "AP": _mean(ap["all"].values()),
        "AP50": _mean([ap["all"][0.5]]),
        "AP75": _mean([ap["all"][0.75]]),
    }
    for a in ("small", "medium", "large"):
        out[f"AP_{a}"] = _mean(ap[a].values())
    for k in max_dets:
        out[f"AR@{k}"] = _mean(ar["all"][k].values())
    for a in ("small", "medium", "large"):
        out[f"AR_{a}"] = _mean(ar[a][top].values())
    return {k: round(v, 4) for k, v in out.items()}


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
