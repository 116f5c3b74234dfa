"""Cross-implementation AP golden: the reference's recorded-detection
fixtures, ported.

The reference's AP unit tests (yolo-dl/src/loss/average_precision.rs:560-644,
t_compute_by_detections / t_mean_average_precision_cal) pin its calculator
against two recorded detection dumps (416x416-scale xyxy boxes).  This file

1. re-runs a faithful Python replica of the REFERENCE protocol on the same
   dumps — the quirky +1-pixel IoU (cal_iou_xxyys), per-detection
   best-same-class-GT matching (match_d_g), per-GT best-IoU-first TP
   marking (compute_by_detections:157-191), precision envelope + 101-point
   stepwise interpolation (compute_by_prec_rec:85-155,
   utils/algorithm.rs:35-80) — and asserts the reference's own expected
   values (AP@0.5 == 1.0; COCO mAP == (0.9 + 0.1 + 0.198019...)/3),

2. runs OUR production calculator (loss/average_precision.py, pycocotools
   protocol: greedy by confidence, no +1-pixel IoU) on the same data and
   pins the documented TP-assignment divergence numerically (README
   "average precision" divergence note).
"""

import numpy as np
import pytest

from yolodl_tpu.loss.average_precision import (
    Detection, GroundTruth, average_precision, coco_map_50_95)

# yolo-dl/src/loss/average_precision.rs:562-573 — ground truth rows are
# (cls, x1, y1, x2, y2); detection rows are (x1, y1, x2, y2, conf,
# cls_conf, cls).  Data fixtures, cited verbatim from the reference tests.
GT_1 = """0.00000 227.16200 219.68274 312.70200 410.39253
0.00000 284.18624 189.21947 335.15290 404.17874
0.00000 0.60445 237.66579 24.34890 415.77453
0.00000 174.27155 155.53200 246.64890 359.78800
34.00000 8.58000 330.53821 31.98000 411.12074"""

DET_1 = """175.30000 170.77000 245.34000 324.72000 0.99968 0.99998 0.00000
284.07000 191.51000 336.73000 351.94000 0.98834 0.99999 0.00000
229.29000 222.98000 314.37000 358.82000 0.98327 0.99990 0.00000
0.35714 234.53000 29.80900 361.46000 0.89682 0.99831 0.00000"""

# average_precision.rs:596-607 (t_mean_average_precision_cal)
GT_2 = """39.00000 61.40888 27.67710 141.49845 230.31445
56.00000 0.22360 92.69645 58.11374 148.82400
56.00000 144.48242 43.56290 416.00021 231.43224
60.00000 0.00000 137.03310 412.75354 410.12421
40.00000 160.14066 101.55579 245.92610 240.79890"""

DET_2 = """159.15750 105.84630 247.27790 245.03130 0.99870 0.99960 40.00000
55.24000 31.11770 150.80330 362.72990 0.99670 0.99930 39.00000
200.69280 35.67050 411.24700 206.84590 0.78630 0.97070 56.00000"""


def parse_gt(text):
    rows = [[float(v) for v in line.split()] for line in text.splitlines()]
    return [(int(r[0]), r[1], r[2], r[3], r[4]) for r in rows]


def parse_det(text):
    rows = [[float(v) for v in line.split()] for line in text.splitlines()]
    return [(r[0], r[1], r[2], r[3], r[4], r[5], int(r[6])) for r in rows]


# ---------------------------------------------------------------------------
# faithful replica of the reference protocol


def ref_iou(a, b):
    """cal_iou_xxyys — note the pixel-count (+1) convention."""
    xa, ya = max(a[0], b[0]), max(a[1], b[1])
    xb, yb = min(a[2], b[2]), min(a[3], b[3])
    inter = max(0.0, xb - xa + 1.0) * max(0.0, yb - ya + 1.0)
    area_a = (a[2] - a[0] + 1.0) * (a[3] - a[1] + 1.0)
    area_b = (b[2] - b[0] + 1.0) * (b[3] - b[1] + 1.0)
    return inter / (area_a + area_b - inter)


def ref_match(dets, gts):
    """match_d_g: per detection, the best same-class GT by IoU (or None)."""
    out = []
    for d in dets:
        best, sel = 0.0, None
        for gi, g in enumerate(gts):
            iou = ref_iou(d[:4], g[1:5])
            if g[0] == d[6] and iou > best:
                best, sel = iou, gi
        out.append((d, sel, 0.0 if sel is None else best))
    return out


def ref_ap(matched, num_gt, iou_thresh):
    """compute_by_detections + compute_by_prec_rec + the stepwise
    interpolation of utils/algorithm.rs."""
    # group by GT id (None = its own group per Rust's Option<&G> —
    # actually None groups together; iou 0 there so never TP)
    groups = {}
    for i, (d, sel, iou) in enumerate(matched):
        groups.setdefault(sel, []).append((i, d, iou))
    flags = {}
    for sel, items in groups.items():
        items = sorted(items, key=lambda t: -t[2])
        for rank, (i, d, iou) in enumerate(items):
            flags[i] = (rank == 0) and (iou >= iou_thresh)
    # sort by decreasing confidence (cls_conf)
    order = sorted(range(len(matched)), key=lambda i: -matched[i][0][5])
    tp = fp = 0
    prec_rec = []
    for i in order:
        if flags[i]:
            tp += 1
        else:
            fp += 1
        prec_rec.append((tp / (tp + fp), tp / num_gt))
    # envelope (right-to-left running max precision, dedupe equal recalls)
    max_recall = prec_rec[-1][1]
    pts = ([(0.0, 0.0)] + [(p, r) for p, r in prec_rec]
           + [(0.0, min(max_recall + 1e-3, 1.0))])
    env = []
    for p, r in reversed(pts):
        if env:
            mp = max(env[-1][0], p)
            if env[-1][1] == r:
                env[-1] = (max(env[-1][0], p), r)
            else:
                env.append((mp, r))
        else:
            env.append((p, r))
    env.reverse()  # increasing recall, non-increasing precision
    # 101-point stepwise interpolation: value at recall x = precision of
    # the next knot with knot_recall > x; beyond the last knot -> 0
    n = 101
    total = 0.0
    last_p, last_r = env[-1]
    for k in range(n):
        x = k / (n - 1)
        y = 0.0
        for (pf, rf), (pl, rl) in zip(env, env[1:]):
            if rf <= x < rl:
                y = pl
                break
        if x >= last_r:
            # algorithm.rs:71-78: when the final knot sits exactly at
            # recall 1.0 its precision is emitted at x=1.0; otherwise
            # points at/past the last knot contribute 0
            y = last_p if last_r == 1.0 else 0.0
        total += y
    return total / n


def to_ours(dets, gts):
    ours_d = [Detection(image_id=0, class_id=d[6], confidence=d[5],
                        tlbr=(d[1], d[0], d[3], d[2])) for d in dets]
    ours_g = [GroundTruth(image_id=0, class_id=g[0],
                          tlbr=(g[2], g[1], g[4], g[3])) for g in gts]
    return ours_d, ours_g


class TestReferenceReplica:
    def test_fixture1_ap50_is_one(self):
        dets, gts = parse_det(DET_1), parse_gt(GT_1)
        matched = ref_match(dets, gts)
        ap = ref_ap(matched, num_gt=4, iou_thresh=0.5)
        assert ap == pytest.approx(1.0, abs=1e-9)

    def test_fixture2_coco_map_matches_reference(self):
        dets, gts = parse_det(DET_2), parse_gt(GT_2)
        matched = ref_match(dets, gts)
        per_class = {}
        gt_counts = {}
        for g in gts:
            gt_counts[g[0]] = gt_counts.get(g[0], 0) + 1
        # split by detection class, mean over 10 IoU thresholds
        by_cls = {}
        for (d, sel, iou) in matched:
            by_cls.setdefault(d[6], []).append((d, sel, iou))
        total = 0.0
        for cls, items in by_cls.items():
            num_gt = gt_counts.get(cls, 0)
            aps = [ref_ap(items, num_gt, 0.5 + 0.05 * k) for k in range(10)]
            total += sum(aps) / 10
        map_ = total / len(gt_counts)
        # the reference's own expected value (average_precision.rs:636-639):
        # per-class APs 0.9 / 0.1 / 0.198019..., divided by the number of
        # GT classes (4 — class 60 contributes its GT count but no AP)
        expect = (0.9 + 0.1 + 0.19801980198019803) / 4
        assert map_ == pytest.approx(expect, abs=1e-9)


class TestOursOnGolden:
    """Our pycocotools-protocol calculator on the same dumps: the
    TP-assignment divergence (greedy-by-confidence vs the reference's
    best-IoU-first; continuous IoU vs +1-pixel), pinned numerically."""

    def test_fixture1_ours(self):
        ours_d, ours_g = to_ours(parse_det(DET_1), parse_gt(GT_1))
        res = average_precision(ours_d, ours_g, iou_threshold=0.5)
        # all 4 class-0 detections land on distinct GTs above 0.5 IoU
        # under greedy confidence matching too -> class-0 AP 1.0; class 34
        # has a GT but no detections -> AP 0, and the reference test's
        # num_ground_truth=4 quietly EXCLUDES that class while our mAP
        # averages over classes present in GT (pycocotools convention):
        # mAP = (1.0 + 0.0) / 2
        assert res["per_class"][0] == pytest.approx(1.0, abs=1e-9)
        assert res["per_class"][34] == 0.0
        assert res["mAP"] == pytest.approx(0.5, abs=1e-9)

    def test_fixture2_ours_vs_reference(self):
        dets, gts = parse_det(DET_2), parse_gt(GT_2)
        ours_d, ours_g = to_ours(dets, gts)
        ours = coco_map_50_95(ours_d, ours_g)
        # reference per-class APs {40: 0.9, 39: 0.1, 56: 0.198019...} / 4 GT
        # classes = 0.29950495...  Ours differs only through the IoU
        # convention: the reference's +1-pixel IoU (cal_iou_xxyys) inflates
        # each overlap, so class 39's det (continuous IoU 0.4987, pixel IoU
        # 0.5011) drops below the 0.5 threshold bin and class 56's crosses
        # one fewer bin — the interpolation grid (101-pt ==1.0-edge vs
        # pycocotools right-continuous) agrees on this dump.
        ref_map = (0.9 + 0.1 + 0.19801980198019803) / 4
        assert ours == pytest.approx(0.27549505, abs=1e-6)
        assert abs(ours - ref_map) < 0.025  # divergence pinned: 0.024...
