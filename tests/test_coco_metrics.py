"""The 12-number COCO summary (AP by size, AR@k) — pycocotools semantics.

Hand-computed scenarios pin the ignore rules (GTs outside the area range
neither score nor penalize; unmatched out-of-range detections are not
FPs; non-ignored GTs are preferred in matching), and a randomized case
cross-checks AP50/AP against the single-threshold calculator the
reference ships (average_precision.rs).
"""

import numpy as np

from yolodl_tpu.loss.average_precision import (
    Detection, GroundTruth, average_precision, coco_map_50_95, coco_summary,
)


def D(img, conf, tlbr, cls=0):
    return Detection(img, cls, conf, tlbr)


def G(img, tlbr, cls=0):
    return GroundTruth(img, cls, tlbr)


def test_perfect_matches_across_sizes():
    # one small (400 px²), one medium (6400), one large (10000) GT; three
    # detections at IoU 1.0 / 1.0 / 0.96 -> perfect at every threshold
    gts = [
        G(0, (0, 0, 20, 20)),
        G(0, (100, 100, 180, 180)),
        G(0, (300, 300, 400, 400)),
    ]
    dets = [
        D(0, 0.9, (0, 0, 20, 20)),
        D(0, 0.8, (100, 100, 180, 180)),
        D(0, 0.7, (300, 304, 400, 400)),  # IoU 0.96 with the large GT
    ]
    s = coco_summary(dets, gts)
    assert s["AP"] == 1.0 and s["AP50"] == 1.0 and s["AP75"] == 1.0
    # in each size bucket the other dets match ignored GTs -> ignored
    assert s["AP_small"] == 1.0
    assert s["AP_medium"] == 1.0
    assert s["AP_large"] == 1.0
    # top-1 detection recalls 1 of 3 GTs; top-10 recalls all
    assert abs(s["AR@1"] - 1 / 3) < 1e-4  # report rounds to 4 decimals
    assert s["AR@10"] == 1.0 and s["AR@100"] == 1.0
    assert s["AR_small"] == 1.0 and s["AR_large"] == 1.0


def test_ignore_semantics_and_ap75():
    # one large GT (10000 px²); D1 overlaps it at IoU 0.6, D2 (2500 px²,
    # medium) hits nothing
    gts = [G(0, (0, 0, 100, 100))]
    dets = [
        D(0, 0.9, (0, 0, 100, 60)),       # IoU 0.6
        D(0, 0.8, (200, 200, 250, 250)),  # pure FP, medium-sized
    ]
    s = coco_summary(dets, gts)
    assert s["AP50"] == 1.0   # TP first; the trailing FP can't dent AP
    assert s["AP75"] == 0.0   # IoU 0.6 < 0.75
    # medium bucket: the only GT is ignored (large), D1 matches it ->
    # ignored, D2 would be an FP but there is no GT left -> bucket skipped;
    # pycocotools reports the empty bucket as -1 (N/A), not 0.0
    assert s["AP_medium"] == -1.0
    # large bucket: TP at t<=0.6; above that D1 (6000 px² itself -> medium)
    # goes unmatched AND out-of-range -> discarded, not FP; D2 likewise
    assert abs(s["AP_large"] - 0.3) < 1e-9  # 3 of 10 IoU thresholds hit
    assert abs(s["AP"] - 0.3) < 1e-9


def test_prefers_non_ignored_gt():
    # the detection overlaps an out-of-range GT MORE than the in-range one;
    # pycocotools still matches the in-range GT (non-ignored scanned first,
    # scan stops at the ignored tail once a real match is held)
    gts = [
        G(0, (0, 0, 100, 100)),    # large, in range for "large"
        G(0, (0, 0, 24, 24)),      # small -> ignored in the large bucket
    ]
    det = D(0, 0.9, (0, 0, 25, 24))  # IoU ~0.96 w/ small, 0.06 w/ large
    s = coco_summary([det], gts)
    # large bucket at t=0.5: the det can't fall back to a 0.06 IoU with the
    # large GT, but DOES take the ignored small GT -> ignored, no FP, and
    # the large GT goes unrecalled
    assert s["AR_large"] == 0.0
    assert s["AP_large"] == 0.0
    # small bucket: matches the small GT normally
    assert s["AR_small"] == 1.0


def test_explicit_area_field_overrides_tlbr():
    # tiny tlbr but declared large area: bucket follows the area field
    gts = [GroundTruth(0, 0, (0, 0, 10, 10), area=10000.0)]
    dets = [Detection(0, 0, 0.9, (0, 0, 10, 10), area=10000.0)]
    s = coco_summary(dets, gts)
    # small bucket is empty (the GT declares a large area) -> -1 (N/A)
    assert s["AP_large"] == 1.0 and s["AP_small"] == -1.0


def test_ar_caps_per_image_per_class():
    # 2 GTs, 3 dets: best det misses, the next two hit -> AR@1 = 0
    gts = [G(0, (0, 0, 50, 50)), G(0, (100, 100, 150, 150))]
    dets = [
        D(0, 0.9, (300, 300, 350, 350)),
        D(0, 0.8, (0, 0, 50, 50)),
        D(0, 0.7, (100, 100, 150, 150)),
    ]
    s = coco_summary(dets, gts)
    assert s["AR@1"] == 0.0
    assert s["AR@10"] == 1.0


def test_random_cross_check_vs_single_threshold_calculator():
    rng = np.random.RandomState(7)
    dets, gts = [], []
    for img in range(6):
        for cls in range(3):
            for _ in range(rng.randint(1, 4)):
                t, l = rng.uniform(0, 300, 2)
                h, w = rng.uniform(20, 120, 2)
                gts.append(G(img, (t, l, t + h, l + w), cls))
            for _ in range(rng.randint(0, 5)):
                t, l = rng.uniform(0, 300, 2)
                h, w = rng.uniform(20, 120, 2)
                dets.append(D(img, float(rng.uniform(0.1, 1)),
                              (t, l, t + h, l + w), cls))
    s = coco_summary(dets, gts)
    # every class has GT in every image set -> present-class means align
    ap50 = average_precision(dets, gts, iou_threshold=0.5)["mAP"]
    assert abs(s["AP50"] - ap50) < 1e-3
    assert abs(s["AP"] - coco_map_50_95(dets, gts)) < 1e-3
    assert 0.0 <= s["AR@100"] <= 1.0


def test_match_with_ignores_degenerates_to_greedy_tp():
    """The three greedy matchers share one semantics contract (conf-desc
    first-match-wins, last-max-IoU tie-break, no zero-IoU matches).  With
    no ignored GTs, _match_with_ignores must produce exactly _greedy_tp's
    TP flags on random IoU matrices at every threshold — the cross-check
    that keeps the ignore-aware path from drifting (match_detections vs
    _greedy_tp is covered by test_eval's randomized cross-check)."""
    from yolodl_tpu.loss.average_precision import (_greedy_tp,
                                                   _match_with_ignores)

    rng = np.random.RandomState(7)
    for trial in range(20):
        n_det, n_gt = rng.randint(0, 9), rng.randint(0, 7)
        ious = rng.uniform(0, 1, (n_det, n_gt))
        ious[rng.uniform(size=ious.shape) < 0.3] = 0.0  # zero-IoU pairs
        ious[rng.uniform(size=ious.shape) < 0.2] = 0.5  # forced ties
        for thr in (0.25, 0.5, 0.75):
            tp = _greedy_tp(ious, thr)
            dtm, dt_ig = _match_with_ignores(
                ious, [False] * n_gt, thr)
            assert not dt_ig.any()
            np.testing.assert_array_equal(
                tp, dtm > -1, err_msg=f"trial={trial} thr={thr}")
