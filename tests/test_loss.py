"""Matcher, loss, NMS, inference tests.

The matcher is checked against a scalar python re-implementation of the
reference algorithm (pred_target_matching.rs) — the same cross-check role
the reference's ndarray debug-asserts play (SURVEY §4 tier 3).
"""

import math
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

from yolodl_tpu.loss import (
    LossConfig,
    MatcherConfig,
    NmsOutput,
    match_targets,
    non_max_suppression,
    yolo_inference,
    yolo_loss,
)
from yolodl_tpu.loss.yolo_loss import bce_with_logits, focal, soft_cross_entropy
from yolodl_tpu.ops.detect import DetectionInfo, MergedDetection


def make_merged(rng, batch=2, num_classes=3, layers=((8, 8, 2), (4, 4, 2))):
    """Random MergedDetection with given (H, W, A) per layer."""
    infos = []
    begin = 0
    boxes, objs, classes = [], [], []
    for fh, fw, a in layers:
        anchors = tuple((0.1 * (i + 1), 0.15 * (i + 1)) for i in range(a))
        n = a * fh * fw
        infos.append(DetectionInfo(fh, fw, anchors, begin, begin + n))
        begin += n
        cy = rng.uniform(0, 1, (batch, n, 1))
        cx = rng.uniform(0, 1, (batch, n, 1))
        h = rng.uniform(0.05, 0.4, (batch, n, 1))
        w = rng.uniform(0.05, 0.4, (batch, n, 1))
        boxes.append(np.concatenate([cy, cx, h, w], axis=-1))
        objs.append(rng.normal(size=(batch, n)))
        classes.append(rng.normal(size=(batch, n, num_classes)))
    return MergedDetection(
        cycxhw=jnp.asarray(np.concatenate(boxes, 1), jnp.float32),
        obj_logit=jnp.asarray(np.concatenate(objs, 1), jnp.float32),
        class_logit=jnp.asarray(np.concatenate(classes, 1), jnp.float32),
        infos=tuple(infos),
    )


def reference_matcher(infos, gt_list, rect4=True, thresh=4.0):
    """Scalar re-implementation of CyCxHWMatcher (pred_target_matching.rs)."""
    matchings = {}  # flat -> (dist, gt_index)
    for gt_idx, (cy, cx, h, w, _cls) in enumerate(gt_list):
        if h == 0 or w == 0:
            continue
        for layer_idx, info in enumerate(infos):
            fh, fw = info.feature_h, info.feature_w
            gy, gx = cy * fh, cx * fw
            row, col = math.floor(gy), math.floor(gx)
            fy, fx = gy - row, gx - col
            cells = [(row, col)]
            if fy < 0.5:
                cells.append((row - 1, col))
            if fx < 0.5:
                cells.append((row, col - 1))
            if rect4 and fy > 0.5:
                cells.append((row + 1, col))
            if rect4 and fx > 0.5:
                cells.append((row, col + 1))
            cells = [(r, c) for r, c in cells if 0 <= r < fh and 0 <= c < fw]
            for a_idx, (ah, aw) in enumerate(info.anchors):
                if max(h / ah, ah / h, w / aw, aw / w) > thresh:
                    continue
                for r, c in cells:
                    flat = info.flat_begin + (a_idx * fh + r) * fw + c
                    dist = (cy - (r + 0.5) / fh) ** 2 + (cx - (c + 0.5) / fw) ** 2
                    if flat not in matchings or dist < matchings[flat][0] - 1e-12:
                        matchings[flat] = (dist, gt_idx)
    return {flat: gt for flat, (d, gt) in matchings.items()}


def pad_targets(gt_per_image, max_gt=16):
    b = len(gt_per_image)
    boxes = np.zeros((b, max_gt, 4), np.float32)
    classes = np.zeros((b, max_gt), np.int32)
    mask = np.zeros((b, max_gt), bool)
    for i, gts in enumerate(gt_per_image):
        for j, (cy, cx, h, w, cls) in enumerate(gts):
            boxes[i, j] = (cy, cx, h, w)
            classes[i, j] = cls
            mask[i, j] = True
    return jnp.asarray(boxes), jnp.asarray(classes), jnp.asarray(mask)


class TestMatcher:
    def test_against_scalar_reference(self, rng):
        pred = make_merged(rng)
        gt = [
            [(0.31, 0.42, 0.2, 0.25, 1), (0.72, 0.18, 0.12, 0.3, 0), (0.5, 0.5, 0.08, 0.08, 2)],
            [(0.12, 0.9, 0.3, 0.22, 2)],
        ]
        boxes, classes, mask = pad_targets(gt)
        out = match_targets(pred, boxes, classes, mask)

        for b in range(2):
            expect = reference_matcher(pred.infos, gt[b])
            got = {}
            flat = np.asarray(out.flat[b])
            valid = np.asarray(out.valid[b])
            gt_box = np.asarray(out.gt_cycxhw[b])
            for k in np.nonzero(valid)[0]:
                got[int(flat[k])] = tuple(gt_box[k])
            assert set(got.keys()) == set(expect.keys())
            for f, gt_idx in expect.items():
                np.testing.assert_allclose(
                    got[f], gt[b][gt_idx][:4], atol=1e-6,
                    err_msg=f"batch {b} flat {f}",
                )

    def test_rect2_matches_fewer_cells(self, rng):
        pred = make_merged(rng)
        gt = [[(0.63, 0.68, 0.2, 0.2, 0)], []]
        boxes, classes, mask = pad_targets(gt)
        n4 = int(match_targets(pred, boxes, classes, mask,
                               MatcherConfig(match_grid="rect4")).num_matched())
        n2 = int(match_targets(pred, boxes, classes, mask,
                               MatcherConfig(match_grid="rect2")).num_matched())
        assert n2 < n4
        # scalar reference agrees for rect2 too
        expect = reference_matcher(pred.infos, gt[0], rect4=False)
        assert n2 == len(expect)

    def test_zero_size_boxes_skipped(self, rng):
        pred = make_merged(rng)
        boxes, classes, mask = pad_targets([[(0.5, 0.5, 0.0, 0.1, 0)], []])
        out = match_targets(pred, boxes, classes, mask)
        assert int(out.num_matched()) == 0

    def test_anchor_scale_gate(self, rng):
        pred = make_merged(rng, layers=((8, 8, 1),))  # single anchor (0.1, 0.15)
        # box 10× the anchor size: rejected at thresh 4, accepted at 100
        boxes, classes, mask = pad_targets([[(0.5, 0.5, 1.0, 1.0, 0)]])
        out4 = match_targets(pred, boxes, classes, mask, MatcherConfig(anchor_scale_thresh=4.0))
        out100 = match_targets(pred, boxes, classes, mask, MatcherConfig(anchor_scale_thresh=100.0))
        assert int(out4.num_matched()) == 0
        assert int(out100.num_matched()) > 0

    def test_dedupe_keeps_nearest(self, rng):
        pred = make_merged(rng, layers=((4, 4, 1),))
        # two GTs snapping to the same cell (1,1): centers at .30/.35 both in cell 1
        gt = [[(0.30, 0.30, 0.2, 0.2, 0), (0.35, 0.35, 0.2, 0.2, 1)]]
        boxes, classes, mask = pad_targets(gt)
        out = match_targets(pred, boxes, classes, mask)
        expect = reference_matcher(pred.infos, gt[0])
        flat = np.asarray(out.flat[0])
        valid = np.asarray(out.valid[0])
        cls = np.asarray(out.gt_class[0])
        got = {int(flat[k]): int(cls[k]) for k in np.nonzero(valid)[0]}
        assert got == {f: gt[0][g][4] for f, g in expect.items()}

    def test_jit_compatible(self, rng):
        pred = make_merged(rng)
        boxes, classes, mask = pad_targets([[(0.5, 0.5, 0.2, 0.2, 0)], []])
        jitted = jax.jit(lambda p, b, c, m: match_targets(p, b, c, m).num_matched())
        assert int(jitted(pred, boxes, classes, mask)) > 0


class TestLoss:
    def _setup(self, rng):
        pred = make_merged(rng)
        gt = [[(0.31, 0.42, 0.2, 0.25, 1), (0.72, 0.18, 0.12, 0.3, 0)], [(0.5, 0.5, 0.2, 0.2, 2)]]
        return pred, pad_targets(gt)

    def test_loss_finite_and_weighted(self, rng):
        pred, (boxes, classes, mask) = self._setup(rng)
        cfg = LossConfig()
        out, aux = yolo_loss(pred, boxes, classes, mask, cfg)
        for v in (out.total_loss, out.iou_loss, out.classification_loss, out.objectness_loss):
            assert np.isfinite(float(v))
        np.testing.assert_allclose(
            float(out.total_loss),
            0.05 * float(out.iou_loss) + 0.58 * float(out.classification_loss)
            + 1.0 * float(out.objectness_loss),
            rtol=1e-5,
        )

    def test_all_metrics_and_kinds(self, rng):
        pred, (boxes, classes, mask) = self._setup(rng)
        for metric in ("iou", "giou", "diou", "ciou", "hausdorff"):
            out, _ = yolo_loss(pred, boxes, classes, mask, LossConfig(box_metric=metric))
            assert np.isfinite(float(out.total_loss)), metric
        for ok in ("bce", "focal", "l2"):
            for ck in ("bce", "focal", "cross_entropy", "l2"):
                out, _ = yolo_loss(
                    pred, boxes, classes, mask,
                    LossConfig(objectness_loss_kind=ok, classification_loss_kind=ck),
                )
                assert np.isfinite(float(out.total_loss)), (ok, ck)

    def test_empty_targets_zero_iou_cls(self, rng):
        pred = make_merged(rng)
        boxes, classes, mask = pad_targets([[], []])
        out, _ = yolo_loss(pred, boxes, classes, mask)
        assert float(out.iou_loss) == 0.0
        assert float(out.classification_loss) == 0.0
        assert float(out.objectness_loss) > 0.0  # pushes obj towards 0

    def test_gradients(self, rng):
        pred, (boxes, classes, mask) = self._setup(rng)

        def f(cycxhw, obj, cls):
            p = MergedDetection(cycxhw, obj, cls, pred.infos)
            return yolo_loss(p, boxes, classes, mask)[0].total_loss

        g = jax.grad(f, argnums=(0, 1, 2))(pred.cycxhw, pred.obj_logit, pred.class_logit)
        for gi in g:
            assert bool(jnp.all(jnp.isfinite(gi)))
        assert float(jnp.abs(g[1]).sum()) > 0

    def test_perfect_prediction_low_loss(self, rng):
        """Predictions equal to targets with confident logits → small loss."""
        pred = make_merged(rng, batch=1, layers=((4, 4, 1),))
        gt = [[(0.38, 0.38, 0.11, 0.16, 1)]]
        boxes, classes, mask = pad_targets(gt)
        m = match_targets(pred, boxes, classes, mask)
        # craft a prediction: boxes = target at matched cells, obj logit high
        # at matched cells / low elsewhere, correct class logit high
        flat = np.asarray(m.flat[0])
        valid = np.asarray(m.valid[0])
        n = pred.num_flats
        cycxhw = np.tile(np.asarray([[0.38, 0.38, 0.11, 0.16]], np.float32), (n, 1))
        obj = np.full((n,), -20.0, np.float32)
        cls = np.full((n, 3), -20.0, np.float32)
        for k in np.nonzero(valid)[0]:
            obj[flat[k]] = 20.0
            cls[flat[k], 1] = 20.0
        perfect = MergedDetection(
            jnp.asarray(cycxhw[None]), jnp.asarray(obj[None]), jnp.asarray(cls[None]), pred.infos
        )
        out, _ = yolo_loss(perfect, boxes, classes, mask)
        # label smoothing (pos=0.995) leaves a ~0.1 cls-loss floor for ±20
        # logits: total ≈ 0.58·0.1 = 0.058
        assert float(out.total_loss) < 0.08
        # a random prediction is much worse
        rand_out, _ = yolo_loss(pred, boxes, classes, mask)
        assert float(rand_out.total_loss) > float(out.total_loss) * 5

    def test_smooth_objectness_uses_iou(self, rng):
        pred, (boxes, classes, mask) = self._setup(rng)
        out0, _ = yolo_loss(pred, boxes, classes, mask, LossConfig(smooth_objectness_coef=0.0))
        out1, _ = yolo_loss(pred, boxes, classes, mask, LossConfig(smooth_objectness_coef=0.5))
        assert float(out0.objectness_loss) != float(out1.objectness_loss)


class TestElementwiseLosses:
    def test_bce_matches_formula(self, rng):
        x = jnp.asarray(rng.normal(size=(5, 3)), jnp.float32)
        t = jnp.asarray(rng.uniform(size=(5, 3)), jnp.float32)
        expect = -(t * np.log(1 / (1 + np.exp(-np.asarray(x))))
                   + (1 - t) * np.log(1 - 1 / (1 + np.exp(-np.asarray(x)))))
        np.testing.assert_allclose(bce_with_logits(x, t), expect, atol=1e-5)

    def test_bce_pos_weight(self):
        x = jnp.asarray([[0.0]])
        t = jnp.asarray([[1.0]])
        base = float(bce_with_logits(x, t)[0, 0])
        weighted = float(bce_with_logits(x, t, pos_weight=2.0)[0, 0])
        assert weighted == pytest.approx(2 * base)

    def test_focal_downweights_easy(self):
        x = jnp.asarray([[10.0, -10.0]])
        t = jnp.asarray([[1.0, 1.0]])
        base = bce_with_logits(x, t)
        f = focal(base, x, t)
        # easy positive (logit 10) is suppressed much more than hard one
        assert float(f[0, 0]) / float(base[0, 0]) < 0.01
        assert float(f[0, 1]) / float(base[0, 1]) > 0.2

    def test_soft_ce(self, rng):
        x = jnp.asarray(rng.normal(size=(4, 5)), jnp.float32)
        t = jax.nn.one_hot(jnp.asarray([0, 1, 2, 3]), 5)
        expect = -np.take_along_axis(
            np.asarray(jax.nn.log_softmax(x)), np.asarray([[0], [1], [2], [3]]), axis=1
        )[:, 0]
        np.testing.assert_allclose(soft_cross_entropy(x, t), expect, atol=1e-5)


class TestNms:
    def _pred_with_boxes(self, entries, num_classes=2, grid=8):
        """entries: list of (cy,cx,h,w,class,conf_logit). Builds a 1-anchor head."""
        a, n = 1, grid * grid
        info = DetectionInfo(grid, grid, ((0.2, 0.2),), 0, n)
        cycxhw = np.full((1, n, 4), 0.5, np.float32)
        cycxhw[..., 2:] = 0.01
        obj = np.full((1, n), -20.0, np.float32)
        cls = np.full((1, n, num_classes), -20.0, np.float32)
        for i, (cy, cx, h, w, c, logit) in enumerate(entries):
            cycxhw[0, i] = (cy, cx, h, w)
            obj[0, i] = logit
            cls[0, i, c] = logit
        return MergedDetection(jnp.asarray(cycxhw), jnp.asarray(obj), jnp.asarray(cls), (info,))

    def test_suppresses_overlapping(self):
        pred = self._pred_with_boxes([
            (0.5, 0.5, 0.2, 0.2, 0, 8.0),   # winner
            (0.51, 0.51, 0.2, 0.2, 0, 5.0), # overlaps winner → suppressed
            (0.2, 0.2, 0.1, 0.1, 1, 6.0),   # disjoint → kept
        ])
        out = non_max_suppression(pred, iou_threshold=0.5, confidence_threshold=0.3,
                                  max_dets=16)
        kept = np.asarray(out.valid[0])
        inst = np.asarray(out.instances[0])
        kept_instances = set(inst[kept].tolist())
        assert 0 in kept_instances and 2 in kept_instances
        assert 1 not in kept_instances

    def test_confidence_threshold(self):
        pred = self._pred_with_boxes([(0.5, 0.5, 0.2, 0.2, 0, -5.0)])
        out = non_max_suppression(pred, confidence_threshold=0.1, max_dets=16)
        assert int(out.num_valid()[0]) == 0

    def test_suppress_by_class_keeps_cross_class_overlap(self):
        pred = self._pred_with_boxes([
            (0.5, 0.5, 0.2, 0.2, 0, 8.0),
            (0.51, 0.51, 0.2, 0.2, 1, 5.0),
        ])
        out_all = non_max_suppression(pred, iou_threshold=0.5, confidence_threshold=0.3,
                                      suppress_by_class=False, max_dets=16)
        out_cls = non_max_suppression(pred, iou_threshold=0.5, confidence_threshold=0.3,
                                      suppress_by_class=True, max_dets=16)
        assert int(out_all.num_valid()[0]) == 1
        assert int(out_cls.num_valid()[0]) == 2

    def test_inference_one_class_per_instance(self):
        # one very confident box with two confident classes (both above thr)
        a, n = 1, 4
        info = DetectionInfo(2, 2, ((0.2, 0.2),), 0, n)
        cycxhw = np.full((1, n, 4), 0.5, np.float32)
        obj = np.full((1, n), -20.0, np.float32)
        cls = np.full((1, n, 2), -20.0, np.float32)
        obj[0, 0] = 8.0
        cls[0, 0, 0] = 4.0
        cls[0, 0, 1] = 5.0
        pred = MergedDetection(jnp.asarray(cycxhw), jnp.asarray(obj), jnp.asarray(cls), (info,))
        out = non_max_suppression(pred, iou_threshold=0.99, confidence_threshold=0.3,
                                  suppress_by_class=True, max_dets=8)
        assert int(out.num_valid()[0]) == 2  # both classes survive class-wise NMS
        inf_out = yolo_inference(out, num_flats=n)
        assert int(inf_out.num_valid()[0]) == 1
        k = np.nonzero(np.asarray(inf_out.valid[0]))[0][0]
        assert int(inf_out.classes[0, k]) == 1  # argmax class

    def test_jit(self):
        pred = self._pred_with_boxes([(0.5, 0.5, 0.2, 0.2, 0, 8.0)])
        f = jax.jit(lambda p: non_max_suppression(p, max_dets=16).num_valid())
        assert int(f(pred)[0]) == 1


class TestDiouNms:
    def test_diou_suppresses_less_for_distant_boxes(self):
        from tests.test_loss import TestNms as _T

        helper = _T()
        # two same-class boxes with IoU just above threshold but distant
        # centers: DIoU-NMS (iou - dist/diag) keeps both, greedy kills one
        pred = helper._pred_with_boxes([
            (0.45, 0.45, 0.4, 0.4, 0, 8.0),
            (0.62, 0.62, 0.4, 0.4, 0, 5.0),  # IoU ≈ 0.30
        ])
        from yolodl_tpu.loss import non_max_suppression

        # pair IoU ≈ 0.198; DIoU ≈ 0.198 − (0.089)^0.6 ≈ −0.04 → threshold
        # 0.15 separates the two policies
        greedy = non_max_suppression(pred, iou_threshold=0.15,
                                     confidence_threshold=0.3, max_dets=16)
        diou = non_max_suppression(pred, iou_threshold=0.15,
                                   confidence_threshold=0.3, max_dets=16,
                                   kind="diou")
        assert int(greedy.num_valid()[0]) == 1
        assert int(diou.num_valid()[0]) == 2

    def test_matches_darknet_box_diounms_formula(self):
        """Suppression decision equals darknet box_diounms: suppress iff
        iou − (d²/c²)^β > thresh (box.c:214-231), β from beta_nms."""
        import numpy as np

        from yolodl_tpu.loss.nms import _suppress

        rng = np.random.default_rng(3)
        n = 32
        cy, cx = rng.uniform(0.2, 0.8, (2, n))
        h, w = rng.uniform(0.1, 0.4, (2, n))
        tlbr = np.stack([cy - h / 2, cx - w / 2, cy + h / 2, cx + w / 2], -1)
        scores = np.sort(rng.uniform(0.1, 1.0, n))[::-1].copy()
        beta, thresh = 0.6, 0.45

        def diounms(a, b):
            t = max(a[0], b[0]); l = max(a[1], b[1])
            bb = min(a[2], b[2]); r = min(a[3], b[3])
            inter = max(0.0, bb - t) * max(0.0, r - l)
            ua = (a[2]-a[0])*(a[3]-a[1]) + (b[2]-b[0])*(b[3]-b[1]) - inter
            iou = inter / ua if ua > 0 else 0.0
            d = ((a[0]+a[2])/2 - (b[0]+b[2])/2) ** 2 \
                + ((a[1]+a[3])/2 - (b[1]+b[3])/2) ** 2
            et = min(a[0], b[0]); el = min(a[1], b[1])
            eb = max(a[2], b[2]); er = max(a[3], b[3])
            c = (eb - et) ** 2 + (er - el) ** 2
            return iou - (d / c) ** beta if c > 0 else iou

        keep_ref = []
        kept = []
        for i in range(n):
            if all(diounms(tlbr[j], tlbr[i]) <= thresh for j in kept):
                kept.append(i)
            keep_ref.append(i in kept)

        import jax.numpy as jnp

        keep = _suppress(jnp.asarray(tlbr, jnp.float32),
                         jnp.asarray(scores, jnp.float32),
                         jnp.zeros(n, jnp.int32), jnp.ones(n, bool),
                         thresh, kind="diou", beta=beta)
        np.testing.assert_array_equal(np.asarray(keep), np.asarray(keep_ref))

    def test_parser_beta_nms_default_matches_darknet(self):
        """parser.c:490: beta_nms defaults to 0.6."""
        from yolodl_tpu.config import darknet_cfg as dk

        darknet = dk.Darknet.load("cfg/darknet/yolov4-csp.cfg")
        yolo = [l for l in darknet.layers
                if getattr(l, "nms_kind", None) is not None]
        assert yolo and all(l.beta_nms == 0.6 for l in yolo)

        from yolodl_tpu.loss.nms import nms_options_from_darknet

        assert nms_options_from_darknet(darknet) == ("diou", 0.6)


class TestNmsFixpointEquivalence:
    def test_matches_sequential_greedy_reference(self, rng):
        """The Jacobi-fixpoint suppression must equal scalar greedy NMS."""
        from yolodl_tpu.loss.nms import _suppress

        for trial in range(10):
            k = 64
            r = np.random.default_rng(trial)
            centers = r.uniform(0.1, 0.9, (k, 2))
            sizes = r.uniform(0.05, 0.45, (k, 2))
            tlbr = np.concatenate([centers - sizes / 2, centers + sizes / 2], 1)
            scores = np.sort(r.uniform(0.1, 1.0, k))[::-1].copy()
            group = r.integers(0, 3, k)
            valid = r.uniform(size=k) > 0.2

            got = np.asarray(
                _suppress(
                    jnp.asarray(tlbr, jnp.float32), jnp.asarray(scores, jnp.float32),
                    jnp.asarray(group), jnp.asarray(valid), 0.45,
                )
            )

            # scalar greedy reference
            def iou(a, b):
                t = max(a[0], b[0]); l = max(a[1], b[1])
                bb = min(a[2], b[2]); rr = min(a[3], b[3])
                inter = max(bb - t, 0) * max(rr - l, 0)
                ua = (a[2] - a[0]) * (a[3] - a[1]) + (b[2] - b[0]) * (b[3] - b[1]) - inter
                return inter / (ua + 1e-16)

            keep = valid.copy()
            for i in range(k):
                if not keep[i]:
                    continue
                for j in range(i):
                    if keep[j] and group[j] == group[i] and iou(tlbr[j], tlbr[i]) > 0.45:
                        keep[i] = False
                        break
            np.testing.assert_array_equal(got, keep, err_msg=f"trial {trial}")


class TestIgnoreThresh:
    def test_high_iou_unmatched_cells_ignored(self, rng):
        from tests.test_loss import make_merged, pad_targets

        pred = make_merged(rng, batch=1, layers=((4, 4, 1),))
        gt = [[(0.4, 0.4, 0.3, 0.3, 0)]]
        boxes, classes, mask = pad_targets(gt)
        # craft: every predicted box equals the GT box → all unmatched cells
        # have IoU 1 with the GT and must drop out of the objectness loss
        n = pred.num_flats
        same = jnp.tile(jnp.asarray([[0.4, 0.4, 0.3, 0.3]], jnp.float32), (n, 1))[None]
        pred2 = MergedDetection(same, pred.obj_logit, pred.class_logit, pred.infos)

        base, _ = yolo_loss(pred2, boxes, classes, mask, LossConfig())
        ignored, _ = yolo_loss(
            pred2, boxes, classes, mask, LossConfig(ignore_thresh=0.7)
        )
        # with ignore_thresh, only matched cells contribute → different,
        # and strictly smaller magnitude of penalty on unmatched negatives
        assert float(ignored.objectness_loss) < float(base.objectness_loss)

    def test_none_reproduces_reference_behavior(self, rng):
        from tests.test_loss import make_merged, pad_targets

        pred = make_merged(rng)
        boxes, classes, mask = pad_targets([[(0.5, 0.5, 0.2, 0.2, 1)], []])
        a, _ = yolo_loss(pred, boxes, classes, mask, LossConfig())
        b, _ = yolo_loss(pred, boxes, classes, mask, LossConfig(ignore_thresh=None))
        assert float(a.total_loss) == float(b.total_loss)


class TestDarknetOptionAdoption:
    """Production-loss adoption of darknet's [yolo] training options
    (round-4: iou_thresh / objectness_smooth / max_delta, VERDICT r3
    item 1 tail).  These are production-form analogues — the darknet-EXACT
    delta semantics live in loss/darknet_loss.py and are oracle-pinned in
    test_parity_train_detection.py."""

    def _single_head(self, rng):
        return make_merged(rng, batch=1, layers=((8, 8, 3),))

    def test_iou_thresh_adds_shape_iou_matches(self, rng):
        """An anchor excluded by the v5 ratio gate (ratio > 4) but passing
        the shape-IoU gate (IoU 0.22 > 0.2) matches at the center cell
        (yolo_layer.c:640-656 analogue)."""
        pred = self._single_head(rng)
        # anchors (h, w) = (0.1,0.15), (0.2,0.3), (0.3,0.45); a box 4.5x
        # anchor0's width passes shape IoU 1/4.5 ≈ 0.22 only
        gt = [[(0.5, 0.5, 0.1, 0.15 * 4.5, 0)]]
        boxes, classes, mask = pad_targets(gt)
        base, aux0 = yolo_loss(pred, boxes, classes, mask,
                               LossConfig(ignore_thresh=None, iou_thresh=None))
        more, aux1 = yolo_loss(pred, boxes, classes, mask,
                               LossConfig(ignore_thresh=None, iou_thresh=0.2))
        n0 = int(aux0.matching.num_matched())
        n1 = int(aux1.matching.num_matched())
        assert n1 > n0, (n0, n1)
        # per-head tuple form with the threshold at 1.0 = no-op
        _, aux2 = yolo_loss(pred, boxes, classes, mask,
                            LossConfig(ignore_thresh=None, iou_thresh=(1.0,)))
        assert int(aux2.matching.num_matched()) == n0
        with pytest.raises(ValueError):
            yolo_loss(pred, boxes, classes, mask,
                      LossConfig(ignore_thresh=None, iou_thresh=(0.2, 0.2)))

    def test_objectness_smooth_trains_ignored_cells_toward_iou(self, rng):
        """With objectness_smooth, ignored cells (best IoU above
        ignore_thresh) keep an objectness loss toward their best IoU
        instead of dropping out (yolo_layer.c:457-462 analogue)."""
        pred = self._single_head(rng)
        gt = [[(0.4, 0.4, 0.3, 0.3, 0)]]
        boxes, classes, mask = pad_targets(gt)
        n = pred.num_flats
        same = jnp.tile(jnp.asarray([[0.4, 0.4, 0.3, 0.3]], jnp.float32),
                        (n, 1))[None]
        pred2 = MergedDetection(same, pred.obj_logit, pred.class_logit,
                                pred.infos)
        masked, _ = yolo_loss(
            pred2, boxes, classes, mask,
            LossConfig(ignore_thresh=0.7, objectness_smooth=False))
        smooth, _ = yolo_loss(
            pred2, boxes, classes, mask,
            LossConfig(ignore_thresh=0.7, objectness_smooth=True))
        # the smooth form re-engages the ignored cells (IoU target = 1 here,
        # logits are random → nonzero extra loss)
        assert float(smooth.objectness_loss) > float(masked.objectness_loss)
        # unresolved "auto" behaves as disabled
        auto, _ = yolo_loss(
            pred2, boxes, classes, mask, LossConfig(ignore_thresh=0.7))
        assert float(auto.objectness_loss) == float(masked.objectness_loss)

    def test_max_delta_clips_box_gradient(self, rng):
        """max_delta clamps the gradient flowing into the matched pred-box
        coordinates (clip_value analogue); a tiny bound shrinks the
        box-gradient norm, None leaves it unchanged."""
        pred = self._single_head(rng)
        gt = [[(0.5, 0.5, 0.2, 0.3, 1)]]
        boxes, classes, mask = pad_targets(gt)

        def iou_part(cycxhw, cfg):
            p = MergedDetection(cycxhw, pred.obj_logit, pred.class_logit,
                                pred.infos)
            out, _ = yolo_loss(p, boxes, classes, mask, cfg)
            return out.iou_loss

        cfg_none = LossConfig(ignore_thresh=None, max_delta=None)
        cfg_tiny = LossConfig(ignore_thresh=None, max_delta=1e-7)
        cfg_tuple = LossConfig(ignore_thresh=None, max_delta=(1e-7,))
        g_none = jax.grad(iou_part)(pred.cycxhw, cfg_none)
        g_tiny = jax.grad(iou_part)(pred.cycxhw, cfg_tiny)
        g_tup = jax.grad(iou_part)(pred.cycxhw, cfg_tuple)
        n_none = float(jnp.sum(jnp.abs(g_none)))
        n_tiny = float(jnp.sum(jnp.abs(g_tiny)))
        assert n_none > 0
        assert n_tiny < n_none * 1e-2
        assert float(jnp.sum(jnp.abs(g_tup))) == pytest.approx(n_tiny)
        # value (loss) itself is untouched — only the gradient is clipped
        assert float(iou_part(pred.cycxhw, cfg_none)) == \
            pytest.approx(float(iou_part(pred.cycxhw, cfg_tiny)))

    def test_auto_resolution_from_darknet_graph(self):
        """The train CLI resolves every "auto" option from the model cfg's
        per-head values (mixed max_delta stays a tuple, uniform iou_thresh
        collapses, objectness_smooth any-head)."""
        from yolodl_tpu.cli.train_main import _resolve_auto_loss_options
        from yolodl_tpu.config import darknet_cfg as dk
        from yolodl_tpu.config.app_config import parse_loss_config
        from yolodl_tpu.graph.from_darknet import graph_from_darknet

        cfg_text = """[net]
width=64
height=64
channels=3
[convolutional]
filters=6
size=1
activation=linear
[yolo]
mask=0
anchors=10,14
classes=1
num=1
ignore_thresh=0.7
iou_thresh=0.213
objectness_smooth=1
max_delta=5
[route]
layers=-2
[convolutional]
filters=6
size=1
activation=linear
[yolo]
mask=0
anchors=10,14
classes=1
num=1
ignore_thresh=0.7
iou_thresh=0.213
max_delta=2
"""
        graph = graph_from_darknet(dk.Darknet.from_str(cfg_text))

        import dataclasses as _dc

        @_dc.dataclass
        class Holder:
            loss: object

        cfg = _resolve_auto_loss_options(Holder(parse_loss_config({})), graph)
        assert cfg.loss.ignore_thresh == 0.7
        assert cfg.loss.iou_thresh == 0.213
        assert cfg.loss.objectness_smooth is True
        assert cfg.loss.max_delta == (5.0, 2.0)
        # explicit overrides win over auto
        explicit = Holder(parse_loss_config(
            {"iou_thresh": None, "objectness_smooth": False,
             "max_delta": 3.0, "ignore_thresh": 0.5}))
        cfg2 = _resolve_auto_loss_options(explicit, graph)
        assert cfg2.loss.iou_thresh is None
        assert cfg2.loss.objectness_smooth is False
        assert cfg2.loss.max_delta == 3.0
        assert cfg2.loss.ignore_thresh == 0.5


class TestClassModeAgreement:
    def test_argmax_matches_pairs_for_unambiguous_classes(self):
        """When each instance has one dominant class, the production argmax
        path and the reference pairs path keep the same detections."""
        helper = TestNms()
        pred = helper._pred_with_boxes([
            (0.2, 0.2, 0.15, 0.15, 0, 7.0),
            (0.6, 0.6, 0.2, 0.2, 1, 6.0),
            (0.85, 0.3, 0.1, 0.1, 0, 5.0),
        ])
        a = non_max_suppression(pred, iou_threshold=0.5, confidence_threshold=0.3,
                                max_dets=16, class_mode="pairs")
        b = non_max_suppression(pred, iou_threshold=0.5, confidence_threshold=0.3,
                                max_dets=16, class_mode="argmax")

        def kept(out):
            inst = np.asarray(out.instances[0])
            cls = np.asarray(out.classes[0])
            valid = np.asarray(out.valid[0])
            return {(int(inst[k]), int(cls[k])) for k in np.nonzero(valid)[0]}

        assert kept(a) == kept(b) == {(0, 0), (1, 1), (2, 0)}


class TestPerLayerIgnoreThresh:
    def test_tuple_matches_scalar_when_uniform(self, rng):
        pred = make_merged(rng)
        boxes, classes, mask = pad_targets([[(0.5, 0.5, 0.2, 0.2, 1)], []])
        a, _ = yolo_loss(pred, boxes, classes, mask,
                         LossConfig(ignore_thresh=0.6))
        b, _ = yolo_loss(pred, boxes, classes, mask,
                         LossConfig(ignore_thresh=(0.6, 0.6)))
        assert float(a.total_loss) == float(b.total_loss)

    def test_per_layer_thresholds_apply_per_flat_range(self, rng):
        # every predicted box == the GT box → best_iou = 1 everywhere; a
        # (1.01, 0.5) tuple ignores only the second head's unmatched cells
        pred = make_merged(rng, batch=1)
        gt = [[(0.4, 0.4, 0.3, 0.3, 0)]]
        boxes, classes, mask = pad_targets(gt)
        n = pred.num_flats
        same = jnp.tile(jnp.asarray([[0.4, 0.4, 0.3, 0.3]], jnp.float32),
                        (n, 1))[None]
        pred2 = MergedDetection(same, pred.obj_logit, pred.class_logit,
                                pred.infos)
        none_ignored, _ = yolo_loss(pred2, boxes, classes, mask,
                                    LossConfig(ignore_thresh=(1.01, 1.01)))
        half_ignored, _ = yolo_loss(pred2, boxes, classes, mask,
                                    LossConfig(ignore_thresh=(1.01, 0.5)))
        all_ignored, _ = yolo_loss(pred2, boxes, classes, mask,
                                   LossConfig(ignore_thresh=(0.5, 0.5)))
        assert (float(all_ignored.objectness_loss)
                < float(half_ignored.objectness_loss)
                < float(none_ignored.objectness_loss))

    def test_wrong_tuple_length_rejected(self, rng):
        pred = make_merged(rng)
        boxes, classes, mask = pad_targets([[(0.5, 0.5, 0.2, 0.2, 1)], []])
        with pytest.raises(ValueError, match="detect heads"):
            yolo_loss(pred, boxes, classes, mask,
                      LossConfig(ignore_thresh=(0.5,)))

    def test_auto_resolves_from_darknet_graph(self, tmp_path):
        from yolodl_tpu.cli.train_main import _resolve_auto_loss_options
        from yolodl_tpu.config import darknet_cfg as dk
        from yolodl_tpu.graph.from_darknet import graph_from_darknet

        import dataclasses

        @dataclasses.dataclass(frozen=True)
        class FakeAppConfig:
            loss: LossConfig

        cfg = os.path.join(REPO_ROOT, "cfg/darknet/yolov4-tiny.cfg")
        graph = graph_from_darknet(dk.Darknet.load(cfg))
        # yolov4-tiny carries ignore_thresh=.7 on both heads
        assert graph.detect_ignore_thresh == (0.7, 0.7)
        assert graph.detect_truth_thresh == (1.0, 1.0)
        resolved = _resolve_auto_loss_options(
            FakeAppConfig(loss=LossConfig()), graph)
        assert resolved.loss.ignore_thresh == 0.7
        # explicit values win over auto
        kept = _resolve_auto_loss_options(
            FakeAppConfig(loss=LossConfig(ignore_thresh=None)), graph)
        assert kept.loss.ignore_thresh is None

    def test_auto_alone_is_disabled(self, rng):
        pred = make_merged(rng)
        boxes, classes, mask = pad_targets([[(0.5, 0.5, 0.2, 0.2, 1)], []])
        a, _ = yolo_loss(pred, boxes, classes, mask,
                         LossConfig(ignore_thresh="auto"))
        b, _ = yolo_loss(pred, boxes, classes, mask,
                         LossConfig(ignore_thresh=None))
        assert float(a.total_loss) == float(b.total_loss)


class TestGaussianUncertaintyLoss:
    def _gaussian_pred(self, rng, sigma=0.5):
        pred = make_merged(rng, batch=1, layers=((4, 4, 2),))
        sig = jnp.full((1, pred.num_flats, 4), sigma, jnp.float32)
        unc = jnp.mean(sig, -1)
        return MergedDetection(pred.cycxhw, pred.obj_logit, pred.class_logit,
                               pred.infos, uncertainty=unc, sigmas=sig)

    def test_auto_enabled_for_gaussian_heads(self, rng):
        pred = self._gaussian_pred(rng)
        boxes, classes, mask = pad_targets([[(0.5, 0.5, 0.2, 0.2, 1)]])
        out, _ = yolo_loss(pred, boxes, classes, mask, LossConfig())
        assert out.uncertainty_loss is not None
        assert np.isfinite(float(out.uncertainty_loss))
        # the term contributes to the total at iou_loss_weight by default
        out0, _ = yolo_loss(pred, boxes, classes, mask,
                            LossConfig(uncertainty_loss_weight=0.0))
        expect = float(out0.total_loss) + 0.05 * float(out.uncertainty_loss)
        assert abs(float(out.total_loss) - expect) < 1e-5

    def test_plain_heads_have_no_uncertainty_loss(self, rng):
        pred = make_merged(rng)
        boxes, classes, mask = pad_targets([[(0.5, 0.5, 0.2, 0.2, 1)], []])
        out, _ = yolo_loss(pred, boxes, classes, mask, LossConfig())
        assert out.uncertainty_loss is None

    def test_sigma_gradient_flows(self, rng):
        """The NLL trains sigma: d(loss)/d(sigma) is nonzero and pushes a
        too-small sigma up (residuals >> sigma) — the uncertainty is now
        actually trained (VERDICT round-2 missing #1)."""
        pred = make_merged(rng, batch=1, layers=((4, 4, 2),))
        boxes, classes, mask = pad_targets([[(0.5, 0.5, 0.2, 0.2, 1)]])

        def loss_of_sigma(sig_val):
            sig = jnp.full((1, pred.num_flats, 4), sig_val, jnp.float32)
            p = MergedDetection(pred.cycxhw, pred.obj_logit,
                                pred.class_logit, pred.infos,
                                uncertainty=jnp.mean(sig, -1), sigmas=sig)
            out, _ = yolo_loss(p, boxes, classes, mask, LossConfig())
            return out.total_loss

        g_small = float(jax.grad(loss_of_sigma)(0.05))
        assert g_small != 0.0
        # with residuals much larger than sigma, increasing sigma lowers
        # the NLL -> gradient is negative at small sigma
        assert g_small < 0.0

    def test_sigma_minimizes_at_residual_scale(self, rng):
        """For fixed residual d, the NLL is minimized near sigma ~ |d|
        (the calibrated uncertainty) — sanity that the term is a proper
        scoring rule, not a monotone shrink."""
        pred = make_merged(rng, batch=1, layers=((4, 4, 2),))
        # every cell predicts the GT box offset by 0.075 in cy -> matched
        # residual d = (0.075*4, 0, 0, 0), |d| mean-NLL minimum near 0.3
        n = pred.num_flats
        shifted = jnp.tile(
            jnp.asarray([[0.575, 0.5, 0.2, 0.2]], jnp.float32), (n, 1))[None]
        pred = MergedDetection(shifted, pred.obj_logit, pred.class_logit,
                               pred.infos)
        boxes, classes, mask = pad_targets([[(0.5, 0.5, 0.2, 0.2, 1)]])

        def unc_of_sigma(sig_val):
            sig = jnp.full((1, n, 4), sig_val, jnp.float32)
            p = MergedDetection(pred.cycxhw, pred.obj_logit,
                                pred.class_logit, pred.infos,
                                uncertainty=jnp.mean(sig, -1), sigmas=sig)
            out, _ = yolo_loss(p, boxes, classes, mask, LossConfig())
            return float(out.uncertainty_loss)

        vals = {s: unc_of_sigma(s) for s in (0.01, 0.05, 0.15, 0.5, 0.95)}
        best = min(vals, key=vals.get)
        assert best not in (0.01, 0.95), vals  # interior minimum
