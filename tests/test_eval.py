"""AP calculator + benchmark metric tests (average_precision.rs parity)."""

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # e2e/CLI tier: excluded from `pytest -m 'not slow'`

from yolodl_tpu.loss.average_precision import (
    Detection,
    GroundTruth,
    average_precision,
    coco_map_50_95,
    interpolated_ap,
    match_detections,
)
from yolodl_tpu.loss.benchmark import yolo_benchmark
from yolodl_tpu.loss.matcher import match_targets


def det(img, cls, conf, t, l, b, r):
    return Detection(img, cls, conf, (t, l, b, r))


def gt(img, cls, t, l, b, r):
    return GroundTruth(img, cls, (t, l, b, r))


class TestMatching:
    def test_perfect_detection(self):
        gts = [gt(0, 0, 0, 0, 10, 10)]
        dets = [det(0, 0, 0.9, 0, 0, 10, 10)]
        tp, conf, n = match_detections(dets, gts, 0.5)
        assert tp.tolist() == [True] and n == 1

    def test_first_match_wins(self):
        gts = [gt(0, 0, 0, 0, 10, 10)]
        dets = [
            det(0, 0, 0.9, 0, 0, 10, 10),
            det(0, 0, 0.8, 1, 1, 10, 10),  # also overlaps, but GT taken
        ]
        tp, _, _ = match_detections(dets, gts, 0.5)
        assert tp.tolist() == [True, False]

    def test_sorted_by_confidence(self):
        gts = [gt(0, 0, 0, 0, 10, 10)]
        dets = [
            det(0, 0, 0.5, 1, 1, 10, 10),
            det(0, 0, 0.9, 0, 0, 10, 10),  # higher conf matches first
        ]
        tp, conf, _ = match_detections(dets, gts, 0.5)
        assert conf[0] == 0.9 and tp[0]

    def test_cross_image_no_match(self):
        gts = [gt(1, 0, 0, 0, 10, 10)]
        dets = [det(0, 0, 0.9, 0, 0, 10, 10)]
        tp, _, _ = match_detections(dets, gts, 0.5)
        assert not tp[0]

    def test_cross_image_confidence_tie_consistent(self):
        """Equal confidences across images: the scalar path and the
        shared-IoU-matrix fast path must break the tie the same way
        (image-major — pycocotools' per-image + mergesort order).  The
        FP in image 0 outranks the equal-confidence TP in image 1."""
        dets = [
            det(1, 0, 0.5, 0, 0, 10, 10),     # TP, listed first
            det(0, 0, 0.5, 50, 50, 60, 60),   # FP in an earlier image
        ]
        gts = [gt(1, 0, 0, 0, 10, 10)]
        tp, _, n = match_detections(dets, gts, 0.5)
        assert tp.tolist() == [False, True]  # image-major order
        ap_ref = interpolated_ap(tp, n)
        ap_new = average_precision(dets, gts, 0.5)["per_class"][0]
        assert ap_new == pytest.approx(ap_ref, abs=1e-12) == 0.5

    def test_matrix_path_matches_scalar_matching(self):
        """average_precision's shared-IoU-matrix fast path (_greedy_tp)
        must equal the scalar match_detections reference on random data,
        at every threshold."""
        rng = np.random.RandomState(3)
        dets, gts = [], []
        for img in range(5):
            for _ in range(rng.randint(0, 6)):
                t, l = rng.uniform(0, 80, 2)
                h, w = rng.uniform(5, 40, 2)
                gts.append(gt(img, 0, t, l, t + h, l + w))
            for _ in range(rng.randint(0, 8)):
                t, l = rng.uniform(0, 80, 2)
                h, w = rng.uniform(5, 40, 2)
                dets.append(det(img, 0, float(rng.uniform(0.1, 1)),
                                t, l, t + h, l + w))
        for thr in (0.3, 0.5, 0.75, 0.9):
            tp_ref, conf_ref, n = match_detections(dets, gts, thr)
            ap_ref = interpolated_ap(tp_ref, n)
            ap_new = average_precision(dets, gts, thr)["per_class"][0]
            assert ap_new == pytest.approx(ap_ref, abs=1e-12), thr


class TestAp:
    def test_perfect_ap_is_one(self):
        tp = np.array([True, True, True])
        assert interpolated_ap(tp, 3) == pytest.approx(1.0)

    def test_all_fp_is_zero(self):
        assert interpolated_ap(np.array([False, False]), 2) == 0.0
        assert interpolated_ap(np.array([], dtype=bool), 0) == 0.0

    def test_half_recall(self):
        # one TP then one FP, 2 GTs: precision env = [1, .5], recall max 0.5
        tp = np.array([True, False])
        ap = interpolated_ap(tp, 2, num_points=101)
        # 51 of 101 points at precision 1 (recall ≤ 0.5), rest 0
        assert ap == pytest.approx(51 / 101, abs=1e-6)

    def test_map_aggregation(self):
        gts = [gt(0, 0, 0, 0, 10, 10), gt(0, 1, 20, 20, 30, 30)]
        dets = [
            det(0, 0, 0.9, 0, 0, 10, 10),     # class 0 perfect
            det(0, 1, 0.8, 50, 50, 60, 60),   # class 1 miss
        ]
        out = average_precision(dets, gts, 0.5)
        assert out["per_class"][0] == pytest.approx(1.0)
        assert out["per_class"][1] == pytest.approx(0.0)
        assert out["mAP"] == pytest.approx(0.5)

    def test_coco_50_95_decreases_with_looser_boxes(self):
        gts = [gt(0, 0, 0, 0, 10, 10)]
        tight = [det(0, 0, 0.9, 0, 0, 10, 10)]
        loose = [det(0, 0, 0.9, 2, 2, 12, 12)]  # IoU ≈ 0.47 → below most thresholds
        assert coco_map_50_95(tight, gts) > coco_map_50_95(loose, gts)


class TestYoloBenchmark:
    def test_metrics_in_range(self, rng):
        import jax.numpy as jnp
        from tests.test_loss import make_merged, pad_targets

        pred = make_merged(rng)
        boxes, classes, mask = pad_targets(
            [[(0.4, 0.4, 0.2, 0.2, 1)], [(0.6, 0.6, 0.3, 0.3, 0)]]
        )
        matching = match_targets(pred, boxes, classes, mask)
        out = yolo_benchmark(pred, matching, confidence_threshold=0.5)
        for v in (out.obj_accuracy, out.obj_recall, out.obj_precision, out.class_accuracy):
            val = float(v)
            assert 0.0 <= val <= 1.0

    def test_confident_correct_prediction_scores_high(self, rng):
        import jax.numpy as jnp
        import numpy as np
        from tests.test_loss import make_merged, pad_targets
        from yolodl_tpu.ops.detect import MergedDetection

        base = make_merged(rng, batch=1, num_classes=3, layers=((4, 4, 1),))
        boxes, classes, mask = pad_targets([[(0.4, 0.4, 0.2, 0.2, 1)]])
        matching = match_targets(base, boxes, classes, mask)
        flat = np.asarray(matching.flat[0])
        valid = np.asarray(matching.valid[0])
        n = base.num_flats
        obj = np.full((1, n), -20.0, np.float32)
        cls = np.full((1, n, 3), -20.0, np.float32)
        for k in np.nonzero(valid)[0]:
            obj[0, flat[k]] = 20.0
            cls[0, flat[k], 1] = 20.0
        pred = MergedDetection(base.cycxhw, jnp.asarray(obj), jnp.asarray(cls), base.infos)
        out = yolo_benchmark(pred, matching, confidence_threshold=0.5)
        assert float(out.obj_accuracy) == pytest.approx(1.0)
        assert float(out.obj_recall) == pytest.approx(1.0)
        assert float(out.obj_precision) == pytest.approx(1.0)
        assert float(out.class_accuracy) == pytest.approx(1.0)


class TestDatasetEvaluatorDevices:
    """DatasetEvaluator devices=N: batch axis sharded over the CPU mesh —
    the mAP report must be identical to single-device evaluation."""

    def test_multi_device_matches_single(self, rng):
        import jax

        from yolodl_tpu.config import newslab as nl
        from yolodl_tpu.data.records import DataRecord
        from yolodl_tpu.graph import Graph
        from yolodl_tpu.models import YoloModel
        from yolodl_tpu.train.evaluation import DatasetEvaluator

        toy = {
            "main_group": "m",
            "groups": {
                "m": [
                    {"name": "input", "kind": "Input", "shape": ["_", 3, 32, 32]},
                    {"kind": "ConvBn2D", "c": 8, "k": 3, "s": 2},
                    {"name": "head", "kind": "ConvBn2D", "c": 6, "k": 1,
                     "act": "linear", "bn": {"enabled": False}},
                    {"name": "det", "kind": "Detect2D", "classes": 1,
                     "anchors": [[0.4, 0.4]]},
                    {"name": "output", "kind": "MergeDetect2D", "from": ["det"]},
                ]
            },
        }
        model = YoloModel(Graph.from_model(nl.parse_model_dict(toy)))
        params, state = model.init(jax.random.PRNGKey(0))

        records = [
            DataRecord(
                image=rng.uniform(0, 1, (3, 32, 32)).astype(np.float32),
                boxes=np.asarray([[0.5, 0.5, 0.4, 0.4]], np.float32),
                classes=np.asarray([0], np.int32),
            )
            for _ in range(6)
        ]

        class Identity:
            def load(self, r):
                return r

        kw = dict(num_classes=1, batch_size=8, confidence_threshold=0.01)
        r1 = DatasetEvaluator(model, records, Identity(), **kw)(params, state)
        r8 = DatasetEvaluator(model, records, Identity(), devices=8,
                              **kw)(params, state)
        assert r1 == r8

        # extended mode: adds the 12-number COCO block; AP50 agrees with
        # mAP@0.5 here (single class, so the class denominators coincide)
        # bf16 evaluation (the serving path's production precision): the
        # report stays a valid mAP close to f32 on this easy fixture
        r16 = DatasetEvaluator(model, records, Identity(),
                               precision="bfloat16", **kw)(params, state)
        assert set(r16) == set(r1)
        assert abs(r16["mAP@0.5"] - r1["mAP@0.5"]) < 0.05

        rx = DatasetEvaluator(model, records, Identity(), extended=True,
                              **kw)(params, state)
        assert set(rx["coco"]) == {
            "AP", "AP50", "AP75", "AP_small", "AP_medium", "AP_large",
            "AR@1", "AR@10", "AR@100", "AR_small", "AR_medium", "AR_large",
        }
        assert rx["coco"]["AP50"] == pytest.approx(rx["mAP@0.5"], abs=1e-3)
        assert rx["coco"]["AP"] == pytest.approx(rx["mAP@0.5:0.95"], abs=1e-3)

    def test_indivisible_batch_rejected(self):
        from yolodl_tpu.train.evaluation import DatasetEvaluator

        with pytest.raises(ValueError, match="not divisible"):
            DatasetEvaluator(None, [], None, num_classes=1, batch_size=6,
                             devices=4)
