"""End-to-end learning check: a tiny model trained on synthetic data must
actually detect the objects (the functional analog of BASELINE milestone 3 —
"training converges" — runnable on CPU in seconds)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from yolodl_tpu.config import newslab
from yolodl_tpu.graph import Graph
from yolodl_tpu.loss import LossConfig, non_max_suppression, yolo_inference
from yolodl_tpu.loss.average_precision import Detection, GroundTruth, average_precision
from yolodl_tpu.models import YoloModel
from yolodl_tpu.train import LrScheduleConfig, TrainConfig, make_train_step, train_init

SIZE = 32


def make_model():
    d = {
        "main_group": "m",
        "groups": {
            "m": [
                {"name": "input", "kind": "Input", "shape": ["_", 3, SIZE, SIZE]},
                {"kind": "ConvBn2D", "c": 8, "k": 3, "s": 2, "act": "leaky"},
                {"kind": "ConvBn2D", "c": 16, "k": 3, "s": 2, "act": "leaky"},
                {"name": "head", "kind": "ConvBn2D", "c": 6, "k": 1,
                 "act": "linear", "bn": {"enabled": False}},
                {"name": "det", "kind": "Detect2D", "classes": 1,
                 "anchors": [[0.35, 0.35]]},
                {"name": "output", "kind": "MergeDetect2D", "from": ["det"]},
            ]
        },
    }
    return YoloModel(Graph.from_model(newslab.parse_model_dict(d)))


def sample_batch(rng, batch=8):
    """Gray images with one bright square each; the square is the target."""
    images = np.full((batch, 3, SIZE, SIZE), 0.3, np.float32)
    boxes = np.zeros((batch, 4, 4), np.float32)
    classes = np.zeros((batch, 4), np.int32)
    mask = np.zeros((batch, 4), bool)
    for b in range(batch):
        size_px = rng.integers(8, 14)
        cy = rng.integers(size_px // 2 + 1, SIZE - size_px // 2 - 1)
        cx = rng.integers(size_px // 2 + 1, SIZE - size_px // 2 - 1)
        t, l = cy - size_px // 2, cx - size_px // 2
        images[b, 0, t:t + size_px, l:l + size_px] = 1.0
        images[b, 1, t:t + size_px, l:l + size_px] = 0.1
        boxes[b, 0] = (cy / SIZE, cx / SIZE, size_px / SIZE, size_px / SIZE)
        mask[b, 0] = True
    return (jnp.asarray(images), jnp.asarray(boxes), jnp.asarray(classes),
            jnp.asarray(mask))


@pytest.mark.slow
def test_tiny_model_learns_to_detect():
    model = make_model()
    config = TrainConfig(
        lr=LrScheduleConfig(kind="constant", lr=3e-3),
        momentum=0.9,
        loss=LossConfig(box_metric="ciou"),
    )
    ts, opt = train_init(model, config, seed=0)
    step_fn = make_train_step(model, opt, config)

    rng = np.random.default_rng(0)
    first_loss = None
    for i in range(300):
        batch = sample_batch(rng)
        ts, metrics = step_fn(ts, *batch)
        if first_loss is None:
            first_loss = float(metrics["total_loss"])
    final_loss = float(metrics["total_loss"])
    assert final_loss < first_loss * 0.5, (first_loss, final_loss)

    # evaluate on fresh samples
    eval_rng = np.random.default_rng(123)
    dets, gts = [], []
    for img_id in range(4):
        images, boxes, classes, mask = sample_batch(eval_rng, batch=4)
        pred, _ = model.apply(ts.params, ts.state, images, train=False)
        out = yolo_inference(
            non_max_suppression(pred, confidence_threshold=0.3, max_dets=32),
            pred.num_flats,
        )
        tlbr = np.asarray(out.tlbr)
        conf = np.asarray(out.confidence)
        valid = np.asarray(out.valid)
        for b in range(4):
            gid = img_id * 4 + b
            cy, cx, h, w = np.asarray(boxes[b, 0])
            gts.append(GroundTruth(gid, 0, (cy - h / 2, cx - w / 2, cy + h / 2, cx + w / 2)))
            for k in np.nonzero(valid[b])[0]:
                dets.append(Detection(gid, 0, float(conf[b, k]), tuple(tlbr[b, k])))

    result = average_precision(dets, gts, iou_threshold=0.5)
    assert result["mAP"] > 0.6, f"mAP@0.5 = {result['mAP']:.3f} (dets={len(dets)})"
