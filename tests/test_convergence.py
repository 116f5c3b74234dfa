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


CLASSIFIER_CFG = """
[net]
height=16
width=16
channels=3
batch=8

[convolutional]
batch_normalize=1
filters=8
size=3
stride=2
activation=leaky

[convolutional]
filters=4
size=1
activation=linear

[avgpool]

[softmax]
"""

RNN_CFG = """
[net]
inputs=8
time_steps=4
batch=32
subdivisions=1

[rnn]
batch_normalize=1
output=16
hidden=16
activation=leaky

[connected]
output=8
activation=linear

[softmax]
"""


def _classifier_state(cfg_text):
    from yolodl_tpu.config import darknet_cfg as dk
    from yolodl_tpu.graph.from_darknet import graph_from_darknet
    from yolodl_tpu.models.builder import GraphModel
    from yolodl_tpu.train.loop import TrainState, make_optimizer

    model = GraphModel(graph_from_darknet(dk.Darknet.from_str(cfg_text)))
    params, state = model.init(jax.random.PRNGKey(0))
    config = TrainConfig(lr=LrScheduleConfig(kind="constant", lr=1e-2))
    optimizer = make_optimizer(config)
    ts = TrainState(params, state, optimizer.init(params),
                    jnp.zeros((), jnp.int32), None)
    return model, optimizer, config, ts


def test_classifier_learns_synthetic_classes():
    """CE training on the classify path: 4 color-coded classes must reach
    perfect train accuracy in a few dozen steps (the classifier analog of
    the detection convergence check)."""
    from yolodl_tpu.train.classifier import make_classifier_train_step

    model, optimizer, config, ts = _classifier_state(CLASSIFIER_CFG)
    step = make_classifier_train_step(model, optimizer, config)

    rng = np.random.default_rng(0)
    images = np.full((8, 3, 16, 16), 0.2, np.float32)
    labels = np.asarray([0, 1, 2, 3, 0, 1, 2, 3], np.int32)
    for b, lbl in enumerate(labels):
        images[b, lbl % 3, :, :] = 0.9  # channel codes the class
        if lbl == 3:
            images[b, :, :8, :] = 0.9   # class 3 = bright top half
    images += rng.normal(0, 0.02, images.shape).astype(np.float32)
    x, y = jnp.asarray(images), jnp.asarray(labels)

    first = None
    for _ in range(150):
        ts, metrics = step(ts, x, y)
        if first is None:
            first = float(metrics["loss"])
    last, acc = float(metrics["loss"]), float(metrics["accuracy"])
    assert last < first * 0.2, (first, last)
    assert acc == 1.0, acc


def test_rnn_learns_cyclic_sequence():
    """BPTT through the lax.scan recurrence: an [rnn] net must learn the
    deterministic next-token rule i → (i+1) mod 8.  Rows are time-major
    (darknet layout: step i = rows [i*b, (i+1)*b)) with 8 parallel streams —
    connected-layer BN normalizes over the per-timestep stream batch, so a
    single stream would degenerate (variance 0), exactly as in darknet."""
    from yolodl_tpu.train.classifier import make_classifier_train_step

    model, optimizer, config, ts = _classifier_state(RNN_CFG)
    step = make_classifier_train_step(model, optimizer, config)

    rng = np.random.default_rng(1)
    rows = 32  # 4 time steps × 8 streams
    tokens = rng.integers(0, 8, size=rows)
    x = np.zeros((rows, 8, 1, 1), np.float32)
    x[np.arange(rows), tokens] = 1.0
    y = jnp.asarray((tokens + 1) % 8, np.int32)
    x = jnp.asarray(x)

    first = None
    for _ in range(250):
        ts, metrics = step(ts, x, y)
        if first is None:
            first = float(metrics["loss"])
    last, acc = float(metrics["loss"]), float(metrics["accuracy"])
    assert last < first * 0.2, (first, last)
    assert acc == 1.0, acc


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
