"""Real-TPU end-to-end quality loop: train → detect → mAP.

The hardware analog of BASELINE milestones 3+4's quality bar: trains
yolov4-tiny at 416 on a synthetic 3-class shapes dataset (red squares /
green filled circles / blue crosses — visually separable), evaluates
mAP@0.5 on a held-out set through the production inference path
(forward → NMS → per-instance class argmax → COCO 101-pt AP) before and
after training, and prints one JSON line.  Demonstrates the full loop
lifting detection quality on the chip.

Run: python scripts/tpu_quality_loop.py   (QL_STEPS / QL_BATCH env knobs)
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np

from yolodl_tpu.config import darknet_cfg as dk
from yolodl_tpu.graph.from_darknet import graph_from_darknet
from yolodl_tpu.loss import LossConfig, non_max_suppression, yolo_inference
from yolodl_tpu.loss.average_precision import (
    Detection,
    GroundTruth,
    average_precision,
)
from yolodl_tpu.models import YoloModel
from yolodl_tpu.train import LrScheduleConfig, TrainConfig, make_train_step, train_init

STEPS = int(os.environ.get("QL_STEPS", "300"))
BATCH = int(os.environ.get("QL_BATCH", "8"))
CFG = os.environ.get("QL_CFG", "cfg/darknet/yolov4-tiny.cfg")
SIZE = int(os.environ.get("QL_SIZE", "416"))
N_CLASSES = 3
MAX_GT = 8


def draw_object(images, b, cls, cy, cx, size_px):
    t, l = cy - size_px // 2, cx - size_px // 2
    bb, r = t + size_px, l + size_px
    if cls == 0:  # red square
        images[b, 0, t:bb, l:r] = 0.9
    elif cls == 1:  # green disc
        yy, xx = np.mgrid[t:bb, l:r]
        disc = (yy - cy) ** 2 + (xx - cx) ** 2 <= (size_px // 2) ** 2
        images[b, 1, t:bb, l:r][disc] = 0.9
    else:  # blue cross
        wbar = max(size_px // 4, 2)
        images[b, 2, cy - wbar // 2:cy + wbar // 2, l:r] = 0.9
        images[b, 2, t:bb, cx - wbar // 2:cx + wbar // 2] = 0.9


def sample_batch(rng, batch):
    images = np.full((batch, 3, SIZE, SIZE), 0.30, np.float32)
    images += rng.normal(0, 0.02, images.shape).astype(np.float32)
    boxes = np.zeros((batch, MAX_GT, 4), np.float32)
    classes = np.zeros((batch, MAX_GT), np.int32)
    mask = np.zeros((batch, MAX_GT), bool)
    for b in range(batch):
        for j in range(int(rng.integers(1, 4))):
            size_px = int(rng.integers(48, 144))
            cy = int(rng.integers(size_px // 2 + 2, SIZE - size_px // 2 - 2))
            cx = int(rng.integers(size_px // 2 + 2, SIZE - size_px // 2 - 2))
            cls = int(rng.integers(0, N_CLASSES))
            draw_object(images, b, cls, cy, cx, size_px)
            boxes[b, j] = (cy / SIZE, cx / SIZE, size_px / SIZE, size_px / SIZE)
            classes[b, j] = cls
            mask[b, j] = True
    return images, boxes, classes, mask


def evaluate(model, params, state, eval_batches, fwd, nms_stage):
    dets, gts = [], []
    img_id = 0
    for images, boxes, classes, mask in eval_batches:
        pred = fwd(params, state, jnp.asarray(images, jnp.bfloat16))
        out = nms_stage(pred)
        kept_tlbr = np.asarray(out.tlbr)
        kept_cls = np.asarray(out.classes)
        kept_conf = np.asarray(out.confidence)
        kept_valid = np.asarray(out.valid)
        for b in range(images.shape[0]):
            for k in np.nonzero(kept_valid[b])[0]:
                dets.append(Detection(
                    image_id=img_id, class_id=int(kept_cls[b, k]),
                    confidence=float(kept_conf[b, k]),
                    tlbr=tuple(float(v) for v in kept_tlbr[b, k]),
                ))
            for j in np.nonzero(mask[b])[0]:
                cy, cx, h, w = boxes[b, j]
                gts.append(GroundTruth(
                    image_id=img_id, class_id=int(classes[b, j]),
                    tlbr=(cy - h / 2, cx - w / 2, cy + h / 2, cx + w / 2),
                ))
            img_id += 1
    return average_precision(dets, gts, 0.5, num_classes=N_CLASSES)["mAP"]


def main():
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    # 3-class head: rewrite cfg classes/filters (3 anchors × (5+3) = 24)
    text = open(os.path.join(repo, CFG)).read()
    for src_size in (416, 512, 608):
        text = text.replace(f"width={src_size}", f"width={SIZE}").replace(
            f"height={src_size}", f"height={SIZE}")
    text = text.replace("classes=80", f"classes={N_CLASSES}").replace(
        "filters=255", f"filters={3 * (5 + N_CLASSES)}")
    darknet = dk.Darknet.from_str(text)
    model = YoloModel(graph_from_darknet(darknet))

    config = TrainConfig(
        lr=LrScheduleConfig(kind="constant", lr=1e-3),
        loss=LossConfig(box_metric="ciou"),
    )
    ts, opt = train_init(model, config, seed=0)
    step_fn = make_train_step(model, opt, config)

    @jax.jit
    def fwd(params, state, x):
        pred, _ = model.apply(params, state, x, train=False)
        return pred

    @jax.jit
    def nms_stage(pred):
        out = non_max_suppression(pred, iou_threshold=0.5,
                                  confidence_threshold=0.3,
                                  class_mode="argmax")
        return yolo_inference(out, pred.num_flats)

    rng = np.random.default_rng(7)
    eval_batches = [sample_batch(rng, BATCH) for _ in range(4)]

    map_before = evaluate(model, ts.params, ts.state, eval_batches, fwd, nms_stage)

    # pre-generate a training pool so long runs are TPU-bound, not bounded
    # by single-threaded numpy image synthesis
    pool = [
        tuple(jnp.asarray(a, jnp.bfloat16 if a.dtype == np.float32 and a.ndim == 4
                          else None) for a in sample_batch(rng, BATCH))
        for _ in range(int(os.environ.get("QL_POOL", "60")))
    ]

    t0 = time.perf_counter()
    last_loss = None
    for i in range(STEPS):
        images, boxes, classes, mask = pool[i % len(pool)]
        ts, metrics = step_fn(ts, images, boxes, classes, mask)
        # a value readout costs a ~26 ms tunnel round trip (CLAUDE.md
        # measurement notes) — only check the loss periodically
        if i % 50 == 0 or i == STEPS - 1:
            last_loss = float(metrics["total_loss"])
            assert np.isfinite(last_loss), f"non-finite loss at step {i}"
    dt = time.perf_counter() - t0

    map_after = evaluate(model, ts.params, ts.state, eval_batches, fwd, nms_stage)

    print(json.dumps({
        "steps": STEPS, "batch": BATCH, "final_loss": round(last_loss, 4),
        "mAP50_before": round(map_before, 4),
        "mAP50_after": round(map_after, 4),
        "train_img_s_incl_hostgen": round(STEPS * BATCH / dt, 1),
    }))
    if map_after <= map_before + 0.05:
        raise SystemExit("mAP did not improve")


if __name__ == "__main__":
    main()
