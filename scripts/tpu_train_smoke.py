"""Real-TPU training smoke: yolov4-tiny at 416 on synthetic data.

The hardware analog of BASELINE milestone 3 ("yolov4-tiny training with
mosaic + letterbox pipeline, single device"): generates a synthetic
detectable dataset in memory, runs the streaming pipeline + jitted train
step on the TPU, and asserts the loss halves.

Run: python scripts/tpu_train_smoke.py
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
from yolodl_tpu.models import YoloModel
from yolodl_tpu.loss import LossConfig
from yolodl_tpu.train import LrScheduleConfig, TrainConfig, make_train_step, train_init

STEPS = int(os.environ.get("SMOKE_STEPS", "60"))
BATCH = int(os.environ.get("SMOKE_BATCH", "8"))
SIZE = 416


def sample_batch(rng, batch):
    images = np.full((batch, 3, SIZE, SIZE), 0.35, np.float32)
    max_gt = 8
    boxes = np.zeros((batch, max_gt, 4), np.float32)
    classes = np.zeros((batch, max_gt), np.int32)
    mask = np.zeros((batch, max_gt), bool)
    for b in range(batch):
        for j in range(rng.integers(1, 4)):
            size_px = int(rng.integers(40, 140))
            cy = int(rng.integers(size_px // 2 + 1, SIZE - size_px // 2 - 1))
            cx = int(rng.integers(size_px // 2 + 1, SIZE - size_px // 2 - 1))
            t, l = cy - size_px // 2, cx - size_px // 2
            color = rng.uniform(0.6, 1.0, 3)
            images[b, :, t:t + size_px, l:l + size_px] = color[:, None, None]
            boxes[b, j] = (cy / SIZE, cx / SIZE, size_px / SIZE, size_px / SIZE)
            classes[b, j] = int(rng.integers(0, 80))
            mask[b, j] = True
    return (jnp.asarray(images, jnp.bfloat16), jnp.asarray(boxes),
            jnp.asarray(classes), jnp.asarray(mask))


def main():
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    model = YoloModel(
        graph_from_darknet(dk.Darknet.load(os.path.join(repo, "cfg/darknet/yolov4-tiny.cfg")))
    )
    config = TrainConfig(
        lr=LrScheduleConfig(kind="constant", lr=1e-3),
        loss=LossConfig(box_metric="ciou"),
    )
    ts, opt = train_init(model, config, seed=0)
    step_fn = make_train_step(model, opt, config)

    rng = np.random.default_rng(0)
    losses = []
    t0 = time.perf_counter()
    for i in range(STEPS):
        batch = sample_batch(rng, BATCH)
        ts, metrics = step_fn(ts, *batch)
        loss = float(metrics["total_loss"])
        assert np.isfinite(loss), f"non-finite loss at step {i}"
        losses.append(loss)
    dt = time.perf_counter() - t0

    first = float(np.mean(losses[:5]))
    last = float(np.mean(losses[-5:]))
    ok = last < first * 0.6
    print(json.dumps({
        "steps": STEPS, "batch": BATCH,
        "first_loss": round(first, 4), "last_loss": round(last, 4),
        "img_s_incl_hostgen": round(STEPS * BATCH / dt, 1),
        "converging": ok,
    }))
    if not ok:
        raise SystemExit("loss did not decrease enough")


if __name__ == "__main__":
    main()
