"""Step-time breakdown on the real TPU: forward / forward+loss / full step.

Not part of the test suite — a perf investigation tool (run under axon).
"""

import json
import os
import time

import jax

jax.config.update("jax_compilation_cache_dir", os.path.join(os.path.dirname(__file__), ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np

from yolodl_tpu.config import darknet_cfg as dk
from yolodl_tpu.graph.from_darknet import graph_from_darknet
from yolodl_tpu.models import YoloModel
from yolodl_tpu.loss import yolo_loss
from yolodl_tpu.train import TrainConfig, make_train_step, train_init

BATCH = int(os.environ.get("BENCH_BATCH", "16"))
SIZE = int(os.environ.get("BENCH_SIZE", "608"))
STEPS = int(os.environ.get("BENCH_STEPS", "5"))


def timeit(fn, *args):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(STEPS):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / STEPS


def main():
    cfg_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                            "cfg/darknet/yolov4-csp.cfg")
    model = YoloModel(graph_from_darknet(dk.Darknet.load(cfg_path)))
    config = TrainConfig()
    ts, opt = train_init(model, config)
    step_fn = make_train_step(model, opt, config)

    rng = np.random.default_rng(0)
    images = jnp.asarray(rng.normal(size=(BATCH, 3, SIZE, SIZE)).astype(np.float32), jnp.bfloat16)
    boxes = jnp.asarray(rng.uniform(0.2, 0.8, (BATCH, 32, 4)).astype(np.float32))
    classes = jnp.asarray(rng.integers(0, 80, (BATCH, 32)).astype(np.int32))
    mask = jnp.ones((BATCH, 32), bool)

    @jax.jit
    def fwd_eval(params, state, x):
        pred, _ = model.apply(params, state, x, train=False)
        return pred.obj_logit.sum()

    @jax.jit
    def fwd_train(params, state, x):
        pred, _ = model.apply(params, state, x, train=True)
        return pred.obj_logit.sum()

    @jax.jit
    def fwd_loss(params, state, x, b, c, m):
        pred, _ = model.apply(params, state, x, train=True)
        out, _ = yolo_loss(pred, b, c, m, config.loss)
        return out.total_loss

    t_eval = timeit(fwd_eval, ts.params, ts.state, images)
    t_train_fwd = timeit(fwd_train, ts.params, ts.state, images)
    t_loss = timeit(fwd_loss, ts.params, ts.state, images, boxes, classes, mask)

    # full step (donates ts; rebuild each call is unfair — run it stateless)
    ts2, _ = train_init(model, config)
    out = step_fn(ts2, images, boxes, classes, mask)
    jax.block_until_ready(out[1]["total_loss"])
    ts2 = out[0]
    t0 = time.perf_counter()
    for _ in range(STEPS):
        ts2, metrics = step_fn(ts2, images, boxes, classes, mask)
    jax.block_until_ready(metrics["total_loss"])
    t_full = (time.perf_counter() - t0) / STEPS

    print(json.dumps({
        "batch": BATCH,
        "fwd_eval_ms": round(t_eval * 1e3, 1),
        "fwd_train_ms": round(t_train_fwd * 1e3, 1),
        "fwd_loss_ms": round(t_loss * 1e3, 1),
        "full_step_ms": round(t_full * 1e3, 1),
        "img_s_full": round(BATCH / t_full, 1),
        "img_s_eval": round(BATCH / t_eval, 1),
    }))


if __name__ == "__main__":
    main()
