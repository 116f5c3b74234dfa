"""Round-5 inference-regression A/B (VERDICT r4 task 1).

Hypothesis under test: the r2 headline rows (567 @b16 / 621 @b32 / 684.7
@b64, commits 014c175+3c0f65a, 2026-08-16) were measured BEFORE the
completion fence existed (added 2026-08-17 in 4fd24a2) — and on the axon
tunnel ``jax.block_until_ready`` does NOT synchronize with device
completion (fire-and-forget dispatch, CLAUDE.md measurement gotchas), so
those numbers timed dispatch, not execution.  The r3/r4 462–470 @b16
rows are post-fence and honest.

Measures, in one process (one backend init):
  1. b16 fenced (value readout)  vs  b16 SOFT (block_until_ready only)
     — if soft reproduces ~560+, the "regression" is fence softness.
  2. b16 fenced with spd_stem OFF — isolates the round-3 stem rewrite.
  3. b32 / b64 fenced — fresh headline rows for BASELINE.md.

Each config: compile+warmup call, then REPS timed loops of STEPS calls.
Prints one JSON line per measurement.
"""
import json
import os
import sys
import time

STEPS = int(os.environ.get("AB_STEPS", "50"))
REPS = int(os.environ.get("AB_REPS", "3"))
SIZE = 608
CFG = "cfg/darknet/yolov4-csp.cfg"

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", ".jax_cache")

import jax  # noqa: E402

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.dirname(
                      os.path.abspath(__file__))), ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from yolodl_tpu.config import darknet_cfg as dk  # noqa: E402
from yolodl_tpu.graph.from_darknet import graph_from_darknet  # noqa: E402
from yolodl_tpu.loss import non_max_suppression, yolo_inference  # noqa: E402
from yolodl_tpu.models import YoloModel  # noqa: E402
from yolodl_tpu.train import TrainConfig, train_init  # noqa: E402


def build(spd):
    graph = graph_from_darknet(dk.Darknet.load(CFG))
    model = YoloModel(graph, spd_stem=spd)
    ts, _ = train_init(model, TrainConfig())
    return model, ts


def measure(model, ts, batch, fence, tag):
    rng = np.random.default_rng(0)
    images = jnp.asarray(
        rng.normal(size=(batch, 3, SIZE, SIZE)).astype(np.float32),
        jnp.bfloat16)

    @jax.jit
    def fwd(params, state, x):
        pred, _ = model.apply(params, state, x, train=False)
        return pred

    @jax.jit
    def nms_stage(pred):
        out = non_max_suppression(pred, confidence_threshold=0.25,
                                  backend="pallas", class_mode="argmax")
        return yolo_inference(out, pred.num_flats)

    def fwd_nms(params, state, x):
        return nms_stage(fwd(params, state, x))

    # compile + settle
    out = fwd_nms(ts.params, ts.state, images)
    jax.block_until_ready(out.valid)
    float(out.valid.sum())

    vals = []
    for _ in range(REPS):
        t0 = time.perf_counter()
        for _ in range(STEPS):
            out = fwd_nms(ts.params, ts.state, images)
        jax.block_until_ready(out.valid)
        if fence:
            float(out.valid.sum())  # honest completion fence
        dt = time.perf_counter() - t0
        vals.append(batch * STEPS / dt)
    print(json.dumps({
        "config": tag, "batch": batch, "fence": fence,
        "img_s": [round(v, 1) for v in vals],
        "best": round(max(vals), 1)}), flush=True)


def main():
    print(f"devices: {jax.devices()}", flush=True)
    model, ts = build("auto")
    measure(model, ts, 16, True, "b16 spd=auto fenced")
    measure(model, ts, 16, False, "b16 spd=auto SOFT (r2 protocol)")
    measure(model, ts, 32, True, "b32 spd=auto fenced")
    measure(model, ts, 64, True, "b64 spd=auto fenced")
    model2, ts2 = build("off")
    measure(model2, ts2, 16, True, "b16 spd=off fenced")
    print("done", flush=True)


if __name__ == "__main__":
    main()
