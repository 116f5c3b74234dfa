"""HBM validation of training.remat on the REAL TPU backend (AOT).

CPU-XLA's memory_analysis cannot demonstrate remat's savings (its temp
pool is dominated by im2col conv scratch — measured flat ~1.0 GB at
batch 8 / 64 px with and without remat, see CLAUDE.md). The TPU backend
has no im2col materialization, so the activation residuals remat removes
actually show up there. This script AOT-compiles the full train step
with and without remat at the flagship shape and reads the compiler's
own HBM accounting — no execution, no OOM risk, one compile each.

Run under the axon tunnel:  python scripts/remat_hbm.py
Knobs: RH_BATCH (16), RH_SIZE (608), RH_CFG (cfg/darknet/yolov4-csp.cfg).

Prints one JSON line per variant:
  {"remat": false, "argument_mb": ..., "output_mb": ..., "temp_mb": ...,
   "peak_mb_estimate": ...}
and a final comparison line. The decision bar: remat should cut the temp
allocation (activation residuals) by a multiple; if it doesn't, the
block-level checkpoint boundaries need revisiting.
"""

import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

BATCH = int(os.environ.get("RH_BATCH", "16"))
SIZE = int(os.environ.get("RH_SIZE", "608"))
CFG = os.environ.get("RH_CFG", "cfg/darknet/yolov4-csp.cfg")


def analyze(remat: bool):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from yolodl_tpu.graph.from_darknet import load_darknet_graph
    from yolodl_tpu.models import YoloModel
    from yolodl_tpu.train import TrainConfig, make_train_step, train_init

    model = YoloModel(load_darknet_graph(os.path.join(REPO, CFG)),
                      remat="blocks" if remat else "off")
    config = TrainConfig()
    ts, opt = train_init(model, config, seed=0)
    # the raw traced step (make_train_step's jit=False escape hatch, the
    # same one make_multi_step uses), jitted once here with donation
    step = make_train_step(model, opt, config, jit=False)

    images = jnp.zeros((BATCH, 3, SIZE, SIZE), jnp.bfloat16)
    boxes = jnp.zeros((BATCH, 64, 4), jnp.float32)
    classes = jnp.zeros((BATCH, 64), jnp.int32)
    mask = jnp.zeros((BATCH, 64), bool)

    lowered = jax.jit(step, donate_argnums=(0,)).lower(
        ts, images, boxes, classes, mask)
    compiled = lowered.compile()
    mem = compiled.memory_analysis()
    mb = lambda b: round(b / (1 << 20), 1)
    row = {
        "remat": remat,
        "argument_mb": mb(mem.argument_size_in_bytes),
        "output_mb": mb(mem.output_size_in_bytes),
        "temp_mb": mb(mem.temp_size_in_bytes),
        "peak_mb_estimate": mb(mem.argument_size_in_bytes
                               + mem.output_size_in_bytes
                               + mem.temp_size_in_bytes),
    }
    print(json.dumps(row), flush=True)
    return row


def main():
    import jax

    plat = jax.devices()[0].platform
    if plat == "cpu":
        print("warning: running on CPU — temp pool is im2col-dominated "
              "and will NOT show remat's effect; run under the tunnel",
              file=sys.stderr)
    base = analyze(False)
    rem = analyze(True)
    ratio = base["temp_mb"] / max(rem["temp_mb"], 0.1)
    print(json.dumps({
        "metric": f"remat temp-HBM reduction ({os.path.basename(CFG)} "
                  f"b{BATCH} {SIZE}px, {plat})",
        "temp_mb_off": base["temp_mb"],
        "temp_mb_on": rem["temp_mb"],
        "reduction_x": round(ratio, 2),
    }), flush=True)


if __name__ == "__main__":
    main()
