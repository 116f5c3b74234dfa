"""Capture a device trace of the full train step and print top ops by time.

Perf investigation tool (run under axon).  Aggregates the chrome-trace
events from jax.profiler by XLA op name so backward-pass hotspots are
visible without TensorBoard.

Usage: python scripts/trace_ops.py [N_top]
Env: BENCH_BATCH/BENCH_SIZE as in profile_step.py; TRACE_MODE=train|infer.
"""

import glob
import gzip
import json
import os
import sys
import tempfile

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(__file__), "..", ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np

from yolodl_tpu.config import darknet_cfg as dk
from yolodl_tpu.graph.from_darknet import graph_from_darknet
from yolodl_tpu.models import YoloModel
from yolodl_tpu.train import TrainConfig, make_train_step, train_init

BATCH = int(os.environ.get("BENCH_BATCH", "16"))
SIZE = int(os.environ.get("BENCH_SIZE", "608"))
CFG = os.environ.get("BENCH_CFG", "cfg/darknet/yolov4-csp.cfg")


def main():
    n_top = int(sys.argv[1]) if len(sys.argv) > 1 else 25
    model = YoloModel(graph_from_darknet(dk.Darknet.load(CFG)),
                      fold_region=os.environ.get("BENCH_FOLD", "off"))
    config = TrainConfig()
    ts, opt = train_init(model, config)
    step_fn = make_train_step(model, opt, config)

    rng = np.random.default_rng(0)
    images = jnp.asarray(rng.normal(size=(BATCH, 3, SIZE, SIZE)).astype(np.float32), jnp.bfloat16)
    boxes = jnp.asarray(rng.uniform(0.2, 0.8, (BATCH, 32, 4)).astype(np.float32))
    classes = jnp.asarray(rng.integers(0, 80, (BATCH, 32)).astype(np.int32))
    mask = jnp.ones((BATCH, 32), bool)

    # warmup/compile
    ts, metrics = step_fn(ts, images, boxes, classes, mask)
    jax.block_until_ready(metrics["total_loss"])

    tmp = tempfile.mkdtemp(prefix="yolodl_trace_")
    with jax.profiler.trace(tmp):
        for _ in range(3):
            ts, metrics = step_fn(ts, images, boxes, classes, mask)
        jax.block_until_ready(metrics["total_loss"])

    files = glob.glob(os.path.join(tmp, "plugins/profile/*/*.trace.json.gz"))
    assert files, f"no trace written under {tmp}"
    data = json.loads(gzip.open(files[0]).read())
    events = data.get("traceEvents", [])

    # device-track complete events only (TPU op executions carry "run_id"
    # or sit on pids whose track name contains "TPU"/"/device:")
    pid_names = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pid_names[e["pid"]] = e.get("args", {}).get("name", "")
    device_pids = {p for p, n in pid_names.items()
                   if "TPU" in n or "/device:" in n or "XLA" in n}

    agg = {}
    total = 0.0
    for e in events:
        if e.get("ph") != "X" or e.get("pid") not in device_pids:
            continue
        dur = e.get("dur", 0) / 1e3  # us -> ms
        name = e.get("name", "?")
        # merge fusion.N -> fusion; keep source op hints from args
        hint = e.get("args", {}).get("long_name", "") or e.get("args", {}).get("tf_op", "")
        base = name.split(".")[0]
        key = f"{base} | {hint[:90]}" if hint else name
        a = agg.setdefault(key, [0.0, 0])
        a[0] += dur
        a[1] += 1
        total += dur

    rows = sorted(agg.items(), key=lambda kv: -kv[1][0])[:n_top]
    print(f"device pids: {sorted(device_pids)} ({ {p: pid_names[p] for p in device_pids} })")
    print(f"total device op time over 3 steps: {total:.1f} ms "
          f"({total/3:.1f} ms/step)\n")
    print(f"{'ms/step':>9}  {'%':>5}  {'calls':>5}  op")
    for key, (ms, cnt) in rows:
        print(f"{ms/3:9.2f}  {100*ms/total:5.1f}  {cnt:5d}  {key[:140]}")


if __name__ == "__main__":
    main()
