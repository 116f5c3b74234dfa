"""A/B the darknet-option adoption cost in the production train step.

The CLI now auto-adopts the flagship cfg's [yolo] training options
(ignore_thresh=0.7, iou_thresh=0.2 multi-anchor matching, max_delta=(5,5,2);
yolov4-csp carries objectness_smooth=0).  bench.py measures the unresolved
default (all off) — this script measures the RESOLVED step with bench.py's
exact protocol (bf16 batch, scanned multi-step) so the cost of the new
CLI default is on record.

Usage (real TPU): python scripts/bench_loss_options.py
Knobs: BLO_BATCH (16), BLO_SIZE (608), BLO_STEPS (80), BLO_SCAN (40).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from yolodl_tpu.config import darknet_cfg as dk
    from yolodl_tpu.graph.from_darknet import graph_from_darknet
    from yolodl_tpu.loss import LossConfig
    from yolodl_tpu.models import YoloModel
    from yolodl_tpu.train import (TrainConfig, make_multi_step, train_init)

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    cfg_path = os.path.join(repo, os.environ.get(
        "BLO_CFG", "cfg/darknet/yolov4-csp.cfg"))
    batch = int(os.environ.get("BLO_BATCH", "16"))
    size = int(os.environ.get("BLO_SIZE", "608"))
    steps = int(os.environ.get("BLO_STEPS", "80"))
    scan_k = int(os.environ.get("BLO_SCAN", "40"))

    model = YoloModel(graph_from_darknet(dk.Darknet.load(cfg_path)))

    rng = np.random.default_rng(0)
    max_gt = 32
    images = jnp.asarray(
        rng.normal(size=(batch, 3, size, size)).astype(np.float32),
        jnp.bfloat16)
    boxes = rng.uniform(0.2, 0.8, (batch, max_gt, 4)).astype(np.float32)
    boxes[..., 2:] = rng.uniform(0.05, 0.3, (batch, max_gt, 2))
    classes = rng.integers(0, 80, (batch, max_gt)).astype(np.int32)
    mask = np.ones((batch, max_gt), bool)
    args = (images, jnp.asarray(boxes), jnp.asarray(classes),
            jnp.asarray(mask))
    scan_args = tuple(
        jnp.broadcast_to(x, (scan_k,) + x.shape) for x in args)

    def bench(tag, loss_cfg):
        config = TrainConfig(loss=loss_cfg)
        ts, opt = train_init(model, config, seed=0)
        step_fn = make_multi_step(model, opt, config, scan_k)
        ts, metrics = step_fn(ts, *scan_args)
        jax.block_until_ready(metrics["total_loss"])
        float(metrics["total_loss"].sum())  # completion fence
        calls = max(steps // scan_k, 1)
        t0 = time.perf_counter()
        for _ in range(calls):
            ts, metrics = step_fn(ts, *scan_args)
        float(metrics["total_loss"].sum())
        dt = (time.perf_counter() - t0) / (calls * scan_k)
        print(f"{tag}: {dt * 1e3:.2f} ms/step = {batch / dt:.1f} img/s")
        return dt

    def bench_darknet(tag):
        from yolodl_tpu.loss.darknet_loss import head_params_from_darknet

        dn = dk.Darknet.load(cfg_path)
        graph = graph_from_darknet(dn)
        heads = [l for l in dn.layers if isinstance(l, dk.Yolo)]
        # bind the head params to the BENCH size (multi-scale darknet
        # training rebinds net_w/net_h per dim, detector.c:195-206)
        spec = (graph.detect_head_input_keys(),
                tuple(head_params_from_darknet(l, size, size)
                      for l in heads))
        config = TrainConfig(darknet_loss=spec)
        ts, opt = train_init(model, config, seed=0)
        step_fn = make_multi_step(model, opt, config, scan_k)
        ts, metrics = step_fn(ts, *scan_args)
        jax.block_until_ready(metrics["total_loss"])
        float(metrics["total_loss"].sum())
        calls = max(steps // scan_k, 1)
        t0 = time.perf_counter()
        for _ in range(calls):
            ts, metrics = step_fn(ts, *scan_args)
        float(metrics["total_loss"].sum())
        dt = (time.perf_counter() - t0) / (calls * scan_k)
        print(f"{tag}: {dt * 1e3:.2f} ms/step = {batch / dt:.1f} img/s")
        return dt

    base = bench("baseline (options off = bench.py path)", LossConfig(
        ignore_thresh=None, iou_thresh=None,
        objectness_smooth=False, max_delta=None))
    if os.environ.get("BLO_DARKNET", "1") != "0":
        bench_darknet("darknet-exact loss impl (training.loss.impl=Darknet)")
    # the values the train CLI resolves from yolov4-csp.cfg
    adopted = bench(
        "flagship-adopted (ignore .7 + iou_thresh .2 + max_delta 5,5,2)",
        LossConfig(ignore_thresh=0.7, iou_thresh=0.2,
                   objectness_smooth=False, max_delta=(5.0, 5.0, 2.0)))
    print(f"adoption cost: {(adopted - base) * 1e3:+.2f} ms/step "
          f"({(adopted / base - 1) * 100:+.1f}%)")


if __name__ == "__main__":
    main()
