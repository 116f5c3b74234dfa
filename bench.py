"""Benchmark: YOLOv4-CSP 608×608 training throughput on one TPU chip.

Measures the full jitted train step (forward + YOLO loss w/ on-device
matcher + backward + Adam + BN var clamp) in bf16 compute / f32 params.

Prints ONE JSON line:
  {"metric": f"img/s/chip {MODEL_TAG} train", "value": N, "unit": "img/s",
   "vs_baseline": N}

Baseline note: the reference publishes no numbers (BASELINE.md).  The
driver's north star is ≥2× V100 img/s/chip; darknet YOLOv4-608 training on
a V100 sustains ≈25 img/s, so vs_baseline is value / 50.0.
"""

import json
import os
import time

V100_X2_IMG_S = 50.0
BATCH = int(os.environ.get("BENCH_BATCH", "16"))
SIZE = int(os.environ.get("BENCH_SIZE", "608"))
STEPS = int(os.environ.get("BENCH_STEPS", "50"))  # enough calls to
# amortize the end-of-run completion fence (~0.5 s on the dev tunnel)
# "train" (default): full train step img/s.  "infer": forward+NMS img/s.
# "nms": p50 NMS latency in ms (BASELINE.json metric family).
MODE = os.environ.get("BENCH_MODE", "train")
# BENCH_DTYPE=float32 A/Bs the f32 step against the bf16 default
# (training.precision: the CLI default is f32; bench default is bf16)
DTYPE = os.environ.get("BENCH_DTYPE", "bfloat16")
_CFG_NAME = os.path.splitext(os.path.basename(
    os.environ.get("BENCH_CFG", "cfg/darknet/yolov4-csp.cfg")))[0]
MODEL_TAG = f"{_CFG_NAME}-{SIZE}"


def _check_backend_alive(timeout_s: float) -> None:
    """Fail fast (clear stderr message, exit 2) when the TPU backend can't
    initialize — a dead tunnel otherwise hangs jax.devices() forever and
    the bench times out with no diagnostic.  Probed in a subprocess: a
    wedged PJRT client can't be interrupted from a thread."""
    import subprocess
    import sys

    probe = ("import jax; d = jax.devices(); "
             "print(d[0].platform, len(d))")
    try:
        out = subprocess.run(
            [sys.executable, "-c", probe], capture_output=True, text=True,
            timeout=timeout_s)
    except subprocess.TimeoutExpired:
        print(
            f"bench: TPU backend did not initialize within {timeout_s:.0f}s "
            "(axon tunnel down? PALLAS_AXON_POOL_IPS="
            f"{os.environ.get('PALLAS_AXON_POOL_IPS', '')!r}). "
            "No measurement taken.", file=sys.stderr)
        raise SystemExit(2)
    if out.returncode != 0:
        print("bench: TPU backend failed to initialize:\n"
              + out.stderr.strip()[-2000:], file=sys.stderr)
        raise SystemExit(2)


def main():
    # the axon backend is activated by sitecustomize keyed on
    # PALLAS_AXON_POOL_IPS (JAX_PLATFORMS merely pins the choice), so gate
    # the liveness probe on either signal
    if (os.environ.get("PALLAS_AXON_POOL_IPS")
            or os.environ.get("JAX_PLATFORMS", "") == "axon"):
        _check_backend_alive(float(os.environ.get("BENCH_INIT_TIMEOUT", "180")))

    import jax

    # persistent compile cache: the 600-step yolov4-csp train graph takes
    # minutes to compile over the remote-TPU tunnel; cache across runs
    cache_dir = os.environ.get(
        "JAX_COMPILATION_CACHE_DIR", os.path.join(os.path.dirname(__file__), ".jax_cache")
    )
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import jax.numpy as jnp
    import numpy as np

    from yolodl_tpu.config import darknet_cfg as dk
    from yolodl_tpu.graph.from_darknet import graph_from_darknet
    from yolodl_tpu.models import YoloModel
    from yolodl_tpu.train import TrainConfig, make_train_step, train_init

    cfg_rel = os.environ.get("BENCH_CFG", "cfg/darknet/yolov4-csp.cfg")
    cfg_path = cfg_rel if os.path.isabs(cfg_rel) else os.path.join(
        os.path.dirname(__file__), cfg_rel)
    model = YoloModel(graph_from_darknet(dk.Darknet.load(cfg_path)),
                      spd_stem=os.environ.get("BENCH_SPD", "auto"),
                      fold_region=os.environ.get("BENCH_FOLD", "off"))

    if MODE in ("infer", "nms"):
        _bench_inference(jax, jnp, np, model)
        return

    if os.environ.get("BENCH_LOSS", "").lower() == "darknet":
        # training.loss.impl=Darknet step (oracle-exact delta loss):
        # 89.0 ms/step on csp-608 b16 — within 1.3% of production (r5)
        from yolodl_tpu.loss.darknet_loss import head_params_from_darknet

        dn = dk.Darknet.load(cfg_path)
        heads = [l for l in dn.layers if isinstance(l, dk.Yolo)]
        config = TrainConfig(darknet_loss=(
            model.graph.detect_head_input_keys(),
            tuple(head_params_from_darknet(l, SIZE, SIZE) for l in heads)))
    else:
        config = TrainConfig()
    ts, opt = train_init(model, config, seed=0)
    # scan SCAN_K steps into one XLA program (train.make_multi_step):
    # amortizes per-step dispatch.  Swept 2026-08-20: k=10 → 164.8 img/s,
    # k=40 → 180.5 (×3 runs, ±0.3), k=80 → 181.0 — the tunnel's ~20 ms/
    # call dispatch share dies at k=40; beyond that is noise-level.
    scan_k = int(os.environ.get("BENCH_SCAN", "40"))

    rng = np.random.default_rng(0)
    max_gt = 32
    images = jnp.asarray(
        rng.normal(size=(BATCH, 3, SIZE, SIZE)).astype(np.float32), DTYPE
    )
    boxes = rng.uniform(0.2, 0.8, (BATCH, max_gt, 4)).astype(np.float32)
    boxes[..., 2:] = rng.uniform(0.05, 0.3, (BATCH, max_gt, 2))
    classes = rng.integers(0, 80, (BATCH, max_gt)).astype(np.int32)
    mask = np.ones((BATCH, max_gt), bool)
    batch = (images, jnp.asarray(boxes), jnp.asarray(classes), jnp.asarray(mask))

    if scan_k > 1:
        from yolodl_tpu.train import make_multi_step

        multi_fn = make_multi_step(model, opt, config, scan_k)
        batch = tuple(
            jnp.broadcast_to(x, (scan_k,) + x.shape) for x in batch
        )
        step_fn = multi_fn
        steps_per_call = scan_k
    else:
        step_fn = make_train_step(model, opt, config)
        steps_per_call = 1

    # warmup / compile — run the completion fence (the .sum readout) here
    # too: its tiny program otherwise compiles INSIDE the timed window
    # (~0.4 s remote compile on the tunnel, below the persistent cache's
    # 1 s floor), and the readout drains the dispatch queue so t0 starts
    # from an idle device.  Round-4 and earlier numbers paid this as a
    # constant inside dt (train ~-8%, infer ~-25% at b16 — the entire
    # "462 vs 567" round-3 inference mystery).
    ts, metrics = step_fn(ts, *batch)
    jax.block_until_ready(metrics["total_loss"])
    float(metrics["total_loss"].sum())

    calls = max(STEPS // steps_per_call, 1)
    t0 = time.perf_counter()
    for _ in range(calls):
        ts, metrics = step_fn(ts, *batch)
    jax.block_until_ready(metrics["total_loss"])
    # value readout: on the axon tunnel block_until_ready does NOT fence
    # device completion (fire-and-forget dispatch) — one float() forces it
    # (~26 ms; raise BENCH_STEPS for small models so device time dominates)
    float(metrics["total_loss"].sum())  # [k]-shaped in scan mode
    dt = time.perf_counter() - t0

    img_s = BATCH * steps_per_call * calls / dt
    print(
        json.dumps(
            {
                # BENCH_DTYPE is a measurement-identity axis: the f32 A/B
                # arm must not collide with the canonical bf16 record
                "metric": f"img/s/chip {MODEL_TAG} train"
                          + ("" if DTYPE == "bfloat16" else f" {DTYPE}"),
                "value": round(img_s, 2),
                "unit": "img/s",
                "vs_baseline": round(img_s / V100_X2_IMG_S, 3),
            }
        )
    )


def _bench_inference(jax, jnp, np, model):
    """forward+NMS throughput, or p50 NMS latency (MODE == "nms")."""
    from yolodl_tpu.loss import non_max_suppression, yolo_inference
    from yolodl_tpu.train import TrainConfig, train_init

    ts, _ = train_init(model, TrainConfig())
    rng = np.random.default_rng(0)
    images = jnp.asarray(
        rng.normal(size=(BATCH, 3, SIZE, SIZE)).astype(np.float32), DTYPE
    )

    @jax.jit
    def fwd(params, state, x):
        pred, _ = model.apply(params, state, x, train=False)
        return pred

    # NMS runs as a second jit: fused into the conv program, XLA's layout
    # choice for the confidence tensor sends TopK down a strided-sort path
    # (~50 ms/batch); as a separate program it costs microseconds
    @jax.jit
    def nms_stage(pred):
        out = non_max_suppression(pred, confidence_threshold=0.25,
                                  backend="pallas", class_mode="argmax")
        return yolo_inference(out, pred.num_flats)

    def fwd_nms(params, state, x):
        return nms_stage(fwd(params, state, x))

    if MODE == "infer":
        # warmup: compile the forward+NMS AND the fence's .sum program,
        # then drain the queue with the readout (see the train-mode note)
        out = fwd_nms(ts.params, ts.state, images)
        jax.block_until_ready(out.valid)
        float(out.valid.sum())
        t0 = time.perf_counter()
        for _ in range(STEPS):
            out = fwd_nms(ts.params, ts.state, images)
        jax.block_until_ready(out.valid)
        float(out.valid.sum())  # completion fence (see the train path)
        dt = time.perf_counter() - t0
        img_s = BATCH * STEPS / dt
        print(json.dumps({
            "metric": f"img/s/chip {MODEL_TAG} infer+nms",
            "value": round(img_s, 2), "unit": "img/s",
            "vs_baseline": round(img_s / V100_X2_IMG_S, 3),
        }))
        return

    # MODE == "nms": differential measurement — (fwd+NMS) − (fwd) with the
    # same loop shape cancels the dev-setup's per-dispatch tunnel overhead
    # and leaves the NMS+class-selection device time
    @jax.jit
    def nms_stage2(pred):
        out = non_max_suppression(pred, confidence_threshold=0.25,
                                  backend="pallas", class_mode="argmax")
        return yolo_inference(out, pred.num_flats).valid.sum()

    @jax.jit
    def fwd_pred(params, state, x):
        pred, _ = model.apply(params, state, x, train=False)
        return pred

    def fwd_sum2(params, state, x):
        return fwd_pred(params, state, x).obj_logit.sum()

    def fwd_nms_sum(params, state, x):
        return nms_stage2(fwd_pred(params, state, x))

    def run(fn, iters):
        out = fn(ts.params, ts.state, images)
        jax.block_until_ready(out)
        float(out)  # compile+drain before timing (see train-mode note)
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(ts.params, ts.state, images)
        jax.block_until_ready(out)
        float(out)  # completion fence: both run() variants return scalars
        return (time.perf_counter() - t0) / iters

    iters = max(STEPS, 10)
    samples = []
    for _ in range(5):
        base = run(fwd_sum2, iters)
        with_nms = run(fwd_nms_sum, iters)
        samples.append(max(with_nms - base, 0.0) * 1e3 / BATCH)
    p50 = float(np.percentile(samples, 50))
    print(json.dumps({
        "metric": "p50 NMS latency yolov4-csp-608",
        "value": round(p50, 4), "unit": "ms/img",
        "vs_baseline": round(1.0 / max(p50, 1e-4), 3),
    }))


if __name__ == "__main__":
    main()
