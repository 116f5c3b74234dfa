"""Serving throughput/latency bench on the real TPU (in-process service).

Hammers DetectionService with concurrent client threads submitting real
pre-decoded images (decode cost excluded — this measures the serving core:
micro-batching + device inference + NMS + coordinate mapping + fan-out).

Run under axon: python scripts/bench_serve.py
Knobs: SRV_BATCH (16), SRV_SIZE (608), SRV_CLIENTS (64), SRV_SECONDS (20),
SRV_CFG (cfg/darknet/yolov4-csp.cfg), SRV_WINDOW_MS (5).
"""

import os
import sys
import threading
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

BATCH = int(os.environ.get("SRV_BATCH", "16"))
SIZE = int(os.environ.get("SRV_SIZE", "608"))
CLIENTS = int(os.environ.get("SRV_CLIENTS", "64"))
SECONDS = float(os.environ.get("SRV_SECONDS", "20"))
CFG = os.environ.get("SRV_CFG", "cfg/darknet/yolov4-csp.cfg")
WINDOW_MS = float(os.environ.get("SRV_WINDOW_MS", "5"))


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(REPO, ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from yolodl_tpu.config import darknet_cfg as dk
    from yolodl_tpu.graph.from_darknet import graph_from_darknet
    from yolodl_tpu.models import YoloModel
    from yolodl_tpu.serve import DetectionService

    model = YoloModel(graph_from_darknet(
        dk.Darknet.load(os.path.join(REPO, CFG))))
    params, state = model.init(jax.random.PRNGKey(0))

    svc = DetectionService(
        model, params, state,
        image_size=SIZE, batch_size=BATCH, window_ms=WINDOW_MS,
        nms_conf_thresh=0.25, max_queue=4 * BATCH,
    )
    t_warm = svc.warmup()
    svc.start()
    print(f"warm in {t_warm:.1f}s; {CLIENTS} clients, batch {BATCH}, "
          f"{SECONDS:.0f}s run", flush=True)

    # Decoded real photographs (uint8, the serving fast path: decode cost
    # excluded, letterbox included).  Real pixels matter here: the axon
    # tunnel compresses host→device transfers, so incompressible noise
    # benches the worst case (~38 MB/s wire ≈ 34 img/s ceiling at 608²)
    # while photographs ride the compressor.  On a local TPU host the
    # upload is PCIe (~1 ms/batch) and none of this applies.
    pool = []
    fixture = os.environ.get(
        "SRV_IMAGES", "/root/reference/yolo-dl/tests/csv_dataset/images")
    if os.path.isdir(fixture):
        from PIL import Image
        for name in sorted(os.listdir(fixture)):
            if name.lower().endswith((".jpg", ".jpeg", ".png")):
                with Image.open(os.path.join(fixture, name)) as im:
                    pool.append(np.asarray(im.convert("RGB"), np.uint8))
    if not pool:  # fallback: smooth synthetic gradients (compressible)
        yy, xx = np.mgrid[0:480, 0:640].astype(np.float32)
        for k in range(4):
            img = np.stack([(yy * (k + 1)) % 256, (xx * (k + 2)) % 256,
                            ((yy + xx) * (k + 3)) % 256], -1)
            pool.append(img.astype(np.uint8))
    stop = time.perf_counter() + SECONDS
    counts = [0] * CLIENTS

    client_errors = []

    def client(i):
        while time.perf_counter() < stop:
            try:
                svc.submit_u8(pool[i % len(pool)], timeout=60)
                counts[i] += 1
            except (RuntimeError, TimeoutError):
                time.sleep(0.005)  # overloaded: back off like a real client
            except Exception as e:  # device fault: fail loudly, not silently
                client_errors.append(repr(e))
                return

    threads = [threading.Thread(target=client, args=(i,)) for i in range(CLIENTS)]
    t0 = time.perf_counter()
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    dt = time.perf_counter() - t0
    svc.shutdown()

    total = sum(counts)
    snap = svc.stats.snapshot(BATCH)

    # Service-core ceiling: the same two jitted programs on an
    # already-committed device batch (what a local-PCIe TPU host sees —
    # its upload is ~1 ms/batch, vs ~460 ms for 17.7 MB over this
    # benchmarking tunnel at ~38 MB/s, which bounds the e2e number above).
    import jax
    from yolodl_tpu.data.letterbox import letterbox_u8_pil
    from PIL import Image
    boxed = np.stack([
        letterbox_u8_pil(Image.fromarray(pool[i % len(pool)]), (SIZE, SIZE))
        for i in range(BATCH)])
    dev = jax.block_until_ready(jax.numpy.asarray(boxed))
    # value readout = true completion fence: on the axon tunnel
    # block_until_ready does NOT synchronize with device completion
    # (see CLAUDE.md / bench.py), so each rep reads a scalar back.
    core = lambda: np.asarray(
        svc._postprocess(svc._forward(svc._params, svc._state, dev)).valid
    ).sum()
    core()
    reps = 10
    t0 = time.perf_counter()
    for _ in range(reps):
        core()
    core_ms = (time.perf_counter() - t0) / reps * 1e3
    # pipelined core: dispatch all reps, one readout at the end — the
    # service's completer thread overlaps result readouts with the next
    # batch's device work, so the throughput ceiling excludes the per-rep
    # host round trip (which is ~26 ms on this tunnel but ~0.1 ms on a
    # local-PCIe host; the strict per-rep number above is the
    # single-request latency bound)
    run_one = lambda: svc._postprocess(
        svc._forward(svc._params, svc._state, dev))
    t0 = time.perf_counter()
    for _ in range(reps - 1):
        run_one()
    np.asarray(run_one().valid).sum()
    core_pipe_ms = (time.perf_counter() - t0) / reps * 1e3

    import json
    print(json.dumps({
        "metric": f"serve img/s {os.path.splitext(os.path.basename(CFG))[0]}-{SIZE}"
                  f" b{BATCH}",
        "value": round(total / dt, 1), "unit": "img/s",
        "latency_ms": snap.get("latency_ms"),
        "mean_batch_fill": snap.get("mean_batch_fill"),
        "errors": snap.get("errors"),
        "client_thread_errors": client_errors,
        "core_ms_per_batch": round(core_ms, 1),
        "core_img_s": round(BATCH / core_ms * 1e3, 1),
        "core_pipelined_ms_per_batch": round(core_pipe_ms, 1),
        "core_pipelined_img_s": round(BATCH / core_pipe_ms * 1e3, 1),
        "note": "e2e bound by the axon tunnel's ~38 MB/s host->device wire; "
                "core = fwd+NMS+fence on a committed batch (local-host view)",
    }), flush=True)


if __name__ == "__main__":
    main()
