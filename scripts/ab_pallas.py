"""A/B bench: Pallas kernels vs their XLA equivalents on the real TPU.

Decides the fate of the two demonstration-grade Pallas kernels (VERDICT
round 1, Weak #2):

1. NMS suppression backend: ``pairwise_iou_pallas`` (the tch-nms
   replacement kernel) vs XLA's fused broadcast IoU, inside the full
   production postprocess (non_max_suppression + yolo_inference) on
   yolov4-csp-608-shaped detections at b16/b64.
2. ``fused_conv1x1_mish`` vs the composed XLA ops (1x1 conv → folded-BN
   affine → Mish) at representative CSP shapes, fwd and fwd+bwd.

Device time via jax.profiler traces (wall timing is meaningless under the
axon tunnel for sub-26ms programs — CLAUDE.md).

MEASURED (2026-08-17, v5e, yolov4-csp-608-shaped inputs):

    NMS b16: xla 1.270 ms  pallas 1.303 ms  (keep agreement 1.000000)
    NMS b64: xla 4.761 ms  pallas 4.622 ms  (keep agreement 1.000000)
    1x1 152p 128->64: fwd fused 1.416 / xla 0.478 ; fwd+bwd 1.791 / 1.017
    1x1  76p 256->128: fwd fused 0.592 / xla 0.383 ; fwd+bwd 0.812 / 0.299
    1x1  38p 512->256: fwd fused 0.390 / xla 0.198 ; fwd+bwd 0.410 / 0.180

Consequences: the Pallas IoU NMS backend is a statistical wash (-2.6% at
b16, +2.9% at b64, bit-identical keep decisions) — it stays available via
``backend="pallas"`` with XLA as default.  ``fused_conv1x1_mish`` lost
1.5-4.5x to XLA's own epilogue fusion on every shape and was DELETED
(git history has it); XLA fuses conv-BN-Mish by itself, better.  Part 2
of this script is therefore skipped unless the kernel is restored.

Run: python scripts/ab_pallas.py
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from _trace_util import device_op_ms, timed as _timed

import jax

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(__file__), "..", ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np

REPS = int(os.environ.get("EXP_REPS", "8"))


def timed(fn, args):
    return _timed(fn, args, reps=REPS)


def make_pred(batch, rng):
    """yolov4-csp-608-shaped MergedDetection with realistic confidence
    statistics (sparse positives over a low-logit background)."""
    from yolodl_tpu.ops.detect import DetectionInfo, MergedDetection

    sizes = [76, 38, 19]
    infos = []
    begin = 0
    for s in sizes:
        n = 3 * s * s
        infos.append(DetectionInfo(
            feature_h=s, feature_w=s,
            anchors=((0.05, 0.05),) * 3,
            flat_begin=begin, flat_end=begin + n))
        begin += n
    n_flats = begin
    cycxhw = rng.uniform(0.1, 0.9, (batch, n_flats, 4)).astype(np.float32)
    cycxhw[..., 2:] = rng.uniform(0.02, 0.3, (batch, n_flats, 2))
    obj = rng.normal(-6.0, 1.0, (batch, n_flats)).astype(np.float32)
    cls = rng.normal(-4.0, 1.0, (batch, n_flats, 80)).astype(np.float32)
    # sprinkle ~100 confident detections per image
    for b in range(batch):
        hot = rng.choice(n_flats, 100, replace=False)
        obj[b, hot] = rng.normal(3.0, 1.0, 100)
        cls[b, hot, rng.integers(0, 80, 100)] = rng.normal(4.0, 1.0, 100)
    return MergedDetection(
        cycxhw=jnp.asarray(cycxhw), obj_logit=jnp.asarray(obj),
        class_logit=jnp.asarray(cls), infos=tuple(infos))


def main():
    from yolodl_tpu.loss import non_max_suppression, yolo_inference

    try:
        from yolodl_tpu.kernels.fused_conv1x1 import fused_conv1x1_mish
    except ImportError:
        fused_conv1x1_mish = None  # deleted after the measured negative

    rng = np.random.default_rng(0)

    # ---- 1. NMS backend A/B ------------------------------------------------
    for batch in (16, 64):
        pred = make_pred(batch, rng)

        def post(backend):
            @jax.jit
            def run(p):
                nms = non_max_suppression(
                    p, iou_threshold=0.6, confidence_threshold=0.1,
                    class_mode="argmax", backend=backend)
                return yolo_inference(nms, p.num_flats)
            return run

        xla = post("xla")
        pal = post("pallas")
        # correctness: identical keep decisions
        kx = np.asarray(xla(pred).valid)
        kp = np.asarray(pal(pred).valid)
        agree = (kx == kp).mean()
        ms_x = timed(xla, (pred,))
        ms_p = timed(pal, (pred,))
        print(f"NMS b{batch}: xla {ms_x:.3f} ms  pallas {ms_p:.3f} ms  "
              f"(keep agreement {agree:.6f})", flush=True)

    # ---- 2. fused 1x1 conv-BN-Mish A/B ------------------------------------
    if fused_conv1x1_mish is None:
        print("fused_conv1x1_mish deleted (measured 1.5-4.5x slower than "
              "XLA's own fusion; see docstring) — part 2 skipped")
        return
    shapes = [
        (16, 152, 152, 128, 64),
        (16, 76, 76, 256, 128),
        (16, 38, 38, 512, 256),
    ]
    for b, h, w_, ci, co in shapes:
        x = jnp.asarray(rng.normal(0, 0.5, (b, h, w_, ci)), jnp.bfloat16)
        w = jnp.asarray(rng.normal(0, 0.1, (ci, co)), jnp.bfloat16)
        scale = jnp.asarray(rng.uniform(0.5, 1.5, (co,)), jnp.float32)
        shift = jnp.asarray(rng.normal(0, 0.1, (co,)), jnp.float32)

        def composed(x, w, scale, shift):
            z = (x @ w).astype(jnp.float32) * scale + shift
            return (z * jnp.tanh(jax.nn.softplus(z))).astype(x.dtype)

        fused_f = jax.jit(fused_conv1x1_mish)
        comp_f = jax.jit(composed)

        err = float(jnp.max(jnp.abs(
            fused_f(x, w, scale, shift).astype(jnp.float32)
            - comp_f(x, w, scale, shift).astype(jnp.float32))))

        def bwd(fn):
            @jax.jit
            def run(x, w, scale, shift):
                return jax.grad(
                    lambda *a: jnp.sum(fn(*a).astype(jnp.float32) ** 2),
                    argnums=(0, 1, 2, 3))(x, w, scale, shift)
            return run

        ms_fwd_fused = timed(fused_f, (x, w, scale, shift))
        ms_fwd_comp = timed(comp_f, (x, w, scale, shift))
        ms_bwd_fused = timed(bwd(fused_conv1x1_mish), (x, w, scale, shift))
        ms_bwd_comp = timed(bwd(composed), (x, w, scale, shift))
        print(f"1x1 {h}p {ci}->{co}: fwd fused {ms_fwd_fused:.3f} / "
              f"xla {ms_fwd_comp:.3f} ms ; fwd+bwd fused {ms_bwd_fused:.3f} / "
              f"xla {ms_bwd_comp:.3f} ms ; max|err| {err:.2e}", flush=True)


if __name__ == "__main__":
    main()
