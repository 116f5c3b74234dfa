"""dW-only bench: double-buffered Pallas wgrad vs XLA backward-filter (TPU).

Isolates the weight-gradient computation (fixed cotangent, no fwd/dX in the
timed program) on the yolov4-csp-608 wgrad hotspot shapes, comparing:

  xla      — jax.vjp of the stock conv, w-cotangent only
  pallas1  — round-1 kernel (synchronous per-block halo DMA, wgrad_pallas)
  pallasdb — round-2 double-buffered kernel (wgrad_db)

Run under axon: python scripts/exp_wgrad_db.py
Env: EXP_BATCH (16), EXP_REPS (8).
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

BATCH = int(os.environ.get("EXP_BATCH", "16"))
REPS = int(os.environ.get("EXP_REPS", "8"))


def timed(fn, args):
    return _timed(fn, args, reps=REPS)


def main():
    from yolodl_tpu.kernels.wgrad_db import wgrad_db
    from yolodl_tpu.kernels.wgrad_pallas import wgrad_lowch

    rng = np.random.default_rng(0)
    shapes = [
        (304, 64, 32, 1),    # stage-1 1x1
        (304, 32, 64, 3),    # stage-1 3x3
        (304, 12, 128, 3),   # spd-stem conv1
        (152, 128, 64, 1),   # worst round-1 shape (0.23x)
        (152, 64, 64, 1),    # csp split 1x1s
        (152, 64, 64, 3),
        (76, 256, 128, 1),   # well-packed control
    ]
    for (hw, ci, co, k) in shapes:
        pad = (k - 1) // 2
        x = jnp.asarray(rng.normal(size=(BATCH, hw, hw, ci)) * 0.1,
                        jnp.bfloat16)
        xp = jnp.pad(x, ((0, 0), (pad, pad), (pad, pad), (0, 0))) if pad else x
        g = jnp.asarray(rng.normal(size=(BATCH, hw, hw, co)) * 0.1,
                        jnp.bfloat16)
        w = jnp.zeros((k, k, ci, co), jnp.bfloat16)

        def dw_xla(x, g):
            def f(w_):
                return jax.lax.conv_general_dilated(
                    x, w_, (1, 1), ((pad, pad), (pad, pad)),
                    dimension_numbers=("NHWC", "HWIO", "NHWC"))
            return jax.vjp(f, w)[1](g)[0]

        name = f"{hw}p {ci}->{co} k{k}"
        ms_xla = timed(jax.jit(dw_xla), (x, g))

        # correctness vs XLA before timing the kernels
        ref = np.asarray(jax.jit(dw_xla)(x, g), np.float32)
        line = f"{name:18} xla {ms_xla:7.3f} ms"
        for kname, fn in (("pallas1", wgrad_lowch), ("pallasdb", wgrad_db)):
            try:
                run = jax.jit(lambda xp, g, fn=fn: fn(xp, g, k))
                got = np.asarray(run(xp, g), np.float32)
                scale = np.abs(ref).max() + 1e-9
                err = np.abs(got - ref).max() / scale
                ms = timed(run, (xp, g))
                line += (f"   {kname} {ms:7.3f} ms ({ms_xla/ms:4.2f}x, "
                         f"err {err:.1e})")
            except Exception as e:
                line += f"   {kname} FAILED: {str(e).splitlines()[0][:60]}"
        print(line, flush=True)


if __name__ == "__main__":
    main()
