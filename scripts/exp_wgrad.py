"""Measure the Pallas wgrad kernel vs XLA conv backward on the TPU.

Target shapes = the wgrad hotspots of the yolov4-csp-608 train step
(trace analysis: stem conv 12->128, stage-1 1x1 64->32 / 3x3 32->64,
152p 1x1s).  Times fwd+bwd of sum(conv(x,w)^2) with the stock XLA conv
vs conv2d_lowch (XLA fwd/dX + Pallas dW).

Run under axon: python scripts/exp_wgrad.py
"""

import functools
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

from yolodl_tpu.kernels.wgrad_pallas import conv2d_lowch
from yolodl_tpu.ops.wgrad import conv2d_packed_wgrad

BATCH = int(os.environ.get("EXP_BATCH", "16"))
REPS = int(os.environ.get("EXP_REPS", "6"))


def timed(fn, args):
    return _timed(fn, args, reps=REPS)


def main():
    rng = np.random.default_rng(0)
    shapes = [
        (304, 12, 128, 3, 1),   # spd-stem conv1
        (304, 64, 32, 1, 1),    # stage-1 1x1
        (304, 32, 64, 3, 1),    # stage-1 3x3
        (152, 64, 64, 1, 1),    # csp split 1x1s
        (152, 128, 64, 1, 1),
        (152, 64, 64, 3, 1),
        (304, 64, 128, 3, 2),   # downsample 304->152
        (152, 128, 256, 3, 2),  # downsample 152->76
    ]
    for (hw, ci, co, k, s) in shapes:
        x = jnp.asarray(rng.normal(size=(BATCH, hw, hw, ci)) * 0.1, jnp.bfloat16)
        w = jnp.asarray(rng.normal(size=(k, k, ci, co)) * 0.1, jnp.bfloat16)
        pad = (k - 1) // 2

        def conv_xla(x, w):
            return jax.lax.conv_general_dilated(
                x, w, (s, s), ((pad, pad), (pad, pad)),
                dimension_numbers=("NHWC", "HWIO", "NHWC"))

        def run_of(convfn):
            @jax.jit
            def run(x, w):
                y = convfn(x, w)
                gx, gw = jax.grad(
                    lambda x, w: jnp.sum(convfn(x, w).astype(jnp.float32) ** 2),
                    argnums=(0, 1))(x, w)
                return (jnp.sum(y.astype(jnp.float32) ** 2)
                        + jnp.sum(gx.astype(jnp.float32) ** 2)
                        + jnp.sum(gw.astype(jnp.float32) ** 2))
            return run

        name = f"{hw}p {ci}->{co} k{k} s{s}"
        try:
            ms_xla = timed(run_of(conv_xla), (x, w))
            ms_pk = timed(
                run_of(functools.partial(conv2d_packed_wgrad, k=k, stride=s)),
                (x, w))
        except Exception as e:
            print(f"{name:22} FAILED: {str(e).splitlines()[0][:120]}",
                  flush=True)
            continue
        line = (f"{name:22} xla {ms_xla:7.3f} ms   packed-dw {ms_pk:7.3f} ms"
                f"   ({ms_xla / ms_pk:4.2f}x)")
        if os.environ.get("EXP_PALLAS") and s == 1:
            try:
                ms_pal = timed(run_of(functools.partial(conv2d_lowch, k=k)),
                               (x, w))
                line += f"   pallas-dw {ms_pal:7.3f} ms"
            except Exception as e:
                line += f"   pallas FAILED: {str(e).splitlines()[0][:60]}"
        print(line, flush=True)


if __name__ == "__main__":
    main()
