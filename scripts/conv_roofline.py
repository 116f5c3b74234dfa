"""Per-conv-shape roofline study for yolov4-csp@608 on the TPU.

For every unique conv geometry in the flagship graph, runs a varied-input
execution loop under ``jax.profiler`` and reads the **device** op times from
the trace, computing achieved FLOP/s vs the bf16 MXU peak.  Sorted by total
step contribution, this shows which layer shapes run furthest from
speed-of-light — the groundwork for kernel-level optimization.

Measurement rule (discovered the hard way): on the axon tunnel backend,
``block_until_ready`` does NOT synchronize with device completion and a
value readout costs a ~26 ms network round trip, so wall-clock timing of
single ops is meaningless — only profiler traces (or long programs like the
full train step) measure device time.  Also, XLA algebraically simplifies
``mean(conv(x))`` through conv linearity, so benchmark consumers must be
nonlinear.

Run under axon: python scripts/conv_roofline.py
Env: ROOF_BATCH (16), ROOF_SIZE (608), ROOF_PEAK_TFLOPS (197 = v5e bf16).
"""

import glob
import gzip
import json
import os
import sys
import tempfile
from collections import defaultdict

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from _trace_util import device_op_ms

import jax

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(__file__), "..", ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np

from yolodl_tpu.config import darknet_cfg as dk

BATCH = int(os.environ.get("ROOF_BATCH", "16"))
SIZE = int(os.environ.get("ROOF_SIZE", "608"))
PEAK = float(os.environ.get("ROOF_PEAK_TFLOPS", "197")) * 1e12
REPS = int(os.environ.get("ROOF_REPS", "6"))


def conv_shapes():
    text = open(os.path.join(os.path.dirname(__file__), "..",
                             "cfg/darknet/yolov4-csp.cfg")).read()
    text = text.replace("width=512", f"width={SIZE}").replace(
        "height=512", f"height={SIZE}")
    d = dk.Darknet.from_str(text)
    shapes = d.output_shapes()
    counts = defaultdict(int)
    for i, l in enumerate(d.layers):
        if not isinstance(l, dk.Convolutional):
            continue
        h, w, _ = d.net.input_shape_hwc if i == 0 else shapes[i - 1]
        c_in = d.net.channels if i == 0 else shapes[i - 1][2]
        counts[(h, w, c_in, l.filters, l.size, l.stride_x, l.groups)] += 1
    return counts


def main():
    rng = np.random.default_rng(0)
    rows = []
    for (h, w, c_in, c_out, k, s, g), count in sorted(conv_shapes().items()):
        xs = [jnp.asarray(rng.normal(size=(BATCH, h, w, c_in)) * 0.1,
                          jnp.bfloat16) for _ in range(REPS)]
        kern = jnp.asarray(rng.normal(size=(k, k, c_in // g, c_out)) * 0.1,
                           jnp.bfloat16)

        def conv(x, kern, s=s, k=k, g=g):
            return jax.lax.conv_general_dilated(
                x, kern, (s, s), ((k // 2, k // 2), (k // 2, k // 2)),
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                feature_group_count=g)

        @jax.jit
        def run(x, kern):
            y = conv(x, kern)
            grads = jax.grad(
                lambda x, kern: jnp.sum(conv(x, kern).astype(jnp.float32) ** 2),
                argnums=(0, 1))(x, kern)
            return (jnp.sum(y.astype(jnp.float32) ** 2)
                    + sum(jnp.sum(gr.astype(jnp.float32) ** 2) for gr in grads))

        float(run(xs[0], kern))  # compile + warm
        tmp = tempfile.mkdtemp(prefix="roof_")
        with jax.profiler.trace(tmp):
            outs = [run(x, kern) for x in xs]
            vals = [float(o) for o in outs]  # force completion
        assert all(np.isfinite(v) for v in vals)
        ms = device_op_ms(tmp) / REPS

        oh = (h + 2 * (k // 2) - k) // s + 1
        ow = (w + 2 * (k // 2) - k) // s + 1
        # run() executes fwd + fwd-for-grad + dX + dW ≈ 4× fwd FLOPs
        flops = 4 * 2 * BATCH * oh * ow * c_out * (c_in // g) * k * k
        eff = flops / (ms * 1e-3) / PEAK if ms > 0 else 0.0
        rows.append({
            "shape": f"{h}x{w} {c_in}->{c_out} k{k}s{s}" + (f"g{g}" if g > 1 else ""),
            "count": count,
            "ms": round(ms, 3),
            "eff": round(eff, 3),
            "step_ms": round(count * ms, 2),
        })
        print(f"{rows[-1]['shape']:34} n={count:3d} {ms:7.3f} ms  "
              f"eff {eff:6.3f}  Σ {rows[-1]['step_ms']:7.2f}", flush=True)

    rows.sort(key=lambda r: -r["step_ms"])
    total = sum(r["step_ms"] for r in rows)
    print("\n--- sorted by step contribution (fwd+bwd, ≈4×fwd FLOPs) ---")
    for r in rows[:15]:
        print(f"{r['shape']:34} n={r['count']:3d} eff {r['eff']:6.3f} "
              f"Σ {r['step_ms']:7.2f} ms")
    print(json.dumps({"total_conv_ms_per_step": round(total, 1),
                      "batch": BATCH, "size": SIZE}))


if __name__ == "__main__":
    main()
