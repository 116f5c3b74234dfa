"""Precise train-step device-time bucketing from a jax.profiler trace.

Sharper than trace_groups.py: distinguishes conv wgrad fusions from
optimizer/cast fusions (both produce kernel-shaped f32 outputs — the
earlier regex conflated them, inflating "wgrad" 55 ms vs the true 23 ms)
by requiring a convolution/dot in the fused computation.

Usage: python scripts/trace_buckets.py            # capture fresh (TPU)
       python scripts/trace_buckets.py <tracedir> # classify existing
Env: BENCH_BATCH/BENCH_SIZE/BENCH_CFG as in trace_ops.py.
"""

import glob
import gzip
import json
import os
import re
import sys
import tempfile

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

SHAPE_RE = re.compile(r"([a-z0-9]+)\[([0-9,]*)\]")


def _outputs(hint: str):
    """Shapes appearing before the op's operand list = the output tuple."""
    head = re.split(r" (?:fusion|convolution|copy|reduce|dot)\(", hint)[0]
    return [(d, s) for d, s in SHAPE_RE.findall(head)]


def classify(name: str, args: dict) -> str:
    base = name.split(".")[0].split("(")[0]
    if re.fullmatch(r"\d+", base) or base.startswith("jit_"):
        return ""
    cat = args.get("hlo_category", "")
    hint = args.get("long_name", "")
    if "convolution" in cat or base == "convolution":
        outs = _outputs(hint)
        for dtype, shape in outs:
            dims = shape.split(",")
            if len(dims) == 4 and dtype == "f32" and int(dims[0]) <= 13 \
                    and dims[0] == dims[1]:
                return "conv wgrad"
        # dX fusions consume a kernel-shaped bf16 operand and produce a
        # big activation; fwd fusions do too — split by BN-stat outputs
        # (forward conv+BN emits per-channel bf16 reduction results).
        return "conv fwd/dx"
    if "copy" in cat or cat in ("data formatting", "copy-done", "copy-start",
                                "broadcast", "memory transfer"):
        return f"data movement ({cat})" if cat else "data movement"
    if "select_and_scatter" in base:
        return "select_and_scatter"
    if base == "dot" or "dot" in cat:
        return "dot (matcher/loss)"
    if "fusion" in cat or "fusion" in base:
        outs = _outputs(hint)
        big = any(len(s.split(",")) >= 3 and all(x for x in s.split(","))
                  and max(int(x) for x in s.split(",") if x) > 1000
                  for _, s in outs)
        kernelish = outs and all(
            (len(s.split(",")) == 4 and int(s.split(",")[0]) <= 13)
            or len(s.split(",")) <= 1
            for _, s in outs)
        if kernelish and not big:
            return "opt update / cast (param-shaped)"
        if " reduce(" in hint or "reduce" in base:
            return "reduce fusion"
        return "elementwise fusion"
    if "reduce" in base:
        return "reduce fusion"
    if "dynamic" in base or "gather" in base or "scatter" in base:
        return "gather/scatter"
    return f"other: {cat or base}"


def bucket(trace_dir: str):
    files = glob.glob(os.path.join(
        trace_dir, "plugins/profile/*/*.trace.json.gz"))
    data = json.loads(gzip.open(sorted(files)[-1]).read())
    events = data.get("traceEvents", [])
    pid_names = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pid_names[e["pid"]] = e.get("args", {}).get("name", "")
    device_pids = {p for p, n in pid_names.items()
                   if "TPU" in n or "/device:" in n}
    buckets, samples = {}, {}
    total = 0.0
    for e in events:
        if e.get("ph") != "X" or e.get("pid") not in device_pids:
            continue
        cat = classify(e.get("name", "?"), e.get("args", {}))
        if not cat:
            continue
        hint = e.get("args", {}).get("long_name", "")
        dur = e.get("dur", 0) / 1e3
        b = buckets.setdefault(cat, [0.0, 0])
        b[0] += dur
        b[1] += 1
        total += dur
        s = samples.setdefault(cat, [])
        if len(s) < 400:
            s.append((dur, e.get("name"), hint[:140]))
    print(f"total leaf device time: {total:.1f} ms")
    for cat, (ms, n) in sorted(buckets.items(), key=lambda kv: -kv[1][0]):
        print(f"{ms:8.2f} ms {100*ms/total:5.1f}%  {n:5d} ops  {cat}")
    if os.environ.get("TRACE_TOP"):
        cat = os.environ["TRACE_TOP"]
        agg = {}
        for dur, nm, hint in samples.get(cat, []):
            key = hint[:100]
            a = agg.setdefault(key, [0.0, 0])
            a[0] += dur
            a[1] += 1
        print(f"\n-- top ops in bucket {cat!r} --")
        for key, (ms, n) in sorted(agg.items(), key=lambda kv: -kv[1][0])[:25]:
            print(f"{ms:7.2f} ms x{n:3d}  {key}")


def capture() -> str:
    import jax
    jax.config.update("jax_compilation_cache_dir", os.path.join(
        os.path.dirname(__file__), "..", ".jax_cache"))
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
    dn = dk.Darknet.load(CFG)
    graph = graph_from_darknet(dn)
    model = YoloModel(graph)
    if os.environ.get("TRACE_LOSS", "").lower() == "darknet":
        # bucket the darknet-EXACT loss step (training.loss.impl=Darknet)
        from yolodl_tpu.loss.darknet_loss import head_params_from_darknet
        heads = [l for l in dn.layers if isinstance(l, dk.Yolo)]
        spec = (graph.detect_head_input_keys(),
                tuple(head_params_from_darknet(l, SIZE, SIZE)
                      for l in heads))
        config = TrainConfig(darknet_loss=spec)
    else:
        config = TrainConfig()
    ts, opt = train_init(model, config)
    step_fn = make_train_step(model, opt, config)
    rng = np.random.default_rng(0)
    images = jnp.asarray(rng.normal(size=(BATCH, 3, SIZE, SIZE)), jnp.bfloat16)
    boxes = jnp.asarray(rng.uniform(0.2, 0.8, (BATCH, 32, 4)), jnp.float32)
    classes = jnp.asarray(rng.integers(0, 80, (BATCH, 32)), jnp.int32)
    mask = jnp.ones((BATCH, 32), bool)
    ts, metrics = step_fn(ts, images, boxes, classes, mask)
    jax.block_until_ready(metrics["total_loss"])
    tmp = tempfile.mkdtemp(prefix="yolodl_buckets_")
    with jax.profiler.trace(tmp):
        for _ in range(3):
            ts, metrics = step_fn(ts, images, boxes, classes, mask)
        jax.block_until_ready(metrics["total_loss"])
        float(metrics["total_loss"])
    print("trace:", tmp)
    return tmp


if __name__ == "__main__":
    d = sys.argv[1] if len(sys.argv) > 1 else capture()
    bucket(d)
