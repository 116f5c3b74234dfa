"""Pipeline-parallel inference parity over the detection corpus.

The pipeline planner (parallel/pipeline.py) claims to cut ANY darknet
graph into balanced stages with few crossing tensors; the unit tests
exercise two families (tiny + a minimal spd-stem net).  This release
check runs every detection cfg:

- plan a 2-stage split (raising max_cross when skip-heavy graphs need
  it) and report the balance + boundary width,
- run the staged MPMD forward on a 2-device CPU mesh and assert it
  matches the single-device forward (max |Δ| < 1e-4 on decoded boxes
  and logits).

Classifier/sequence cfgs are skipped (PipelineModel.apply is generic,
but this sweep targets the detection sink like the spatial one).

~30-60 min on one CPU core — release check, not unit suite:
    python scripts/corpus_pipeline_sweep.py [--all] [--cfg NAME ...]
(default: every 2nd detection cfg)
Last result (2026-08-18): --all pipeline ok: 40/40 detection cfgs (the
parity bar is max |Δ| < 1e-4 per cfg; observed deltas were 1e-7-ish),
stage balance within 44-56% flops on the sampled tail.
"""

import argparse
import glob
import os
import re
import sys
import time

# must precede any jax import: the staged path needs 2 virtual devices
os.environ.pop("PALLAS_AXON_POOL_IPS", None)
os.environ["JAX_PLATFORMS"] = "cpu"
if "xla_force_host_platform_device_count" not in os.environ.get("XLA_FLAGS", ""):
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + " --xla_force_host_platform_device_count=2").strip()

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

# the session's sitecustomize re-forces the axon platform via jax.config at
# interpreter start — env vars alone are too late (CLAUDE.md / conftest.py)
jax.config.update("jax_platforms", "cpu")

import numpy as np

SKIP = {"resnet152_trident.cfg"}  # broken upstream (mismatched route sizes)
N_STAGES = 2


def pipeline_one(path: str, name: str) -> str:
    import jax
    import jax.numpy as jnp

    import yolodl_tpu.config.darknet_cfg as dk
    from yolodl_tpu.graph.from_darknet import graph_from_darknet
    from yolodl_tpu.models import YoloModel
    from yolodl_tpu.parallel.pipeline import PipelineModel

    text = open(path).read()
    d0 = dk.Darknet.from_str(text)
    has_head = any(
        type(layer).__name__ in ("Yolo", "GaussianYolo", "Region")
        for layer in d0.layers)
    if not has_head:
        return None
    target = 256 if "p7" in name else 128
    if d0.net.height != target:
        text = re.sub(r"(?m)^height *= *\d+", f"height={target}", text)
        text = re.sub(r"(?m)^width *= *\d+", f"width={target}", text)
    d = dk.Darknet.from_str(text)
    model = YoloModel(graph_from_darknet(d))
    params, state = model.init(jax.random.PRNGKey(0))

    pp = None
    for max_cross in (4, 8, 16, 32):
        try:
            pp = PipelineModel(model, N_STAGES, max_cross=max_cross)
            break
        except ValueError:
            continue
    if pp is None:
        raise AssertionError("no 2-stage split up to max_cross=32")

    h, w, c = d.net.input_shape_hwc
    b = max(d.net.time_steps, 1) * 2  # even batch (dp-divisibility habit)
    x = jnp.asarray(
        np.random.default_rng(0).uniform(0, 1, (b, c, h, w)), jnp.float32)
    ref, _ = model.apply(params, state, x, train=False)
    out, _ = pp.apply(pp.split_params(params), pp.split_state(state), x)
    worst = 0.0
    for field in ("cycxhw", "obj_logit", "class_logit"):
        delta = float(jnp.max(jnp.abs(
            getattr(out, field) - getattr(ref, field))))
        worst = max(worst, delta)
        if delta > 1e-4:
            raise AssertionError(f"{field}: max|Δ| {delta:.2e}")
    total = sum(p.cost for p in pp.stages) or 1.0
    shares = "/".join(f"{100 * p.cost / total:.0f}" for p in pp.stages)
    return (f"stages {'+'.join(str(len(p.keys)) for p in pp.stages):>9s} "
            f"nodes ({shares}% flops), {len(pp.stages[0].out_keys)} "
            f"boundary tensors (max_cross {max_cross}), max|Δ| {worst:.1e}")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--all", action="store_true")
    ap.add_argument("--cfg", nargs="*")
    args = ap.parse_args()

    repo = os.path.join(os.path.dirname(__file__), "..")
    if args.cfg:
        names = args.cfg
    else:
        names = sorted(
            os.path.basename(p)
            for p in glob.glob(os.path.join(repo, "cfg/darknet/*.cfg")))
        if not args.all:
            names = names[::2]

    ok, skipped, fails = 0, 0, []
    for name in names:
        if name in SKIP:
            continue
        t0 = time.time()
        try:
            info = pipeline_one(os.path.join(repo, "cfg/darknet", name), name)
            if info is None:
                skipped += 1
                continue
            ok += 1
            print(f"ok   {name:40s} {info} [{time.time()-t0:5.1f}s]",
                  flush=True)
        except Exception as e:  # noqa: BLE001 — sweep reports, doesn't die
            fails.append((name, repr(e)))
            print(f"FAIL {name:40s} {e!r}", flush=True)
    print(f"\npipeline ok: {ok}/{ok + len(fails)} detection cfgs "
          f"({skipped} non-detection skipped)")
    for name, err in fails:
        print(f"  FAIL {name}: {err}")
    sys.exit(1 if fails else 0)


if __name__ == "__main__":
    main()
