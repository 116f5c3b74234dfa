"""Spatial (height-sharded) inference parity over the detection corpus.

The spatial planner (parallel/spatial_model.py) claims to find the exact
halo-shardable prefix of ANY darknet graph; the unit tests exercise two
families (tiny, csp).  This release check runs every detection cfg:

- plan the shardable prefix on a 2-shard space mesh and report coverage
  (sharded nodes / total nodes),
- run the full sharded inference (halo-exchange prefix + all_gather cut)
  and assert it matches the unsharded forward (max |Δ| < 1e-4 on decoded
  boxes and logits).

Classifier/sequence cfgs are skipped (spatial inference is wired for the
detection sink; their planner behavior is covered by the planner unit
tests).

~30-60 min on one CPU core — release check, not unit suite:
    python scripts/corpus_spatial_sweep.py [--all] [--cfg NAME ...]
(default: every 2nd detection cfg)
Last result (2026-08-18): --all spatial ok: 40/40 detection cfgs, exact
(max |Δ| ≤ 4.8e-07).  Prefix coverage 3-96% of nodes: the 3% outlier is
enet-coco, whose squeeze-excite global pools end the shardable prefix
after 4 nodes (structural); tiny nets at 128px stop where H/n gets too
small — coverage grows with input size.
"""

import argparse
import glob
import os
import re
import sys
import time

# must precede any jax import: the sharded path needs 2 virtual devices
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
N_SHARDS = 2


def spatial_one(path: str, name: str) -> str:
    import jax
    import jax.numpy as jnp

    import yolodl_tpu.config.darknet_cfg as dk
    from yolodl_tpu.graph.from_darknet import graph_from_darknet
    from yolodl_tpu.models import YoloModel
    from yolodl_tpu.parallel.spatial import make_space_mesh
    from yolodl_tpu.parallel.spatial_model import (
        make_spatial_infer, plan_spatial_prefix,
    )

    text = open(path).read()
    d0 = dk.Darknet.from_str(text)
    has_head = any(
        type(layer).__name__ in ("Yolo", "GaussianYolo", "Region")
        for layer in d0.layers)
    if not has_head:
        # classifier/sequence cfg, or the yolov1 [detection] grid head
        # (a GraphModel tensor sink, not a MergeDetect2D model) — not a
        # spatial-infer target
        return None
    target = 256 if "p7" in name else 128
    if d0.net.height != target:
        text = re.sub(r"(?m)^height *= *\d+", f"height={target}", text)
        text = re.sub(r"(?m)^width *= *\d+", f"width={target}", text)
    d = dk.Darknet.from_str(text)
    model = YoloModel(graph_from_darknet(d))
    params, state = model.init(jax.random.PRNGKey(0))

    sharded, cut = plan_spatial_prefix(model, N_SHARDS)
    coverage = len(sharded) / len(model.graph.order)

    mesh = make_space_mesh(N_SHARDS)
    infer = make_spatial_infer(model, mesh)
    h, w, c = d.net.input_shape_hwc
    b = max(d.net.time_steps, 1)  # [crnn] trackers: batch = time-major rows
    x = jnp.asarray(
        np.random.default_rng(0).uniform(0, 1, (b, c, h, w)), jnp.float32)
    ref, _ = model.apply(params, state, x, train=False)
    out = infer(params, state, x)
    worst = 0.0
    for field in ("cycxhw", "obj_logit", "class_logit"):
        delta = float(jnp.max(jnp.abs(
            getattr(out, field) - getattr(ref, field))))
        worst = max(worst, delta)
        if delta > 1e-4:
            raise AssertionError(f"{field}: max|Δ| {delta:.2e}")
    return (f"prefix {len(sharded):3d}/{len(model.graph.order):3d} nodes "
            f"({coverage:4.0%}), max|Δ| {worst:.1e}")


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
            info = spatial_one(os.path.join(repo, "cfg/darknet", name), name)
            if info is None:
                skipped += 1
                continue
            ok += 1
            print(f"ok   {name:40s} {info} [{time.time()-t0:5.1f}s]",
                  flush=True)
        except Exception as e:  # noqa: BLE001 — sweep reports, doesn't die
            fails.append((name, repr(e)))
            print(f"FAIL {name:40s} {e!r}", flush=True)
    print(f"\nspatial ok: {ok}/{ok + len(fails)} detection cfgs "
          f"({skipped} non-detection skipped)")
    for name, err in fails:
        print(f"  FAIL {name}: {err}")
    sys.exit(1 if fails else 0)


if __name__ == "__main__":
    main()
