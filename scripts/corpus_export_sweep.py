"""StableHLO export round-trip over the detection corpus (CPU).

``yolo-tool export`` (models/export.py) is the deployment path: for every
detection cfg, serialize the inference fn (weights baked in), reload the
artifact, and assert its outputs match the live model (atol 1e-4 on
decoded boxes/logits) and that the head layout metadata survives.
Catches per-topology lowering/serialization gaps (scan-free CNNs only —
classifier/sequence cfgs have no MergedDetection sink to export).

~20-40 min on one CPU core — release check, not unit suite:
    python scripts/corpus_export_sweep.py [--all] [--cfg NAME ...]
(default: every 3rd detection cfg)
Last result (2026-08-18): --all export ok: 40/40 detection cfgs.
"""

import argparse
import glob
import os
import re
import sys
import tempfile
import time

os.environ.pop("PALLAS_AXON_POOL_IPS", None)
os.environ["JAX_PLATFORMS"] = "cpu"

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

jax.config.update("jax_platforms", "cpu")  # sitecustomize re-forces axon

import numpy as np

SKIP = {"resnet152_trident.cfg"}  # broken upstream (mismatched route sizes)


def export_one(path: str, name: str):
    import jax.numpy as jnp

    import yolodl_tpu.config.darknet_cfg as dk
    from yolodl_tpu.graph.from_darknet import graph_from_darknet
    from yolodl_tpu.models import YoloModel
    from yolodl_tpu.models.export import export_inference, load_exported

    text = open(path).read()
    d0 = dk.Darknet.from_str(text)
    if not any(type(layer).__name__ in ("Yolo", "GaussianYolo", "Region")
               for layer in d0.layers):
        return None  # no MergedDetection sink to export
    target = 256 if "p7" in name else 128
    if d0.net.height != target:
        text = re.sub(r"(?m)^height *= *\d+", f"height={target}", text)
        text = re.sub(r"(?m)^width *= *\d+", f"width={target}", text)
    d = dk.Darknet.from_str(text)
    model = YoloModel(graph_from_darknet(d))
    params, state = model.init(jax.random.PRNGKey(0))

    b = max(d.net.time_steps, 1)
    h, w, c = d.net.input_shape_hwc
    with tempfile.TemporaryDirectory() as out_dir:
        export_inference(model, params, state, out_dir,
                         batch_size=b, image_size=h)
        infer, meta = load_exported(out_dir)
        x = jnp.asarray(
            np.random.default_rng(0).uniform(0, 1, (b, c, h, w)), jnp.float32)
        live, _ = model.apply(params, state, x, train=False)
        art = infer(x)
        assert art.infos == live.infos, "head layout metadata changed"
        worst = 0.0
        for field in ("cycxhw", "obj_logit", "class_logit"):
            delta = float(jnp.max(jnp.abs(
                getattr(art, field) - getattr(live, field))))
            worst = max(worst, delta)
            if delta > 1e-4:
                raise AssertionError(f"{field}: max|Δ| {delta:.2e}")
    return f"{meta['num_classes']:3d} classes, max|Δ| {worst:.1e}"


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
            names = names[::3]

    ok, skipped, fails = 0, 0, []
    for name in names:
        if name in SKIP:
            continue
        t0 = time.time()
        try:
            info = export_one(os.path.join(repo, "cfg/darknet", name), name)
            if info is None:
                skipped += 1
                continue
            ok += 1
            print(f"ok   {name:40s} {info} [{time.time()-t0:5.1f}s]",
                  flush=True)
        except Exception as e:  # noqa: BLE001 — sweep reports, doesn't die
            fails.append((name, repr(e)))
            print(f"FAIL {name:40s} {e!r}", flush=True)
    print(f"\nexport ok: {ok}/{ok + len(fails)} detection cfgs "
          f"({skipped} non-detection skipped)")
    for name, err in fails:
        print(f"  FAIL {name}: {err}")
    sys.exit(1 if fails else 0)


if __name__ == "__main__":
    main()
