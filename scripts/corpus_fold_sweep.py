"""BN-folding parity over the whole darknet corpus (CPU).

``yolo-tool fold-weights`` (models/fold.py) is a production export path:
for every corpus cfg, randomize the BN affine/running stats (an
identity-stat fold proves nothing), fold, rebuild the model from the
folded cfg, and assert the eval-mode forward matches the unfolded one to
rel-MSE < 1e-4.  Catches per-layer-type folding gaps (groups, shared
weights, composite blocks, recurrent cfgs where nothing folds) across the
full corpus, not just the unit-tested models.

~30-45 min on one CPU core (two model builds + three forwards per cfg) —
release check, not unit suite:
    python scripts/corpus_fold_sweep.py [--all] [--cfg NAME ...]
(default: every 3rd cfg, ~15 min)
Last result (2026-08-18): --all fold ok: 73/73 (worst rel-MSE 6.9e-07).
"""

import argparse
import glob
import os
import re
import sys
import time

# force the CPU backend before any jax import (the session presets the
# axon TPU platform, which hangs the sweep when the tunnel is down)
os.environ.pop("PALLAS_AXON_POOL_IPS", None)
os.environ["JAX_PLATFORMS"] = "cpu"

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

# sitecustomize re-forces the axon platform via jax.config at interpreter
# start — env vars alone are too late (CLAUDE.md / tests/conftest.py)
jax.config.update("jax_platforms", "cpu")

import numpy as np

SKIP = {"resnet152_trident.cfg"}  # broken upstream (mismatched route sizes)


def _randomized_bn_tree(params, state, seed=7):
    import jax.numpy as jnp

    rng = np.random.default_rng(seed)

    def perturb(tree, kinds):
        out = {}
        for k, v in tree.items():
            if isinstance(v, dict):
                out[k] = perturb(v, kinds)
            elif k in kinds:
                lo, hi = kinds[k]
                out[k] = jnp.asarray(
                    rng.uniform(lo, hi, np.shape(v)).astype(np.float32))
            else:
                out[k] = v
        return out

    params = perturb(params, {"scale": (0.5, 1.5), "bias": (-0.3, 0.3)})
    state = perturb(state, {"mean": (-0.5, 0.5), "var": (0.3, 2.0)})
    return params, state


def fold_one(path: str, name: str) -> str:
    import jax
    import jax.numpy as jnp

    import yolodl_tpu.config.darknet_cfg as dk
    from yolodl_tpu.graph.from_darknet import graph_from_darknet
    from yolodl_tpu.models.builder import GraphModel
    from yolodl_tpu.models.fold import fold_darknet
    from yolodl_tpu.models.weights import merge_into_model_tree

    text = open(path).read()
    d0 = dk.Darknet.from_str(text)
    if d0.net.height >= 128:
        target = 256 if "p7" in name else 128
        text = re.sub(r"(?m)^height *= *\d+", f"height={target}", text)
        text = re.sub(r"(?m)^width *= *\d+", f"width={target}", text)
    d = dk.Darknet.from_str(text)
    model = GraphModel(graph_from_darknet(d))
    params, state = model.init(jax.random.PRNGKey(0))
    params, state = _randomized_bn_tree(params, state)

    n_foldable = sum(
        isinstance(l, dk.Convolutional) and l.batch_normalize
        and l.share_index is None for l in d.layers)
    folded_cfg, fp, fs = fold_darknet(d, params, state)
    folded_model = GraphModel(graph_from_darknet(folded_cfg))
    ip, is_ = folded_model.init(jax.random.PRNGKey(1))
    fp2, fs2 = merge_into_model_tree(fp, fs, ip, is_)

    h, w, c = d.net.input_shape_hwc
    t = max(d.net.time_steps, 1)
    x = jnp.asarray(
        np.random.default_rng(0).normal(size=(t, c, h, w)) * 0.1, jnp.float32)
    ref, _ = model.apply(params, state, x, train=False)
    out, _ = folded_model.apply(fp2, fs2, x, train=False)

    worst = 0.0
    if isinstance(ref, jax.Array):
        pairs = [("out", ref, out)]
    else:
        pairs = [(n, getattr(ref, n), getattr(out, n))
                 for n in ("cycxhw", "obj_logit", "class_logit")]
    for label, a, b in pairs:
        a = np.asarray(a, np.float64)
        b = np.asarray(b, np.float64)
        rel = float(np.sqrt(np.mean((a - b) ** 2) / (np.mean(a**2) + 1e-12)))
        worst = max(worst, rel)
        if rel > 1e-4:
            raise AssertionError(f"{label}: rel MSE {rel:.2e}")
    return f"{n_foldable:3d} convs folded, worst rel-MSE {worst:.1e}"


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
            names = names[::3]  # quick mode

    ok, fails = 0, []
    for name in names:
        if name in SKIP:
            continue
        t0 = time.time()
        try:
            info = fold_one(os.path.join(repo, "cfg/darknet", name), name)
            ok += 1
            print(f"ok   {name:40s} {info} [{time.time()-t0:5.1f}s]",
                  flush=True)
        except Exception as e:  # noqa: BLE001 — sweep reports, doesn't die
            fails.append((name, repr(e)))
            print(f"FAIL {name:40s} {e!r}", flush=True)
    print(f"\nfold ok: {ok}/{ok + len(fails)}")
    for name, err in fails:
        print(f"  FAIL {name}: {err}")
    sys.exit(1 if fails else 0)


if __name__ == "__main__":
    main()
