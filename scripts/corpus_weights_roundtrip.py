"""Weights save→load round-trip over the whole darknet corpus (CPU).

For every buildable cfg: init the model, ``save_darknet_weights`` to a
temporary .weights file, ``load_darknet_weights`` it back, merge into a
fresh init tree, and assert every loaded leaf is BIT-IDENTICAL to the
original parameters/state.  Catches saver/loader asymmetries, silent
layer-type skips in the saver (which would shift every later layer's
offsets), and dtype/shape drift — per layer type across the full corpus,
not just the few models the unit tests cover.

Blind spot, by construction: a save-permutation bug exactly inverted by
the loader cancels in a round-trip — the darknet-C oracle parity tests
(tests/test_parity_darknet.py load REAL darknet-written weights) cover
that direction.

Fast: no forward pass, no grad — ~2-10 s per cfg, ~8 min for --all.
    python scripts/corpus_weights_roundtrip.py [--all] [--cfg NAME ...]
Last result (2026-08-18): --all ok: 73/73 (bit-identical round-trips).
"""

import argparse
import glob
import os
import re
import sys
import tempfile
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


def _flatten(tree, prefix=""):
    out = {}
    if isinstance(tree, dict):
        for k, v in tree.items():
            out.update(_flatten(v, f"{prefix}/{k}"))
    elif isinstance(tree, (list, tuple)):
        for i, v in enumerate(tree):
            out.update(_flatten(v, f"{prefix}/{i}"))
    else:
        out[prefix] = np.asarray(tree)
    return out


def roundtrip_one(path: str, name: str) -> str:
    import jax

    import yolodl_tpu.config.darknet_cfg as dk
    from yolodl_tpu.graph.from_darknet import graph_from_darknet
    from yolodl_tpu.models.builder import GraphModel
    from yolodl_tpu.models.weights import (
        load_darknet_weights, merge_into_model_tree, save_darknet_weights,
    )

    text = open(path).read()
    d0 = dk.Darknet.from_str(text)
    if d0.net.height >= 128:
        # weights don't depend on spatial size; shrink to keep init cheap
        target = 256 if "p7" in name else 128
        text = re.sub(r"(?m)^height *= *\d+", f"height={target}", text)
        text = re.sub(r"(?m)^width *= *\d+", f"width={target}", text)
    d = dk.Darknet.from_str(text)
    model = GraphModel(graph_from_darknet(d))
    params, state = model.init(jax.random.PRNGKey(0))

    with tempfile.NamedTemporaryFile(suffix=".weights", delete=False) as f:
        wpath = f.name
    try:
        save_darknet_weights(d, params, state, wpath, seen=42)
        loaded_p, loaded_s, seen = load_darknet_weights(d, wpath)
        assert seen == 42, f"seen round-trip broke: {seen}"
        params2, state2 = model.init(jax.random.PRNGKey(1))  # different init
        merged_p, merged_s = merge_into_model_tree(
            loaded_p, loaded_s, params2, state2)

        orig_p, orig_s = _flatten(params), _flatten(state)
        got_p, got_s = _flatten(merged_p), _flatten(merged_s)
        pruned = {k for k in loaded_p if k not in params}
        n_checked = 0
        for flat_loaded, flat_orig, label in (
            (_flatten(loaded_p), orig_p, "params"),
            (_flatten(loaded_s), orig_s, "state"),
        ):
            for key in flat_loaded:
                top = key.split("/")[1]
                if top in pruned:
                    # graph-pruned training-only tail: saved as an
                    # identity-init placeholder, dropped by the merge
                    assert not any(k.startswith(f"/{top}/")
                                   for k in (*got_p, *got_s)), (
                        f"merge kept pruned layer {top}")
                    continue
                if key not in flat_orig:
                    raise AssertionError(f"{label}{key} not in model tree")
                a, b = flat_orig[key], flat_loaded[key]
                if a.shape != b.shape or not np.array_equal(
                        np.asarray(a, np.float32), np.asarray(b, np.float32)):
                    raise AssertionError(f"{label}{key} differs")
                # the merge must carry the loaded value too
                m = got_p[key] if label == "params" else got_s[key]
                if not np.array_equal(np.asarray(m, np.float32),
                                      np.asarray(b, np.float32)):
                    raise AssertionError(f"merge dropped {label}{key}")
                n_checked += 1
        return f"{n_checked} leaves bit-identical"
    finally:
        os.unlink(wpath)


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
            names = names[::4]  # quick mode: every 4th cfg

    ok, fails = 0, []
    for name in names:
        if name in SKIP:
            continue
        t0 = time.time()
        try:
            info = roundtrip_one(
                os.path.join(repo, "cfg/darknet", name), name)
            ok += 1
            print(f"ok   {name:40s} {info} [{time.time()-t0:4.1f}s]",
                  flush=True)
        except Exception as e:  # noqa: BLE001 — sweep reports, doesn't die
            fails.append((name, repr(e)))
            print(f"FAIL {name:40s} {e!r}", flush=True)
    print(f"\nroundtrip ok: {ok}/{ok + len(fails)}")
    for name, err in fails:
        print(f"  FAIL {name}: {err}")
    sys.exit(1 if fails else 0)


if __name__ == "__main__":
    main()
