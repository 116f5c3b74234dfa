"""Init + forward every buildable corpus cfg (CPU) — model-family smoke.

Goes beyond the corpus *build* test (tests/test_darknet.py): actually
initializes parameters and runs one eval-mode forward pass per model,
asserting finite outputs.  Spatial inputs are shrunk to 128 (256 for the
p7 models, stride 128) to keep the sweep tractable; sequence cfgs run at
their native time_steps.

~15 min on one CPU core — run as a release check, not in the unit suite:
    python scripts/corpus_forward_sweep.py
Last result: forward ok: 73/73 (everything that builds also runs).
"""

import glob
import os
import re
import sys


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


def main():
    import jax
    import jax.numpy as jnp

    import yolodl_tpu.config.darknet_cfg as dk
    from yolodl_tpu.graph.from_darknet import graph_from_darknet
    from yolodl_tpu.models.builder import GraphModel

    repo = os.path.join(os.path.dirname(__file__), "..")
    fails = []
    ok = 0
    for path in sorted(glob.glob(os.path.join(repo, "cfg/darknet/*.cfg"))):
        name = os.path.basename(path)
        if name in SKIP:
            continue
        try:
            text = open(path).read()
            d0 = dk.Darknet.from_str(text)
            if d0.net.height >= 128:
                target = 256 if "p7" in name else 128
                text = re.sub(r"(?m)^height *= *\d+", f"height={target}", text)
                text = re.sub(r"(?m)^width *= *\d+", f"width={target}", text)
            d = dk.Darknet.from_str(text)
            gm = GraphModel(graph_from_darknet(d))
            params, state = gm.init(jax.random.PRNGKey(0))
            h, w, c = d.net.input_shape_hwc
            t = max(d.net.time_steps, 1)
            x = jnp.asarray(
                np.random.default_rng(0).normal(size=(t, c, h, w)) * 0.1,
                jnp.float32)
            out, _ = gm.apply(params, state, x, train=False)
            arr = out if isinstance(out, jax.Array) else out.obj_logit
            assert bool(jnp.isfinite(arr).all()), "non-finite output"
            ok += 1
            print(f"ok   {name}")
        except Exception as e:  # noqa: BLE001 — report and continue
            fails.append((name, f"{type(e).__name__}: {str(e)[:110]}"))
            print(f"FAIL {name} | {fails[-1][1]}")
    print(f"forward ok: {ok}, failed: {len(fails)}")
    if fails:
        raise SystemExit(1)


if __name__ == "__main__":
    main()
