"""Checkpoint→resume exactness over the whole darknet corpus (CPU).

For every buildable cfg: take optimizer step 0, snapshot the full train
state, ``save_checkpoint`` it, take step 1 ("uninterrupted" run), then
reload the checkpoint into freshly-initialized templates and take step 1
again ("resumed" run) with identical data.  The two final states must be
BIT-IDENTICAL leaf-for-leaf (same compiled executable, same inputs, CPU).

What this catches that the unit tests (one toy model in test_cli /
test_train) cannot: checkpoint flatten/unflatten asymmetries in the
opt-state/BN-state pytrees of every layer family — recurrent cells
([rnn]/[gru]/[lstm]/[crnn] carry per-cell hidden-state templates),
graph-pruned [contrastive] tails, [connected]+BN, Gaussian heads — and
step-counter restores that would silently shift burn-in LR after resume
(the step rides inside the checkpoint, train/utils/checkpoint.rs:6-22
discipline).

~15-60 s per cfg (two extra compiles beyond the train sweep's one);
release check, not a unit test:
    python scripts/corpus_resume_sweep.py [--all] [--cfg NAME ...]
Last result (2026-08-18): --all resume ok: 73/73 bit-identical.
"""

import argparse
import glob
import os
import re
import sys
import tempfile
import time

# force the CPU backend before any jax import (the session presets the
# axon TPU platform, which hangs the whole sweep when the tunnel is down;
# same header as the other corpus sweeps)
os.environ.pop("PALLAS_AXON_POOL_IPS", None)
os.environ["JAX_PLATFORMS"] = "cpu"

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

# sitecustomize re-forces the axon platform via jax.config at interpreter
# start — env vars alone are too late (CLAUDE.md / tests/conftest.py)
jax.config.update("jax_platforms", "cpu")

import numpy as np

DEFAULT_SUBSET = [
    "yolov4-csp.cfg",           # flagship: CSP + SPP + new_coords heads
    "yolov4-tiny.cfg",          # route groups
    "yolov3.cfg",
    "Gaussian_yolov3_BDD.cfg",  # [Gaussian_yolo] head
    "yolov2-tiny.cfg",          # [region]
    "t1.test.cfg",              # [detection] (yolov1 grid head)
    "darknet19.cfg",            # classifier
    "resnet50.cfg",
    "rnn.train.cfg",            # sequence nets (scan-carried cells)
    "lstm.train.cfg",
    "crnn.train.cfg",
]

SKIP = {"resnet152_trident.cfg"}  # broken upstream (mismatched route sizes)


def _shrunk_text(path: str, name: str) -> str:
    text = open(path).read()
    import yolodl_tpu.config.darknet_cfg as dk

    d0 = dk.Darknet.from_str(text)
    if d0.net.height >= 128:
        target = 256 if "p7" in name else 128
        text = re.sub(r"(?m)^height *= *\d+", f"height={target}", text)
        text = re.sub(r"(?m)^width *= *\d+", f"width={target}", text)
    return text


def _snapshot(tree):
    """Copy to host numpy — the train steps donate their input buffers."""
    return jax.tree_util.tree_map(lambda x: np.asarray(x).copy(), tree)


def _assert_bitwise(a, b, what: str) -> None:
    la = jax.tree_util.tree_leaves(a)
    lb = jax.tree_util.tree_leaves(b)
    assert len(la) == len(lb), f"{what}: leaf count {len(la)} != {len(lb)}"
    for i, (x, y) in enumerate(zip(la, lb)):
        x, y = np.asarray(x), np.asarray(y)
        assert x.dtype == y.dtype and x.shape == y.shape, (
            f"{what}: leaf {i} dtype/shape {x.dtype}{x.shape} != {y.dtype}{y.shape}")
        if not np.array_equal(x, y, equal_nan=True):
            d = float(np.abs(x.astype(np.float64) - y.astype(np.float64)).max())
            raise AssertionError(f"{what}: leaf {i} differs, max|Δ|={d:.3e}")


def resume_one(path: str, name: str) -> str:
    import jax.numpy as jnp

    import yolodl_tpu.config.darknet_cfg as dk
    from yolodl_tpu.graph.from_darknet import graph_from_darknet
    from yolodl_tpu.models import YoloModel
    from yolodl_tpu.models.builder import GraphModel
    from yolodl_tpu.train import TrainConfig, train_init
    from yolodl_tpu.train.checkpoint import load_checkpoint, save_checkpoint
    from yolodl_tpu.train.loop import TrainState

    text = _shrunk_text(path, name)
    d = dk.Darknet.from_str(text)
    graph = graph_from_darknet(d)
    h, w, c = d.net.input_shape_hwc

    is_detector = any(
        node.kind in ("Detect2D", "MergeDetect2D")
        for node in graph.nodes.values()
    )

    if is_detector:
        from yolodl_tpu.train import make_train_step

        model = YoloModel(graph)
        config = TrainConfig()
        ts, opt = train_init(model, config, seed=0)
        step = make_train_step(model, opt, config)
        b = max(d.net.time_steps, 1)

        def data(i):
            rng = np.random.default_rng(1000 + i)
            images = jnp.asarray(rng.normal(size=(b, c, h, w)) * 0.1,
                                 jnp.float32)
            boxes = np.zeros((b, 4, 4), np.float32)
            boxes[:, 0] = (0.45 + 0.01 * i, 0.5, 0.3, 0.3)
            mask = np.zeros((b, 4), bool)
            mask[:, 0] = True
            return (images, jnp.asarray(boxes), jnp.zeros((b, 4), jnp.int32),
                    jnp.asarray(mask))

        kind = "detect "
    else:
        import optax  # noqa: F401 — TrainConfig optimizers resolve lazily

        from yolodl_tpu.train.classifier import make_classifier_train_step
        from yolodl_tpu.train.loop import make_optimizer

        model = GraphModel(graph)
        params, state = model.init(jax.random.PRNGKey(0))
        t = max(d.net.time_steps, 1)
        probe = jnp.zeros((t, c, h, w), jnp.float32)
        out_sd = jax.eval_shape(
            lambda p, s: model.apply(p, s, probe, train=False)[0], params, state)
        n_out = int(np.prod(out_sd.shape[1:]))

        config = TrainConfig()
        optimizer = make_optimizer(config)
        ts = TrainState(params, state, optimizer.init(params),
                        jnp.zeros((), jnp.int32), None)
        step = make_classifier_train_step(model, optimizer, config,
                                          output_is_prob=False)

        def data(i):
            rng = np.random.default_rng(1000 + i)
            images = jnp.asarray(rng.normal(size=(t, c, h, w)) * 0.1,
                                 jnp.float32)
            labels = jnp.asarray(rng.integers(0, n_out, size=(t,)), jnp.int32)
            return (images, labels)

        kind = "seq-cls" if d.net.time_steps > 1 else "classif"

    # --- uninterrupted run: step 0, checkpoint, step 1 -------------------
    ts, _ = step(ts, *data(0))
    snap1 = _snapshot(ts)  # host copy BEFORE donation kills the buffers
    ts, metrics = step(ts, *data(1))
    final_a = _snapshot(ts)
    loss = float(metrics.get("total_loss", metrics.get("loss")))
    assert np.isfinite(loss), f"non-finite loss {loss}"

    # --- resumed run: save snap1, reload into fresh templates, step 1 ----
    with tempfile.TemporaryDirectory() as tmp:
        save_checkpoint(tmp, step=int(snap1.step), loss=loss,
                        params=snap1.params, state=snap1.state,
                        opt_state=snap1.opt_state)
        ckpt = os.listdir(tmp)[0]
        params, state, opt_state, meta = load_checkpoint(
            os.path.join(tmp, ckpt), snap1.params, snap1.state,
            snap1.opt_state)
    ts_b = TrainState(params, state, opt_state,
                      jnp.asarray(meta["step"], jnp.int32), None)
    ts_b, _ = step(ts_b, *data(1))
    final_b = _snapshot(ts_b)

    _assert_bitwise(final_a.params, final_b.params, "params")
    _assert_bitwise(final_a.state, final_b.state, "bn-state")
    _assert_bitwise(final_a.opt_state, final_b.opt_state, "opt-state")
    assert int(final_a.step) == int(final_b.step), "step counter diverged"
    return f"{kind} loss={loss:9.4f} resume bit-identical"


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--all", action="store_true",
                    help="sweep every corpus cfg, not the family subset")
    ap.add_argument("--cfg", nargs="*", help="explicit cfg names")
    args = ap.parse_args()

    repo = os.path.join(os.path.dirname(__file__), "..")
    if args.cfg:
        names = args.cfg
    elif args.all:
        names = sorted(
            os.path.basename(p)
            for p in glob.glob(os.path.join(repo, "cfg/darknet/*.cfg")))
    else:
        names = DEFAULT_SUBSET

    ok, fails = 0, []
    for name in names:
        if name in SKIP:
            continue
        path = os.path.join(repo, "cfg/darknet", name)
        t0 = time.time()
        try:
            info = resume_one(path, name)
            ok += 1
            print(f"ok   {name:40s} {info} [{time.time()-t0:5.1f}s]",
                  flush=True)
        except Exception as e:  # noqa: BLE001 — sweep reports, doesn't die
            fails.append((name, repr(e)))
            print(f"FAIL {name:40s} {e!r}", flush=True)
    print(f"\nresume ok: {ok}/{ok + len(fails)}")
    for name, err in fails:
        print(f"  FAIL {name}: {err}")
    sys.exit(1 if fails else 0)


if __name__ == "__main__":
    main()
