"""One real gradient step on every model family in the darknet corpus (CPU).

The forward sweep (corpus_forward_sweep.py) proves the corpus *runs*; this
release check proves it *trains*: for a representative cfg per family it
takes one optimizer step with the production step builders — the detection
loss for [yolo]/[Gaussian_yolo]/[region]/[detection] heads
(train/loop.make_train_step, the same path the train CLI jits) and the
cross-entropy step for classifier + sequence nets
(train/classifier.make_classifier_train_step, the classify CLI path) —
and asserts a finite loss AND that parameters actually moved.

Families covered by the default subset: yolo v4-csp / v4-tiny(+groups) /
v3 / v3-tiny, Gaussian heads, [region] (v2), [detection] (v1), classifier
conv nets (darknet19 / resnet50 / efficientnet_b0 / cifar), and the
sequence nets ([rnn]/[gru]/[lstm]/[crnn] under lax.scan).

~10-20 min on one CPU core for the default subset (backward compiles
dominate; ~50 min with --all) — run as a release check, not in the unit
suite:
    python scripts/corpus_train_sweep.py [--all] [--cfg NAME ...]
Last result (2026-08-18, after the pipeline/COCO/resume arc): --all
train ok: 73/73 — every buildable corpus
cfg takes a finite gradient step that moves its parameters.  The sweep
caught two real bugs on first run: sequence-net training crashed in
clamp_running_vars (bool bn configs) and go.test.cfg trained with frozen
parameters (saturated-softmax CE — both fixed, see git log).
"""

import argparse
import glob
import os
import re
import sys
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
    # detection: modern yolo heads
    "yolov4-csp.cfg",       # flagship: CSP + SPP + new_coords heads
    "yolov4-tiny.cfg",      # route groups
    "yolov3.cfg",           # classic v3 heads
    "yolov3-tiny.cfg",
    "Gaussian_yolov3_BDD.cfg",  # [Gaussian_yolo] uncertainty head
    # detection: older families
    "yolov2-tiny.cfg",      # [region]
    "tiny-yolo.cfg",        # [region], v1-era topology
    "t1.test.cfg",          # [detection] (yolov1 grid head)
    # classifiers
    "darknet19.cfg",
    "resnet50.cfg",
    "efficientnet_b0.cfg",
    "cifar.cfg",
    # sequence nets (batch axis = time, lax.scan recurrence)
    "rnn.train.cfg",
    "gru.cfg",
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
    """Copy to host numpy — the train steps donate their input state, so
    the original device buffers are dead after the call."""
    import jax

    return jax.tree_util.tree_map(lambda x: np.asarray(x).copy(), tree)


def _tree_delta(a, b) -> float:
    import jax

    leaves_a = jax.tree_util.tree_leaves(a)
    leaves_b = jax.tree_util.tree_leaves(b)
    return max(
        (float(np.abs(np.asarray(x) - np.asarray(y)).max()) if np.asarray(x).size else 0.0)
        for x, y in zip(leaves_a, leaves_b)
    )


def train_one(path: str, name: str, precision: str = "float32") -> str:
    import jax
    import jax.numpy as jnp

    import yolodl_tpu.config.darknet_cfg as dk
    from yolodl_tpu.config.app_config import compute_dtype_of
    from yolodl_tpu.graph.from_darknet import graph_from_darknet
    from yolodl_tpu.models import YoloModel
    from yolodl_tpu.models.builder import GraphModel
    from yolodl_tpu.train import TrainConfig, train_init

    text = _shrunk_text(path, name)
    d = dk.Darknet.from_str(text)
    graph = graph_from_darknet(d)
    h, w, c = d.net.input_shape_hwc
    rng = np.random.default_rng(0)

    is_detector = any(
        node.kind in ("Detect2D", "MergeDetect2D")
        for node in graph.nodes.values()
    )

    if is_detector:
        from yolodl_tpu.train import make_train_step

        model = YoloModel(graph)
        config = TrainConfig(compute_dtype=compute_dtype_of(precision))
        ts, opt = train_init(model, config, seed=0)
        step = make_train_step(model, opt, config)
        # detectors with recurrent layers (e.g. [crnn] trackers) need the
        # batch axis to be a multiple of time_steps (time-major rows)
        b = max(d.net.time_steps, 1)
        images = jnp.asarray(rng.normal(size=(b, c, h, w)) * 0.1, jnp.float32)
        boxes = np.zeros((b, 4, 4), np.float32)
        boxes[:, 0] = (0.5, 0.5, 0.3, 0.3)
        mask = np.zeros((b, 4), bool)
        mask[:, 0] = True
        p0 = _snapshot(ts.params)
        ts, metrics = step(ts, images, jnp.asarray(boxes),
                           jnp.zeros((b, 4), jnp.int32), jnp.asarray(mask))
        loss = float(metrics["total_loss"])
        assert np.isfinite(loss), f"non-finite detection loss {loss}"
        delta = _tree_delta(p0, ts.params)
        assert delta > 0, "optimizer step did not move the parameters"
        return f"detect  loss={loss:9.4f} max|Δw|={delta:.2e}"

    # classifier / sequence net: CE step on the [softmax] (or logit) output
    import optax

    from yolodl_tpu.train.classifier import make_classifier_train_step
    from yolodl_tpu.train.loop import TrainState, make_optimizer

    model = GraphModel(graph)
    params, state = model.init(jax.random.PRNGKey(0))
    t = max(d.net.time_steps, 1)
    images = jnp.asarray(rng.normal(size=(t, c, h, w)) * 0.1, jnp.float32)
    # abstract eval only — no compile/execution just to size the labels.
    # output_is_prob is irrelevant: [softmax]-terminated graphs take the
    # pre-softmax logits path inside the step; all others output logits.
    out_sd = jax.eval_shape(
        lambda p, s: model.apply(p, s, images, train=False)[0], params, state)
    n_out = int(np.prod(out_sd.shape[1:]))
    labels = jnp.asarray(rng.integers(0, n_out, size=(t,)), jnp.int32)

    config = TrainConfig(compute_dtype=compute_dtype_of(precision))
    optimizer = make_optimizer(config)
    ts = TrainState(params, state, optimizer.init(params),
                    jnp.zeros((), jnp.int32), None)
    step = make_classifier_train_step(model, optimizer, config,
                                      output_is_prob=False)
    p0 = _snapshot(ts.params)
    ts, metrics = step(ts, images, labels)
    loss = float(metrics["loss"])
    assert np.isfinite(loss), f"non-finite CE loss {loss}"
    delta = _tree_delta(p0, ts.params)
    assert delta > 0, "optimizer step did not move the parameters"
    kind = "seq-cls" if d.net.time_steps > 1 else "classif"
    return f"{kind} loss={loss:9.4f} max|Δw|={delta:.2e}"


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--all", action="store_true",
                    help="sweep every corpus cfg, not the family subset")
    ap.add_argument("--cfg", nargs="*", help="explicit cfg names")
    ap.add_argument("--precision", default="float32",
                    choices=["float32", "bfloat16"],
                    help="train-step compute dtype (training.precision)")
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
            info = train_one(path, name, args.precision)
            ok += 1
            print(f"ok   {name:40s} {info} [{time.time()-t0:5.1f}s]",
                  flush=True)
        except Exception as e:  # noqa: BLE001 — sweep reports, doesn't die
            fails.append((name, repr(e)))
            print(f"FAIL {name:40s} {e!r}", flush=True)
    print(f"\ntrain ok: {ok}/{ok + len(fails)}")
    for name, err in fails:
        print(f"  FAIL {name}: {err}")
    sys.exit(1 if fails else 0)


if __name__ == "__main__":
    main()
