"""Multi-host (multi-process) data parallelism over the JAX distributed
runtime — the DCN story (SURVEY §2.8/§5.8) the reference entirely lacks.

Spawns a real 2-process CPU "cluster" (4 virtual devices each → 8 global),
runs the standard DP train step, and checks both ranks agree with each
other AND with a single-process 8-device run of the same step — proving
the mesh/axis-name contract holds across the process boundary.
"""

import os
import re
import socket
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def test_two_process_dp_matches_single_process(devices8):
    port = _free_port()
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO
    env["PALLAS_AXON_POOL_IPS"] = ""
    procs = [
        subprocess.Popen(
            [sys.executable, os.path.join(REPO, "tests", "_mh_worker.py"),
             str(pid), str(port)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
            env=env,
        )
        for pid in range(2)
    ]
    outs = [p.communicate(timeout=280)[0] for p in procs]
    for p, out in zip(procs, outs):
        assert p.returncode == 0, out[-3000:]
    losses = []
    for out in outs:
        m = re.search(r"MH_RESULT proc=\d loss=([0-9.]+)", out)
        assert m, out[-3000:]
        losses.append(float(m.group(1)))
    assert losses[0] == losses[1], losses  # psum agreement across processes

    # single-process 8-device reference: same model, same data, same step
    import jax
    import jax.numpy as jnp

    from yolodl_tpu.config import newslab as cfg
    from yolodl_tpu.graph.ir import _flatten
    from yolodl_tpu.models import YoloModel
    from yolodl_tpu.parallel import make_dp_train_step, make_mesh, shard_batch
    from yolodl_tpu.parallel.dp import replicate_state
    from yolodl_tpu.shapes import Shape
    from yolodl_tpu.train import TrainConfig, train_init

    model_cfg = cfg.Model(groups={"m": (
        cfg.Input(name="input", shape=Shape(["_", 3, 32, 32])),
        cfg.ConvBn2D(name="c0", from_="input", c=8, k=3, s=2, p=1, act="leaky"),
        cfg.ConvBn2D(name="head", from_="c0", c=18, k=1, s=1, act="linear",
                     bn=cfg.BatchNormConfig(enabled=False)),
        cfg.Detect2D(name="det", from_="head", classes=1,
                     anchors=((0.3, 0.3), (0.5, 0.5), (0.7, 0.7))),
        cfg.MergeDetect2D(name="output", from_=("det",)),
    )}, main_group="m")
    model = YoloModel(_flatten(model_cfg))
    config = TrainConfig()
    ts, opt = train_init(model, config, seed=0)
    mesh = make_mesh(8)
    dp_step = make_dp_train_step(model, opt, config, mesh)
    ts = replicate_state(mesh, ts)

    rng = np.random.default_rng(0)
    images = rng.normal(size=(8, 3, 32, 32)).astype(np.float32)
    boxes = np.zeros((8, 4, 4), np.float32)
    boxes[:, 0] = (0.5, 0.5, 0.3, 0.3)
    classes = np.zeros((8, 4), np.int32)
    mask = np.zeros((8, 4), bool)
    mask[:, 0] = True
    batch = shard_batch(mesh, tuple(
        jnp.asarray(a) for a in (images, boxes, classes, mask)))
    _, metrics = dp_step(ts, *batch)
    ref = float(metrics["total_loss"])
    np.testing.assert_allclose(losses[0], ref, rtol=1e-5)
