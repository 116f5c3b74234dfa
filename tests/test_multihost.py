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

pytestmark = pytest.mark.slow  # e2e/CLI tier: excluded from `pytest -m 'not slow'`

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


def test_two_process_spatial_train(devices8):
    """Multi-host × spatial: the 2-D (data × space) spatially-sharded train
    step on a 2-process cluster, data axis crossing the process boundary
    (prefix-BN psums + gradient pmeans ride the distributed runtime)."""
    port = _free_port()
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO
    env["PALLAS_AXON_POOL_IPS"] = ""
    procs = [
        subprocess.Popen(
            [sys.executable,
             os.path.join(REPO, "tests", "_mh_spatial_worker.py"),
             str(pid), str(port)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
            env=env,
        )
        for pid in range(2)
    ]
    outs = [p.communicate(timeout=560)[0] for p in procs]
    for p, out in zip(procs, outs):
        assert p.returncode == 0, out[-3000:]
    losses = []
    for out in outs:
        m = re.search(r"MH_RESULT proc=\d loss=([0-9.]+)", out)
        assert m, out[-3000:]
        losses.append(float(m.group(1)))
    assert losses[0] == losses[1], losses


def test_multiprocess_train_cli(tmp_path):
    """The PRODUCTION train CLI on a 2-process cluster (device_config
    MultiProcess): each rank streams its record shard, contributes its
    local batch slice, and the psum'd loss agrees across ranks; only the
    chief writes checkpoints."""
    import json

    from PIL import Image

    rng = np.random.default_rng(0)
    img_dir = tmp_path / "images"
    img_dir.mkdir()
    rows = ["image_file,class_name,cy,cx,h,w"]
    for i in range(6):
        arr = rng.uniform(0, 255, (48, 48, 3)).astype(np.uint8)
        arr[10:30, 10:30] = (255, 0, 0)
        Image.fromarray(arr).save(img_dir / f"i{i}.png")
        rows.append(f"i{i}.png,square,20,20,20,20")
    (tmp_path / "label.csv").write_text("\n".join(rows) + "\n")
    (tmp_path / "classes.txt").write_text("square\n")
    model = {
        "main_group": "m",
        "groups": {"m": [
            {"name": "input", "kind": "Input", "shape": ["_", 3, 32, 32]},
            {"kind": "ConvBn2D", "c": 8, "k": 3, "s": 2},
            {"name": "head", "kind": "ConvBn2D", "c": 6, "k": 1,
             "act": "linear", "bn": {"enabled": False}},
            {"name": "det", "kind": "Detect2D", "classes": 1,
             "anchors": [[0.4, 0.4]]},
            {"name": "output", "kind": "MergeDetect2D", "from": ["det"]},
        ]},
    }
    (tmp_path / "model.json5").write_text(json.dumps(model))
    port = _free_port()
    train_cfg = {
        "version": "0.1.0",
        "model": {"kind": "NewslabV1", "cfg_file": "model.json5"},
        "dataset": {"kind": {
            "type": "Csv", "image_size": 32, "input_channels": 3,
            "image_dir": str(img_dir),
            "label_file": str(tmp_path / "label.csv"),
            "classes_file": str(tmp_path / "classes.txt"),
        }},
        "logging": {"dir": str(tmp_path / "logs")},
        "training": {
            "batch_size": 8,
            "device_config": {"type": "MultiProcess",
                              "coordinator": f"127.0.0.1:{port}",
                              "num_processes": 2},
            "optimizer": {"momentum": 0.9, "lr_schedule": {
                "type": "StepWise", "steps": [[0, 0.005]]}},
            "loss": {"box_metric": "DIoU"},
            "save_checkpoint_steps": 5,
            "load_checkpoint": {"type": "Disabled"},
        },
    }
    (tmp_path / "train.json5").write_text(json.dumps(train_cfg))

    env = dict(os.environ)
    env["PYTHONPATH"] = REPO
    env["PALLAS_AXON_POOL_IPS"] = ""
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    procs = [
        subprocess.Popen(
            [sys.executable, "-m", "yolodl_tpu.cli.train_main",
             "--config-file", str(tmp_path / "train.json5"),
             "--max-steps", "10", "--process-id", str(pid)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
            env=env, cwd=REPO,
        )
        for pid in range(2)
    ]
    outs = [p.communicate(timeout=540)[0] for p in procs]
    for p, out in zip(procs, outs):
        assert p.returncode == 0, out[-4000:]
    step_lines = []
    for rank, out in enumerate(outs):
        assert f"multi-process: rank {rank}/2, 4 local / 8 global" in out, \
            out[-2000:]
        m = re.search(r"step 10  loss ([0-9.]+)", out)
        assert m, out[-2000:]
        step_lines.append(m.group(1))
    assert step_lines[0] == step_lines[1], step_lines  # psum agreement

    runs = sorted(os.listdir(tmp_path / "logs"))
    chief = [r for r in runs if not r.endswith("-r1")]
    rank1 = [r for r in runs if r.endswith("-r1")]
    assert len(chief) == 1 and len(rank1) == 1, runs
    chief_ckpts = os.listdir(tmp_path / "logs" / chief[0] / "checkpoints")
    assert len(chief_ckpts) >= 2, chief_ckpts  # steps 5 + 10
    r1_ckpt_dir = tmp_path / "logs" / rank1[0] / "checkpoints"
    assert not os.path.exists(r1_ckpt_dir) or not os.listdir(r1_ckpt_dir)
