"""CLI end-to-end smoke tests: train/detect/tool on a synthetic CSV dataset."""

import json
import os
import subprocess
import sys

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # e2e/CLI tier: excluded from `pytest -m 'not slow'`
from PIL import Image

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture()
def workspace(tmp_path, rng):
    """Synthetic CSV dataset + toy model + train/detect JSON5 configs."""
    img_dir = tmp_path / "images"
    img_dir.mkdir()
    for i in range(6):
        arr = (rng.uniform(0, 255, (48, 48, 3))).astype(np.uint8)
        arr[10:30, 10:30] = (255, 0, 0)  # a "detectable" red square
        Image.fromarray(arr).save(img_dir / f"i{i}.png")
    (tmp_path / "classes.txt").write_text("square\n")
    lines = ["image_file,class_name,cy,cx,h,w"]
    for i in range(6):
        lines.append(f"i{i}.png,square,20,20,20,20")
    (tmp_path / "label.csv").write_text("\n".join(lines) + "\n")

    model = {
        "main_group": "m",
        "groups": {
            "m": [
                {"name": "input", "kind": "Input", "shape": ["_", 3, 32, 32]},
                {"kind": "ConvBn2D", "c": 8, "k": 3, "s": 2},
                {"kind": "ConvBn2D", "c": 12, "k": 3, "s": 2},
                {"name": "head", "kind": "ConvBn2D", "c": 6, "k": 1,
                 "act": "linear", "bn": {"enabled": False}},
                {"name": "det", "kind": "Detect2D", "classes": 1,
                 "anchors": [[0.4, 0.4]]},
                {"name": "output", "kind": "MergeDetect2D", "from": ["det"]},
            ]
        },
    }
    (tmp_path / "model.json5").write_text(json.dumps(model))

    train_cfg = {
        "version": "0.1.0",
        "model": {"kind": "NewslabV1", "cfg_file": "model.json5"},
        "dataset": {
            "kind": {
                "type": "Csv", "image_size": 32, "input_channels": 3,
                "image_dir": str(img_dir),
                "label_file": str(tmp_path / "label.csv"),
                "classes_file": str(tmp_path / "classes.txt"),
            },
        },
        "logging": {"dir": str(tmp_path / "logs")},
        "preprocessor": {
            "mixup": {"mosaic_prob": 0.5, "mosaic_margin": 0.3},
            "color_jitter": {"hue_shift": 0.05, "saturation_shift": 0.1, "value_shift": 0.1},
            "cleanse": {"out_of_bound_tolerance": 5, "min_bbox_size": 0.01},
        },
        "training": {
            "batch_size": 2,
            "device_config": {"type": "SingleDevice", "device": "tpu:0"},
            "optimizer": {
                "momentum": 0.9,
                "lr_schedule": {"type": "StepWise", "steps": [[0, 0.005], [100, 0.001]]},
            },
            "loss": {"box_metric": "DIoU"},
            "save_checkpoint_steps": 2,
            "load_checkpoint": {"type": "Disabled"},
        },
        "benchmark": {"nms_iou_thresh": 0.5, "nms_conf_thresh": 0.4},
    }
    (tmp_path / "train.json5").write_text(json.dumps(train_cfg))

    detect_cfg = {
        "version": "0.1.0",
        "model": {"kind": "NewslabV1", "cfg_file": "model.json5", "minibatch_size": 2},
        "input": dict(train_cfg["dataset"]),
        "output": {
            "output_dir": str(tmp_path / "out"),
            "nms_iou_thresh": 0.5,
            "nms_conf_thresh": 0.05,
        },
    }
    (tmp_path / "detect.json5").write_text(json.dumps(detect_cfg))
    return tmp_path


def run_cli(module, *args):
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["PYTHONPATH"] = REPO
    # sitecustomize re-forces the axon platform via jax.config; strip it for
    # subprocess CLI tests
    env["PALLAS_AXON_POOL_IPS"] = ""
    env["XLA_FLAGS"] = (env.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8").strip()
    return subprocess.run(
        [sys.executable, "-m", module, *args],
        capture_output=True, text=True, env=env, cwd=REPO, timeout=600,
    )


class TestToolCli:
    def test_info_newslab(self, workspace):
        out = run_cli("yolodl_tpu.cli.tool_main", "info", str(workspace / "model.json5"))
        assert out.returncode == 0, out.stderr
        assert "MergeDetect2D" in out.stdout

    def test_info_pipeline_stages(self, workspace):
        out = run_cli("yolodl_tpu.cli.tool_main", "info",
                      os.path.join(REPO, "cfg/darknet/yolov4-tiny.cfg"),
                      "--pipeline-stages", "3")
        assert out.returncode == 0, out.stderr
        assert "pipeline plan (3 stages):" in out.stdout
        # three stage rows, last one ends at the graph output
        assert "(output)" in out.stdout

    def test_dot_darknet(self, workspace, tmp_path):
        out = run_cli(
            "yolodl_tpu.cli.tool_main", "make-dot-file",
            os.path.join(REPO, "cfg/darknet/yolov4-tiny.cfg"),
            str(tmp_path / "g.dot"),
        )
        assert out.returncode == 0, out.stderr
        assert (tmp_path / "g.dot").read_text().startswith("digraph")


class TestTrainCli:
    def test_train_runs_and_checkpoints(self, workspace):
        out = run_cli(
            "yolodl_tpu.cli.train_main",
            "--config-file", str(workspace / "train.json5"),
            "--max-steps", "4",
        )
        assert out.returncode == 0, out.stderr[-3000:]
        runs = os.listdir(workspace / "logs")
        assert len(runs) == 1
        run_dir = workspace / "logs" / runs[0]
        assert (run_dir / "train.json5").exists()
        ckpts = os.listdir(run_dir / "checkpoints")
        assert any(name.endswith(".ckpt") for name in ckpts)
        # tensorboard event file written
        assert any(name.startswith("events.out") for name in os.listdir(run_dir))

    def test_train_bf16_precision(self, workspace):
        """training.precision: "bfloat16" trains end-to-end (finite losses,
        checkpoints written); params/opt state stay f32 (test_precision.py
        pins the dtypes — this exercises the CLI wiring)."""
        cfg = json.loads((workspace / "train.json5").read_text())
        cfg["training"]["precision"] = "bfloat16"
        (workspace / "train_bf16.json5").write_text(json.dumps(cfg))
        out = run_cli(
            "yolodl_tpu.cli.train_main",
            "--config-file", str(workspace / "train_bf16.json5"),
            "--max-steps", "2",
        )
        assert out.returncode == 0, out.stderr[-3000:]
        assert "non-finite" not in out.stdout

    def test_train_freeze_through(self, workspace):
        """training.freeze_through freezes a node and its ancestors via
        the production CLI: the frozen conv's params are bit-identical
        across optimizer steps while downstream layers train."""
        cfg = json.loads((workspace / "train.json5").read_text())
        cfg["training"]["freeze_through"] = "node1"  # first (unnamed) conv
        cfg["training"]["save_checkpoint_steps"] = 1
        (workspace / "train_freeze.json5").write_text(json.dumps(cfg))
        out = run_cli(
            "yolodl_tpu.cli.train_main",
            "--config-file", str(workspace / "train_freeze.json5"),
            "--max-steps", "3",
        )
        assert out.returncode == 0, out.stderr[-3000:]
        assert "freezing 2 node(s)" in out.stdout  # input + node1
        runs = sorted(os.listdir(workspace / "logs"))
        ckpt_dir = workspace / "logs" / runs[-1] / "checkpoints"
        ckpts = sorted(ckpt_dir / n for n in os.listdir(ckpt_dir))
        assert len(ckpts) >= 2
        za, zb = np.load(ckpts[0]), np.load(ckpts[-1])
        assert np.array_equal(za["params/node1/w"], zb["params/node1/w"])
        assert not np.array_equal(za["params/head/w"], zb["params/head/w"])

    def test_train_freeze_unknown_node_fails_cleanly(self, workspace):
        cfg = json.loads((workspace / "train.json5").read_text())
        cfg["training"]["freeze"] = ["nonexistent"]
        (workspace / "train_badfreeze.json5").write_text(json.dumps(cfg))
        out = run_cli(
            "yolodl_tpu.cli.train_main",
            "--config-file", str(workspace / "train_badfreeze.json5"),
            "--max-steps", "1",
        )
        assert out.returncode != 0
        assert "unknown node path 'nonexistent'" in out.stderr

    def test_train_device_pipeline(self, workspace):
        """preprocessor.pipeline.device="tpu": pixel augmentation runs as a
        jitted device program (data/device_augment.py); training proceeds
        end-to-end with finite losses and checkpoints."""
        cfg = json.loads((workspace / "train.json5").read_text())
        cfg["preprocessor"]["pipeline"] = {"device": "tpu"}
        cfg["preprocessor"]["affine"] = {
            "rotate_prob": 0.5, "rotate_degrees": 10.0,
            "horizontal_flip_prob": 0.5,
        }
        (workspace / "train_devaug.json5").write_text(json.dumps(cfg))
        out = run_cli(
            "yolodl_tpu.cli.train_main",
            "--config-file", str(workspace / "train_devaug.json5"),
            "--max-steps", "3",
        )
        assert out.returncode == 0, out.stderr[-3000:]
        assert "requires single-process" not in out.stderr  # no fallback
        runs = sorted(os.listdir(workspace / "logs"))
        ckpt_dir = workspace / "logs" / runs[-1] / "checkpoints"
        assert any(n.endswith(".ckpt") for n in os.listdir(ckpt_dir))

    def test_train_device_pipeline_scan_falls_back(self, workspace):
        """steps_per_call stacks host arrays, so pipeline.device="tpu"
        falls back to the CPU pipeline with a warning instead of failing."""
        cfg = json.loads((workspace / "train.json5").read_text())
        cfg["preprocessor"]["pipeline"] = {"device": "tpu"}
        cfg["training"]["steps_per_call"] = 2
        (workspace / "train_devaug_scan.json5").write_text(json.dumps(cfg))
        out = run_cli(
            "yolodl_tpu.cli.train_main",
            "--config-file", str(workspace / "train_devaug_scan.json5"),
            "--max-steps", "2",
        )
        assert out.returncode == 0, out.stderr[-3000:]
        assert "requires single-process" in out.stderr

    def test_train_records_cache(self, workspace):
        """preprocessor.cache.records caches the parsed annotations: the
        first run writes records-*.npz, the second serves from it."""
        cfg = json.loads((workspace / "train.json5").read_text())
        cache_dir = workspace / "rcache"
        cfg["preprocessor"]["cache"] = {
            "method": "NoCache", "cache_dir": str(cache_dir), "records": True}
        (workspace / "train_rc.json5").write_text(json.dumps(cfg))
        out = run_cli(
            "yolodl_tpu.cli.train_main",
            "--config-file", str(workspace / "train_rc.json5"),
            "--max-steps", "2",
        )
        assert out.returncode == 0, out.stderr[-3000:]
        entries = [n for n in os.listdir(cache_dir)
                   if n.startswith("records-") and n.endswith(".npz")]
        assert len(entries) == 1, entries
        mtime = os.stat(cache_dir / entries[0]).st_mtime_ns
        out2 = run_cli(
            "yolodl_tpu.cli.train_main",
            "--config-file", str(workspace / "train_rc.json5"),
            "--max-steps", "2",
        )
        assert out2.returncode == 0, out2.stderr[-3000:]
        # warm start: entry untouched (hit), not rebuilt
        assert os.stat(cache_dir / entries[0]).st_mtime_ns == mtime

    def test_train_zero1_on_mesh(self, workspace):
        """training.zero_optimizer shards Adam state over an 8-device mesh;
        the run trains, checkpoints, and resumes params."""
        import json

        cfg = json.loads((workspace / "train.json5").read_text())
        cfg["training"]["device_config"] = {
            "type": "MultiDevice", "devices": [f"tpu:{i}" for i in range(8)]}
        cfg["training"]["batch_size"] = 8
        cfg["training"]["zero_optimizer"] = True
        cfg["logging"] = {"dir": str(workspace / "logs_zero")}
        (workspace / "train_zero.json5").write_text(json.dumps(cfg))
        out = run_cli(
            "yolodl_tpu.cli.train_main",
            "--config-file", str(workspace / "train_zero.json5"),
            "--max-steps", "4",
        )
        assert out.returncode == 0, out.stderr[-3000:]
        runs = os.listdir(workspace / "logs_zero")
        ckpts = os.listdir(workspace / "logs_zero" / runs[0] / "checkpoints")
        assert any("_000004_" in n for n in ckpts), ckpts

    def test_train_tensor_parallel_on_mesh(self, workspace):
        """training.tensor_parallel folds the 8 devices into a (data=4,
        model=2) mesh with conv channels GSPMD-sharded; the run trains and
        checkpoints, and zero_optimizer is reported as subsumed."""
        import json

        cfg = json.loads((workspace / "train.json5").read_text())
        cfg["training"]["device_config"] = {
            "type": "MultiDevice", "devices": [f"tpu:{i}" for i in range(8)]}
        cfg["training"]["batch_size"] = 8
        cfg["training"]["tensor_parallel"] = 2
        cfg["training"]["zero_optimizer"] = True  # should be ignored
        cfg["logging"] = {"dir": str(workspace / "logs_tp")}
        (workspace / "train_tp.json5").write_text(json.dumps(cfg))
        out = run_cli(
            "yolodl_tpu.cli.train_main",
            "--config-file", str(workspace / "train_tp.json5"),
            "--max-steps", "4",
        )
        assert out.returncode == 0, out.stderr[-3000:]
        assert "mesh: data=4 x model=2" in out.stdout
        assert "ignoring zero_optimizer" in out.stdout
        runs = os.listdir(workspace / "logs_tp")
        ckpts = os.listdir(workspace / "logs_tp" / runs[0] / "checkpoints")
        assert any("_000004_" in n for n in ckpts), ckpts

    def test_train_pipeline_parallel_cli(self, workspace):
        """training.pipeline_parallel cuts the graph into 2 stages on 2
        devices, trains GPipe microbatches through the production CLI,
        checkpoints in the standard layout, and FromRecent-resumes."""
        import json

        cfg = json.loads((workspace / "train.json5").read_text())
        cfg["training"]["device_config"] = {
            "type": "MultiDevice", "devices": ["tpu:0", "tpu:1"]}
        cfg["training"]["pipeline_parallel"] = 2
        cfg["training"]["accumulation_steps"] = 2
        cfg["logging"] = {"dir": str(workspace / "logs_pp")}
        (workspace / "train_pp.json5").write_text(json.dumps(cfg))
        out = run_cli(
            "yolodl_tpu.cli.train_main",
            "--config-file", str(workspace / "train_pp.json5"),
            "--max-steps", "2",
        )
        assert out.returncode == 0, out.stderr[-3000:]
        assert "pipeline: 2 stages" in out.stdout
        runs = os.listdir(workspace / "logs_pp")
        ckpts = os.listdir(workspace / "logs_pp" / runs[0] / "checkpoints")
        assert any("_000002_" in n for n in ckpts), ckpts

        # resume: the checkpoint is format-compatible (merged layout)
        cfg["training"]["load_checkpoint"] = {"type": "FromRecent"}
        (workspace / "train_pp.json5").write_text(json.dumps(cfg))
        out2 = run_cli(
            "yolodl_tpu.cli.train_main",
            "--config-file", str(workspace / "train_pp.json5"),
            "--max-steps", "4",
        )
        assert out2.returncode == 0, out2.stderr[-3000:]
        assert "restored checkpoint at step 2" in out2.stdout
        # exact-resume data order: 2 steps x batch 2 already consumed
        assert "data stream resumed at record 4" in out2.stdout
        runs2 = sorted(os.listdir(workspace / "logs_pp"))
        ckpts2 = os.listdir(workspace / "logs_pp" / runs2[-1] / "checkpoints")
        assert any("_000004_" in n for n in ckpts2), ckpts2

    def test_train_pipeline_x_dp_cli(self, workspace):
        """pipeline_parallel=2 on 4 devices folds into 2 stages x dp=2:
        each stage's group shards its microbatch via GSPMD."""
        import json

        cfg = json.loads((workspace / "train.json5").read_text())
        cfg["training"]["device_config"] = {
            "type": "MultiDevice", "devices": [f"tpu:{i}" for i in range(4)]}
        cfg["training"]["pipeline_parallel"] = 2
        cfg["training"]["accumulation_steps"] = 2
        cfg["training"]["batch_size"] = 4
        cfg["logging"] = {"dir": str(workspace / "logs_ppdp")}
        (workspace / "train_ppdp.json5").write_text(json.dumps(cfg))
        out = run_cli(
            "yolodl_tpu.cli.train_main",
            "--config-file", str(workspace / "train_ppdp.json5"),
            "--max-steps", "2",
        )
        assert out.returncode == 0, out.stderr[-3000:]
        assert "x dp=2, 2 microbatches/step" in out.stdout
        runs = os.listdir(workspace / "logs_ppdp")
        ckpts = os.listdir(workspace / "logs_ppdp" / runs[0] / "checkpoints")
        assert any("_000002_" in n for n in ckpts), ckpts

    def test_fromfile_and_override_step_do_not_seek_data(self, workspace):
        """The exact-resume data fast-forward is FromRecent-only: a
        FromFile fine-tune (foreign checkpoint) and override_initial_step
        (pure step forcing) never consumed this stream's records."""
        import json

        out = run_cli(
            "yolodl_tpu.cli.train_main",
            "--config-file", str(workspace / "train.json5"),
            "--max-steps", "2",
        )
        assert out.returncode == 0, out.stderr[-3000:]
        runs = sorted(os.listdir(workspace / "logs"))
        ckpt_dir = workspace / "logs" / runs[-1] / "checkpoints"
        ckpt = sorted(os.listdir(ckpt_dir))[-1]

        cfg = json.loads((workspace / "train.json5").read_text())
        cfg["training"]["load_checkpoint"] = {
            "type": "FromFile", "file": str(ckpt_dir / ckpt)}
        (workspace / "train_ff.json5").write_text(json.dumps(cfg))
        out2 = run_cli(
            "yolodl_tpu.cli.train_main",
            "--config-file", str(workspace / "train_ff.json5"),
            "--max-steps", "3",
        )
        assert out2.returncode == 0, out2.stderr[-3000:]
        assert "restored checkpoint at step 2" in out2.stdout
        assert "data stream resumed" not in out2.stdout

        cfg = json.loads((workspace / "train.json5").read_text())
        cfg["training"]["override_initial_step"] = 7
        cfg["logging"] = {"dir": str(workspace / "logs_ov")}
        (workspace / "train_ov.json5").write_text(json.dumps(cfg))
        out3 = run_cli(
            "yolodl_tpu.cli.train_main",
            "--config-file", str(workspace / "train_ov.json5"),
            "--max-steps", "9",
        )
        assert out3.returncode == 0, out3.stderr[-3000:]
        assert "data stream resumed" not in out3.stdout
        runs3 = os.listdir(workspace / "logs_ov")
        ckpts3 = os.listdir(workspace / "logs_ov" / runs3[0] / "checkpoints")
        assert any("_000009_" in n for n in ckpts3), ckpts3

    def test_pipeline_parallel_exclusive_with_tp(self, workspace):
        import json

        cfg = json.loads((workspace / "train.json5").read_text())
        cfg["training"]["device_config"] = {
            "type": "MultiDevice", "devices": [f"tpu:{i}" for i in range(8)]}
        cfg["training"]["batch_size"] = 8
        cfg["training"]["pipeline_parallel"] = 8
        cfg["training"]["tensor_parallel"] = 2
        (workspace / "train_pptp.json5").write_text(json.dumps(cfg))
        out = run_cli(
            "yolodl_tpu.cli.train_main",
            "--config-file", str(workspace / "train_pptp.json5"),
            "--max-steps", "1",
        )
        assert out.returncode != 0
        assert "exclusive" in out.stderr

    def test_tensor_parallel_must_divide_devices(self, workspace):
        import json

        cfg = json.loads((workspace / "train.json5").read_text())
        cfg["training"]["device_config"] = {
            "type": "MultiDevice", "devices": [f"tpu:{i}" for i in range(8)]}
        cfg["training"]["batch_size"] = 8
        cfg["training"]["tensor_parallel"] = 3
        (workspace / "train_tp3.json5").write_text(json.dumps(cfg))
        out = run_cli(
            "yolodl_tpu.cli.train_main",
            "--config-file", str(workspace / "train_tp3.json5"),
            "--max-steps", "1",
        )
        assert out.returncode != 0
        assert "must divide the device count" in out.stderr

    def test_train_periodic_evaluation(self, workspace):
        """evaluation.interval=2 reports dataset mAP through the full
        inference path every 2 optimizer steps."""
        import json

        cfg = json.loads((workspace / "train.json5").read_text())
        cfg["evaluation"] = {"interval": 2, "limit": 4, "conf_thresh": 0.05}
        cfg["logging"] = {"dir": str(workspace / "logs_eval")}
        (workspace / "train_eval.json5").write_text(json.dumps(cfg))
        out = run_cli(
            "yolodl_tpu.cli.train_main",
            "--config-file", str(workspace / "train_eval.json5"),
            "--max-steps", "4",
        )
        assert out.returncode == 0, out.stderr[-3000:]
        val_lines = [l for l in out.stdout.splitlines() if "val mAP@0.5" in l]
        assert len(val_lines) == 2, out.stdout  # steps 2 and 4
        # best-checkpoint tracking: best.json records the best-mAP step and
        # a checkpoint exists at that step
        runs = os.listdir(workspace / "logs_eval")
        run_dir = workspace / "logs_eval" / runs[0]
        best = json.loads((run_dir / "best.json").read_text())
        assert best["mAP@0.5"] >= 0
        ckpts = os.listdir(run_dir / "checkpoints")
        assert any(f"_{best['step']:06d}_" in n for n in ckpts), (best, ckpts)

    def test_train_accumulation_steps(self, workspace):
        """training.accumulation_steps=2 splits each batch into two
        sequential micro-batches with one optimizer step per logical batch
        (darknet batch/subdivisions semantics)."""
        import json

        cfg = json.loads((workspace / "train.json5").read_text())
        cfg["training"]["accumulation_steps"] = 2
        cfg["logging"]["dir"] = str(workspace / "logs_accum")
        (workspace / "train_accum.json5").write_text(json.dumps(cfg))
        out = run_cli(
            "yolodl_tpu.cli.train_main",
            "--config-file", str(workspace / "train_accum.json5"),
            "--max-steps", "4",
        )
        assert out.returncode == 0, out.stderr[-3000:]
        # one optimizer step per logical batch: max-steps counts optimizer
        # steps, so the final checkpoint lands at step 4
        runs = os.listdir(workspace / "logs_accum")
        ckpts = os.listdir(workspace / "logs_accum" / runs[0] / "checkpoints")
        assert any("_000004_" in n for n in ckpts), ckpts

    def test_accumulation_must_divide_batch(self, workspace):
        import json

        cfg = json.loads((workspace / "train.json5").read_text())
        cfg["training"]["accumulation_steps"] = 3  # batch_size=2 — invalid
        (workspace / "train_bad_accum.json5").write_text(json.dumps(cfg))
        out = run_cli(
            "yolodl_tpu.cli.train_main",
            "--config-file", str(workspace / "train_bad_accum.json5"),
            "--max-steps", "1",
        )
        assert out.returncode == 1
        assert "divisible" in out.stderr

    def test_train_steps_per_call_scan(self, workspace):
        """training.steps_per_call=2 scans two optimizer steps per XLA call;
        logging/checkpoint cadence still sees every step."""
        import json

        cfg = json.loads((workspace / "train.json5").read_text())
        cfg["training"]["steps_per_call"] = 2
        cfg["logging"]["dir"] = str(workspace / "logs_scan")
        (workspace / "train_scan.json5").write_text(json.dumps(cfg))
        out = run_cli(
            "yolodl_tpu.cli.train_main",
            "--config-file", str(workspace / "train_scan.json5"),
            "--max-steps", "4",
        )
        assert out.returncode == 0, out.stderr[-3000:]
        runs = os.listdir(workspace / "logs_scan")
        run_dir = workspace / "logs_scan" / runs[0]
        ckpts = os.listdir(run_dir / "checkpoints")
        assert any(name.endswith(".ckpt") for name in ckpts)
        # checkpoints land only on scan-window boundaries: ts holds the
        # end-of-window params, so an intermediate step label would break
        # exact resume (the saved step must divide by steps_per_call)
        steps = [int(n.split("_")[1]) for n in ckpts if n.endswith(".ckpt")]
        assert steps and all(s % 2 == 0 for s in steps), steps

    def test_train_scan_saves_window_end_on_odd_boundary(self, workspace):
        """A save boundary crossed mid-window triggers a save at the window
        end (not silently skipped, not mislabeled)."""
        import json

        cfg = json.loads((workspace / "train.json5").read_text())
        cfg["training"]["steps_per_call"] = 2
        cfg["training"]["save_checkpoint_steps"] = 3  # crosses mid-window
        cfg["logging"]["dir"] = str(workspace / "logs_scan3")
        (workspace / "train_scan3.json5").write_text(json.dumps(cfg))
        out = run_cli(
            "yolodl_tpu.cli.train_main",
            "--config-file", str(workspace / "train_scan3.json5"),
            "--max-steps", "6",
        )
        assert out.returncode == 0, out.stderr[-3000:]
        runs = os.listdir(workspace / "logs_scan3")
        ckpts = os.listdir(workspace / "logs_scan3" / runs[0] / "checkpoints")
        steps = sorted(int(n.split("_")[1]) for n in ckpts)
        # boundary 3 falls inside window (3,4] → saved at 4; boundary 6 and
        # max-steps coincide at 6
        assert steps == [4, 6], steps

    def test_train_full_telemetry(self, workspace):
        """enable_gradients + enable_images + enable_benchmark: per-param
        maxima, benchmark scalars, heatmap and pipeline images all flow to
        the TB worker without breaking the step (logging.rs:323-422)."""
        import json

        cfg = json.loads((workspace / "train.json5").read_text())
        cfg["logging"].update(enable_gradients=True, enable_images=True,
                              enable_benchmark=True, enable_inference=True,
                              enable_debug_stat=True)
        cfg["logging"]["dir"] = str(workspace / "logs_tel")
        (workspace / "train_tel.json5").write_text(json.dumps(cfg))
        out = run_cli(
            "yolodl_tpu.cli.train_main",
            "--config-file", str(workspace / "train_tel.json5"),
            "--max-steps", "3",
        )
        assert out.returncode == 0, out.stderr[-3000:]
        runs = os.listdir(workspace / "logs_tel")
        run_dir = workspace / "logs_tel" / runs[0]
        events = [f for f in os.listdir(run_dir) if f.startswith("events.out")]
        assert events
        # the event file must actually contain the extra taxonomies
        data = b"".join((run_dir / f).read_bytes() for f in events)
        assert b"weights_max/" in data and b"grads_max/" in data, \
            "per-parameter maxima missing from TB events"
        assert b"benchmark/obj_accuracy" in data
        assert b"objectness" in data, "heatmap image missing"
        # enable_inference: training-time NMS detection overlays
        # (multi_gpu.rs:239-261, logging.rs:379-422)
        assert b"inference/detections" in data, \
            "training-time inference image missing"
        # enable_debug_stat: mean decoded box stats (logging.rs:135-146)
        assert b"debug/cy_mean" in data and b"debug/w_mean" in data, \
            "debug_stat scalars missing"

    def test_train_ema_checkpointed(self, workspace):
        """training.ema.enabled produces checkpoints with EMA params that
        eval --ema can consume."""
        import json

        cfg = json.loads((workspace / "train.json5").read_text())
        cfg["training"]["ema"] = {"enabled": True, "decay": 0.99}
        cfg["logging"]["dir"] = str(workspace / "logs_ema")
        (workspace / "train_ema.json5").write_text(json.dumps(cfg))
        out = run_cli(
            "yolodl_tpu.cli.train_main",
            "--config-file", str(workspace / "train_ema.json5"),
            "--max-steps", "2",
        )
        assert out.returncode == 0, out.stderr[-3000:]
        runs = os.listdir(workspace / "logs_ema")
        ckpt_dir = workspace / "logs_ema" / runs[0] / "checkpoints"
        path = sorted(ckpt_dir.iterdir())[-1]
        import numpy as np
        with np.load(path) as data:
            import json as _json
            meta = _json.loads(bytes(data["__meta__"].tobytes()).decode())
        assert meta["has_ema"], meta

    def test_train_resume_from_recent(self, workspace):
        out1 = run_cli(
            "yolodl_tpu.cli.train_main",
            "--config-file", str(workspace / "train.json5"),
            "--max-steps", "2",
        )
        assert out1.returncode == 0, out1.stderr[-3000:]
        # second invocation makes a fresh run dir; FromRecent must find the
        # first run's step-2 checkpoint across run dirs (checkpoint.rs:39-64)
        cfg = json.loads((workspace / "train.json5").read_text())
        cfg["training"]["load_checkpoint"] = {"type": "FromRecent"}
        (workspace / "train_resume.json5").write_text(json.dumps(cfg))
        out2 = run_cli(
            "yolodl_tpu.cli.train_main",
            "--config-file", str(workspace / "train_resume.json5"),
            "--max-steps", "4",
        )
        assert out2.returncode == 0, out2.stderr[-3000:]
        assert "restored checkpoint at step 2" in out2.stdout, out2.stdout


class TestDarknetLossImplCli:
    """training.loss.impl=Darknet end-to-end: the CLI trains a darknet cfg
    through the oracle-exact delta loss (round-4; step math pinned in
    test_parity_train_detection.py, wiring in test_train.py)."""

    def _darknet_workspace(self, tmp_path, rng):
        tmp_path = tmp_path / "dk_ws"
        tmp_path.mkdir(exist_ok=True)
        img_dir = tmp_path / "images"
        img_dir.mkdir(exist_ok=True)
        for i in range(4):
            arr = (rng.uniform(0, 255, (48, 48, 3))).astype(np.uint8)
            arr[10:30, 10:30] = (255, 0, 0)
            Image.fromarray(arr).save(img_dir / f"i{i}.png")
        (tmp_path / "classes.txt").write_text("square\n")
        lines = ["image_file,class_name,cy,cx,h,w"]
        for i in range(4):
            lines.append(f"i{i}.png,square,20,20,20,20")
        (tmp_path / "label.csv").write_text("\n".join(lines) + "\n")
        (tmp_path / "model.cfg").write_text("""[net]
width=32
height=32
channels=3
[convolutional]
batch_normalize=1
filters=8
size=3
stride=2
pad=1
activation=leaky
[convolutional]
filters=18
size=1
activation=linear
[yolo]
mask=0,1,2
anchors=6,8, 10,14, 18,24
classes=1
num=3
iou_loss=ciou
iou_thresh=0.2
max_delta=5
ignore_thresh=0.6
""")
        cfg = {
            "version": "0.1.0",
            "model": {"kind": "Darknet", "cfg_file": "model.cfg"},
            "dataset": {"kind": {"type": "Csv", "image_size": 32,
                                 "input_channels": 3,
                                 "image_dir": str(img_dir),
                                 "label_file": str(tmp_path / "label.csv"),
                                 "classes_file": str(tmp_path / "classes.txt")}},
            "logging": {"dir": str(tmp_path / "logs")},
            "preprocessor": {},
            "training": {
                "batch_size": 2,
                "device_config": {"type": "SingleDevice", "device": "tpu:0"},
                "optimizer": {"type": "sgd", "momentum": 0.9,
                              "lr_schedule": {"type": "StepWise",
                                              "steps": [[0, 0.002]]}},
                "loss": {"impl": "Darknet"},
                "save_checkpoint_steps": 2,
                "load_checkpoint": {"type": "Disabled"},
            },
            "benchmark": {"nms_iou_thresh": 0.5, "nms_conf_thresh": 0.4},
        }
        (tmp_path / "train.json5").write_text(json.dumps(cfg))
        return tmp_path

    def test_trains_and_checkpoints(self, tmp_path, rng):
        ws = self._darknet_workspace(tmp_path, rng)
        out = run_cli("yolodl_tpu.cli.train_main",
                      "--config-file", str(ws / "train.json5"),
                      "--max-steps", "4")
        assert out.returncode == 0, out.stderr[-3000:]
        assert "loss impl: darknet-exact" in out.stdout
        runs = os.listdir(ws / "logs")
        run_dir = ws / "logs" / runs[0]
        assert any(n.endswith(".ckpt")
                   for n in os.listdir(run_dir / "checkpoints"))

    def test_rejected_for_newslab_and_multiscale(self, workspace, tmp_path,
                                                 rng):
        # NEWSLABv1 model → clear error
        cfg = json.loads((workspace / "train.json5").read_text())
        cfg["training"]["loss"] = {"impl": "Darknet"}
        (workspace / "train_dkl.json5").write_text(json.dumps(cfg))
        out = run_cli("yolodl_tpu.cli.train_main",
                      "--config-file", str(workspace / "train_dkl.json5"),
                      "--max-steps", "1")
        assert out.returncode != 0
        assert "darknet model cfg" in (out.stderr + out.stdout)

    def test_multiscale_trains(self, tmp_path, rng):
        """multi_scale × impl=Darknet (VERDICT r4 #4): per-size head
        params via the per-size step cache — darknet's random=1
        resize-every-N-batches semantics under the exact loss."""
        ws = self._darknet_workspace(tmp_path, rng)
        cfg2 = json.loads((ws / "train.json5").read_text())
        cfg2["training"]["multi_scale"] = {"sizes": [32, 64], "interval": 2}
        (ws / "train_ms.json5").write_text(json.dumps(cfg2))
        out2 = run_cli("yolodl_tpu.cli.train_main",
                       "--config-file", str(ws / "train_ms.json5"),
                       "--max-steps", "4")
        assert out2.returncode == 0, out2.stderr[-3000:]
        assert "loss impl: darknet-exact" in out2.stdout


class TestDetectCli:
    def test_detect_writes_images(self, workspace):
        out = run_cli(
            "yolodl_tpu.cli.detect_main",
            "--config-file", str(workspace / "detect.json5"),
            "--limit", "3",
        )
        assert out.returncode == 0, out.stderr[-3000:]
        files = os.listdir(workspace / "out")
        assert len(files) == 3
        img = Image.open(workspace / "out" / sorted(files)[0])
        assert img.size == (32, 32)


class TestDetectMultiDevice:
    def test_detect_sharded_over_8_devices(self, workspace):
        # batch must divide over the mesh: use minibatch 8
        import json5 as _json5
        cfg = _json5.loads((workspace / "detect.json5").read_text())
        cfg["model"]["minibatch_size"] = 8
        cfg["output"]["output_dir"] = str(workspace / "out8")
        (workspace / "detect8.json5").write_text(json.dumps(cfg))
        out = run_cli(
            "yolodl_tpu.cli.detect_main",
            "--config-file", str(workspace / "detect8.json5"),
            "--limit", "6", "--devices", "8",
        )
        assert out.returncode == 0, out.stderr[-3000:]
        assert len(os.listdir(workspace / "out8")) == 6


class TestGracefulShutdown:
    def test_sigterm_saves_checkpoint_and_exits_zero(self, workspace):
        """SIGTERM (TPU maintenance preemption) checkpoints at the next step
        boundary and exits cleanly."""
        import signal as _signal

        env = dict(os.environ)
        env.update(JAX_PLATFORMS="cpu", PYTHONPATH=REPO,
                   PALLAS_AXON_POOL_IPS="")
        proc = subprocess.Popen(
            [sys.executable, "-m", "yolodl_tpu.cli.train_main",
             "--config-file", str(workspace / "train.json5")],
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
            env=env, cwd=REPO,
        )
        saw_step = False
        try:
            for line in proc.stdout:
                if line.startswith("step "):
                    saw_step = True
                    proc.send_signal(_signal.SIGTERM)
                    break
            out_rest, err = proc.communicate(timeout=120)
        finally:
            if proc.poll() is None:
                proc.kill()
        assert saw_step, err[-2000:]
        assert proc.returncode == 0, (out_rest, err[-2000:])
        assert "checkpoint saved" in out_rest, out_rest
        runs = os.listdir(workspace / "logs")
        ckpts = []
        for r in runs:
            d = workspace / "logs" / r / "checkpoints"
            if d.is_dir():
                ckpts += [f for f in os.listdir(d) if f.endswith(".ckpt")]
        assert ckpts


class TestConfigErrors:
    """User mistakes produce one clear error line + exit 1, not a traceback
    wall (anyhow-chain equivalent, train/src/main.rs:23)."""

    def test_missing_config_file(self):
        out = run_cli("yolodl_tpu.cli.train_main",
                      "--config-file", "does-not-exist.json5")
        assert out.returncode == 1
        assert "error: file not found" in out.stderr
        assert "Traceback" not in out.stderr

    def test_bad_version(self, tmp_path):
        p = tmp_path / "bad.json5"
        p.write_text('{"version": "9.9.9"}')
        out = run_cli("yolodl_tpu.cli.detect_main", "--config-file", str(p))
        assert out.returncode == 1
        assert "9.9.9" in out.stderr and "Traceback" not in out.stderr

    def test_syntax_error(self, tmp_path):
        p = tmp_path / "syn.json5"
        p.write_text("{oops")
        out = run_cli("yolodl_tpu.cli.train_main", "--config-file", str(p))
        assert out.returncode == 1
        assert "error:" in out.stderr and "Traceback" not in out.stderr

    def test_debug_env_reenables_traceback(self, tmp_path):
        env_backup = os.environ.get("YOLODL_DEBUG")
        os.environ["YOLODL_DEBUG"] = "1"
        try:
            out = run_cli("yolodl_tpu.cli.train_main",
                          "--config-file", "does-not-exist.json5")
        finally:
            if env_backup is None:
                os.environ.pop("YOLODL_DEBUG", None)
            else:
                os.environ["YOLODL_DEBUG"] = env_backup
        assert out.returncode == 1
        assert "Traceback" in out.stderr


class TestBenchmarkMetrics:
    def test_train_logs_benchmark_metrics(self, workspace):
        import json5 as _json5
        cfg = _json5.loads((workspace / "train.json5").read_text())
        cfg["logging"]["enable_benchmark"] = True
        (workspace / "train_bench.json5").write_text(json.dumps(cfg))
        out = run_cli(
            "yolodl_tpu.cli.train_main",
            "--config-file", str(workspace / "train_bench.json5"),
            "--max-steps", "2",
        )
        assert out.returncode == 0, out.stderr[-3000:]


class TestEvalCli:
    def test_eval_runs_and_reports(self, workspace):
        out = run_cli(
            "yolodl_tpu.cli.eval_main",
            "--config-file", str(workspace / "detect.json5"),
            "--limit", "4",
        )
        assert out.returncode == 0, out.stderr[-3000:]
        result = json.loads(out.stdout.strip().splitlines()[-1])
        assert result["images"] == 4
        assert 0.0 <= result["mAP@0.5"] <= 1.0
        assert "mAP@0.5:0.95" in result


class TestReferenceConfigParity:
    def test_reference_train_json5_parses(self):
        from yolodl_tpu.config.app_config import TrainAppConfig

        cfg = TrainAppConfig.load(os.path.join(REPO, "cfg/train.json5"))
        # values straight from the reference file
        assert cfg.batch_size == 96
        assert cfg.n_devices == 1
        assert cfg.model_kind == "newslab_v1"
        assert cfg.dataset.kind == "iii"
        assert cfg.loss.box_metric == "hausdorff"
        assert cfg.loss.iou_loss_weight == 55.0
        assert cfg.lr.kind == "stepwise"
        assert cfg.lr.steps[0] == (0, 0.01)
        assert cfg.checkpoint.mode == "from_file"
        assert cfg.preprocessor.cache_method == "file"
        assert cfg.preprocessor.color_jitter is not None
        assert cfg.preprocessor.affine is not None
        # pipeline.unordered_records=true in the reference file flows to
        # the stream's out-of-order reassembly mode
        assert cfg.preprocessor.unordered is True

    def test_darknet_data_recipe_adoption(self, tmp_path):
        """preprocessor.from_model_cfg: a darknet cfg carrying mosaic=1 +
        [net] HSV knobs + [yolo] jitter/random/resize yields a mosaic-
        enabled, color-jittered, affine-jittered, multi-scale config
        (round-3 VERDICT item 8) without hand-written JSON5 aug blocks."""
        import json

        from yolodl_tpu.config import darknet_cfg as dk
        from yolodl_tpu.config.app_config import (
            TrainAppConfig, adopt_darknet_data_recipe)

        cfg_text = """[net]
width=416
height=416
channels=3
mosaic=1
hue=.1
saturation=1.5
exposure=1.5
angle=0
[convolutional]
filters=18
size=1
activation=linear
[yolo]
mask=0
anchors=10,14
classes=1
num=1
jitter=.3
random=1
resize=1.5
"""
        train_cfg = {
            "version": "0.1.0",
            "model": {"kind": "Darknet", "cfg_file": "m.cfg"},
            "dataset": {"kind": {"type": "Csv", "image_size": 416,
                                 "image_dir": ".", "label_file": "l.csv",
                                 "classes_file": "c.txt"}},
            "preprocessor": {"from_model_cfg": True},
            "training": {"batch_size": 2, "optimizer": {"lr": 0.001}},
        }
        p = tmp_path / "train_fm.json5"
        p.write_text(json.dumps(train_cfg))
        parsed = TrainAppConfig.load(p)
        assert parsed.preprocessor.from_model_cfg is True
        out = adopt_darknet_data_recipe(parsed, dk.Darknet.from_str(cfg_text))
        pre = out.preprocessor
        # mosaic gated 50% per batch (data.c:1069)
        assert pre.mosaic_prob == 0.5
        assert pre.color_jitter is not None
        assert pre.color_jitter.hue_shift == pytest.approx(0.1)
        assert pre.color_jitter.saturation_shift == pytest.approx(0.5)
        assert pre.color_jitter.value_shift == pytest.approx(0.5)
        aff = pre.affine
        assert aff is not None
        assert aff.horizontal_flip_prob == 0.5  # [net] flip default 1
        assert aff.translation == pytest.approx(0.3)  # [yolo] jitter
        assert aff.scale == (pytest.approx(1 / 1.5), 1.5)  # [yolo] resize
        # [yolo] random=1 → multi-scale dims round(v*416/32+1)*32,
        # v ∈ [1/1.4, 1.4] (detector.c:195-206), every 10 steps
        assert out.multi_scale_interval == 10
        sizes = out.multi_scale_sizes
        assert sizes and sizes[0] <= 320 and sizes[-1] >= 608
        assert all(s % 32 == 0 for s in sizes)
        assert 416 in sizes
        # a cfg WITHOUT the knobs changes nothing
        plain = """[net]
width=416
height=416
channels=3
flip=0
[convolutional]
filters=18
size=1
activation=linear
[yolo]
mask=0
anchors=10,14
classes=1
num=1
jitter=0
"""
        out2 = adopt_darknet_data_recipe(parsed, dk.Darknet.from_str(plain))
        assert out2.preprocessor.mosaic_prob == 0.0
        assert out2.preprocessor.affine is None
        assert out2.multi_scale_sizes == ()

    def test_pipeline_device_warns(self, tmp_path, capsys):
        """preprocessor.pipeline.device other than cpu warns (the host
        pipeline is CPU + native kernels here; the reference could run its
        preprocessor on CUDA)."""
        import json

        from yolodl_tpu.config.app_config import TrainAppConfig

        cfg = {
            "version": "0.1.0",
            "model": {"kind": "NewslabV1", "cfg_file": "model.json5"},
            "dataset": {"kind": {"type": "Csv", "image_size": 32,
                                 "image_dir": ".", "label_file": "l.csv",
                                 "classes_file": "c.txt"}},
            "preprocessor": {"pipeline": {"device": "cuda:0"}},
            "training": {"batch_size": 2, "optimizer": {"lr": 0.001}},
        }
        p = tmp_path / "train_pd.json5"
        p.write_text(json.dumps(cfg))
        parsed = TrainAppConfig.load(p)
        assert parsed.preprocessor.unordered is False
        assert "pipeline.device" in capsys.readouterr().err

    def test_nonuniform_minibatch_warns(self, tmp_path, capsys):
        """NonUniformMultiDevice sizes (config.rs:263-271) are normalized to
        a uniform SPMD split — with a warning, not silently."""
        import json

        from yolodl_tpu.config.app_config import TrainAppConfig

        cfg = {
            "version": "0.1.0",
            "model": {"kind": "NewslabV1", "cfg_file": "model.json5"},
            "dataset": {"kind": {"type": "Csv", "image_size": 32,
                                 "image_dir": ".", "label_file": "l.csv",
                                 "classes_file": "c.txt"}},
            "training": {
                "batch_size": 6,
                "device_config": {
                    "type": "NonUniformMultiDevice",
                    "devices": [
                        {"device": "tpu:0", "minibatch_size": 4},
                        {"device": "tpu:1", "minibatch_size": 2},
                    ],
                },
                "optimizer": {"lr": 0.001},
            },
        }
        p = tmp_path / "train_nu.json5"
        p.write_text(json.dumps(cfg))
        parsed = TrainAppConfig.load(p)
        assert parsed.n_devices == 2
        err = capsys.readouterr().err
        assert "normalized to a uniform split" in err
        # uniform sizes → no warning
        cfg["training"]["device_config"]["devices"][1]["minibatch_size"] = 4
        p.write_text(json.dumps(cfg))
        TrainAppConfig.load(p)
        assert "normalized" not in capsys.readouterr().err
        # bare minibatch_sizes list form must warn too
        cfg["training"]["device_config"] = {
            "type": "NonUniformMultiDevice", "minibatch_sizes": [4, 2]}
        p.write_text(json.dumps(cfg))
        parsed = TrainAppConfig.load(p)
        assert parsed.n_devices == 2
        assert "normalized to a uniform split" in capsys.readouterr().err

    def test_reference_detect_json5_parses(self):
        from yolodl_tpu.config.app_config import DetectAppConfig

        cfg = DetectAppConfig.load(os.path.join(REPO, "cfg/detect.json5"))
        assert cfg.minibatch_size == 4
        assert cfg.dataset.kind == "iii"
        assert cfg.nms_iou_thresh == 0.5
        assert cfg.nms_conf_thresh == 0.4
        # preprocess block (detect/src/config.rs) flows to GT sanitizing
        assert cfg.bbox_scaling == 1.0
        assert cfg.out_of_bound_tolerance == 10
        assert cfg.min_bbox_size == 0.05


class TestMultiScale:
    def test_train_with_multi_scale(self, workspace):
        import json5 as _json5
        cfg = _json5.loads((workspace / "train.json5").read_text())
        cfg["training"]["multi_scale"] = {"sizes": [32, 64], "interval": 2}
        (workspace / "train_ms.json5").write_text(json.dumps(cfg))
        out = run_cli(
            "yolodl_tpu.cli.train_main",
            "--config-file", str(workspace / "train_ms.json5"),
            "--max-steps", "4",
        )
        assert out.returncode == 0, out.stderr[-3000:]


class TestDetectJsonOutput:
    def test_coco_json_written(self, workspace):
        out = run_cli(
            "yolodl_tpu.cli.detect_main",
            "--config-file", str(workspace / "detect.json5"),
            "--limit", "2",
            "--save-json", str(workspace / "dets.json"),
        )
        assert out.returncode == 0, out.stderr[-3000:]
        import json5 as _json5
        dets = json.loads((workspace / "dets.json").read_text())
        assert isinstance(dets, list)
        for d in dets:
            assert set(d) == {"image_id", "file_name", "category_id", "bbox", "score"}
            x, y, w, h = d["bbox"]
            assert w >= 0 and h >= 0


class TestPipelineDebugImages:
    def test_enable_images_writes_pipeline_images(self, workspace):
        import json5 as _json5
        cfg = _json5.loads((workspace / "train.json5").read_text())
        cfg["logging"]["enable_images"] = True
        (workspace / "train_img.json5").write_text(json.dumps(cfg))
        out = run_cli(
            "yolodl_tpu.cli.train_main",
            "--config-file", str(workspace / "train_img.json5"),
            "--max-steps", "3",
        )
        assert out.returncode == 0, out.stderr[-3000:]


class TestAnchorsTool:
    def test_kmeans_anchors(self, workspace):
        out = run_cli(
            "yolodl_tpu.cli.tool_main", "anchors",
            "--config-file", str(workspace / "train.json5"),
            "--num", "2",
        )
        assert out.returncode == 0, out.stderr
        assert "anchors (h, w)" in out.stdout
        assert "fitness" in out.stdout


class TestEvalEma:
    def test_eval_with_ema_checkpoint(self, workspace, tmp_path):
        # create an EMA checkpoint from the workspace model
        env_script = f"""
import os
os.environ['JAX_PLATFORMS']='cpu'
os.environ['PALLAS_AXON_POOL_IPS']=''
import jax
jax.config.update('jax_platforms','cpu')
from yolodl_tpu.models.zoo import load_newslab_model
from yolodl_tpu.train import TrainConfig, train_init, save_checkpoint
from yolodl_tpu.models import YoloModel
from yolodl_tpu.graph import Graph
model = YoloModel(Graph.load_newslab_v1_json(r'{workspace}/model.json5'))
ts, _ = train_init(model, TrainConfig(use_ema=True))
save_checkpoint(r'{tmp_path}/ckpts', 1, 1.0, ts.params, ts.state, ema_params=ts.ema_params)
"""
        import subprocess, sys
        env = dict(os.environ)
        env["PYTHONPATH"] = REPO
        r = subprocess.run([sys.executable, "-c", env_script], env=env,
                           capture_output=True, text=True, cwd=REPO, timeout=300)
        assert r.returncode == 0, r.stderr[-2000:]
        ckpt_dir = os.path.join(tmp_path, "ckpts")
        ckpt = os.path.join(ckpt_dir, os.listdir(ckpt_dir)[0])
        out = run_cli(
            "yolodl_tpu.cli.eval_main",
            "--config-file", str(workspace / "detect.json5"),
            "--checkpoint", ckpt, "--ema", "--limit", "2",
        )
        assert out.returncode == 0, out.stderr[-3000:]


class TestClassifyCli:
    @pytest.fixture()
    def class_workspace(self, tmp_path, rng):
        """3-color synthetic classification set + tiny classifier cfg."""
        img_dir = tmp_path / "images"
        img_dir.mkdir()
        names = ["red", "green", "blue"]
        rows = ["image_file,class_name"]
        for i in range(12):
            cls = i % 3
            arr = rng.uniform(0, 60, (24, 24, 3)).astype(np.uint8)
            arr[:, :, cls] = rng.uniform(180, 255, (24, 24)).astype(np.uint8)
            Image.fromarray(arr).save(img_dir / f"i{i}.png")
            rows.append(f"i{i}.png,{names[cls]}")
        (tmp_path / "labels.csv").write_text("\n".join(rows) + "\n")
        (tmp_path / "classes.txt").write_text("\n".join(names) + "\n")
        (tmp_path / "net.cfg").write_text("""
[net]
height=24
width=24
channels=3
batch=1

[convolutional]
batch_normalize=1
filters=8
size=3
stride=2
pad=1
activation=leaky

[convolutional]
batch_normalize=1
filters=16
size=3
stride=2
pad=1
activation=leaky

[avgpool]

[connected]
output=3
activation=linear

[softmax]
""")
        cfg = {
            "version": "0.1.0",
            "model": {"kind": "Darknet", "cfg_file": str(tmp_path / "net.cfg")},
            "dataset": {"image_dir": str(img_dir),
                        "label_file": str(tmp_path / "labels.csv"),
                        "classes_file": str(tmp_path / "classes.txt")},
            "logging": {"dir": str(tmp_path / "logs")},
            "training": {"batch_size": 6, "save_checkpoint_steps": 20,
                         "optimizer": {"momentum": 0.9,
                                       "lr_schedule": {"type": "Constant", "lr": 0.005}}},
        }
        (tmp_path / "classify.json5").write_text(json.dumps(cfg))
        return tmp_path

    def test_train_then_eval(self, class_workspace):
        out = run_cli(
            "yolodl_tpu.cli.classify_main",
            "--config-file", str(class_workspace / "classify.json5"),
            "--max-steps", "40",
        )
        assert out.returncode == 0, out.stderr[-3000:]
        assert "acc" in out.stdout

        out2 = run_cli(
            "yolodl_tpu.cli.classify_main",
            "--config-file", str(class_workspace / "classify.json5"),
            "--eval", "--topk", "2",
        )
        assert out2.returncode == 0, out2.stderr[-3000:]
        assert "restored checkpoint" in out2.stdout
        acc = float(out2.stdout.split("top-1 accuracy:")[1].split()[0])
        assert acc > 0.9, out2.stdout
        # top-k accuracy (darknet validate_classifier's topk) dominates top-1
        acc2 = float(out2.stdout.split("top-2 accuracy:")[1].split()[0])
        assert acc2 >= acc


class TestDetectDarknetWeights:
    def test_detect_with_darknet_cfg_and_weights(self, workspace, tmp_path):
        """The README quickstart flow: darknet .cfg + .weights through the
        detect CLI (model built by the darknet front-end, weights loaded by
        our serializer)."""
        import jax

        from yolodl_tpu.config import darknet_cfg as dk
        from yolodl_tpu.graph.from_darknet import graph_from_darknet
        from yolodl_tpu.models import YoloModel
        from yolodl_tpu.models.weights import save_darknet_weights

        # shrink yolov4-tiny for CPU speed; weights are input-size-invariant
        text = open(os.path.join(REPO, "cfg/darknet/yolov4-tiny.cfg")).read()
        text = text.replace("width=416", "width=160").replace(
            "height=416", "height=160")
        cfg_path = tmp_path / "tiny160.cfg"
        cfg_path.write_text(text)

        darknet = dk.Darknet.load(str(cfg_path))
        model = YoloModel(graph_from_darknet(darknet))
        params, state = model.init(jax.random.PRNGKey(0))
        weights_path = tmp_path / "tiny.weights"
        save_darknet_weights(darknet, params, state, str(weights_path))

        detect_cfg = {
            "version": "0.1.0",
            "model": {"kind": "Darknet", "cfg_file": str(cfg_path),
                      "minibatch_size": 2},
            "input": {"kind": {
                "type": "Csv", "image_size": 160, "input_channels": 3,
                "image_dir": str(workspace / "images"),
                "label_file": str(workspace / "label.csv"),
                "classes_file": str(workspace / "classes.txt"),
            }},
            "output": {"output_dir": str(tmp_path / "out"),
                       "nms_iou_thresh": 0.5, "nms_conf_thresh": 0.05},
        }
        (tmp_path / "detect_dk.json5").write_text(json.dumps(detect_cfg))
        out = run_cli(
            "yolodl_tpu.cli.detect_main",
            "--config-file", str(tmp_path / "detect_dk.json5"),
            "--weights", str(weights_path),
            "--limit", "2",
        )
        assert out.returncode == 0, out.stderr[-3000:]
        assert len(os.listdir(tmp_path / "out")) == 2
