"""Real-photograph quality loop through the PRODUCTION CLIs on the TPU.

Unlike scripts/tpu_quality_loop.py (synthetic shapes, library-level loop),
this drives the actual shipping surfaces end-to-end on real data:

    train CLI (JSON5 config, CSV dataset of real photos, full host pipeline
    with mosaic/jitter/affine, checkpoints)  →  eval CLI (mAP@0.5)

Data = the reference's own CSV test fixture
(/root/reference/yolo-dl/tests/csv_dataset: three real photographs — dog,
cat, pig — with hand-labeled boxes, yolo-dl/src/dataset/csv.rs test data),
read in place.  Three images is an overfit demonstration, not a
generalization benchmark — the value is that every production stage (JPEG
decode → letterbox → augmentation → batching → TPU train step →
checkpoint → eval inference → NMS → COCO AP) runs on real photographs and
the mAP goes 0 → ~1.

Run under axon: python scripts/tpu_quality_real.py
Knobs: QLR_STEPS (default 400), QLR_SIZE (320), QLR_BATCH (6),
QLR_CFG (cfg/darknet/yolov4-tiny.cfg — any detection cfg works, e.g.
yolov4-csp.cfg for the flagship).
"""

import json
import os
import re
import subprocess
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
FIXTURE = "/root/reference/yolo-dl/tests/csv_dataset"

STEPS = int(os.environ.get("QLR_STEPS", "400"))
SIZE = int(os.environ.get("QLR_SIZE", "320"))
BATCH = int(os.environ.get("QLR_BATCH", "6"))
CFG = os.environ.get("QLR_CFG", "cfg/darknet/yolov4-tiny.cfg")
LR = float(os.environ.get("QLR_LR", "0.001"))
# decay lr 10x at this fraction of the run (deep flagships need the decay
# to settle box regression; 0 disables)
DECAY_AT = float(os.environ.get("QLR_DECAY_AT", "0.7"))
MOSAIC = float(os.environ.get("QLR_MOSAIC", "0.25"))
# exercise the memory/scale-out knobs in the same end-to-end loop:
# QLR_REMAT=1 trains with block-level activation remat; QLR_EVAL_DEVICES=N
# shards the eval batches over N devices
REMAT = bool(int(os.environ.get("QLR_REMAT", "0")))
# QLR_PRECISION=bfloat16 trains + evaluates through training.precision
PRECISION = os.environ.get("QLR_PRECISION", "float32")
EVAL_DEVICES = int(os.environ.get("QLR_EVAL_DEVICES", "0"))


def make_cfg(ws: str) -> str:
    """The chosen cfg rewritten to 3 classes at SIZE (filters=(5+3)*3=24)."""
    text = open(os.path.join(REPO, CFG)).read()
    text = re.sub(r"(?m)^width=\d+", f"width={SIZE}", text)
    text = re.sub(r"(?m)^height=\d+", f"height={SIZE}", text)
    text = text.replace("classes=80", "classes=3")
    # the conv feeding each [yolo] head must emit (5+3)*3 channels
    text = text.replace("filters=255", "filters=24")
    path = os.path.join(ws, "model3.cfg")
    open(path, "w").write(text)
    return path


def main():
    ws = tempfile.mkdtemp(prefix="qlr_")
    cfg_path = make_cfg(ws)
    dataset = {
        "kind": {
            "type": "Csv",
            "image_size": SIZE,
            "image_dir": os.path.join(FIXTURE, "images"),
            "label_file": os.path.join(FIXTURE, "label.csv"),
            "classes_file": os.path.join(FIXTURE, "classes.txt"),
            "input_channels": 3,
        }
    }
    train_cfg = {
        "version": "0.1.0",
        "model": {"kind": "Darknet", "cfg_file": cfg_path},
        "dataset": dataset,
        "preprocessor": {
            "cache": {"method": "MemoryCache"},
            "mixup": {"mosaic_prob": MOSAIC},
            "color_jitter": {"hue_shift": 0.02, "saturation_shift": 0.2,
                             "value_shift": 0.2},
            "random_affine": {"horizontal_flip_prob": 0.5,
                              "translation_prob": 0.3, "translation": 0.1,
                              "scale_prob": 0.3, "scale": [0.8, 1.2]},
            "workers": 2,
        },
        "logging": {"dir": os.path.join(ws, "logs")},
        "training": {
            "batch_size": BATCH,
            "optimizer": {
                "type": "adam", "momentum": 0.937, "weight_decay": 0.0,
                "lr_schedule": (
                    {"type": "StepWise",
                     "steps": [[0, LR], [int(STEPS * DECAY_AT), LR / 10]]}
                    if DECAY_AT else {"type": "Constant", "lr": LR}
                ),
            },
            "save_checkpoint_steps": STEPS,
            "remat": REMAT,
            "precision": PRECISION,
            "loss": {"box_metric": "CIoU",
                     "match_grid_method": "Rect4",
                     "anchor_scale_thresh": 4.0},
        },
        "benchmark": {"nms_iou_thresh": 0.45, "nms_conf_thresh": 0.2},
    }
    train_path = os.path.join(ws, "train.json5")
    json.dump(train_cfg, open(train_path, "w"))

    detect_cfg = {
        "version": "0.1.0",
        "model": {"kind": "Darknet", "cfg_file": cfg_path,
                  # eval batch must divide by the eval device count
                  "minibatch_size": EVAL_DEVICES or 3},
        "input": dataset,
        "output": {"output_dir": os.path.join(ws, "out"),
                   "nms_iou_thresh": 0.45, "nms_conf_thresh": 0.2},
    }
    detect_path = os.path.join(ws, "detect.json5")
    json.dump(detect_cfg, open(detect_path, "w"))

    env = dict(os.environ)
    # Prepend (not replace): the session's PYTHONPATH carries the
    # sitecustomize that registers the axon TPU backend.
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")

    def run(mod, *args):
        out = subprocess.run(
            [sys.executable, "-m", mod, *args], env=env, cwd=REPO,
            capture_output=True, text=True)
        if out.returncode != 0:
            print(out.stdout[-2000:])
            print(out.stderr[-4000:])
            raise SystemExit(f"{mod} failed rc={out.returncode}")
        return out.stdout

    def eval_map(ckpt=""):
        args = ["--config-file", detect_path, "--conf-thresh", "0.01",
                "--precision", PRECISION]
        if EVAL_DEVICES:
            args += ["--devices", str(EVAL_DEVICES)]
        if ckpt:
            args += ["--checkpoint", ckpt]
        out = run("yolodl_tpu.cli.eval_main", *args)
        line = [l for l in out.splitlines() if l.startswith("{")][-1]
        return float(json.loads(line)["mAP@0.5"]), out

    t0 = time.time()
    map_before, _ = eval_map()
    print(f"mAP@0.5 before training (random weights): {map_before:.3f}",
          flush=True)

    out = run("yolodl_tpu.cli.train_main",
              "--config-file", train_path, "--max-steps", str(STEPS))
    tail = [l for l in out.splitlines() if l.startswith("step ")][-3:]
    print("\n".join(tail), flush=True)

    runs = sorted(os.listdir(os.path.join(ws, "logs")))
    ckpt_dir = os.path.join(ws, "logs", runs[-1], "checkpoints")
    ckpt = os.path.join(ckpt_dir, sorted(os.listdir(ckpt_dir))[-1])
    map_after, eval_out = eval_map(ckpt)
    print(eval_out.strip(), flush=True)
    print(json.dumps({
        "metric": "real-photo overfit mAP@0.5 via train+eval CLIs "
                  f"({os.path.splitext(os.path.basename(CFG))[0]}-{SIZE}, "
                  f"3 classes, {STEPS} steps)",
        "before": map_before, "after": map_after,
        "seconds": round(time.time() - t0, 1),
    }), flush=True)


if __name__ == "__main__":
    main()
