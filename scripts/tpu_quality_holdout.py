"""HELD-OUT generalization quality run through the production CLIs.

Every other quality record (tpu_quality_loop.py, tpu_quality_real.py)
evaluates on the images it trained on — overfit demonstrations that prove
the plumbing, not learning.  This script is the generalization version:

    generate train/val splits of *distinct* synthetic scenes
    → train CLI on the train split (full host pipeline, TPU step)
    → eval CLI on the VAL split the model never saw

Scenes: 1-4 objects per image on a low-frequency noise background; class
is defined by SHAPE (disk / square / triangle) while color, size, position
and background vary randomly — so a model scoring on the val split has
learned shape, not memorized pixels.  The val split uses a disjoint RNG
stream; no image is shared.

Run under axon:  python scripts/tpu_quality_holdout.py
Knobs: QLH_STEPS (1500), QLH_SIZE (320), QLH_BATCH (16),
QLH_TRAIN (240 images), QLH_VAL (60), QLH_CFG (yolov4-tiny),
QLH_PRECISION (bfloat16 — the production training precision),
QLH_LR (0.001), QLH_SEED (0).

QLH_SEGMENTS=N splits training into N sequential train-CLI invocations
(FromRecent + exact data-order resume makes them semantically one run).
Needed on the axon tunnel: its client permanently retains every
host→device transfer buffer (measured: +8.9 MB RSS per 8.9 MB device_put,
unfixable process-side), so a long device-augment run leaks one pack per
step and the OOM killer ends it; fresh processes bound the leak.

QLH_RICH=1 switches to the flagship protocol: 8 shape classes,
crowded scenes (2-9 objects), a wide scale spread (0.05-0.45 of the
image side), and real occlusion (later shapes may overlay earlier
ones; GT boxes stay amodal) — the richer generator the flagship
held-out record uses (yolov4-csp 608).
"""

import json
import os
import subprocess
import sys
import tempfile
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

STEPS = int(os.environ.get("QLH_STEPS", "1500"))
SIZE = int(os.environ.get("QLH_SIZE", "320"))
BATCH = int(os.environ.get("QLH_BATCH", "16"))
N_TRAIN = int(os.environ.get("QLH_TRAIN", "240"))
N_VAL = int(os.environ.get("QLH_VAL", "60"))
CFG = os.environ.get("QLH_CFG", "cfg/darknet/yolov4-tiny.cfg")
PRECISION = os.environ.get("QLH_PRECISION", "bfloat16")
LR = float(os.environ.get("QLH_LR", "0.001"))
SEED = int(os.environ.get("QLH_SEED", "0"))
RICH = os.environ.get("QLH_RICH", "0") == "1"
SEGMENTS = int(os.environ.get("QLH_SEGMENTS", "1"))
# QLH_LOSS_IMPL=Darknet trains through the oracle-exact delta loss
# (training.loss.impl) — the round-5 evidence weld: held-out
# generalization AND oracle exactness from the same trainer
LOSS_IMPL = os.environ.get("QLH_LOSS_IMPL", "Production")
# QLH_EMA=1 enables the EMA parameter shadow (training.ema); eval then
# measures the EMA weights via --ema
EMA = os.environ.get("QLH_EMA", "0") == "1"

CLASSES = (["disk", "square", "triangle", "ring", "cross", "star",
            "diamond", "bar"] if RICH
           else ["disk", "square", "triangle"])


def _background(rng, size):
    """Low-frequency colored gradient + broadband noise."""
    coarse = rng.uniform(0, 255, (4, 4, 3))
    from PIL import Image

    bg = np.asarray(
        Image.fromarray(coarse.astype(np.uint8)).resize(
            (size, size), Image.BILINEAR),
        np.float32)
    bg += rng.normal(0, 18, bg.shape)
    return bg


def _draw_scene(rng, size):
    """One scene → (uint8 HWC image, list of (class_idx, cy, cx, h, w))."""
    from PIL import Image, ImageDraw

    img = Image.fromarray(
        np.clip(_background(rng, size), 0, 255).astype(np.uint8))
    draw = ImageDraw.Draw(img)
    labels = []
    lo, hi = (2, 10) if RICH else (1, 5)
    smin, smax = (0.05, 0.45) if RICH else (0.12, 0.38)
    for _ in range(int(rng.integers(lo, hi))):
        cls = int(rng.integers(0, len(CLASSES)))
        s = int(rng.uniform(smin, smax) * size)  # object side/diameter
        s = max(s, 8)
        # rich mode: half the placements ignore the spacing constraint,
        # so later shapes genuinely occlude earlier ones (GT stays amodal)
        occlude = RICH and rng.uniform() < 0.5
        for _try in range(8):
            cy = rng.uniform(s / 2 + 2, size - s / 2 - 2)
            cx = rng.uniform(s / 2 + 2, size - s / 2 - 2)
            if occlude or all(
                    max(abs(cy - py), abs(cx - px)) > 0.6 * (s + ps) / 2
                    for _, py, px, ps, _w in labels):
                break
        else:
            continue  # crowded scene — skip this object
        color = tuple(int(c) for c in rng.integers(40, 256, 3))
        t, l = cy - s / 2, cx - s / 2
        w = float(s)
        if cls == 0:
            draw.ellipse([l, t, l + s, t + s], fill=color)
        elif cls == 1:
            draw.rectangle([l, t, l + s, t + s], fill=color)
        elif cls == 2:  # triangle inscribed in the box
            draw.polygon(
                [(cx, t), (l, t + s), (l + s, t + s)], fill=color)
        elif cls == 3:  # ring: annulus with a hole ~45% of the diameter
            draw.ellipse([l, t, l + s, t + s], fill=color)
            h2 = 0.45 * s / 2
            draw.ellipse([cx - h2, cy - h2, cx + h2, cy + h2],
                         fill=tuple(int(c) for c in rng.integers(0, 256, 3)))
        elif cls == 4:  # cross / plus sign
            a = s * 0.30
            draw.rectangle([cx - a / 2, t, cx + a / 2, t + s], fill=color)
            draw.rectangle([l, cy - a / 2, l + s, cy + a / 2], fill=color)
        elif cls == 5:  # 5-point star
            pts = []
            for k in range(10):
                r = (s / 2) if k % 2 == 0 else (s / 2) * 0.42
                ang = -np.pi / 2 + k * np.pi / 5
                pts.append((cx + r * np.cos(ang), cy + r * np.sin(ang)))
            draw.polygon(pts, fill=color)
        elif cls == 6:  # diamond (square rotated 45°)
            draw.polygon([(cx, t), (l + s, cy), (cx, t + s), (l, cy)],
                         fill=color)
        else:  # bar: wide, short rectangle (aspect ~3:1)
            h = max(8.0, s / 3.0)
            draw.rectangle([l, cy - h / 2, l + s, cy + h / 2], fill=color)
            labels.append((cls, cy, cx, h, w))
            continue
        labels.append((cls, cy, cx, float(s), w))
    return np.asarray(img), labels


def make_split(rng, out_dir, n, prefix):
    from PIL import Image

    img_dir = os.path.join(out_dir, "images")
    os.makedirs(img_dir, exist_ok=True)
    rows = ["image_file,class_name,cy,cx,h,w"]
    for i in range(n):
        arr, labels = _draw_scene(rng, SIZE)
        name = f"{prefix}{i:04d}.png"
        Image.fromarray(arr).save(os.path.join(img_dir, name))
        for cls, cy, cx, h, w in labels:
            rows.append(
                f"{name},{CLASSES[cls]},{cy:.1f},{cx:.1f},{h:.1f},{w:.1f}")
    label_file = os.path.join(out_dir, "label.csv")
    open(label_file, "w").write("\n".join(rows) + "\n")
    classes_file = os.path.join(out_dir, "classes.txt")
    open(classes_file, "w").write("\n".join(CLASSES) + "\n")
    return {
        "kind": {
            "type": "Csv", "image_size": SIZE, "input_channels": 3,
            "image_dir": img_dir, "label_file": label_file,
            "classes_file": classes_file,
        }
    }


def make_cfg(ws):
    import re

    text = open(os.path.join(REPO, CFG)).read()
    text = re.sub(r"(?m)^width=\d+", f"width={SIZE}", text)
    text = re.sub(r"(?m)^height=\d+", f"height={SIZE}", text)
    text = text.replace("classes=80", f"classes={len(CLASSES)}")
    text = text.replace("filters=255", f"filters={(5 + len(CLASSES)) * 3}")
    path = os.path.join(ws, "model3.cfg")
    open(path, "w").write(text)
    return path


def main():
    ws = tempfile.mkdtemp(prefix="qlh_")
    cfg_path = make_cfg(ws)
    # disjoint RNG streams per split — no scene is shared
    train_ds = make_split(np.random.default_rng(SEED),
                          os.path.join(ws, "train"), N_TRAIN, "t")
    val_ds = make_split(np.random.default_rng(SEED + 10_000),
                        os.path.join(ws, "val"), N_VAL, "v")

    train_cfg = {
        "version": "0.1.0",
        "model": {"kind": "Darknet", "cfg_file": cfg_path},
        "dataset": train_ds,
        "preprocessor": {
            "cache": {"method": "MemoryCache"},
            "mixup": {"mosaic_prob": 0.25},
            "color_jitter": {"hue_shift": 0.02, "saturation_shift": 0.2,
                             "value_shift": 0.2},
            "random_affine": {"horizontal_flip_prob": 0.5,
                              "translation_prob": 0.3, "translation": 0.1,
                              "scale_prob": 0.3, "scale": [0.8, 1.2]},
            "workers": 2,
            # QLH_DEVICE_AUG=1: run the batched augmentation program on
            # the TPU (pipeline.device=tpu).  At 608² the host pipeline
            # tops out ~2.4 records/s/core with this augment set
            # (scripts/bench_device_augment.py) — a one-core host would
            # data-bound the flagship run by hours; the separable device
            # program costs ~30 ms/batch.
            **({"pipeline": {"device": "tpu"}}
               if os.environ.get("QLH_DEVICE_AUG", "0") == "1" else {}),
        },
        "logging": {"dir": os.path.join(ws, "logs")},
        "training": {
            "batch_size": BATCH,
            "optimizer": {
                "type": "adam", "momentum": 0.937, "weight_decay": 0.0,
                "lr_schedule": {"type": "StepWise",
                                "steps": [[0, LR], [int(STEPS * 0.7), LR / 10]]},
            },
            "save_checkpoint_steps": -(-STEPS // SEGMENTS),
            **({"load_checkpoint": {"type": "FromRecent"}}
               if SEGMENTS > 1 else {}),
            "precision": PRECISION,
            "loss": {"box_metric": "CIoU", "match_grid_method": "Rect4",
                     "anchor_scale_thresh": 4.0, "impl": LOSS_IMPL},
            **({"ema": {"enabled": True}} if EMA else {}),
        },
        "benchmark": {"nms_iou_thresh": 0.45, "nms_conf_thresh": 0.2},
    }
    train_path = os.path.join(ws, "train.json5")
    json.dump(train_cfg, open(train_path, "w"))

    detect_cfg = {
        "version": "0.1.0",
        "model": {"kind": "Darknet", "cfg_file": cfg_path,
                  "minibatch_size": 6},
        "input": val_ds,
        "output": {"output_dir": os.path.join(ws, "out"),
                   "nms_iou_thresh": 0.45, "nms_conf_thresh": 0.2},
    }
    detect_path = os.path.join(ws, "detect.json5")
    json.dump(detect_cfg, open(detect_path, "w"))

    env = dict(os.environ)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")

    def run(mod, *args):
        out = subprocess.run([sys.executable, "-m", mod, *args],
                             env=env, cwd=REPO, capture_output=True,
                             text=True)
        if out.returncode:
            sys.stderr.write(out.stdout[-4000:] + out.stderr[-4000:])
            raise SystemExit(f"{mod} failed rc={out.returncode}")
        return out.stdout

    def eval_map(ckpt=""):
        args = ["--config-file", detect_path, "--conf-thresh", "0.01",
                "--precision", PRECISION]
        if ckpt:
            args += ["--checkpoint", ckpt]
            if EMA:
                args += ["--ema"]
        out = run("yolodl_tpu.cli.eval_main", *args)
        line = [l for l in out.splitlines() if l.startswith("{")][-1]
        d = json.loads(line)
        return float(d["mAP@0.5"]), float(d["mAP@0.5:0.95"]), out

    t0 = time.time()
    m0, _, _ = eval_map()
    print(f"held-out mAP@0.5 before training: {m0:.3f}", flush=True)

    seg = -(-STEPS // SEGMENTS)
    for s in range(SEGMENTS):
        until = min((s + 1) * seg, STEPS)
        out = run("yolodl_tpu.cli.train_main",
                  "--config-file", train_path, "--max-steps", str(until))
        print(f"[segment {s + 1}/{SEGMENTS} → step {until}]", flush=True)
        print("\n".join([l for l in out.splitlines()
                         if l.startswith("step ")][-2:]), flush=True)

    runs = sorted(os.listdir(os.path.join(ws, "logs")))
    ckpt_dir = os.path.join(ws, "logs", runs[-1], "checkpoints")
    ckpt = os.path.join(ckpt_dir, sorted(os.listdir(ckpt_dir))[-1])
    m1, m1s, eval_out = eval_map(ckpt)
    print(eval_out.strip(), flush=True)
    print(json.dumps({
        "metric": "HELD-OUT val mAP@0.5 via train+eval CLIs "
                  f"({os.path.basename(CFG)} {SIZE}px, {N_TRAIN} train / "
                  f"{N_VAL} unseen val scenes, {STEPS} steps, {PRECISION}, "
                  f"loss={LOSS_IMPL}{', ema' if EMA else ''})",
        "map50_before": round(m0, 4),
        "map50_after": round(m1, 4),
        "map5095_after": round(m1s, 4),
        "wall_s": round(time.time() - t0, 1),
        "workspace": ws,
    }), flush=True)


if __name__ == "__main__":
    main()
