"""Classifier train/eval CLI — darknet classification cfgs end-to-end.

Beyond-reference capability (the reference cannot build classifier cfgs at
all): trains any darknet classification network (cifar, darknet19/53,
alexnet, vgg, resnet, ...) with the cross-entropy step of
``train/classifier.py`` on a CSV-labelled image folder, and evaluates
top-1 accuracy.

Config (JSON5):
    {
      "version": "0.1.0",
      "model": {"kind": "Darknet", "cfg_file": "cifar.cfg"},
      "dataset": {"image_dir": ".", "label_file": "labels.csv",
                  "classes_file": "classes.txt"},
      "logging": {"dir": "logs"},
      "training": {"batch_size": 32, "save_checkpoint_steps": 100,
                   "optimizer": {"momentum": 0.9,
                                 "lr_schedule": {"type": "Constant", "lr": 0.001}}}
    }

label_file rows: ``image_file,class_name``.  Images are letterboxed to the
cfg's input size.  ``--eval`` computes dataset top-1 accuracy from the most
recent checkpoint instead of training.
"""

from __future__ import annotations

import argparse
import csv
import os
import time


def _load_records(image_dir: str, label_file: str, classes):
    class_to_id = {name: i for i, name in enumerate(classes)}
    records = []
    with open(label_file) as f:
        for row in csv.DictReader(f):
            name = row["class_name"].strip()
            if name not in class_to_id:
                raise ValueError(f"unknown class {name!r} in {label_file}")
            records.append((os.path.join(image_dir, row["image_file"].strip()),
                            class_to_id[name]))
    if not records:
        raise ValueError(f"no rows in {label_file}")
    return records


def main(argv=None):
    parser = argparse.ArgumentParser(prog="yolodl-classify")
    parser.add_argument("--config-file", required=True)
    parser.add_argument("--max-steps", type=int, default=0)
    parser.add_argument("--eval", action="store_true",
                        help="evaluate top-1 accuracy from the most recent "
                             "checkpoint instead of training")
    parser.add_argument("--topk", type=int, default=5,
                        help="also report top-K accuracy with --eval "
                             "(darknet validate_classifier's topk; 1 = off)")
    args = parser.parse_args(argv)

    import json5
    import numpy as np

    import jax
    import jax.numpy as jnp

    from ..config.app_config import _check_version
    from ..data.cache import make_decode_loader
    from ..data.records import FileRecord
    from ..models.zoo import load_darknet_classifier
    from ..train import LrScheduleConfig, TrainConfig, TrainState
    from ..train.checkpoint import (
        load_recent_checkpoint_in_runs,
        save_checkpoint,
    )
    from ..train.classifier import make_classifier_train_step
    from ..train.loop import make_optimizer

    base_dir = os.path.dirname(os.path.abspath(args.config_file))
    with open(args.config_file) as f:
        raw = json5.load(f)
    _check_version(raw, args.config_file)

    def resolve(p):
        return p if os.path.isabs(p) else os.path.join(base_dir, p)

    cfg_file = resolve(raw["model"]["cfg_file"])
    ds = raw["dataset"]
    classes = [
        line.strip() for line in open(resolve(ds["classes_file"]))
        if line.strip()
    ]
    records = _load_records(resolve(ds.get("image_dir", ".")),
                            resolve(ds["label_file"]), classes)

    model, params, state = load_darknet_classifier(cfg_file)
    from ..config import darknet_cfg as dk

    darknet = dk.Darknet.load(cfg_file)
    in_h, in_w, _ = darknet.net.input_shape_hwc
    loader = make_decode_loader((in_h, in_w))

    training = raw.get("training", {})
    opt_raw = training.get("optimizer", {})
    lr_cfg = LrScheduleConfig.parse(opt_raw.get("lr_schedule", opt_raw.get("lr")))
    if lr_cfg.kind == "from_model_cfg":
        # adopt the darknet [net] policy (burn_in + steps/poly/sig/sgdr...)
        from ..train.lr_schedule import lr_schedule_from_darknet

        lr_cfg = lr_schedule_from_darknet(darknet.net)
    from ..config.app_config import compute_dtype_of

    compute_dtype = compute_dtype_of(
        training.get("precision", "float32"), args.config_file)
    config = TrainConfig(
        lr=lr_cfg,
        optimizer=str(opt_raw.get("type", "adam")).lower(),
        momentum=float(opt_raw.get("momentum", 0.937)),
        weight_decay=float(opt_raw.get("weight_decay", 0.0)),
        compute_dtype=compute_dtype,
    )
    optimizer = make_optimizer(config)
    opt_state = optimizer.init(params)
    ts = TrainState(params, state, opt_state, jnp.zeros((), jnp.int32), None)

    log_dir = resolve(raw.get("logging", {}).get("dir", "classify_logs"))
    run_dir = os.path.join(log_dir, time.strftime("%Y-%m-%d-%H-%M-%S"))
    ckpt_dir = os.path.join(run_dir, "checkpoints")

    def load_batch(batch_records):
        images = np.stack([loader.load(FileRecord(
            path=p, height=0, width=0,
            boxes_pixel=np.zeros((0, 4), np.float32),
            classes=np.zeros((0,), np.int32),
        )).image for p, _ in batch_records])
        labels = np.asarray([lbl for _, lbl in batch_records], np.int32)
        return jnp.asarray(images), jnp.asarray(labels)

    if args.eval:
        restored = load_recent_checkpoint_in_runs(log_dir, ts.params, ts.state,
                                                  ts.opt_state)
        if restored is not None:
            p2, s2, _, meta = restored
            ts = TrainState(p2, s2, ts.opt_state, ts.step, None)
            print(f"restored checkpoint at step {meta['step']}")
        else:
            print(f"no checkpoint found under {log_dir} — "
                  "evaluating the fresh initialization")

        # darknet's validate_classifier reports top-1 AND top-k
        # (classifier.c: topk_accuracy with [net] top, default 5)
        k = max(1, min(int(args.topk), len(classes)))

        @jax.jit
        def infer(params, state, images):
            # evaluate in the dtype actually trained/deployed (the same
            # follows-training-precision rule as the detection evaluator)
            if compute_dtype is not None:
                images = images.astype(compute_dtype)
            out, _ = model.apply(params, state, images, train=False)
            flat = out.reshape(out.shape[0], -1)
            return jax.lax.top_k(flat, k)[1]

        batch_size = int(training.get("batch_size", 32))
        correct = correct_k = total = 0
        for i in range(0, len(records), batch_size):
            chunk = records[i:i + batch_size]
            n_real = len(chunk)
            # pad the tail chunk to the full batch shape (repeat the last
            # record) so the jitted program compiles ONCE — a second shape
            # is a whole extra multi-minute compile on remote TPUs (same
            # discipline as train/evaluation.py)
            chunk = chunk + [chunk[-1]] * (batch_size - n_real)
            images, labels = load_batch(chunk)
            topk = np.asarray(infer(ts.params, ts.state, images))[:n_real]
            labels = np.asarray(labels)[:n_real]
            correct += int((topk[:, 0] == labels).sum())
            correct_k += int((topk == labels[:, None]).any(-1).sum())
            total += n_real
        print(f"top-1 accuracy: {correct / total:.4f} ({correct}/{total})")
        if k > 1:
            print(f"top-{k} accuracy: {correct_k / total:.4f} "
                  f"({correct_k}/{total})")
        return

    os.makedirs(ckpt_dir, exist_ok=True)
    step_fn = make_classifier_train_step(model, optimizer, config)
    batch_size = int(training.get("batch_size", 32))
    save_steps = int(training.get("save_checkpoint_steps", 0))
    if len(records) < batch_size:
        raise ValueError(
            f"dataset has {len(records)} records < batch_size {batch_size} "
            "— no full batch can ever be formed")

    rng = np.random.default_rng(0)
    step = 0
    while True:
        order = rng.permutation(len(records))
        for i in range(0, len(order) - batch_size + 1, batch_size):
            batch_records = [records[j] for j in order[i:i + batch_size]]
            images, labels = load_batch(batch_records)
            ts, metrics = step_fn(ts, images, labels)
            # step tracked host-side (a device readout costs a network
            # round trip on remote TPUs); one transfer for all metrics
            metrics = jax.device_get(metrics)
            step += 1
            loss = float(metrics["loss"])
            if not np.isfinite(loss):
                raise RuntimeError(f"non-finite loss at step {step}")
            if step % 10 == 0 or step == 1:
                print(f"step {step}  loss {loss:.5f}  "
                      f"acc {float(metrics['accuracy']):.3f}")
            if save_steps and step % save_steps == 0:
                save_checkpoint(ckpt_dir, step, loss, ts.params, ts.state,
                                ts.opt_state)
            if args.max_steps and step >= args.max_steps:
                save_checkpoint(ckpt_dir, step, loss, ts.params, ts.state,
                                ts.opt_state)
                return


def cli():
    """Console-script entry (pyproject [project.scripts]): guarded main."""
    from ._guard import run
    run(main)


if __name__ == "__main__":
    cli()
