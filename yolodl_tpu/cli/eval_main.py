"""Evaluation CLI: dataset mAP.

    python -m yolodl_tpu.cli.eval_main --config-file detect.json5 \
        [--weights w.weights | --checkpoint c.ckpt] [--limit N]

Runs batch inference + NMS over the configured dataset and reports COCO
101-point AP@0.5 and mAP@0.5:0.95.  The reference has only in-training
benchmark telemetry and an AP calculator library (average_precision.rs) —
no standalone evaluation entry point; this closes that gap.
"""

from __future__ import annotations

import argparse
import json
import os


def main(argv=None):
    parser = argparse.ArgumentParser(description="yolodl_tpu evaluator")
    parser.add_argument("--config-file", required=True,
                        help="detect.json5-style config")
    parser.add_argument("--weights", default="")
    parser.add_argument("--checkpoint", default="")
    parser.add_argument("--limit", type=int, default=0)
    parser.add_argument("--conf-thresh", type=float, default=0.005,
                        help="confidence floor for candidate detections")
    parser.add_argument("--ema", action="store_true",
                        help="evaluate the EMA parameters from the checkpoint")
    parser.add_argument("--per-class", action="store_true",
                        help="include per-class AP@0.5 in the report")
    args = parser.parse_args(argv)

    import jax
    import jax.numpy as jnp
    import numpy as np

    from ..config.app_config import DetectAppConfig
    from ..data import OnDemandLoader, SanitizedDataset
    from ..graph import Graph
    from ..graph.from_darknet import load_darknet_graph
    from ..loss import non_max_suppression, yolo_inference
    from ..loss.average_precision import (
        Detection, GroundTruth, average_precision, coco_map_50_95,
    )
    from ..models import YoloModel
    from ..train.checkpoint import load_checkpoint

    config = DetectAppConfig.load(args.config_file)
    base_dir = os.path.dirname(os.path.abspath(args.config_file))
    model_path = os.path.join(base_dir, config.model_file)

    if config.model_kind == "darknet":
        if args.weights:
            from ..models.zoo import load_darknet_model

            model, params, state = load_darknet_model(model_path, args.weights)
        else:
            model = YoloModel(load_darknet_graph(model_path))
            params, state = model.init(jax.random.PRNGKey(0))
    else:
        model = YoloModel(Graph.load_newslab_v1_json(model_path))
        params, state = model.init(jax.random.PRNGKey(0))
    if args.checkpoint:
        params, state, _, meta = load_checkpoint(args.checkpoint, params, state)
        if args.ema:
            if "ema" not in meta:
                raise SystemExit("checkpoint has no EMA parameters")
            params = meta["ema"]

    dataset = SanitizedDataset(config.dataset.open(base_dir))
    size = config.dataset.image_size
    loader = OnDemandLoader((size, size))

    # two-stage jit (see detect_main: fused-TopK layout pathology on TPU)
    @jax.jit
    def forward(params, state, images):
        pred, _ = model.apply(params, state, images, train=False)
        return pred

    # honor the model cfg's nms_kind + beta_nms (detect_main does the same)
    nms_kind, nms_beta = "greedy", 0.6
    if config.model_kind == "darknet":
        from ..config import darknet_cfg as dk
        from ..loss.nms import nms_options_from_darknet

        nms_kind, nms_beta = nms_options_from_darknet(dk.Darknet.load(model_path))

    @jax.jit
    def postprocess(pred):
        # class_mode="argmax": yolo_inference keeps only each instance's
        # best class anyway, and the full N·C top-k hits XLA's TPU TopK
        # slow path on near-degenerate confidences (see non_max_suppression)
        nms = non_max_suppression(
            pred,
            iou_threshold=config.nms_iou_thresh,
            confidence_threshold=args.conf_thresh,
            suppress_by_class=True,
            class_mode="argmax",
            kind=nms_kind,
            beta=nms_beta,
        )
        return yolo_inference(nms, pred.num_flats)

    def infer(params, state, images):
        return postprocess(forward(params, state, images))

    records = dataset.records()
    if args.limit:
        records = records[: args.limit]
    batch_size = config.minibatch_size

    dets, gts = [], []
    for start in range(0, len(records), batch_size):
        chunk = records[start : start + batch_size]
        decoded = [loader.load(r) for r in chunk]
        while len(decoded) < batch_size:
            decoded.append(decoded[-1])
        images = jnp.asarray(np.stack([d.image for d in decoded]))
        out = infer(params, state, images)
        tlbr = np.asarray(out.tlbr)
        conf = np.asarray(out.confidence)
        classes = np.asarray(out.classes)
        valid = np.asarray(out.valid)
        for i, _rec in enumerate(chunk):
            img_id = start + i
            boxes = decoded[i].boxes
            for (cy, cx, h, w), cls in zip(boxes, decoded[i].classes):
                gts.append(
                    GroundTruth(img_id, int(cls),
                                (cy - h / 2, cx - w / 2, cy + h / 2, cx + w / 2))
                )
            for k in np.nonzero(valid[i])[0]:
                dets.append(
                    Detection(img_id, int(classes[i, k]), float(conf[i, k]),
                              tuple(tlbr[i, k]))
                )

    ap50 = average_precision(dets, gts, iou_threshold=0.5,
                             num_classes=len(dataset.classes))
    map5095 = coco_map_50_95(dets, gts, num_classes=len(dataset.classes))
    result = {
        "images": len(records),
        "detections": len(dets),
        "ground_truths": len(gts),
        "mAP@0.5": round(ap50["mAP"], 4),
        "mAP@0.5:0.95": round(map5095, 4),
    }
    if args.per_class:
        names = list(dataset.classes)
        result["AP@0.5_per_class"] = {
            (names[cid] if cid < len(names) else str(cid)): round(ap, 4)
            for cid, ap in sorted(ap50["per_class"].items())
        }
    print(json.dumps(result))
    return result


def cli():
    """Console-script entry (pyproject [project.scripts]): guarded main."""
    from ._guard import run
    run(main)


if __name__ == "__main__":
    cli()
