"""Detection CLI: ``python -m yolodl_tpu.cli.detect_main --config-file detect.json5``.

Equivalent capability to the reference ``detect`` crate (detect/src/main.rs):
batch inference over a dataset, NMS + per-instance class selection, then
draw ground truth (yellow) and predictions (per-class colors) and save
JPEGs into the output dir (:108-213).  Drawing is PIL-based (the reference
uses OpenCV; host-side drawing is not perf-critical — SURVEY §2.7).
"""

from __future__ import annotations

import argparse
import os


def main(argv=None):
    parser = argparse.ArgumentParser(description="yolodl_tpu detector")
    parser.add_argument("--config-file", required=True)
    parser.add_argument("--weights", default="", help="darknet .weights file")
    parser.add_argument("--checkpoint", default="", help="framework .ckpt file")
    parser.add_argument("--limit", type=int, default=0, help="max images (0 = all)")
    parser.add_argument("--devices", type=int, default=0,
                        help="shard inference batches over N devices (0 = single)")
    parser.add_argument("--save-json", default="",
                        help="also write COCO-format detections (original "
                             "pixel coordinates) to this file")
    parser.add_argument("--precision", default="float32",
                        help="forward-pass compute dtype (float32/bfloat16, "
                             "same aliases as training.precision); bfloat16 "
                             "is the serving path's production precision "
                             "(params stay f32)")
    parser.add_argument("--artifact", default="",
                        help="run an exported StableHLO artifact dir "
                             "(yolo-tool export) instead of building the "
                             "model; --weights/--checkpoint/--devices do "
                             "not apply")
    args = parser.parse_args(argv)

    import jax
    import jax.numpy as jnp
    import numpy as np
    from PIL import Image

    from ..config.app_config import DetectAppConfig, compute_dtype_of
    from ..data import SanitizedDataset, make_decode_loader
    from ..data.letterbox import letterbox_unit_transform
    from ..loss import non_max_suppression, yolo_inference
    from ..loss.inference import to_host_detections
    from ..train.logging import draw_boxes_on_image

    config = DetectAppConfig.load(args.config_file)
    base_dir = os.path.dirname(os.path.abspath(args.config_file))
    model_path = os.path.join(base_dir, config.model_file)

    artifact_infer = None
    params = state = model = None
    if args.artifact:
        if args.weights or args.checkpoint or args.devices:
            raise ValueError(
                "--artifact bakes the weights in and fixes the device "
                "program; --weights/--checkpoint/--devices do not apply")
        from ..models.export import load_exported

        artifact_infer, meta = load_exported(args.artifact)
        artifact_nhwc = meta.get("data_format") == "NHWC"
        artifact_px = meta["input_shape"][1 if artifact_nhwc else -1]
        if artifact_px != config.dataset.image_size:
            raise ValueError(
                f"artifact expects {artifact_px}px input but the "
                f"config dataset is {config.dataset.image_size}px")
        artifact_dtype = jnp.dtype(meta["input_dtype"])
    else:
        from ._common import build_model

        model, params, state, model_path = build_model(
            config, base_dir, weights=args.weights,
            checkpoint=args.checkpoint)

    dataset = SanitizedDataset(
        config.dataset.open(base_dir),
        out_of_bound_tolerance=config.out_of_bound_tolerance,
        min_bbox_size=config.min_bbox_size,
        bbox_scaling=config.bbox_scaling,
    )
    size = config.dataset.image_size
    loader = make_decode_loader((size, size))
    os.makedirs(config.output_dir, exist_ok=True)

    # two-stage jit: NMS fused into the conv program inherits layouts that
    # send XLA's TopK down a slow path on TPU (see CLAUDE.md perf ledger)
    if artifact_infer is None:
        compute_dtype = compute_dtype_of(args.precision)

        @jax.jit
        def forward(params, state, images):
            if compute_dtype is not None:
                images = images.astype(compute_dtype)
            pred, _ = model.apply(params, state, images, train=False)
            return pred
    else:
        if compute_dtype_of(args.precision) is not None:
            raise ValueError(
                "--precision does not apply to --artifact runs: the "
                "artifact's compute dtype was fixed at export time")

        def forward(params, state, images):
            # loader yields float [0,1] NCHW; a serving artifact ingests
            # uint8 pixels (the /255 normalize is baked into its program) —
            # a bare astype(uint8) would truncate [0,1] floats to all-zeros
            if artifact_dtype == jnp.uint8:
                x = jnp.round(images * 255.0).astype(jnp.uint8)
            else:
                x = images.astype(artifact_dtype)
            if artifact_nhwc:  # loader yields NCHW batches
                x = jnp.transpose(x, (0, 2, 3, 1))
            return artifact_infer(x)

    # honor the model cfg's nms_kind + beta_nms (yolo.rs NmsKind; e.g.
    # yolov4-csp, cspx-p7 declare nms_kind=diounms; with --artifact the
    # cfg may be absent and greedy defaults apply)
    from ._common import nms_options

    nms_kind, nms_beta = nms_options(config, model_path)

    @jax.jit
    def postprocess(pred):
        nms = non_max_suppression(
            pred,
            iou_threshold=config.nms_iou_thresh,
            confidence_threshold=config.nms_conf_thresh,
            suppress_by_class=False,
            class_mode="argmax",
            kind=nms_kind,
            beta=nms_beta,
        )
        return yolo_inference(nms, pred.num_flats)

    def infer(params, state, images):
        return postprocess(forward(params, state, images))

    # multi-device: replicate params, shard the batch axis — the reference
    # replicates the model per device and fans a shared stream out
    # (detect/src/main.rs:44-67); under SPMD this is just sharding metadata
    n_devices = args.devices or config.n_devices
    if artifact_infer is not None and n_devices > 1:
        # the exported program was compiled for one device; sharding its
        # inputs would contradict the '--devices do not apply' contract
        raise ValueError(
            "--artifact runs the exported single-device program; the "
            f"config's {n_devices}-device block does not apply (re-export "
            "per device or use the live-model path for DP detect)")
    if n_devices > 1:
        from ..parallel import make_dp_shardings

        replicated, batch_sharded = make_dp_shardings(n_devices)
        params = jax.device_put(params, replicated)
        state = jax.device_put(state, replicated)
        place_batch = lambda x: jax.device_put(x, batch_sharded)
    else:
        place_batch = lambda x: x

    palette = [
        (1.0, 0.2, 0.2), (0.2, 1.0, 0.2), (0.2, 0.4, 1.0), (1.0, 0.6, 0.1),
        (0.8, 0.2, 1.0), (0.1, 0.9, 0.9),
    ]

    batch_size = config.minibatch_size
    if artifact_infer is not None:
        batch_size = meta["input_shape"][0]  # the artifact's compiled batch
        if batch_size != config.minibatch_size:
            print(f"artifact batch {batch_size} overrides "
                  f"minibatch_size {config.minibatch_size}")
    records = dataset.records()
    if args.limit:
        records = records[: args.limit]
    count = 0
    json_results = []
    for start in range(0, len(records), batch_size):
        chunk = records[start : start + batch_size]
        decoded = [loader.load(r) for r in chunk]
        # pad the trailing batch so jit sees a fixed shape
        while len(decoded) < batch_size:
            decoded.append(decoded[-1])
        images = place_batch(jnp.asarray(np.stack([d.image for d in decoded])))
        out = infer(params, state, images)
        dets = to_host_detections(out)
        for i, rec in enumerate(chunk):
            canvas = decoded[i].image.copy()
            # ground truth in yellow (main.rs draws GT yellow)
            if len(decoded[i].boxes):
                cy, cx, h, w = (decoded[i].boxes[:, k] for k in range(4))
                gt_tlbr = np.stack([cy - h / 2, cx - w / 2, cy + h / 2, cx + w / 2], -1)
                canvas = draw_boxes_on_image(canvas, gt_tlbr, color=(1.0, 1.0, 0.0))
            for det in dets[i]:
                color = palette[det["class"] % len(palette)]
                canvas = draw_boxes_on_image(
                    canvas, np.asarray([det["tlbr"]]), color=color
                )
            out_path = os.path.join(config.output_dir, f"{start + i:06d}.jpg")
            Image.fromarray(
                (np.clip(np.transpose(canvas, (1, 2, 0)), 0, 1) * 255).astype(np.uint8)
            ).save(out_path, quality=92)
            if args.save_json:
                # map letterbox-frame ratio boxes back to original pixel
                # coords (the reference's inverse transform, detect main:169)
                inv = letterbox_unit_transform(
                    (rec.height, rec.width), (size, size)
                ).inverse()
                tlbrs = inv.apply_tlbr(np.asarray(
                    [det["tlbr"] for det in dets[i]], np.float64
                ).reshape(-1, 4))
                for det, (ot, ol, ob, orr) in zip(dets[i], tlbrs):
                    x_px = float(ol * rec.width)
                    y_px = float(ot * rec.height)
                    w_px = float((orr - ol) * rec.width)
                    h_px = float((ob - ot) * rec.height)
                    json_results.append({
                        "image_id": start + i,
                        "file_name": os.path.basename(rec.path),
                        "category_id": det["class"],
                        "bbox": [round(x_px, 2), round(y_px, 2),
                                 round(w_px, 2), round(h_px, 2)],
                        "score": round(det["confidence"], 5),
                    })
            count += 1
    if args.save_json:
        import json as json_mod

        with open(args.save_json, "w") as f:
            json_mod.dump(json_results, f)
        print(f"wrote {len(json_results)} detections to {args.save_json}")
    print(f"wrote {count} images to {config.output_dir}")


def cli():
    """Console-script entry (pyproject [project.scripts]): guarded main."""
    from ._guard import run
    run(main)


if __name__ == "__main__":
    cli()
