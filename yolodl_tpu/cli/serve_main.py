"""Detection serving CLI:

    python -m yolodl_tpu.cli.serve_main --config-file detect.json5 \\
        --port 8650 --batch-size 8 --window-ms 5

Long-lived deployment surface the reference lacks (its ``detect`` crate
is batch-only, detect/src/main.rs): loads the model once, compiles the
fixed-batch forward+NMS program, warms it, then serves HTTP requests with
micro-batching (yolodl_tpu/serve/).  Model/NMS configuration reuses the
``detect.json5`` schema; the ``input`` dataset block supplies the image
size and (when present) class names.
"""

from __future__ import annotations

import argparse
import os


def main(argv=None):
    parser = argparse.ArgumentParser(description="yolodl_tpu detection server")
    parser.add_argument("--config-file", required=True,
                        help="detect.json5 (model + NMS config)")
    parser.add_argument("--weights", default="", help="darknet .weights file")
    parser.add_argument("--checkpoint", default="", help="framework .ckpt file")
    parser.add_argument("--host", default="127.0.0.1")
    parser.add_argument("--port", type=int, default=8650)
    parser.add_argument("--batch-size", type=int, default=8,
                        help="device batch (compiled shape)")
    parser.add_argument("--window-ms", type=float, default=5.0,
                        help="micro-batching window")
    parser.add_argument("--classes-file", default="",
                        help="one class name per line (overrides dataset)")
    parser.add_argument("--devices", type=int, default=1,
                        help="data-parallel serving: shard each batch over "
                             "this many chips (batch_size must divide)")
    parser.add_argument("--artifact", default="",
                        help="serve an exported StableHLO serving artifact "
                             "dir (yolo-tool export --serving) — no model "
                             "build; batch/size come from the artifact")
    args = parser.parse_args(argv)

    from ..config.app_config import DetectAppConfig
    from ..serve import DetectionService, make_http_server
    from ._common import build_model, nms_options

    config = DetectAppConfig.load(args.config_file)
    base_dir = os.path.dirname(os.path.abspath(args.config_file))
    model_path = os.path.join(base_dir, config.model_file)

    weights = args.weights or config.weights_file
    if args.artifact:
        if args.weights or args.checkpoint:
            raise ValueError(
                "--artifact bakes the weights in; --weights/--checkpoint "
                "do not apply")
        model = params = state = None
    else:
        model, params, state, model_path = build_model(
            config, base_dir, weights=weights, checkpoint=args.checkpoint)

    # NMS runs LIVE in the postprocess program even with --artifact (only
    # the forward is baked in), so the cfg's nms_kind/beta_nms apply either
    # way — dropping them would make artifact responses diverge from the
    # live model on diounms cfgs
    nms_kind, nms_beta = nms_options(config, model_path)

    class_names = None
    ds_classes = config.dataset.classes_file
    if ds_classes and not os.path.isabs(ds_classes):
        ds_classes = os.path.join(base_dir, ds_classes)
    classes_path = args.classes_file or ds_classes
    if classes_path and os.path.exists(classes_path):
        with open(classes_path) as f:
            class_names = [ln.strip() for ln in f if ln.strip()]

    if args.artifact:
        if args.devices > 1:
            raise SystemExit(
                "--devices > 1 needs live-model serving: the exported "
                "StableHLO artifact has a fixed single-device lowering")
        service = DetectionService.from_artifact(
            args.artifact,
            window_ms=args.window_ms,
            nms_iou_thresh=config.nms_iou_thresh,
            nms_conf_thresh=config.nms_conf_thresh,
            nms_kind=nms_kind,
            nms_beta=nms_beta,
            class_names=class_names,
        )
        if service.batch_size != args.batch_size:
            print(f"artifact batch {service.batch_size} overrides "
                  f"--batch-size {args.batch_size}")
    else:
        service = DetectionService(
            model, params, state,
            image_size=config.dataset.image_size,
            batch_size=args.batch_size,
            window_ms=args.window_ms,
            nms_iou_thresh=config.nms_iou_thresh,
            nms_conf_thresh=config.nms_conf_thresh,
            nms_kind=nms_kind,
            nms_beta=nms_beta,
            class_names=class_names,
            devices=args.devices,
        )
    print(f"compiling batch={service.batch_size} "
          f"size={service.image_size} ...", flush=True)
    secs = service.warmup()
    service.start()
    server = make_http_server(service, args.host, args.port)
    # report the bound port (not args.port) so --port 0 = OS-assigned
    # ephemeral port is usable by supervisors/tests
    port = server.server_address[1]
    print(f"warm in {secs:.1f}s; serving on http://{args.host}:{port} "
          f"(POST /detect, GET /healthz, GET /stats)", flush=True)
    try:
        server.serve_forever()
    except KeyboardInterrupt:
        pass
    finally:
        server.server_close()
        service.shutdown()


def cli():
    """Console-script entry (pyproject [project.scripts]): guarded main."""
    from ._guard import run
    run(main)


if __name__ == "__main__":
    cli()
