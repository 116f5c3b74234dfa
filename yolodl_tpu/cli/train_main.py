"""Training CLI: ``python -m yolodl_tpu.cli.train_main --config-file train.json5``.

Equivalent capability to the reference ``train`` crate (train/src/main.rs):
load the versioned JSON5 config, create a timestamped log dir and save a
config copy (:34-51), start the data pipeline and logging worker, run the
training loop (single-chip or data-parallel mesh), checkpoint every N
steps, and abort on non-finite loss (multi_gpu.rs:198-204).
"""

from __future__ import annotations

import argparse
import os
import shutil
import sys
import time


def _resolve_auto_loss_options(config, graph):
    """Resolve the "auto" loss options from the darknet model cfg: adopt
    the per-[yolo]-layer ignore_thresh, iou_thresh (multi-anchor match
    gate), objectness_smooth, and max_delta values (darknet-config
    yolo.rs:15-49 surface) so darknet cfgs train with darknet's
    objectness masking / multi-positive matching / delta clamping out of
    the box.  NEWSLABv1 models (no [yolo] sections) resolve to disabled —
    the Rust reference's behavior.  A uniform per-layer set collapses to
    a scalar; mixed values stay a per-head tuple (loss/yolo_loss.py maps
    them per flat range).  truth_thresh < 1 (darknet's per-cell
    best-IoU-overwrite branch) is not implemented in the production loss —
    warn loudly instead of silently diverging (all 83 corpus cfgs carry
    truth_thresh=1, where it is a no-op)."""
    import dataclasses as _dc

    loss = config.loss
    tt = getattr(graph, "detect_truth_thresh", None)
    if tt and any(t < 1.0 for t in tt):
        print(f"warning: model cfg truth_thresh={tt} < 1 is not "
              "implemented; training without the multi-positive branch")

    def _adopt(field, attr, collapse=True):
        vals = getattr(graph, attr, None)
        if not vals or all(v is None for v in vals):
            new = None
        elif collapse and len(set(vals)) == 1:
            new = vals[0]
        else:
            new = tuple(vals)
        if new is not None and new != 1.0 and new is not False:
            print(f"loss.{field}: auto -> {new} (from the model cfg)")
        return new

    updates = {}
    if loss.ignore_thresh == "auto":
        updates["ignore_thresh"] = _adopt("ignore_thresh",
                                          "detect_ignore_thresh")
    if loss.iou_thresh == "auto":
        # per-head iou_thresh values of 1.0 are no-ops — collapse to None
        # when every head carries the default
        v = _adopt("iou_thresh", "detect_iou_thresh")
        if isinstance(v, float) and v >= 1.0:
            v = None
        updates["iou_thresh"] = v
    if loss.objectness_smooth == "auto":
        vals = getattr(graph, "detect_objectness_smooth", None)
        new = bool(vals and any(vals))
        if new:
            print("loss.objectness_smooth: auto -> True (from the model cfg)")
        updates["objectness_smooth"] = new
    if loss.max_delta == "auto":
        updates["max_delta"] = _adopt("max_delta", "detect_max_delta")
    if not updates:
        return config
    return _dc.replace(config, loss=_dc.replace(loss, **updates))


def main(argv=None):
    parser = argparse.ArgumentParser(description="yolodl_tpu trainer")
    parser.add_argument("--config-file", required=True)
    parser.add_argument("--max-steps", type=int, default=0,
                        help="stop after N steps (0 = run forever)")
    parser.add_argument("--profile-dir", default="",
                        help="capture a jax.profiler device trace of steps "
                             "5-10 into this directory")
    parser.add_argument("--process-id", type=int, default=-1,
                        help="this process's rank in a MultiProcess "
                             "device_config cluster (or YDL_PROCESS_ID)")
    args = parser.parse_args(argv)

    import jax
    import jax.numpy as jnp
    import numpy as np

    from ..config.app_config import TrainAppConfig, compute_dtype_of
    from ..data import (
        FileCache, MemoryCache, MosaicMixer, OnDemandLoader, SanitizedDataset,
        make_decode_loader,
        TrainingStream, TrainingStreamConfig,
    )
    from ..data.pipeline import device_prefetch
    from ..graph import Graph
    from ..graph.from_darknet import load_darknet_graph
    from ..models import YoloModel
    from ..parallel import make_dp_train_step, make_mesh, shard_batch
    from ..parallel.dp import replicate_state
    from ..train import (
        TrainConfig, load_checkpoint, load_recent_checkpoint_in_runs,
        make_train_step, train_init,
    )
    from ..train.checkpoint import AsyncCheckpointer
    from ..train.logging import LoggingWorker
    from ..train.lr_schedule import lr_at_step
    from ..utils.timing import RateCounter

    config = TrainAppConfig.load(args.config_file)
    base_dir = os.path.dirname(os.path.abspath(args.config_file))

    # multi-process (multi-host) DP: join the distributed runtime BEFORE
    # any backend use, then resolve the global device count.  Same mesh /
    # axis-name code as single-host — the data axis just spans processes.
    proc_id, n_procs = 0, 1
    if config.multi_process is not None:
        import dataclasses

        from ..parallel.mesh import initialize_multi_host

        mp = config.multi_process
        pid = args.process_id if args.process_id >= 0 else int(
            os.environ.get("YDL_PROCESS_ID", "-1"))
        if mp.coordinator:
            if pid < 0:
                raise SystemExit(
                    "MultiProcess with an explicit coordinator needs "
                    "--process-id (or YDL_PROCESS_ID)")
            initialize_multi_host(mp.coordinator, mp.num_processes, pid)
        else:
            initialize_multi_host()  # auto-discovery (TPU pod metadata)
        proc_id, n_procs = jax.process_index(), jax.process_count()
        config = dataclasses.replace(config, n_devices=jax.device_count())
        if config.batch_size % (config.n_devices * config.accumulation_steps):
            raise SystemExit(
                f"training.batch_size ({config.batch_size}) must be "
                f"divisible by global devices x accumulation_steps "
                f"({config.n_devices} x {config.accumulation_steps})")
        print(f"multi-process: rank {proc_id}/{n_procs}, "
              f"{jax.local_device_count()} local / {config.n_devices} "
              f"global devices", flush=True)
    is_chief = proc_id == 0

    # timestamped run dir + config copy (main.rs:34-51); non-chief ranks get
    # a rank-suffixed dir (no checkpoints land there, so FromRecent resume
    # scans only ever find the chief's)
    stamp = time.strftime("%Y-%m-%d-%H-%M-%S")
    rank_tag = f"-r{proc_id}" if proc_id else ""
    run_dir = os.path.join(config.logging.dir, stamp + rank_tag)
    # the stamp has second resolution: two runs in the same second must not
    # share a dir (interleaved checkpoints would poison FromRecent resume)
    dedupe = 1
    while True:
        try:
            os.makedirs(run_dir)
            break
        except FileExistsError:
            dedupe += 1
            run_dir = os.path.join(
                config.logging.dir, f"{stamp}.{dedupe}{rank_tag}")
    shutil.copy(args.config_file, os.path.join(run_dir, "train.json5"))
    ckpt_dir = os.path.join(run_dir, "checkpoints")

    # model
    model_path = os.path.join(base_dir, config.model_file)
    if config.model_kind == "darknet":
        graph = load_darknet_graph(model_path)
    else:
        graph = Graph.load_newslab_v1_json(model_path)
    if config.freeze or config.freeze_through:
        # frozen-layer fine-tuning: merge with any cfg-level stopbackward
        frozen = set(graph.stop_gradient_paths)
        for p in config.freeze:
            try:
                graph.resolve_path(p)
            except ValueError as e:
                raise SystemExit(f"training.freeze: {e}")
            frozen.add(p)
        if config.freeze_through:
            try:
                frozen |= graph.ancestor_paths(config.freeze_through)
            except ValueError as e:
                raise SystemExit(f"training.freeze_through: {e}")
        graph.stop_gradient_paths = frozenset(frozen)
        print(f"freezing {len(frozen)} node(s): "
              + ", ".join(sorted(frozen)[:8])
              + (" ..." if len(frozen) > 8 else ""))
    config = _resolve_auto_loss_options(config, graph)
    model = YoloModel(graph, remat="blocks" if config.remat else "off")

    # lr_schedule {type: FromModelCfg}: adopt the darknet [net] policy
    # family (burn_in + steps/poly/sig/sgdr..., network.c:131-176) so
    # darknet training recipes run unchanged under the JSON5 config
    if config.lr.kind == "from_model_cfg":
        if config.model_kind != "darknet":
            raise SystemExit(
                "optimizer.lr_schedule FromModelCfg needs a darknet model "
                "cfg (NEWSLABv1 models carry no [net] policy)")
        import dataclasses as _dc

        from ..config import darknet_cfg as _dk
        from ..train.lr_schedule import lr_schedule_from_darknet

        config = _dc.replace(
            config, lr=lr_schedule_from_darknet(_dk.Darknet.load(model_path).net))

    # preprocessor.from_model_cfg: adopt the darknet cfg's data recipe
    # ([net] mosaic/hue/sat/exposure/flip/angle + [yolo] jitter/random/
    # resize) — the data-path sibling of lr_schedule FromModelCfg
    if config.preprocessor.from_model_cfg:
        if config.model_kind != "darknet":
            raise SystemExit(
                "preprocessor.from_model_cfg needs a darknet model cfg "
                "(NEWSLABv1 models carry no [net]/[yolo] aug knobs)")
        from ..config import darknet_cfg as _dk2
        from ..config.app_config import adopt_darknet_data_recipe

        config = adopt_darknet_data_recipe(config, _dk2.Darknet.load(model_path))
        pre2 = config.preprocessor
        print(
            f"data recipe from model cfg: mosaic_prob={pre2.mosaic_prob}, "
            f"color_jitter={pre2.color_jitter}, affine={pre2.affine}, "
            f"multi_scale={list(config.multi_scale_sizes) or None}")

    # dataset + pipeline (cache.records: annotation parse cached on disk)
    pre = config.preprocessor
    # one cache_dir, resolved once against the config-file dir (the same
    # convention as model_file / dataset paths) for BOTH the image caches
    # and the records cache — a CWD-relative image cache next to a
    # config-relative records cache would silently split the cache
    cache_dir = (
        os.path.join(base_dir, pre.cache_dir)
        if pre.cache_dir and not os.path.isabs(pre.cache_dir)
        else pre.cache_dir
    )
    records_cache_dir = cache_dir if pre.cache_records else ""
    dataset = SanitizedDataset(
        config.dataset.open(base_dir, records_cache_dir=records_cache_dir),
        out_of_bound_tolerance=config.preprocessor.out_of_bound_tolerance,
        min_bbox_size=config.preprocessor.min_bbox_size,
    )
    size = config.dataset.image_size
    if pre.cache_method == "file":
        loader = FileCache(cache_dir or os.path.join(run_dir, "cache"),
                           (size, size), dtype=pre.cache_dtype)
    elif pre.cache_method == "tfrecord":
        from ..data.tfrecord_cache import TfrecordCache

        # per-rank shard under MultiProcess: ranks share cache_dir but
        # append to the same shard file is not cross-process safe, and each
        # rank's record share (records[rank::n]) is disjoint anyway
        loader = TfrecordCache(cache_dir or os.path.join(run_dir, "cache"),
                               (size, size),
                               shard_tag=f"-r{proc_id}" if n_procs > 1 else "")
    elif pre.cache_method == "memory":
        loader = MemoryCache((size, size))
    else:
        loader = make_decode_loader((size, size))
    # multi-process: each rank streams its strided share of the records and
    # produces the LOCAL slice of the global batch (shard_batch_multiprocess
    # assembles global arrays in mesh device order = process order)
    local_batch = config.batch_size
    records = dataset.records()
    if n_procs > 1:
        records = records[proc_id::n_procs]
        local_batch = (config.batch_size * jax.local_device_count()
                       // config.n_devices)
    # preprocessor.pipeline.device="tpu": defer pixel augmentation to one
    # jitted batched device program (data/device_augment.py).  The scanned
    # multi-step path stacks HOST arrays and the multi-process path needs
    # process-local HOST shards, so both keep the CPU pipeline.
    defer_images = False
    if pre.pipeline_device == "tpu":
        eff_scan = (config.steps_per_call
                    if (config.steps_per_call > 1 and config.n_devices == 1
                        and not config.multi_scale_sizes) else 1)
        if eff_scan > 1 or n_procs > 1:
            print("warning: preprocessor.pipeline.device='tpu' requires "
                  "single-process, non-scanned training; using the CPU "
                  "pipeline", file=sys.stderr)
        elif config.logging.enable_images:
            # the deferred path never materializes per-stage host pixels,
            # so the pipeline debug-image hooks would silently vanish
            # (round-2 advisor finding) — keep the CPU pipeline instead
            print("warning: logging.enable_images needs host-side pipeline "
                  "stages for debug images; using the CPU pipeline instead "
                  "of pipeline.device='tpu'", file=sys.stderr)
        else:
            defer_images = True
            if config.n_devices > 1:
                print("note: pipeline.device='tpu' commits augmented "
                      "batches to one device; multi-device runs pay a "
                      "reshard copy per batch when the step re-places "
                      "them on the mesh", file=sys.stderr)
    stream_cfg = TrainingStreamConfig(
        batch_size=local_batch,
        defer_images=defer_images,
        seed=proc_id,  # decorrelate augmentation streams across ranks
        mosaic_prob=pre.mosaic_prob,
        mixup_prob=pre.mixup_prob,
        cutmix_prob=pre.cutmix_prob,
        mosaic=MosaicMixer(mosaic_margin=pre.mosaic_margin),
        color_jitter=pre.color_jitter,
        color_jitter_prob=pre.color_jitter_prob,
        random_affine=pre.affine,
        affine_prob=pre.affine_prob,
        bbox_scaling=pre.bbox_scaling,
        workers=pre.workers,
        ordered=not pre.unordered,
    )
    stream = TrainingStream(records, loader, stream_cfg)

    logger_holder = {}
    current_step = {"n": 0}  # host-side optimizer step, for telemetry tags
    if config.logging.enable_images:
        # per-stage debug images with boxes (logging.rs:428-500 taxonomy)
        from ..train.logging import draw_boxes_on_image

        debug_counter = {"n": 0}

        def debug_hook(stage, rec):
            lg = logger_holder.get("logger")
            sampled = debug_counter["n"] % 50 == 0
            debug_counter["n"] += 1
            if lg is None or not sampled:
                return
            boxes = rec.boxes
            if len(boxes):
                cy, cx, h, w = (boxes[:, k] for k in range(4))
                tlbr = np.stack([cy - h / 2, cx - w / 2, cy + h / 2, cx + w / 2], -1)
                canvas = draw_boxes_on_image(rec.image, tlbr)
            else:
                canvas = rec.image
            # tag with the optimizer step so TB's x-axis tracks training
            # progress (the hook runs on pipeline threads ahead of the
            # trainer; the step is approximate by design)
            lg.log_image(current_step["n"], f"pipeline/{stage}", canvas)

        stream_cfg.debug_hook = debug_hook

    # training.loss.impl=Darknet: swap in the oracle-exact darknet delta
    # loss (loss/darknet_loss.py) — the step consumes the raw head-conv
    # outputs (graph.detect_head_input_keys) with per-head params built
    # from the model cfg's [yolo]/[Gaussian_yolo] sections
    darknet_loss_spec = None
    if config.loss_impl not in ("production", "darknet"):
        raise SystemExit(
            f"unknown training.loss.impl {config.loss_impl!r} "
            "(expected Production or Darknet)")
    if config.loss_impl == "darknet":
        if config.model_kind != "darknet":
            raise SystemExit(
                "training.loss.impl Darknet needs a darknet model cfg")
        if config.pipeline_parallel > 1:
            # TP/DP/ZeRO compose (the loss is an ordinary jittable term —
            # GSPMD handles the sharded head outputs; tests
            # test_{dp,tp}_composition); PP's MPMD stage programs wire the
            # production loss into the recompute-VJP machinery and would
            # need the darknet loss re-plumbed per stage
            raise SystemExit(
                "training.loss.impl Darknet does not support "
                "pipeline_parallel (single-device, DP, TP, ZeRO all work)")
        from ..config import darknet_cfg as _dkl
        from ..loss.darknet_loss import head_params_from_darknet

        _dn = _dkl.Darknet.load(model_path)
        _heads = [l for l in _dn.layers if isinstance(l, _dkl.Yolo)]
        if not _heads:
            raise SystemExit(
                "training.loss.impl Darknet needs [yolo]/[Gaussian_yolo] "
                "heads ([region]/[detection] exact losses are library-"
                "level only: loss/darknet_loss.py)")
        _h, _w, _ = _dn.net.input_shape_hwc
        _head_params = []
        for _li, _l in enumerate(_dn.layers):
            if not isinstance(_l, _dkl.Yolo):
                continue
            try:
                _head_params.append(head_params_from_darknet(_l, _w, _h))
            except ValueError as e:
                # cfg-validation-time rejection with the offender named
                raise SystemExit(
                    f"{model_path}: layer {_li}: {e}") from None
        darknet_loss_spec = (
            graph.detect_head_input_keys(),
            tuple(_head_params),
        )
        print(f"loss impl: darknet-exact ({len(_heads)} heads; per-term "
              "losses + darknet avg_iou/obj/no_obj/recall telemetry from "
              "the delta buffers)")

    # trainer
    train_cfg = TrainConfig(
        lr=config.lr, optimizer=config.optimizer,
        momentum=config.momentum, weight_decay=config.weight_decay,
        loss=config.loss,
        darknet_loss=darknet_loss_spec,
        use_ema=config.use_ema, ema_decay=config.ema_decay,
        benchmark_confidence=(
            config.nms_conf_thresh if config.logging.enable_benchmark else None
        ),
        log_weights_and_grads=config.logging.enable_gradients,
        return_obj_sample=config.logging.enable_images,
        debug_stat=config.logging.enable_debug_stat,
        compute_dtype=compute_dtype_of(config.precision),
    )
    use_pp = config.pipeline_parallel > 1
    use_tp = config.tensor_parallel > 1
    use_zero = config.zero_optimizer and config.n_devices > 1 and not use_tp
    if config.zero_optimizer and config.n_devices <= 1:
        print("zero_optimizer requires a MultiDevice config; ignoring "
              "(optimizer-state sharding is a no-op on one device)")
    if config.zero_optimizer and use_tp:
        print("tensor_parallel already shards the optimizer state on the "
              "model axis; ignoring zero_optimizer")
    if use_tp:
        from ..parallel import make_tp_mesh

        mesh = make_tp_mesh(config.n_devices // config.tensor_parallel,
                            config.tensor_parallel)
        print(f"mesh: data={mesh.shape['data']} x "
              f"model={mesh.shape['model']} (tensor parallel)")
    else:
        mesh = (make_mesh(config.n_devices)
                if config.n_devices > 1 and not use_pp else None)
    if use_zero:
        from ..parallel import zero_init

        ts, optimizer = zero_init(model, train_cfg, mesh, seed=0)
    else:
        ts, optimizer = train_init(model, train_cfg, seed=0)

    # checkpoint restore (utils/checkpoint.rs:24-81 semantics)
    restored = None
    if config.checkpoint.mode == "from_recent":
        # scan prior runs under the logging dir, not this run's empty dir
        restored = load_recent_checkpoint_in_runs(
            config.logging.dir, ts.params, ts.state, ts.opt_state)
    elif config.checkpoint.mode == "from_file":
        restored = load_checkpoint(
            os.path.join(base_dir, config.checkpoint.file), ts.params, ts.state,
            ts.opt_state,
        )
    if restored is not None:
        params, state, opt_state, meta = restored
        # restored EMA (if present) continues accumulating; otherwise the
        # EMA shadow restarts from the restored params
        ema = meta.get("ema")
        if ts.ema_params is None:
            ema = None  # EMA disabled in this run's config
        elif ema is None:
            ema = params
        ts = ts.__class__(params, state, opt_state or ts.opt_state,
                          jnp.asarray(meta["step"], jnp.int32), ema)
        print(f"restored checkpoint at step {meta['step']}")
    if config.override_initial_step is not None:
        ts = ts.__class__(ts.params, ts.state, ts.opt_state,
                          jnp.asarray(config.override_initial_step, jnp.int32),
                          ts.ema_params)

    # exact-resume data order: skip the records the interrupted run already
    # consumed, so the continuation sees the same shuffles/augmentations an
    # uninterrupted run would (per-slot RNG keys make the skip bitwise-
    # faithful; the reference restarts its shuffles on resume).  Only a
    # FromRecent restore means "continue THIS run's data stream" — FromFile
    # fine-tunes from a foreign checkpoint and override_initial_step is a
    # pure step-forcing knob; neither consumed this dataset's records.
    if restored is not None and config.checkpoint.mode == "from_recent":
        # one optimizer step consumes one logical batch (scan mode stacks K
        # batches but advances the step by K — same records-per-step)
        stream_cfg.start_records = int(restored[3]["step"]) * local_batch
        if stream_cfg.start_records:
            print(f"data stream resumed at record {stream_cfg.start_records}")

    # device placement
    accum = config.accumulation_steps
    if use_pp:
        # pipeline (stage) parallelism: the graph cut into n_devices
        # balanced stages, each stage's params + optimizer state on its
        # own device; the batch streams through as accum GPipe
        # microbatches (parallel/pipeline.py).  Checkpoints merge back to
        # the standard layout on save, so resume is format-compatible.
        from ..parallel import PipelineModel, PipelineTrainStep
        from ..parallel.pipeline import PipelineTrainState

        pp_dp, rem = divmod(config.n_devices, config.pipeline_parallel)
        if pp_dp < 1:
            raise ValueError(
                f"training.pipeline_parallel={config.pipeline_parallel} "
                f"needs at least that many devices; device config has "
                f"{config.n_devices}")
        if rem:
            print(f"warning: {config.n_devices} devices do not divide into "
                  f"{config.pipeline_parallel} pipeline stages — using "
                  f"{pp_dp * config.pipeline_parallel}, {rem} device(s) idle")
        pp_model = PipelineModel(model, config.pipeline_parallel, dp=pp_dp)
        pts_step = PipelineTrainStep(pp_model, train_cfg, n_micro=accum)
        ts = PipelineTrainState.from_train_state(pp_model, ts)
        step_fn = pts_step.step_fn()
        place = lambda batch: batch
        print(f"pipeline: {config.pipeline_parallel} stages "
              f"({', '.join(str(len(p.keys)) + ' nodes' for p in pp_model.stages)})"
              f" x dp={pp_dp}, {accum} microbatches/step")
        if config.eval_interval or config.logging.enable_inference:
            print("warning: in-training evaluation/inference merges the "
                  "full model onto the default device; if the model needs "
                  "pipeline_parallel to fit in one chip's HBM, run eval "
                  "offline instead (eval CLI on a bigger host)")
    elif config.n_devices > 1:
        if use_tp:
            from ..parallel import (make_tp_train_step, place_tp_state,
                                    shard_batch_tp)

            step_fn = make_tp_train_step(model, optimizer, train_cfg, mesh,
                                         accum=accum)
            ts = place_tp_state(mesh, ts)
        elif use_zero:
            from ..parallel import make_zero_train_step, place_zero_state

            step_fn = make_zero_train_step(model, optimizer, train_cfg, mesh,
                                           accum=accum)
            ts = place_zero_state(mesh, ts)
        else:
            step_fn = make_dp_train_step(model, optimizer, train_cfg, mesh,
                                         accum=accum)
            ts = replicate_state(mesh, ts)
        if use_tp:
            place = lambda batch: shard_batch_tp(mesh, batch)
        elif n_procs > 1:
            from ..parallel import shard_batch_multiprocess

            place = lambda batch: shard_batch_multiprocess(mesh, batch)
        else:
            place = lambda batch: shard_batch(mesh, batch)
    else:
        step_fn = make_train_step(model, optimizer, train_cfg, accum=accum)
        place = lambda batch: batch

    # multi_scale × darknet-exact loss: the head params bind net_w/net_h
    # (darknet's resize_network updates net.w/net.h per random=1 resize and
    # yolo_layer.c's delta_yolo_box normalizes anchors by them), so each
    # training size gets its OWN step program with per-size head params —
    # the same per-size compile-cache mechanism the production loss's
    # shape-polymorphic jit already uses.  Covers the single-device, DP and
    # ZeRO paths (PP/TP are rejected above).
    dk_multi_scale = (darknet_loss_spec is not None
                      and bool(config.multi_scale_sizes))
    dk_ms_step_cache = {}

    def _dk_step_for_size(size):
        fn = dk_ms_step_cache.get(size)
        if fn is not None:
            return fn
        from dataclasses import replace as _dc_replace

        from ..loss.darknet_loss import head_params_from_darknet as _hp
        spec = (darknet_loss_spec[0],
                tuple(_hp(l, size, size) for l in _heads))
        cfg_s = _dc_replace(train_cfg, darknet_loss=spec)
        if config.n_devices > 1:
            if use_zero:
                from ..parallel import make_zero_train_step
                fn = make_zero_train_step(model, optimizer, cfg_s, mesh,
                                          accum=accum)
            else:
                fn = make_dp_train_step(model, optimizer, cfg_s, mesh,
                                        accum=accum)
        else:
            fn = make_train_step(model, optimizer, cfg_s, accum=accum)
        dk_ms_step_cache[size] = fn
        return fn

    logger = LoggingWorker(run_dir).start()
    logger_holder["logger"] = logger if config.logging.enable_images else None
    last_batch = {"images": None, "infos": None}

    # training-time inference visualization (logging.enable_inference): the
    # reference optionally runs NMS inference during training and logs
    # detection-overlay images (train/src/train/multi_gpu.rs:239-261,
    # train/src/logging.rs:379-422).  Same two-stage jit discipline as the
    # detect CLI (NMS fused into the conv program inherits bad layouts).
    # honor the model cfg's nms_kind + beta_nms like the detect CLI — any
    # in-training inference must preview what detect would actually keep
    nms_kind, nms_beta = "greedy", 0.6
    if config.model_kind == "darknet":
        from ..config import darknet_cfg as dk
        from ..loss.nms import nms_options_from_darknet

        nms_kind, nms_beta = nms_options_from_darknet(
            dk.Darknet.load(model_path))

    infer_one = None
    if config.logging.enable_inference and is_chief:
        from ..loss import non_max_suppression, yolo_inference
        from ..loss.inference import to_host_detections
        from ..train.logging import draw_boxes_on_image as _draw

        @jax.jit
        def _infer_fwd(params, state, image):
            pred, _ = model.apply(params, state, image, train=False)
            return pred

        @jax.jit
        def _infer_post(pred):
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

        _palette = [
            (1.0, 0.2, 0.2), (0.2, 1.0, 0.2), (0.2, 0.4, 1.0),
            (1.0, 0.6, 0.1), (0.8, 0.2, 1.0), (0.1, 0.9, 0.9),
        ]

        def infer_one(step, image_chw, gt_boxes, gt_mask):
            """Run inference on one training image and log the overlay:
            GT yellow, predictions per-class colors (detect-CLI taxonomy)."""
            out = _infer_post(
                _infer_fwd(ts.params, ts.state, jnp.asarray(image_chw[None]))
            )
            dets = to_host_detections(out)[0]
            canvas = np.asarray(image_chw, np.float32)
            gt = np.asarray(gt_boxes)[np.asarray(gt_mask)]
            if len(gt):
                cy, cx, h, w = (gt[:, k] for k in range(4))
                gt_tlbr = np.stack(
                    [cy - h / 2, cx - w / 2, cy + h / 2, cx + w / 2], -1)
                canvas = _draw(canvas, gt_tlbr, color=(1.0, 1.0, 0.0))
            # one draw call (= one canvas copy) per palette color, not per box
            by_color = {}
            for det in dets:
                by_color.setdefault(det["class"] % len(_palette), []).append(
                    det["tlbr"])
            for ci, boxes in by_color.items():
                canvas = _draw(canvas, np.asarray(boxes), color=_palette[ci])
            logger.log_image(step, "inference/detections",
                             np.clip(canvas, 0, 1))
    # periodic in-training validation (evaluation.interval): dataset mAP
    # through the full inference path, logged as val/* scalars
    evaluator = None
    if config.eval_interval and is_chief:
        from ..train.evaluation import DatasetEvaluator

        ev_cfg = config.eval_dataset or config.dataset
        ev_ds = SanitizedDataset(
            ev_cfg.open(base_dir, records_cache_dir=records_cache_dir),
            out_of_bound_tolerance=config.preprocessor.out_of_bound_tolerance,
            min_bbox_size=config.preprocessor.min_bbox_size,
        )
        ev_records = ev_ds.records()
        if config.eval_limit:
            ev_records = ev_records[: config.eval_limit]
        ev_size = ev_cfg.image_size
        evaluator = DatasetEvaluator(
            model, ev_records, make_decode_loader((ev_size, ev_size)),
            num_classes=len(ev_ds.classes),
            batch_size=config.eval_batch_size or config.batch_size,
            iou_threshold=config.nms_iou_thresh,
            confidence_threshold=config.eval_conf_thresh,
            nms_kind=nms_kind,
            nms_beta=nms_beta,
            # validation runs at the training precision so val/mAP measures
            # the dtype actually being trained (and deployed — serving is
            # bf16)
            precision=config.precision,
        )

    if config.logging.enable_images:
        # static per-head layout for the objectness heatmap, via an
        # abstract trace (no device work)
        size = config.dataset.image_size
        spec = jax.eval_shape(
            lambda p, s, x: model.apply(p, s, x, train=False)[0],
            ts.params, ts.state,
            jax.ShapeDtypeStruct((1, 3, size, size), jnp.float32),
        )
        last_batch["infos"] = spec.infos
    batch_rate = RateCounter()
    record_rate = RateCounter()

    # multi-scale training (darknet random=1; the reference parses but never
    # implements it): boxes are ratio units, so rescaling is image-only.
    # Each size compiles its own step once and is cached thereafter.
    ms_sizes = list(config.multi_scale_sizes)
    resize_cache = {}

    def maybe_rescale(images, step):
        if not ms_sizes:
            return images
        target = ms_sizes[(step // config.multi_scale_interval) % len(ms_sizes)]
        if images.shape[-1] == target:
            return images
        if target not in resize_cache:
            resize_cache[target] = jax.jit(
                lambda im, t=target: jax.image.resize(
                    im, (im.shape[0], im.shape[1], t, t), "bilinear"
                )
            )
        return resize_cache[target](images)

    # scanned multi-step (training.steps_per_call): run K optimizer steps
    # as one XLA program, amortizing per-step dispatch (~6 ms/step at
    # yolov4-csp-608 b16).  Incompatible with multi-scale (sizes change
    # per step) and the DP path (which has its own sharded program).
    scan_k = config.steps_per_call
    if scan_k > 1 and (config.n_devices > 1 or ms_sizes):
        print("steps_per_call > 1 requires single-device, fixed-size "
              "training; falling back to per-step dispatch")
        scan_k = 1
    if scan_k > 1 and args.max_steps and args.max_steps % scan_k:
        # the stop check runs at window ends only (mid-window params are
        # unsaveable), so a non-multiple max-steps rounds UP — say so
        # rather than silently overshooting an exact-step A/B run
        print(f"warning: --max-steps {args.max_steps} is not a multiple of "
              f"steps_per_call {scan_k}; the run stops at step "
              f"{-(-args.max_steps // scan_k) * scan_k} (window end)")
    if scan_k > 1:
        from ..train import make_multi_step

        step_fn = make_multi_step(model, optimizer, train_cfg, scan_k,
                                  accum=accum)

    # graceful preemption: SIGTERM/SIGINT request a checkpoint + clean exit
    # at the next step boundary (TPU maintenance events deliver SIGTERM);
    # a second signal falls through to the default handler
    import signal

    stop_signal = {"num": None}

    def _request_stop(signum, frame):
        stop_signal["num"] = signum
        signal.signal(signum, signal.SIG_DFL)

    for _sig in (signal.SIGTERM, signal.SIGINT):
        signal.signal(_sig, _request_stop)

    saver = AsyncCheckpointer()
    # multi-process: the chief serializes (params are replicated, so every
    # rank holds identical values; duplicate writes would litter FromRecent)
    save_checkpoint = saver.save if is_chief else (lambda *a, **k: None)
    best_eval = {"map": -1.0}

    def handle_step(step, metrics, index=None, final=True, window=1):
        """Per-optimizer-step host work: finite check, TB logging, rates,
        checkpoints.  Returns True when training should stop.

        In scanned multi-step mode only the last sub-step of a window has
        ``final=True``: ``ts`` then matches ``step``, so checkpoints and
        stop handling happen exclusively there (an intermediate sub-step
        must never be saved — ts already holds the end-of-window params and
        the label would lie, breaking exact resume). A save boundary
        crossed anywhere inside the window triggers a save at its end.
        """
        pick = (lambda v: v[index]) if index is not None else (lambda v: v)
        total = float(pick(metrics["total_loss"]))
        if not np.isfinite(total):
            raise RuntimeError(f"non-finite total loss at step {step}: {total}")
        if os.environ.get("YOLODL_DEBUG_ASSERT"):
            # per-term guard (the reference's debug_assert tier,
            # loss_.rs:242-255; total-loss ensure is always on above);
            # skips non-scalar entries (obj_sample is an [N] array)
            for k, v in metrics.items():
                val = pick(v)
                if np.ndim(val) == 0 and not np.isfinite(float(val)):
                    raise RuntimeError(
                        f"non-finite metric {k!r} at step {step}")
        # step is 1-based post-update here, but optax evaluates the schedule
        # at the 0-based pre-update count — log the rate the update USED
        lr = lr_at_step(config.lr, step - 1)
        bench_keys = ("obj_accuracy", "obj_recall", "obj_precision",
                      "class_accuracy", "num_matched",
                      # darknet console taxonomy (loss.impl=Darknet;
                      # yolo_layer.c:560-575 printed stats)
                      "avg_iou", "avg_obj", "avg_cat", "recall50",
                      "recall75", "no_obj")
        wg_keys = [k for k in metrics
                   if k.startswith(("weights_max/", "grads_max/"))]
        logger.log_training_output(
            step, lr,
            {k: float(pick(v)) for k, v in metrics.items()
             if k not in bench_keys and k not in wg_keys
             and k != "obj_sample"},
            benchmark={k: float(pick(metrics[k])) for k in bench_keys
                       if k in metrics} or None,
        )
        if wg_keys:
            # per-parameter |w|max / |grad|max (logging.rs:361-376)
            logger.log_scalars(
                step, {k: float(pick(metrics[k])) for k in wg_keys})
        if ("obj_sample" in metrics and (step % 200 == 0 or step == 1)
                and logger_holder.get("logger") is not None
                and last_batch.get("infos") is not None):
            # in scan mode obj_sample[j] belongs to sub-batch j — pair it
            # with that window batch's image, not the last one
            if index is not None and last_batch.get("window"):
                imgs = last_batch["window"][index]
            else:
                imgs = last_batch.get("images")
            obj = np.asarray(pick(metrics["obj_sample"]))
            # multi-scale steps at a non-base size have a different flat
            # layout — skip those samples
            if imgs is not None and \
                    obj.shape[0] == last_batch["infos"][-1].flat_end:
                # objectness heatmap over the first training image
                # (logging.rs:379-422)
                logger.log_objectness_heatmap(
                    step, np.asarray(imgs[0]), obj, last_batch["infos"])
        current_step["n"] = step
        batch_rate.add(1)
        record_rate.add(config.batch_size)
        if step % 10 == 0:
            print(
                f"step {step}  loss {total:.5f}  "
                f"{batch_rate.rate():.2f} batches/s  {record_rate.rate():.1f} records/s"
            )
        if not final:
            return False
        if (infer_one is not None
                and (step <= window or step % 200 < window)
                and last_batch.get("images") is not None
                and last_batch.get("gt") is not None):
            # only at window ends: ts then holds the weights matching `step`.
            # last_batch always holds the base-size host batch (multi-scale
            # rescaling happens on the device copy only), so the inference
            # program compiles once at the base size.
            imgs = last_batch["images"]
            gt_boxes, gt_mask = last_batch["gt"]
            infer_one(step, imgs[0], gt_boxes[0], gt_mask[0])
        saved = False
        if (evaluator is not None and (step // config.eval_interval)
                > ((step - window) // config.eval_interval)):
            # window-end only: ts holds the params matching `step`
            report = evaluator(ts.params, ts.state)
            logger.log_scalars(step, {
                "val/mAP@0.5": report["mAP@0.5"],
                "val/mAP@0.5:0.95": report["mAP@0.5:0.95"],
            })
            print(f"step {step}  val mAP@0.5 {report['mAP@0.5']:.4f}  "
                  f"mAP@0.5:0.95 {report['mAP@0.5:0.95']:.4f}")
            if report["mAP@0.5"] > best_eval["map"]:
                # keep a checkpoint of the best validation mAP so far and
                # point best.json at it (production early-stop artifact)
                best_eval["map"] = report["mAP@0.5"]
                save_checkpoint(ckpt_dir, step, total, ts.params, ts.state,
                                ts.opt_state, ema_params=ts.ema_params)
                saved = True  # don't re-serialize this step below
                import json as _json

                with open(os.path.join(run_dir, "best.json"), "w") as bf:
                    _json.dump({"step": step,
                                "mAP@0.5": report["mAP@0.5"],
                                "mAP@0.5:0.95": report["mAP@0.5:0.95"]}, bf)
        save = config.checkpoint.save_steps
        if save and not saved and (step // save) > ((step - window) // save):
            save_checkpoint(ckpt_dir, step, total, ts.params, ts.state,
                            ts.opt_state, ema_params=ts.ema_params)
            saved = True
        if args.max_steps and step >= args.max_steps:
            if not saved:
                save_checkpoint(ckpt_dir, step, total, ts.params, ts.state,
                                ts.opt_state, ema_params=ts.ema_params)
            return True
        if stop_signal["num"] is not None:
            if not saved:
                save_checkpoint(ckpt_dir, step, total, ts.params, ts.state,
                                ts.opt_state, ema_params=ts.ema_params)
            saver.flush()  # raises if the write failed — do not lie below
            print(f"received signal {stop_signal['num']} — checkpoint saved "
                  f"at step {step}, exiting")
            return True
        return False

    profiling = False
    profiled = False
    pending = []
    # step tracked host-side: a per-step int(ts.step) readout costs a full
    # device round trip (~26 ms on the axon tunnel, CLAUDE.md perf ledger)
    host_step = int(ts.step)
    # scan mode stacks HOST arrays into one k-step upload — prefetching
    # per-batch device copies would transfer every batch twice
    if scan_k > 1:
        source = ((rec, None) for rec in iter(stream))
    elif n_procs > 1:
        # multi-process placement needs HOST arrays (each rank contributes
        # its local slice via make_array_from_process_local_data)
        source = ((rec, (rec.images, rec.boxes, rec.classes, rec.mask))
                  for rec in iter(stream))
    elif stream_cfg.defer_images:
        # pipeline.device="tpu": the augment program runs on device and the
        # yielded arrays are already device-resident (same contract as
        # device_prefetch)
        from ..data.device_augment import apply_device_augmentation

        source = apply_device_augmentation(iter(stream), stream_cfg)
    else:
        source = device_prefetch(iter(stream))
    try:
        for record, arrays in source:
            if args.profile_dir and not profiled:
                # device-side timing via jax.profiler (SURVEY §5.1): trace
                # ONE steady-state window after warmup/compile
                if host_step >= 5 and not profiling:
                    jax.profiler.start_trace(args.profile_dir)
                    profiling = True
                elif host_step >= 10 and profiling:
                    jax.profiler.stop_trace()
                    profiling = False
                    profiled = True
                    print(f"wrote device trace to {args.profile_dir}")
            if scan_k > 1:
                # stack the HOST arrays (stacking the prefetched device
                # arrays would round-trip every batch through the host)
                pending.append((record.images, record.boxes,
                                record.classes, record.mask))
                last_batch["images"] = record.images
                last_batch["gt"] = (record.boxes, record.mask)
                if len(pending) < scan_k:
                    continue
                stacked = tuple(np.stack(parts) for parts in zip(*pending))
                last_batch["window"] = [p[0] for p in pending]
                pending.clear()
                ts, metrics = step_fn(ts, *stacked)
                # ONE host transfer for the whole metrics dict (each
                # float() readout is a ~26 ms round trip on a remote TPU)
                metrics = jax.device_get(metrics)
                host_step += scan_k
                done = False
                for j in range(scan_k):
                    step = host_step - scan_k + 1 + j
                    if handle_step(step, metrics, index=j,
                                   final=(j == scan_k - 1), window=scan_k):
                        done = True
                        break
                if done:
                    break
                continue
            images, gt_boxes, gt_classes, gt_mask = arrays
            images = maybe_rescale(images, host_step)
            last_batch["images"] = record.images
            last_batch["gt"] = (record.boxes, record.mask)
            batch = place((images, gt_boxes, gt_classes, gt_mask))
            # darknet-exact loss under multi_scale: pick the step program
            # whose head params match this batch's net size
            sf = (_dk_step_for_size(int(images.shape[-1]))
                  if dk_multi_scale else step_fn)
            ts, metrics = sf(ts, *batch)
            metrics = jax.device_get(metrics)  # one transfer per step
            host_step += 1
            if handle_step(host_step, metrics):
                break
    finally:
        if profiling:
            jax.profiler.stop_trace()
        saver.flush()
        logger.close()


def cli():
    """Console-script entry (pyproject [project.scripts]): guarded main."""
    from ._guard import run
    run(main)


if __name__ == "__main__":
    cli()
