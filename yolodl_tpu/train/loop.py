"""Single-device training step.

Equivalent capability to ``train/src/train/single_gpu.rs``: forward → YOLO
loss → Adam step (beta1 = config momentum, matching multi_gpu.rs:425-434) →
BN running-var clamp (dark_batch_norm.rs:148-172 via model.clamp_running_vars)
→ LR schedule advance — but compiled as **one jitted function** with donated
buffers, so a whole optimizer step is a single XLA program on the TPU.

The training step count lives inside TrainState (the reference stores it as
a VarStore tensor so it checkpoints — multi_gpu.rs:423; same effect here).
Non-finite total loss must abort training (multi_gpu.rs:198-204): the step
returns the loss for the host loop to check.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from ..loss import LossConfig, yolo_loss
from ..models.builder import YoloModel
from .ema import ema_init, ema_update
from .lr_schedule import LrScheduleConfig, make_schedule_fn

Array = jax.Array


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    lr: LrScheduleConfig = LrScheduleConfig(kind="constant", lr=1e-3)
    optimizer: str = "adam"       # "adam" (reference) | "sgd" (darknet native)
    momentum: float = 0.937       # Adam beta1 (multi_gpu.rs:425-434) / SGD momentum
    beta2: float = 0.999
    eps: float = 1e-8
    weight_decay: float = 0.0
    clip_grad_value: Optional[float] = None
    clip_grad_norm: Optional[float] = None
    loss: LossConfig = LossConfig()
    use_ema: bool = False
    ema_decay: float = 0.9999
    # when set, per-step obj/class quality metrics (benchmark.rs taxonomy)
    # are computed inside the step at this confidence threshold
    benchmark_confidence: Optional[float] = None
    # per-parameter |w|max / |grad|max scalars in the metrics dict
    # (logging.rs:361-376 enable_gradients taxonomy); the reductions run
    # on device, only ~2·n_params scalars cross to the host
    log_weights_and_grads: bool = False
    # include the first image's objectness probabilities in the metrics
    # (metrics["obj_sample"], [N]) for the TB heatmap (logging.rs:379-422)
    return_obj_sample: bool = False
    # mean decoded cy/cx/h/w scalars per step (logging.rs:135-146
    # enable_debug_stat statistics)
    debug_stat: bool = False
    # training.loss.impl=Darknet: train with the darknet-EXACT delta
    # semantics (loss/darknet_loss.py) instead of the production loss —
    # (head_conv_node_keys, DarknetHeadParams per head, merge order).
    # The step consumes the RAW head-conv outputs; decode/merge are dead
    # code under this loss and XLA prunes them.
    darknet_loss: Optional[tuple] = None
    # compute dtype for the forward/backward pass ("bfloat16" | None).
    # The batch is cast at step entry; every conv casts its f32 weights to
    # the activation dtype (ops/conv.py), so parameters, optimizer state and
    # BN running stats stay float32 while all convolutions hit the MXU's
    # bf16 path (~2x the f32 conv throughput on v5e; bench.py trains the
    # flagship this way).  None = compute in the batch's own dtype (f32
    # from the data pipeline).  Beyond-reference: tch trains f32 only.
    compute_dtype: Optional[str] = None


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class TrainState:
    params: Any
    state: Any          # BN running stats
    opt_state: Any
    step: Array         # scalar int32
    ema_params: Any     # None when EMA disabled

    def tree_flatten(self):
        return (self.params, self.state, self.opt_state, self.step, self.ema_params), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)


def make_optimizer(config: TrainConfig) -> optax.GradientTransformation:
    schedule = make_schedule_fn(config.lr)
    chain = []
    if config.clip_grad_value is not None:
        chain.append(optax.clip(config.clip_grad_value))
    if config.clip_grad_norm is not None:
        chain.append(optax.clip_by_global_norm(config.clip_grad_norm))
    if config.optimizer == "sgd":
        # darknet's native optimizer (the reference only offers Adam)
        if config.weight_decay:
            chain.append(optax.add_decayed_weights(config.weight_decay))
        chain.append(
            optax.sgd(learning_rate=schedule, momentum=config.momentum)
        )
    elif config.optimizer == "adam":
        chain.append(
            optax.adamw(
                learning_rate=schedule,
                b1=config.momentum,
                b2=config.beta2,
                eps=config.eps,
                weight_decay=config.weight_decay,
            )
            if config.weight_decay
            else optax.adam(
                learning_rate=schedule,
                b1=config.momentum,
                b2=config.beta2,
                eps=config.eps,
            )
        )
    else:
        raise ValueError(f"unknown optimizer {config.optimizer!r}")
    return optax.chain(*chain)


def train_init(
    model: YoloModel, config: TrainConfig, seed: int = 0
) -> Tuple[TrainState, optax.GradientTransformation]:
    params, state = model.init(jax.random.PRNGKey(seed))
    optimizer = make_optimizer(config)
    opt_state = optimizer.init(params)
    ema = ema_init(params) if config.use_ema else None
    return (
        TrainState(
            params=params,
            state=state,
            opt_state=opt_state,
            step=jnp.zeros((), jnp.int32),
            ema_params=ema,
        ),
        optimizer,
    )


def collect_step_metrics(config: TrainConfig, out, aux, pred) -> dict:
    """Per-step metrics dict from the loss output — losses always; the
    optional telemetry (benchmark accuracy/recall/precision, decoded-box
    debug stats, the objectness heatmap sample) per the config flags.
    Shared by the single-device/DP step and the pipeline step so every
    parallelism path produces the same TensorBoard panels."""
    metrics = {
        "total_loss": out.total_loss,
        "iou_loss": out.iou_loss,
        "classification_loss": out.classification_loss,
        "objectness_loss": out.objectness_loss,
        "num_matched": aux.matching.num_matched(),
    }
    if out.uncertainty_loss is not None:  # gaussian heads
        metrics["uncertainty_loss"] = out.uncertainty_loss
    if config.benchmark_confidence is not None:
        from ..loss.benchmark import yolo_benchmark

        bench = yolo_benchmark(pred, aux.matching, config.benchmark_confidence)
        metrics.update({
            "obj_accuracy": bench.obj_accuracy,
            "obj_recall": bench.obj_recall,
            "obj_precision": bench.obj_precision,
            "class_accuracy": bench.class_accuracy,
        })
    if config.debug_stat:
        # mean decoded box stats (logging.rs:135-146 debug_stat tuple)
        mean = jnp.mean(pred.cycxhw, axis=(0, 1))
        metrics.update({
            "debug/cy_mean": mean[0], "debug/cx_mean": mean[1],
            "debug/h_mean": mean[2], "debug/w_mean": mean[3],
        })
    if config.return_obj_sample:
        metrics["obj_sample"] = pred.obj_prob()[0]
    return metrics


def make_batch_grads(
    model: YoloModel,
    config: TrainConfig,
    data_format: str = "NCHW",
    accum: int = 1,
) -> Callable:
    """(params, state, images, boxes, classes, mask) → (grads, new_state,
    metrics) for one logical batch.

    ``accum > 1`` is gradient accumulation with darknet's
    ``batch``/``subdivisions`` semantics ([net] subdivisions — the reference
    parses it, darknet-config/src/net.rs, but tch always holds the whole
    batch): the logical batch is split into ``accum`` sequential
    micro-batches under ``lax.scan``, each running forward+backward before
    the next starts, so activation memory scales with ``batch/accum`` while
    the gradient is the average over the full batch.  BN running stats
    thread through the micro-batches sequentially, exactly like darknet's
    per-subdivision forward.  Loss metrics are micro-batch means (the same
    masked-mean-of-means the DP path produces per replica); ``num_matched``
    is the sum over the logical batch.
    """
    if accum < 1:
        raise ValueError(f"accum must be >= 1, got {accum}")

    if config.darknet_loss is not None:
        head_keys, head_params = config.darknet_loss
        from ..loss.darknet_loss import darknet_detection_loss_with_metrics

        def loss_fn(params, state, images, gt_boxes, gt_classes, gt_mask):
            if config.compute_dtype is not None:
                images = images.astype(config.compute_dtype)
            outs, new_state = model.apply(
                params, state, images, train=True, data_format=data_format,
                output_keys=head_keys)
            raws = tuple(outs[k].astype(jnp.float32) for k in head_keys)
            # darknet truth rows (x, y, w, h, class) in image-ratio units;
            # x=0 is the `!truth.x break` sentinel — labels must be
            # prefix-packed (every loader fills from the front)
            truth = jnp.stack([
                jnp.where(gt_mask, gt_boxes[..., 1].astype(jnp.float32), 0.0),
                gt_boxes[..., 0].astype(jnp.float32),
                gt_boxes[..., 3].astype(jnp.float32),
                gt_boxes[..., 2].astype(jnp.float32),
                gt_classes.astype(jnp.float32),
            ], axis=-1)
            loss, dk_metrics = darknet_detection_loss_with_metrics(
                raws, truth, head_params)
            return loss, (loss, new_state, dk_metrics, None)

        def step_metrics(out, aux, pred):
            # per-term components + darknet's printed training stats,
            # recovered from the delta buffers (loss/darknet_loss.py
            # _head_cost_delta_stats) — the exact-loss trainer logs the
            # same loss/* panels as the production loss plus darknet's
            # own avg_iou/obj/no_obj/recall taxonomy
            metrics = {"total_loss": out}
            metrics.update(aux)
            return metrics
    else:
        def loss_fn(params, state, images, gt_boxes, gt_classes, gt_mask):
            if config.compute_dtype is not None:
                images = images.astype(config.compute_dtype)
            pred, new_state = model.apply(params, state, images, train=True,
                                          data_format=data_format)
            out, aux = yolo_loss(pred, gt_boxes, gt_classes, gt_mask, config.loss)
            return out.total_loss, (out, new_state, aux, pred)

        def step_metrics(out, aux, pred):
            return collect_step_metrics(config, out, aux, pred)

    vag = jax.value_and_grad(loss_fn, has_aux=True)

    def batch_grads(params, state, images, gt_boxes, gt_classes, gt_mask):
        if accum == 1:
            (_, (out, new_state, aux, pred)), grads = vag(
                params, state, images, gt_boxes, gt_classes, gt_mask)
            return grads, new_state, step_metrics(out, aux, pred)

        batch = images.shape[0]
        if batch % accum:
            raise ValueError(
                f"batch size {batch} is not divisible by "
                f"accumulation_steps {accum}")
        mb = batch // accum
        split = lambda x: x.reshape((accum, mb) + x.shape[1:])

        def body(carry, xs):
            state, grad_acc = carry
            (_, (out, new_state, aux, pred)), grads = vag(params, state, *xs)
            grad_acc = jax.tree_util.tree_map(jnp.add, grad_acc, grads)
            return (new_state, grad_acc), step_metrics(out, aux, pred)

        zero = jax.tree_util.tree_map(jnp.zeros_like, params)
        (new_state, grads), ys = jax.lax.scan(
            body, (state, zero),
            tuple(split(x) for x in (images, gt_boxes, gt_classes, gt_mask)))
        grads = jax.tree_util.tree_map(lambda g: g / accum, grads)
        metrics = {
            k: (jnp.sum(v, 0) if k == "num_matched"
                else v[0] if k == "obj_sample"  # first image overall
                else jnp.mean(v, 0))
            for k, v in ys.items()
        }
        return grads, new_state, metrics

    return batch_grads


def make_train_step(
    model: YoloModel,
    optimizer: optax.GradientTransformation,
    config: TrainConfig,
    data_format: str = "NCHW",
    jit: bool = True,
    accum: int = 1,
) -> Callable:
    """Build the jitted train step:
    (TrainState, images, gt_boxes, gt_classes, gt_mask) → (TrainState, metrics).

    ``jit=False`` returns the raw traced function (used by
    :func:`make_multi_step` to scan several steps into one program).
    ``accum`` enables gradient accumulation — see :func:`make_batch_grads`.
    """
    batch_grads = make_batch_grads(model, config, data_format, accum)

    def step(ts: TrainState, images, gt_boxes, gt_classes, gt_mask):
        grads, new_state, metrics = batch_grads(
            ts.params, ts.state, images, gt_boxes, gt_classes, gt_mask)

        updates, new_opt_state = optimizer.update(grads, ts.opt_state, ts.params)
        new_params = optax.apply_updates(ts.params, updates)
        new_state = model.clamp_running_vars(new_state)

        new_step = ts.step + 1
        new_ema = (
            ema_update(ts.ema_params, new_params, new_step, config.ema_decay)
            if ts.ema_params is not None
            else None
        )

        if config.log_weights_and_grads:
            metrics.update(param_maxima(new_params, grads))
        return (
            TrainState(new_params, new_state, new_opt_state, new_step, new_ema),
            metrics,
        )

    return jax.jit(step, donate_argnums=(0,)) if jit else step


def param_maxima(params, grads=None):
    """Per-parameter |w|max (and |grad|max) scalars, keyed the way the TB
    worker expects (logging.rs:361-376 taxonomy)."""
    from ..utils.trees import tree_path_name

    out = {}
    for path, leaf in jax.tree_util.tree_flatten_with_path(params)[0]:
        out[f"weights_max/{tree_path_name(path)}"] = jnp.max(jnp.abs(leaf))
    if grads is not None:
        for path, leaf in jax.tree_util.tree_flatten_with_path(grads)[0]:
            out[f"grads_max/{tree_path_name(path)}"] = jnp.max(jnp.abs(leaf))
    return out


def make_multi_step(
    model: YoloModel,
    optimizer: optax.GradientTransformation,
    config: TrainConfig,
    k: int,
    data_format: str = "NCHW",
    accum: int = 1,
) -> Callable:
    """``k`` train steps scanned into ONE XLA program.

    (TrainState, images[k,b,...], boxes[k,b,...], classes[k,b,...],
    mask[k,b,...]) → (TrainState, metrics stacked [k]).

    Amortizes per-step host dispatch: the single-step path leaves ~6 ms/step
    of gaps between programs at yolov4-csp-608 b16 (96.1 ms wall vs 89.3 ms
    device time); the scanned loop runs back-to-back on device
    (measured 96.1 → 90.4 ms/step).  Semantics are identical to ``k``
    sequential ``make_train_step`` calls — the LR schedule reads the optax
    step count, which advances inside the scan.
    """
    step = make_train_step(model, optimizer, config, data_format, jit=False,
                           accum=accum)

    def multi(ts: TrainState, images, gt_boxes, gt_classes, gt_mask):
        def body(carry, xs):
            new_ts, metrics = step(carry, *xs)
            return new_ts, metrics

        return jax.lax.scan(body, ts, (images, gt_boxes, gt_classes, gt_mask))

    return jax.jit(multi, donate_argnums=(0,))
