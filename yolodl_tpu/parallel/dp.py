"""shard_map data-parallel training step.

Replaces the reference's manual single-process multi-GPU data parallelism
(train/src/train/multi_gpu.rs): per-device model replicas synced by
``VarStore::copy`` broadcast each step (:503-530), per-device backward, and
a fold-on-master "all-reduce" (:671-693).  On TPU this whole choreography
compiles to one SPMD program: parameters are replicated, the batch is
sharded over the ``data`` mesh axis, and gradients are averaged with a
single fused ``psum`` over ICI — no explicit broadcast step exists because
replicas never diverge.

BN cross-replica note (SURVEY §7.3): the reference updates running stats
per-replica and then worker-0's stats win via the next broadcast.  Here
running-stat updates are ``pmean``-averaged across replicas — a documented
(and strictly better) divergence: every replica sees the same, less noisy
statistics.
"""

from __future__ import annotations

from typing import Any, Callable

import jax
import optax
from jax.sharding import Mesh, NamedSharding
from jax.sharding import PartitionSpec as P

from ..models.builder import YoloModel
from ..train.ema import ema_update
from ..train.loop import TrainConfig, TrainState
from .mesh import DATA_AXIS

Array = jax.Array


def shard_batch(mesh: Mesh, batch: Any) -> Any:
    """Place host arrays with leading batch axis sharded over the data axis."""
    sharding = NamedSharding(mesh, P(DATA_AXIS))
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, sharding), batch
    )


def shard_batch_multiprocess(mesh: Mesh, batch: Any) -> Any:
    """Multi-controller variant of :func:`shard_batch`: every process passes
    only its LOCAL slice of the global batch (local_batch = batch ·
    local_devices / global_devices) and receives global arrays sharded over
    the data axis.  Process shards concatenate in mesh device order, which
    groups each process's devices contiguously (``jax.devices()`` order) —
    so process *i* must stream records ``[i::num_processes]``."""
    import numpy as np

    sharding = NamedSharding(mesh, P(DATA_AXIS))
    return jax.tree_util.tree_map(
        lambda x: jax.make_array_from_process_local_data(
            sharding, np.asarray(x)),
        batch,
    )


def make_dp_train_step(
    model: YoloModel,
    optimizer: optax.GradientTransformation,
    config: TrainConfig,
    mesh: Mesh,
    data_format: str = "NCHW",
    accum: int = 1,
) -> Callable:
    """Data-parallel train step over ``mesh``.

    Signature: (TrainState, images, gt_boxes, gt_classes, gt_mask)
    → (TrainState, metrics); state replicated, batch sharded on axis 0.

    ``accum > 1`` composes gradient accumulation with DP: each replica's
    shard is further split into ``accum`` sequential micro-batches (see
    ``train.loop.make_batch_grads``), so the logical batch is
    ``n_devices × accum`` micro-batches while only ``batch/(n·accum)``
    activations live at once per chip.
    """
    import dataclasses as _dc

    from ..train.loop import make_batch_grads

    # obj_sample is per-shard data (an [N] activation sample) and cannot be
    # emitted through a replicated out_spec — the DP path never returns it
    shard_cfg = _dc.replace(config, return_obj_sample=False)
    batch_grads = make_batch_grads(model, shard_cfg, data_format, accum)

    def shard_step(ts: TrainState, images, gt_boxes, gt_classes, gt_mask):
        # per-shard forward/backward on the local micro-batch(es)
        grads, new_state, metrics = batch_grads(
            ts.params, ts.state, images, gt_boxes, gt_classes, gt_mask)

        # gradient + metric all-reduce over ICI (the entire multi_gpu.rs
        # scatter/gather/broadcast choreography collapses to this psum)
        grads = jax.lax.pmean(grads, DATA_AXIS)
        # cross-replica BN statistics (documented divergence, see module doc)
        new_state = jax.lax.pmean(new_state, DATA_AXIS)

        updates, new_opt_state = optimizer.update(grads, ts.opt_state, ts.params)
        new_params = optax.apply_updates(ts.params, updates)
        new_state = model.clamp_running_vars(new_state)

        new_step = ts.step + 1
        new_ema = (
            ema_update(ts.ema_params, new_params, new_step, config.ema_decay)
            if ts.ema_params is not None
            else None
        )

        metrics = {
            k: (jax.lax.psum(v, DATA_AXIS) if k == "num_matched"
                else jax.lax.pmean(v, DATA_AXIS))
            for k, v in metrics.items()
        }
        if config.log_weights_and_grads:
            # params/grads are identical across replicas post-pmean
            from ..train.loop import param_maxima

            metrics.update(param_maxima(new_params, grads))
        return (
            TrainState(new_params, new_state, new_opt_state, new_step, new_ema),
            metrics,
        )

    replicated = P()
    batch_sharded = P(DATA_AXIS)

    mapped = jax.shard_map(
        shard_step,
        mesh=mesh,
        in_specs=(replicated, batch_sharded, batch_sharded, batch_sharded, batch_sharded),
        out_specs=(replicated, replicated),
        check_vma=False,
    )
    return jax.jit(mapped, donate_argnums=(0,))


def replicate_state(mesh: Mesh, ts: TrainState) -> TrainState:
    """Place a TrainState replicated on every mesh device."""
    sharding = NamedSharding(mesh, P())
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sharding), ts)
