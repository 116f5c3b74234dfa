"""ZeRO-1 data parallelism: optimizer-state sharding over the data axis.

Plain DP (``parallel/dp.py``) replicates parameters AND optimizer state on
every device, so Adam costs 3x the model size per chip.  ZeRO-1 keeps the
forward/backward replicated but shards the optimizer across the data axis:

    reduce_scatter(grads)  →  each device owns 1/n of the gradient mean
    optimizer.update       →  on the local 1/n slice only (mu/nu are 1/n)
    all_gather(new params) →  replicas stay bit-identical

The reference has nothing remotely comparable (its "all-reduce" is a fold
on the master GPU, train/src/train/multi_gpu.rs:671-693); this is the
standard TPU recipe — both collectives ride ICI and XLA overlaps them with
the step.  Optimizer state per chip drops from 2·P (Adam mu+nu) to 2·P/n.

Works with any *elementwise* optax chain (adam/adamw/sgd/clip-by-value):
updating a flat slice then gathering equals updating the full vector.
``clip_by_global_norm`` needs the global norm and is rejected — use
``clip_grad_value`` or plain DP.
"""

from __future__ import annotations

from typing import Callable, Tuple

import dataclasses
import jax
import jax.numpy as jnp
import optax
from jax.flatten_util import ravel_pytree
from jax.sharding import Mesh, NamedSharding
from jax.sharding import PartitionSpec as P

from ..models.builder import YoloModel
from ..train.ema import ema_update
from ..train.loop import TrainConfig, TrainState, make_batch_grads, make_optimizer
from .mesh import DATA_AXIS

Array = jax.Array


def _flat_geometry(params, n_devices: int) -> Tuple[int, int]:
    """(padded_total, per_shard) for the raveled parameter vector."""
    total = sum(int(jnp.size(l)) for l in jax.tree_util.tree_leaves(params))
    per_shard = -(-total // n_devices)  # ceil
    return per_shard * n_devices, per_shard


def zero_init(
    model: YoloModel, config: TrainConfig, mesh: Mesh, seed: int = 0
) -> Tuple[TrainState, optax.GradientTransformation]:
    """Like ``train_init`` but with the optimizer state built per-shard.

    The returned ``TrainState.opt_state`` leaves with a parameter-sized
    dimension are laid out ``[n_devices * per_shard]`` and sharded over the
    data axis; scalars (e.g. Adam's step count) stay replicated.
    """
    if config.clip_grad_norm is not None:
        raise ValueError(
            "ZeRO-1 shards the optimizer elementwise; clip_grad_norm needs "
            "the global gradient norm — use clip_grad_value or plain DP")
    params, state = model.init(jax.random.PRNGKey(seed))
    optimizer = make_optimizer(config)
    n = mesh.devices.size
    padded, per_shard = _flat_geometry(params, n)

    # per-shard optimizer state, then laid out as one global array
    shard_zero = jnp.zeros((per_shard,), jnp.float32)
    one = optimizer.init(shard_zero)
    opt_state = jax.tree_util.tree_map(
        lambda l: (jnp.zeros((n * per_shard,), l.dtype)
                   if getattr(l, "ndim", 0) else l),
        one,
    )
    from ..train.ema import ema_init

    ema = ema_init(params) if config.use_ema else None
    ts = TrainState(
        params=params,
        state=state,
        opt_state=opt_state,
        step=jnp.zeros((), jnp.int32),
        ema_params=ema,
    )
    return ts, optimizer


def zero_specs(ts: TrainState) -> TrainState:
    """PartitionSpec pytree for a ZeRO TrainState: optimizer vectors sharded
    over the data axis, everything else replicated."""
    opt_spec = jax.tree_util.tree_map(
        lambda l: P(DATA_AXIS) if getattr(l, "ndim", 0) else P(),
        ts.opt_state,
    )
    return TrainState(
        params=jax.tree_util.tree_map(lambda _: P(), ts.params),
        state=jax.tree_util.tree_map(lambda _: P(), ts.state),
        opt_state=opt_spec,
        step=P(),
        ema_params=(jax.tree_util.tree_map(lambda _: P(), ts.ema_params)
                    if ts.ema_params is not None else None),
    )


def place_zero_state(mesh: Mesh, ts: TrainState) -> TrainState:
    """Device-place a ZeRO TrainState per :func:`zero_specs`."""
    specs = zero_specs(ts)
    return jax.tree_util.tree_map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)), ts, specs)


def make_zero_train_step(
    model: YoloModel,
    optimizer: optax.GradientTransformation,
    config: TrainConfig,
    mesh: Mesh,
    data_format: str = "NCHW",
    accum: int = 1,
) -> Callable:
    """ZeRO-1 train step over ``mesh``: batch sharded on axis 0, parameters
    replicated, optimizer state sharded.  Numerics match plain DP exactly
    (elementwise optimizer on a slice == on the full vector)."""
    n = mesh.devices.size
    shard_cfg = dataclasses.replace(config, return_obj_sample=False)
    batch_grads = make_batch_grads(model, shard_cfg, data_format, accum)

    def shard_step(ts: TrainState, images, gt_boxes, gt_classes, gt_mask):
        grads, new_state, metrics = batch_grads(
            ts.params, ts.state, images, gt_boxes, gt_classes, gt_mask)
        new_state = jax.lax.pmean(new_state, DATA_AXIS)

        flat_params, unravel = ravel_pytree(ts.params)
        flat_grads, _ = ravel_pytree(grads)
        padded, per_shard = _flat_geometry(ts.params, n)
        pad = padded - flat_grads.shape[0]
        flat_grads = jnp.pad(flat_grads, (0, pad))
        flat_params_pad = jnp.pad(flat_params, (0, pad))

        # reduce_scatter: each device receives the summed 1/n gradient slice
        local_grads = jax.lax.psum_scatter(
            flat_grads, DATA_AXIS, scatter_dimension=0, tiled=True) / n
        idx = jax.lax.axis_index(DATA_AXIS)
        local_params = jax.lax.dynamic_slice(
            flat_params_pad, (idx * per_shard,), (per_shard,))

        updates, new_opt_state = optimizer.update(
            local_grads, ts.opt_state, local_params)
        local_new = optax.apply_updates(local_params, updates)

        # replicas reassemble identical parameters over ICI
        flat_new = jax.lax.all_gather(
            local_new, DATA_AXIS, axis=0, tiled=True)[:flat_params.shape[0]]
        new_params = unravel(flat_new)
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
            from ..train.loop import param_maxima

            # the averaged gradient only exists scattered across shards;
            # pmean the local-grad tree (telemetry-only collective, gated
            # on the flag) so grads_max/* match the DP path
            metrics.update(
                param_maxima(new_params, jax.lax.pmean(grads, DATA_AXIS)))
        return (
            TrainState(new_params, new_state, new_opt_state, new_step, new_ema),
            metrics,
        )

    batch_sharded = P(DATA_AXIS)
    # opt_state leaves with a vector dim are sharded; in/out specs must
    # mirror zero_specs — build them from an abstract TrainState
    def spec_of(ts_example: TrainState):
        return zero_specs(ts_example)

    def step(ts: TrainState, images, gt_boxes, gt_classes, gt_mask):
        specs = spec_of(ts)
        mapped = jax.shard_map(
            shard_step,
            mesh=mesh,
            in_specs=(specs, batch_sharded, batch_sharded, batch_sharded,
                      batch_sharded),
            out_specs=(specs, P()),
            check_vma=False,
        )
        return mapped(ts, images, gt_boxes, gt_classes, gt_mask)

    return jax.jit(step, donate_argnums=(0,))
