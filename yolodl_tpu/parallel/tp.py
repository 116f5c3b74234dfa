"""Tensor (channel) parallelism via GSPMD sharding annotations.

The reference's only scaling axis is the batch (SURVEY §2.8; its manual
multi-GPU DP lives in train/src/train/multi_gpu.rs).  This module adds the
missing *model* axis for networks whose weights + optimizer state do not
fit one chip (cspx-p7 at 1536², or wide custom heads): convolution kernels
are sharded along their OUTPUT-CHANNEL dimension over a ``model`` mesh
axis, so each chip holds (and updates) ``1/n``-th of every large layer.

TPU-first design — this is the scaling-book recipe, not an NCCL port:

- we only *annotate*: parameters, optimizer state, and EMA leaves get
  ``NamedSharding``s by a rank/divisibility rule (conv HWIO → shard O,
  dense [I,O] → shard O, per-channel vectors [O] → shard O); the batch is
  sharded over the ``data`` axis of the same 2-D mesh;
- the train step itself is the SAME function as the single-device path
  (``train.loop.make_train_step``) compiled under ``jax.jit``.  Unlike
  ``shard_map``, ``jit`` keeps *global* array semantics, so XLA's GSPMD
  partitioner inserts every collective (all-gathers around contractions,
  psums for cross-shard reductions) itself, and the step is numerically
  the single-device step — including full-batch BN statistics (stricter
  than the DP path's per-replica stats; tested to track the single-device
  step on a BN model, which shard_map DP cannot claim);
- a ``with_sharding_constraint`` on the output TrainState pins the layout
  steady-state so parameters never migrate between steps.

Memory per chip for sharded layers: weights, Adam mu/nu, and EMA all
drop by the ``model``-axis size (a ZeRO-3-like effect that falls out of
the annotations), composing with data parallelism on the other mesh axis.

Layers whose channel count does not divide the axis (e.g. detection
heads with ``(5+classes)·anchors`` outputs) stay replicated — the rule is
per-leaf, and GSPMD stitches mixed layouts correctly by construction.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional, Sequence

import jax
import numpy as np
import optax
from jax.sharding import Mesh, NamedSharding
from jax.sharding import PartitionSpec as P

from ..models.builder import YoloModel
from ..train.loop import TrainConfig, TrainState, make_train_step
from .mesh import DATA_AXIS

MODEL_AXIS = "model"


def make_tp_mesh(
    n_data: int, n_model: int, devices: Optional[Sequence] = None
) -> Mesh:
    """2-D ``(data, model)`` mesh over the first ``n_data·n_model`` devices.

    The model axis should map to the innermost (fastest-ICI) dimension of
    the physical topology — on a default device enumeration, taking
    contiguous device blocks per data replica does exactly that.
    """
    if devices is None:
        devices = jax.devices()
    need = n_data * n_model
    if len(devices) < need:
        raise ValueError(
            f"mesh {n_data}x{n_model} needs {need} devices, "
            f"have {len(devices)}")
    devs = np.asarray(devices[:need]).reshape(n_data, n_model)
    return Mesh(devs, (DATA_AXIS, MODEL_AXIS))


def _leaf_spec(x, n_model: int) -> P:
    """Channel-sharding rule for one array leaf.

    Shards the trailing output-feature dimension when it divides the model
    axis: conv kernels are HWIO (device layout, see models/builder.py
    DIMSPEC), dense kernels [in, out], and every per-channel vector (conv
    bias, BN scale/bias/running stats, their Adam moments and EMA shadows)
    is [O].  Anything else — scalars, counters, non-divisible heads —
    stays replicated.  The rule is self-consistent per layer because every
    leaf of one layer shares the same O.
    """
    shape = getattr(x, "shape", ())
    if len(shape) == 4 and shape[3] % n_model == 0 and shape[3] >= n_model:
        return P(None, None, None, MODEL_AXIS)
    if len(shape) == 2 and shape[1] % n_model == 0 and shape[1] >= n_model:
        return P(None, MODEL_AXIS)
    if len(shape) == 1 and shape[0] % n_model == 0 and shape[0] >= n_model:
        return P(MODEL_AXIS)
    return P()


def tp_shardings(mesh: Mesh, tree: Any) -> Any:
    """NamedSharding pytree for ``tree`` under the channel-sharding rule."""
    n = mesh.shape[MODEL_AXIS]
    return jax.tree_util.tree_map(
        lambda x: NamedSharding(mesh, _leaf_spec(x, n)), tree)


def place_tp_state(mesh: Mesh, ts: TrainState) -> TrainState:
    """Place a TrainState with params/opt-state/EMA channel-sharded."""
    return jax.tree_util.tree_map(
        lambda x, s: jax.device_put(x, s), ts, tp_shardings(mesh, ts))


def shard_batch_tp(mesh: Mesh, batch: Any) -> Any:
    """Batch leaves sharded over the data axis (replicated over model)."""
    sharding = NamedSharding(mesh, P(DATA_AXIS))
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, sharding), batch)


def make_tp_train_step(
    model: YoloModel,
    optimizer: optax.GradientTransformation,
    config: TrainConfig,
    mesh: Mesh,
    data_format: str = "NCHW",
    accum: int = 1,
):
    """Channel-sharded (optionally × data-parallel) train step.

    Signature matches make_dp_train_step: (TrainState, images, gt_boxes,
    gt_classes, gt_mask) → (TrainState, metrics), with the TrainState
    placed by :func:`place_tp_state` and the batch by
    :func:`shard_batch_tp`.  Semantics are exactly the single-device
    step's (global-batch BN, global matcher/loss) — only the layout and
    the XLA-inserted collectives differ.
    """
    base = make_train_step(model, optimizer, config, data_format=data_format,
                           jit=False, accum=accum)

    def step(ts: TrainState, images, gt_boxes, gt_classes, gt_mask):
        new_ts, metrics = base(ts, images, gt_boxes, gt_classes, gt_mask)
        # pin the steady-state layout: without this GSPMD may choose a
        # different output sharding and parameters would re-shard each step
        new_ts = jax.lax.with_sharding_constraint(
            new_ts, tp_shardings(mesh, new_ts))
        return new_ts, metrics

    return jax.jit(step, donate_argnums=(0,))


def _zero_leaf_spec(x, n_data: int, n_model: int) -> P:
    """ZeRO-1 rule for one OPTIMIZER-state leaf on a (data, model) mesh:
    keep the TP output-channel sharding and additionally shard a second
    dimension over the data axis where it divides — conv-kernel moments
    [kh,kw,ci,co] shard ci, dense moments [i,o] shard i.  Per-channel
    vectors and non-divisible leaves keep the plain TP spec (they are the
    small tail of the state)."""
    shape = getattr(x, "shape", ())
    if len(shape) == 4 and shape[3] % n_model == 0 and shape[3] >= n_model:
        if shape[2] % n_data == 0 and shape[2] >= n_data:
            return P(None, None, DATA_AXIS, MODEL_AXIS)
        return P(None, None, None, MODEL_AXIS)
    if len(shape) == 2 and shape[1] % n_model == 0 and shape[1] >= n_model:
        if shape[0] % n_data == 0 and shape[0] >= n_data:
            return P(DATA_AXIS, MODEL_AXIS)
        return P(None, MODEL_AXIS)
    return _leaf_spec(x, n_model)


def tp_zero_shardings(mesh: Mesh, ts: TrainState) -> TrainState:
    """Shardings for a TrainState under TP × ZeRO-1: params/BN-state/EMA
    follow the TP channel rule; optimizer-state moments are ADDITIONALLY
    sharded over the data axis (``_zero_leaf_spec``), so each chip holds
    ``1/(n_data·n_model)`` of the large Adam vectors.

    This is the GSPMD form of ZeRO-1 (scaling-book recipe): no manual
    reduce-scatter/all-gather — annotating the optimizer state is enough,
    XLA partitions the elementwise optimizer update and inserts the
    collectives.  Numerics are the single-device step's exactly (an
    elementwise update on a slice == on the full vector)."""
    n_d = mesh.shape[DATA_AXIS]
    n_m = mesh.shape[MODEL_AXIS]
    tp = tp_shardings(mesh, ts)
    opt = jax.tree_util.tree_map(
        lambda x: NamedSharding(mesh, _zero_leaf_spec(x, n_d, n_m)),
        ts.opt_state)
    return dataclasses.replace(tp, opt_state=opt)


def place_tp_zero_state(mesh: Mesh, ts: TrainState) -> TrainState:
    """Place a TrainState per :func:`tp_zero_shardings`."""
    return jax.tree_util.tree_map(
        lambda x, s: jax.device_put(x, s), ts, tp_zero_shardings(mesh, ts))


def make_tp_zero_train_step(
    model: YoloModel,
    optimizer: optax.GradientTransformation,
    config: TrainConfig,
    mesh: Mesh,
    data_format: str = "NCHW",
    accum: int = 1,
):
    """TP × ZeRO-1 train step: identical computation to
    :func:`make_tp_train_step`, with the steady-state optimizer layout
    pinned to the data-axis-sharded ZeRO specs."""
    base = make_train_step(model, optimizer, config, data_format=data_format,
                           jit=False, accum=accum)

    def step(ts: TrainState, images, gt_boxes, gt_classes, gt_mask):
        new_ts, metrics = base(ts, images, gt_boxes, gt_classes, gt_mask)
        new_ts = jax.lax.with_sharding_constraint(
            new_ts, tp_zero_shardings(mesh, new_ts))
        return new_ts, metrics

    return jax.jit(step, donate_argnums=(0,))


def make_tp_infer(model: YoloModel, mesh: Mesh):
    """Jitted ``(params, state, images_nchw) → MergedDetection`` with the
    params channel-sharded over ``mesh``'s model axis (place them with
    ``jax.device_put(params, tp_shardings(mesh, params))``); the batch is
    sharded over the data axis."""
    batch_sharding = NamedSharding(mesh, P(DATA_AXIS))

    def infer(params, state, images):
        images = jax.lax.with_sharding_constraint(images, batch_sharding)
        pred, _ = model.apply(params, state, images, train=False)
        return pred

    return jax.jit(infer)
