"""Full-model spatially-sharded inference: height over the device mesh.

The reference's only scaling axis is the batch (SURVEY §2.8); its analogous
"large axis" concern is spatial (SURVEY §5.7).  This module runs a whole
detection graph with the image HEIGHT sharded across chips:

- a planner walks the graph IR and finds the longest *prefix* of nodes that
  can execute on height shards exactly — convolutions and SPP pools via
  halo exchange (``ppermute`` neighbor transfers over ICI), stride-2
  downsamples on even local heights, routes/shortcuts/upsamples locally;
- the prefix runs inside ``shard_map``; at the cut (where the spatial
  extent stops dividing the mesh, or an op needs global context) the live
  tensors are ``all_gather``-ed along H — by then the network has
  downsampled 8-32×, so the gathered tail is small — and the stock model
  executes the remainder via ``GraphModel.apply(node_overrides=...)``;
- outputs are bitwise the unsharded model's (tested vs single-device).

This is how inputs larger than one chip's HBM (1216²+ satellite tiles)
are served: the memory-dominant high-resolution stages never exist
unsharded anywhere.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Set, Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh
from jax.sharding import PartitionSpec as P

from .. import activations
from ..config import newslab as cfg
from ..ops.norm import batch_norm_apply
from ..ops import simple
from .spatial import SPACE_AXIS, halo_exchange

Array = jax.Array

DIMSPEC = ("NHWC", "HWIO", "NHWC")


def _halo(x_local: Array, halo: int, fill: float, axis_name: str) -> Array:
    return halo_exchange(x_local, halo, axis_name, fill=fill)


# ----------------------------------------------------------------------
# planning


def _static_h(node) -> Optional[int]:
    out = node.output_shape
    if not out.is_tensor:
        return None
    dims = out.tensor_shape()
    if len(dims) != 4 or not dims[2].is_known:  # logical NCHW
        return None
    return dims[2].size


def _conv_shardable(layer: cfg.ConvBn2D, in_h: int, n: int) -> bool:
    if in_h % n:
        return False
    lh = in_h // n
    if layer.d != 1:
        return False
    # exact cases: "same"-family pad (k-1)//2 via halo, or zero padding
    # with k ≤ s (aligned non-overlapping windows; k > s pad 0 would lose
    # k−1 rows per shard boundary)
    pad_ok = (layer.padding == (layer.k - 1) // 2
              or (layer.padding == 0 and layer.k <= layer.s))
    return pad_ok and lh % layer.s == 0 and lh >= max(1, layer.padding)


def _pool_shardable(layer: cfg.MaxPool, in_h: int, n: int) -> bool:
    if in_h % n:
        return False
    lh = in_h // n
    tp = layer.total_padding if layer.total_padding is not None else 0
    if layer.maxpool_depth:
        return False
    if (layer.stride_y == layer.size == layer.stride_x and tp // 2 == 0
            and (layer.total_padding is not None or layer.padding == 0)
            and lh % layer.size == 0):
        # aligned non-overlapping windows; darknet's default tp=size−1
        # puts all padding at the hi edge (lo = tp//2 = 0), which only the
        # last shard can read — and on size-aligned heights it never does.
        # (torch-style symmetric `padding` would pad every shard edge.)
        return True
    if (layer.pool_kind == "max"
            and layer.stride_y == 1 and layer.stride_x == 1
            and layer.size % 2 == 1 and tp == layer.size - 1):
        # SPP window with symmetric halo (-inf fill is max-specific; an
        # avg pool here would need count-aware halos)
        return lh >= layer.size // 2
    return False


def plan_spatial_prefix(model, n_shards: int) -> Tuple[Set[int], List[int]]:
    """(sharded node keys, cut keys to gather) for an ``n_shards`` mesh.

    A node is sharded when every input is sharded and the op is exact on
    height shards at the graph's static sizes.  Cut keys are sharded nodes
    consumed by any unsharded node.
    """
    graph = model.graph
    sharded: Set[int] = set()
    for key in graph.order:
        node = graph.nodes[key]
        layer = node.config
        ik = node.input_keys
        if isinstance(layer, cfg.Input):
            h = _static_h(node)
            if ik.kind == "placeholder" and h and h % n_shards == 0:
                sharded.add(key)
            continue
        in_keys = list(ik.iter_keys())
        if not in_keys or not all(k in sharded for k in in_keys):
            continue
        in_h = _static_h(graph.nodes[in_keys[0]])
        if in_h is None:
            continue
        ok = False
        if isinstance(layer, cfg.ConvBn2D):
            ok = _conv_shardable(layer, in_h, n_shards)
        elif isinstance(layer, cfg.MaxPool):
            ok = _pool_shardable(layer, in_h, n_shards)
        elif isinstance(layer, cfg.UpSample2D):
            if layer.stride is not None and layer.reverse:
                ok = (in_h // n_shards) % layer.stride == 0
            else:
                # nearest-upsample is local only for integral scales
                ok = float(layer.scale).is_integer() and layer.scale >= 1
        elif isinstance(layer, (cfg.Concat2D, cfg.Sum2D, cfg.DarknetRoute,
                                cfg.DarknetSam)):
            hs = {_static_h(graph.nodes[k]) for k in in_keys}
            ok = len(hs) == 1 and None not in hs
        elif isinstance(layer, cfg.DarknetShortcut):
            hs = {_static_h(graph.nodes[k]) for k in in_keys}
            ok = len(hs) == 1 and None not in hs  # equal-H adds only
        if ok:
            sharded.add(key)

    consumers: Dict[int, List[int]] = {}
    for key in graph.order:
        for k2 in graph.nodes[key].input_keys.iter_keys():
            consumers.setdefault(k2, []).append(key)
    cut = [k for k in graph.order if k in sharded
           and any(c not in sharded for c in consumers.get(k, []))]
    return sharded, cut


# ----------------------------------------------------------------------
# sharded prefix execution


def _run_prefix(model, params, state, x_local, sharded: Set[int],
                axis_name: str, train: bool = False,
                bn_axes=()) -> Tuple[Dict[int, Array], Dict[str, dict]]:
    """Execute the sharded prefix.  Returns (node outputs, BN state
    updates).  In training mode BN statistics are psum-synchronized over
    ``bn_axes`` so sharded normalization equals the unsharded batch's."""
    from ..ops.norm import batch_norm_apply_sync

    graph = model.graph
    outputs: Dict[int, Array] = {}
    new_states: Dict[str, dict] = {}

    def _bn(name, p, out):
        if train:
            out, bn_s = batch_norm_apply_sync(
                p["bn"], state[name]["bn"], out, True, bn_axes)
            new_states[name] = {**state.get(name, {}), "bn": bn_s}
            return out
        out, _ = batch_norm_apply(p["bn"], state[name]["bn"], out, False)
        return out

    for key in graph.order:
        if key not in sharded:
            continue
        node = graph.nodes[key]
        layer = node.config
        name = model._pname[key]
        ik = node.input_keys

        if isinstance(layer, cfg.Input):
            outputs[key] = x_local
        elif isinstance(layer, cfg.ConvBn2D):
            xin = outputs[ik.single_key]
            p = params[name]
            xe = _halo(xin, layer.padding, 0.0, axis_name)
            out = jax.lax.conv_general_dilated(
                xe, p["w"].astype(xe.dtype), (layer.s, layer.s),
                ((0, 0), (layer.padding, layer.padding)),
                dimension_numbers=DIMSPEC, feature_group_count=layer.g,
            )
            if "b" in p:
                out = out + p["b"].astype(out.dtype)
            if layer.order == "act_bn":
                out = activations.apply(layer.act, out)
                if layer.bn.enabled:
                    out = _bn(name, p, out)
            else:
                if layer.bn.enabled:
                    out = _bn(name, p, out)
                out = activations.apply(layer.act, out)
            outputs[key] = out
        elif isinstance(layer, cfg.MaxPool):
            xin = outputs[ik.single_key]
            tp = layer.total_padding if layer.total_padding is not None else 0
            if layer.stride_y == layer.size:
                # aligned windows, lo pad 0 — per-shard == global
                outputs[key] = simple.max_pool2d(
                    xin, layer.size, layer.stride_y, layer.stride_x,
                    layer.padding, layer.total_padding, layer.pool_kind)
            else:  # stride-1 SPP window
                halo = layer.size // 2
                xe = _halo(xin, halo, -jnp.inf, axis_name)
                outputs[key] = jax.lax.reduce_window(
                    xe, -jnp.inf, jax.lax.max,
                    window_dimensions=(1, layer.size, layer.size, 1),
                    window_strides=(1, 1, 1, 1),
                    padding=((0, 0), (0, 0), (halo, halo), (0, 0)),
                )
        elif isinstance(layer, cfg.UpSample2D):
            xin = outputs[ik.single_key]
            if layer.stride is not None and layer.reverse:
                outputs[key] = simple.downsample2d(xin, layer.stride)
            else:
                outputs[key] = simple.upsample2d(xin, layer.scale)
        elif isinstance(layer, cfg.Concat2D):
            outputs[key] = simple.concat2d([outputs[k] for k in ik.iter_keys()])
        elif isinstance(layer, cfg.Sum2D):
            outputs[key] = simple.sum2d([outputs[k] for k in ik.iter_keys()])
        elif isinstance(layer, cfg.DarknetRoute):
            ins = [outputs[k] for k in ik.iter_keys()]
            ng = layer.num_groups
            if ng > 1:
                ins = [t[..., layer.group_id * (t.shape[-1] // ng):
                          (layer.group_id + 1) * (t.shape[-1] // ng)]
                       for t in ins]
            outputs[key] = ins[0] if len(ins) == 1 else simple.concat2d(ins)
        elif isinstance(layer, cfg.DarknetSam):
            ins = [outputs[k] for k in ik.iter_keys()]
            outputs[key] = ins[0] * ins[1]
        elif isinstance(layer, cfg.DarknetShortcut):
            ins = [outputs[k] for k in ik.iter_keys()]
            out = ins[0]
            for other in ins[1:]:
                c = min(out.shape[-1], other.shape[-1])
                out = (out.at[..., :c].add(other[..., :c])
                       if c < out.shape[-1] else out + other[..., :c])
            outputs[key] = activations.apply(layer.act, out)
        else:  # pragma: no cover - planner only admits the types above
            raise AssertionError(f"unplanned sharded op {type(layer)}")

        if key in model._sg_keys:
            # darknet stopbackward/onlyforward (network.c:362-363) and
            # training.freeze: mirror GraphModel.apply's output-site
            # stop_gradient so frozen prefixes stay frozen under spatial
            # sharding too (the overridden cut nodes skip apply's write
            # site, so it must happen here, inside the shard_map body).
            outputs[key] = jax.lax.stop_gradient(outputs[key])
    return outputs, new_states


def make_spatial_infer(model, mesh: Mesh):
    """Jitted ``(params, state, x_nchw) → MergedDetection`` with the
    height axis sharded over ``mesh``'s '{space}' axis for the prefix of
    the network that admits exact halo execution."""
    n = mesh.shape[SPACE_AXIS]
    sharded, cut = plan_spatial_prefix(model, n)
    if not cut:
        raise ValueError("no shardable prefix (input height not divisible "
                         f"by {n}?)")

    def worker(params, state, x):  # x: [B, Hl, W, C] local NHWC
        prefix, _ = _run_prefix(model, params, state, x, sharded, SPACE_AXIS)
        gathered = {
            k: jax.lax.all_gather(prefix[k], SPACE_AXIS, axis=1, tiled=True)
            for k in cut
        }
        pred, _ = model.apply(params, state, x, train=False,
                              data_format="NHWC", node_overrides=gathered)
        return pred

    mapped = jax.shard_map(
        worker,
        mesh=mesh,
        in_specs=(P(), P(), P(None, SPACE_AXIS)),
        out_specs=P(),
        check_vma=False,
    )

    def infer(params, state, x_nchw):
        x = jnp.transpose(x_nchw, (0, 2, 3, 1))
        return mapped(params, state, x)

    return jax.jit(infer)


# ----------------------------------------------------------------------
# 2-D (data × space) training


def make_data_space_mesh(n_data: int, n_space: int) -> Mesh:
    import numpy as np

    devs = np.asarray(jax.devices()[: n_data * n_space]).reshape(
        n_data, n_space)
    from .mesh import DATA_AXIS

    return Mesh(devs, (DATA_AXIS, SPACE_AXIS))


def shard_batch_2d(mesh: Mesh, batch):
    """(images_nchw, boxes, classes, mask) placed on a (data, space) mesh:
    images sharded on batch AND height, targets on batch only."""
    from jax.sharding import NamedSharding
    from .mesh import DATA_AXIS

    images, boxes, classes, mask = batch
    img_s = NamedSharding(mesh, P(DATA_AXIS, None, SPACE_AXIS, None))
    tgt_s = NamedSharding(mesh, P(DATA_AXIS))
    return (jax.device_put(images, img_s), jax.device_put(boxes, tgt_s),
            jax.device_put(classes, tgt_s), jax.device_put(mask, tgt_s))


def make_spatial_train_step(model, optimizer, config, mesh: Mesh):
    """Train step over a 2-D ("data", "space") mesh: batch data-parallel AND
    image height spatially sharded.

    - the shardable prefix runs on height shards with halo exchange; its
      batch norms are psum-synchronized over BOTH axes, so normalization
      equals the full unsharded batch's (stricter than the DP step's
      per-replica stats);
    - the tail (post-gather) runs replicated over space, per data replica
      (same BN semantics as the DP step);
    - gradients: pmean over "space" (the replicated tail loss makes each
      space member's prefix cotangent n_space× the true one — the mean
      restores it exactly, and tail grads are identical across space),
      then pmean over "data" (batch averaging, as in dp.py).

    Signature matches make_dp_train_step: (TrainState, images_nchw, boxes,
    classes, mask) → (TrainState, metrics), inputs placed by
    :func:`shard_batch_2d`.
    """
    import optax

    from ..loss import yolo_loss
    from ..train.ema import ema_update
    from ..train.loop import TrainState
    from .mesh import DATA_AXIS

    n_space = mesh.shape[SPACE_AXIS]
    sharded, cut = plan_spatial_prefix(model, n_space)
    if not cut:
        raise ValueError("no shardable prefix for this mesh/input size")

    def shard_step(ts: TrainState, images, gt_boxes, gt_classes, gt_mask):
        x = jnp.transpose(images, (0, 2, 3, 1))  # local NHWC
        if config.compute_dtype is not None:
            x = x.astype(config.compute_dtype)

        def loss_fn(params, state):
            prefix, bn_updates = _run_prefix(
                model, params, state, x, sharded, SPACE_AXIS,
                train=True, bn_axes=(DATA_AXIS, SPACE_AXIS))
            gathered = {
                k: jax.lax.all_gather(prefix[k], SPACE_AXIS, axis=1,
                                      tiled=True)
                for k in cut
            }
            pred, new_state = model.apply(
                params, state, x, train=True, data_format="NHWC",
                node_overrides=gathered)
            new_state = {**new_state, **bn_updates}
            out, aux = yolo_loss(pred, gt_boxes, gt_classes, gt_mask,
                                 config.loss)
            return out.total_loss, (out, new_state, aux, pred)

        (total, (out, new_state, aux, pred)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(ts.params, ts.state)

        grads = jax.lax.pmean(jax.lax.pmean(grads, SPACE_AXIS), DATA_AXIS)
        new_state = jax.lax.pmean(
            jax.lax.pmean(new_state, SPACE_AXIS), DATA_AXIS)

        updates, new_opt_state = optimizer.update(grads, ts.opt_state,
                                                  ts.params)
        new_params = optax.apply_updates(ts.params, updates)
        new_state = model.clamp_running_vars(new_state)
        new_step = ts.step + 1
        new_ema = (
            ema_update(ts.ema_params, new_params, new_step, config.ema_decay)
            if ts.ema_params is not None else None
        )
        def both(v):
            return jax.lax.pmean(jax.lax.pmean(v, SPACE_AXIS), DATA_AXIS)

        metrics = {
            "total_loss": both(out.total_loss),
            "iou_loss": both(out.iou_loss),
            "classification_loss": both(out.classification_loss),
            "objectness_loss": both(out.objectness_loss),
            "num_matched": jax.lax.psum(jax.lax.pmean(
                aux.matching.num_matched(), SPACE_AXIS), DATA_AXIS),
        }
        if config.benchmark_confidence is not None:
            from ..loss.benchmark import yolo_benchmark

            bench = yolo_benchmark(pred, aux.matching,
                                   config.benchmark_confidence)
            metrics.update({
                "obj_accuracy": both(bench.obj_accuracy),
                "obj_recall": both(bench.obj_recall),
                "obj_precision": both(bench.obj_precision),
                "class_accuracy": both(bench.class_accuracy),
            })
        if config.log_weights_and_grads:
            from ..train.loop import param_maxima

            metrics.update(param_maxima(new_params, grads))
        return (
            TrainState(new_params, new_state, new_opt_state, new_step,
                       new_ema),
            metrics,
        )

    from .mesh import DATA_AXIS as _D

    mapped = jax.shard_map(
        shard_step,
        mesh=mesh,
        in_specs=(P(), P(_D, None, SPACE_AXIS, None), P(_D), P(_D), P(_D)),
        out_specs=(P(), P()),
        check_vma=False,
    )
    return jax.jit(mapped, donate_argnums=(0,))
