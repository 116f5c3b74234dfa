"""Full-model spatially-sharded inference == unsharded (8-device CPU mesh).

parallel/spatial_model.py: height-sharded prefix with halo exchange +
all_gather at the cut.  The planner must find a non-trivial prefix on real
darknet graphs, and outputs must match the stock model exactly.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.slow  # e2e/CLI tier: excluded from `pytest -m 'not slow'`

from yolodl_tpu.config import darknet_cfg as dk
from yolodl_tpu.graph.from_darknet import graph_from_darknet
from yolodl_tpu.models import YoloModel
from yolodl_tpu.parallel.spatial_model import (
    make_spatial_infer, plan_spatial_prefix,
)
from yolodl_tpu.parallel.spatial import SPACE_AXIS

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _mesh(n):
    from jax.sharding import Mesh

    return Mesh(np.asarray(jax.devices()[:n]), (SPACE_AXIS,))


def _build(cfg_rel, size_from=None, size_to=None):
    path = os.path.join(REPO, cfg_rel)
    text = open(path).read()
    if size_from:
        text = text.replace(f"width={size_from}", f"width={size_to}").replace(
            f"height={size_from}", f"height={size_to}")
    import tempfile

    f = tempfile.NamedTemporaryFile("w", suffix=".cfg", delete=False)
    f.write(text)
    f.close()
    darknet = dk.Darknet.load(f.name)
    model = YoloModel(graph_from_darknet(darknet))
    params, state = model.init(jax.random.PRNGKey(0))
    return model, params, state


@pytest.mark.parametrize("cfg_rel,size_from,size_to,n", [
    ("cfg/darknet/yolov4-tiny.cfg", "416", "256", 8),
    ("cfg/darknet/yolov4-csp.cfg", "512", "256", 4),
])
def test_sharded_matches_unsharded(cfg_rel, size_from, size_to, n):
    if jax.device_count() < n:
        pytest.skip("needs virtual device mesh")
    model, params, state = _build(cfg_rel, size_from, size_to)
    size = int(size_to)

    sharded, cut = plan_spatial_prefix(model, n)
    assert len(sharded) > 5, "planner found no meaningful prefix"
    assert cut

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.uniform(0, 1, (1, 3, size, size)), jnp.float32)

    ref, _ = model.apply(params, state, x, train=False)
    infer = make_spatial_infer(model, _mesh(n))
    out = infer(params, state, x)

    np.testing.assert_allclose(np.asarray(out.cycxhw),
                               np.asarray(ref.cycxhw), atol=2e-5)
    np.testing.assert_allclose(np.asarray(out.obj_logit),
                               np.asarray(ref.obj_logit), atol=2e-5)
    np.testing.assert_allclose(np.asarray(out.class_logit),
                               np.asarray(ref.class_logit), atol=2e-5)


def test_spatial_train_step_matches_single_device():
    """One train step on a 2×4 (data × space) mesh == single-device step.

    The batch is duplicated across the data axis so per-replica tail BN
    statistics equal the full-batch statistics (prefix BN is psum-
    synchronized and exact regardless) — making the whole step exactly
    comparable."""
    if jax.device_count() < 8:
        pytest.skip("needs 8 virtual devices")
    from yolodl_tpu.parallel.spatial_model import (
        make_data_space_mesh, make_spatial_train_step, shard_batch_2d,
    )
    from yolodl_tpu.train import TrainConfig, make_train_step, train_init

    model, params, state = _build("cfg/darknet/yolov4-tiny.cfg", "416", "128")
    # SGD: linear in the gradients, so collective reduction-order noise
    # stays at fp epsilon (Adam's g/√v amplifies 1e-7 grad noise on
    # near-zero entries to lr-scale param differences)
    config = TrainConfig(optimizer="sgd")
    ts, opt = train_init(model, config, seed=0)

    rng = np.random.default_rng(4)
    half = jnp.asarray(rng.uniform(0, 1, (2, 3, 128, 128)), jnp.float32)
    images = jnp.concatenate([half, half], axis=0)  # duplicated over data
    boxes = np.zeros((4, 4, 4), np.float32)
    boxes[:, 0] = (0.5, 0.5, 0.4, 0.4)
    classes = np.zeros((4, 4), np.int32)
    mask = np.zeros((4, 4), bool)
    mask[:, 0] = True
    batch = (images, jnp.asarray(boxes), jnp.asarray(classes),
             jnp.asarray(mask))

    # single-device reference
    ref_fn = make_train_step(model, opt, config)
    ref_ts, ref_metrics = ref_fn(ts, *batch)

    # 2-D sharded
    mesh = make_data_space_mesh(2, 4)
    sp_fn = make_spatial_train_step(model, opt, config, mesh)
    ts2, _ = train_init(model, config, seed=0)
    from yolodl_tpu.parallel.dp import replicate_state

    ts2 = replicate_state(mesh, ts2)
    sp_ts, sp_metrics = sp_fn(ts2, *shard_batch_2d(mesh, batch))

    assert np.isfinite(float(sp_metrics["total_loss"]))
    np.testing.assert_allclose(float(sp_metrics["total_loss"]),
                               float(ref_metrics["total_loss"]), atol=1e-4)
    # parameters after the step agree
    for a, b in zip(jax.tree_util.tree_leaves(ref_ts.params),
                    jax.tree_util.tree_leaves(sp_ts.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-4)
    # BN running stats agree (prefix sync + duplicated-batch tail)
    for a, b in zip(jax.tree_util.tree_leaves(ref_ts.state),
                    jax.tree_util.tree_leaves(sp_ts.state)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-4)


def test_spatial_train_step_respects_frozen_layers():
    """stop_gradient_paths (darknet stopbackward / training.freeze) must
    hold under spatial sharding: _run_prefix re-implements the prefix
    forward, so it applies the same output-site stop_gradient as
    GraphModel.apply — frozen prefix params take zero gradient here too."""
    if jax.device_count() < 8:
        pytest.skip("needs 8 virtual devices")
    from yolodl_tpu.parallel.dp import replicate_state
    from yolodl_tpu.parallel.spatial_model import (
        make_data_space_mesh, make_spatial_train_step, shard_batch_2d,
    )
    from yolodl_tpu.train import TrainConfig, make_train_step, train_init

    path = os.path.join(REPO, "cfg/darknet/yolov4-tiny.cfg")
    text = open(path).read().replace("width=416", "width=128").replace(
        "height=416", "height=128")
    import tempfile

    f = tempfile.NamedTemporaryFile("w", suffix=".cfg", delete=False)
    f.write(text)
    f.close()
    darknet = dk.Darknet.load(f.name)
    graph = graph_from_darknet(darknet)
    graph.stop_gradient_paths = frozenset({"layer0", "layer1"})
    model = YoloModel(graph)
    assert model._sg_keys, "freeze paths did not resolve to node keys"
    config = TrainConfig(optimizer="sgd", weight_decay=0.0)
    ts0, opt = train_init(model, config, seed=0)
    # the step donates its TrainState — snapshot init params up front
    init_w = {n: np.asarray(ts0.params[n]["w"])
              for n in ts0.params if "w" in ts0.params[n]}

    rng = np.random.default_rng(4)
    half = jnp.asarray(rng.uniform(0, 1, (2, 3, 128, 128)), jnp.float32)
    images = jnp.concatenate([half, half], axis=0)
    boxes = np.zeros((4, 4, 4), np.float32)
    boxes[:, 0] = (0.5, 0.5, 0.4, 0.4)
    classes = np.zeros((4, 4), np.int32)
    mask = np.zeros((4, 4), bool)
    mask[:, 0] = True
    batch = (images, jnp.asarray(boxes), jnp.asarray(classes),
             jnp.asarray(mask))

    mesh = make_data_space_mesh(2, 4)
    sp_fn = make_spatial_train_step(model, opt, config, mesh)
    sp_ts, _ = sp_fn(replicate_state(mesh, ts0), *shard_batch_2d(mesh, batch))

    # frozen conv kernels bit-equal to init (SGD, wd=0 → zero grad = no move)
    for name in ("layer0", "layer1"):
        np.testing.assert_array_equal(np.asarray(sp_ts.params[name]["w"]),
                                      init_w[name], err_msg=name)
    # and the rest of the net actually trained
    moved = any(
        not np.array_equal(np.asarray(sp_ts.params[n]["w"]), init_w[n])
        for n in sp_ts.params if n not in ("layer0", "layer1") and "w" in sp_ts.params[n]
    )
    assert moved

    # and the step still matches the single-device frozen step exactly
    ts1, _ = train_init(model, config, seed=0)
    ref_ts, _ = make_train_step(model, opt, config)(ts1, *batch)
    for a, b in zip(jax.tree_util.tree_leaves(ref_ts.params),
                    jax.tree_util.tree_leaves(sp_ts.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-4)


class TestPlannerAdmissionRules:
    """The planner must reject ops whose sharded execution would be
    inexact (wrong values or shapes) rather than admit-and-corrupt."""

    def test_rejects_valid_conv_with_wide_kernel(self):
        from yolodl_tpu.parallel.spatial_model import _conv_shardable
        from yolodl_tpu.config import newslab as cfg

        # pad 0, k3 s1 ("valid" conv): each shard would lose k−1 rows
        layer = cfg.ConvBn2D(name="c", c=8, k=3, s=1, p=0)
        assert not _conv_shardable(layer, 64, 4)
        # pad 0, k1: aligned, exact
        assert _conv_shardable(
            cfg.ConvBn2D(name="c", c=8, k=1, s=1, p=0), 64, 4)
        # same-pad k3: halo, exact
        assert _conv_shardable(
            cfg.ConvBn2D(name="c", c=8, k=3, s=1, p=1), 64, 4)

    def test_rejects_avg_pool_in_spp_branch(self):
        from yolodl_tpu.parallel.spatial_model import _pool_shardable
        from yolodl_tpu.config import newslab as cfg

        avg = cfg.MaxPool(name="p", size=5, stride_y=1, stride_x=1,
                          total_padding=4, pool_kind="avg")
        assert not _pool_shardable(avg, 64, 4)
        mx = cfg.MaxPool(name="p", size=5, stride_y=1, stride_x=1,
                         total_padding=4, pool_kind="max")
        assert _pool_shardable(mx, 64, 4)

    def test_rejects_symmetric_padded_aligned_pool(self):
        from yolodl_tpu.parallel.spatial_model import _pool_shardable
        from yolodl_tpu.config import newslab as cfg

        # torch-style symmetric padding with no total_padding: each shard
        # would pad its own edges
        p = cfg.MaxPool(name="p", size=2, stride_y=2, stride_x=2,
                        padding=1, total_padding=None)
        assert not _pool_shardable(p, 64, 4)
        ok = cfg.MaxPool(name="p", size=2, stride_y=2, stride_x=2,
                         padding=0, total_padding=None)
        assert _pool_shardable(ok, 64, 4)


def test_planner_covers_high_res_stages():
    """The memory-dominant high-resolution layers must be in the sharded
    prefix (that is the point of spatial sharding)."""
    model, _, _ = _build("cfg/darknet/yolov4-csp.cfg", "512", "256")
    sharded, _ = plan_spatial_prefix(model, 4)
    graph = model.graph
    hi_res = [k for k in graph.order
              if graph.nodes[k].output_shape.is_tensor
              and graph.nodes[k].output_shape.tensor_shape()[2].is_known
              and graph.nodes[k].output_shape.tensor_shape()[2].size >= 64]
    covered = sum(1 for k in hi_res if k in sharded)
    assert covered / len(hi_res) > 0.9, (covered, len(hi_res))
