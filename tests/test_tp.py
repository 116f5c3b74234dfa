"""Tensor (channel) parallelism: GSPMD-sharded step vs single device."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.slow  # e2e/CLI tier: excluded from `pytest -m 'not slow'`

from yolodl_tpu.parallel import (
    make_tp_infer,
    make_tp_mesh,
    make_tp_train_step,
    place_tp_state,
    shard_batch_tp,
    tp_shardings,
)
from yolodl_tpu.parallel.tp import MODEL_AXIS, _leaf_spec
from yolodl_tpu.train import TrainConfig, make_train_step, train_init
from yolodl_tpu.train.lr_schedule import LrScheduleConfig

from test_train import fake_batch, tiny_model


class TestLeafSpec:
    def test_conv_kernel_sharded_on_o(self):
        assert _leaf_spec(jnp.zeros((3, 3, 8, 16)), 4) == (
            None, None, None, MODEL_AXIS)

    def test_indivisible_head_replicated(self):
        assert _leaf_spec(jnp.zeros((1, 1, 16, 7)), 4) == ()

    def test_channel_vector_sharded(self):
        assert _leaf_spec(jnp.zeros((16,)), 4) == (MODEL_AXIS,)

    def test_scalar_replicated(self):
        assert _leaf_spec(jnp.zeros(()), 4) == ()


class TestTensorParallel:
    def test_tp_train_matches_single_device_with_bn(self, rng, devices8):
        """The TP step is the single-device step under jit — GSPMD keeps
        global semantics, so it must track single-device INCLUDING batch
        norm (which shard_map DP cannot claim: per-replica stats)."""
        model = tiny_model(bn=True)
        config = TrainConfig(lr=LrScheduleConfig(kind="constant", lr=1e-3))
        ts, opt = train_init(model, config, seed=0)
        batch = fake_batch(rng, batch=8)

        single_fn = make_train_step(model, opt, config)
        ts_single = jax.tree_util.tree_map(jnp.copy, ts)
        for _ in range(2):
            ts_single, m_single = single_fn(ts_single, *batch)

        mesh = make_tp_mesh(2, 4)
        tp_fn = make_tp_train_step(model, opt, config, mesh)
        ts_tp = place_tp_state(mesh, jax.tree_util.tree_map(jnp.copy, ts))
        sharded = shard_batch_tp(mesh, batch)
        for _ in range(2):
            ts_tp, m_tp = tp_fn(ts_tp, *sharded)

        np.testing.assert_allclose(
            float(m_single["total_loss"]), float(m_tp["total_loss"]),
            rtol=2e-4)
        for a, b in zip(jax.tree_util.tree_leaves(ts_single.params),
                        jax.tree_util.tree_leaves(ts_tp.params)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=5e-5)
        # BN running stats track too (full-batch semantics)
        for a, b in zip(jax.tree_util.tree_leaves(ts_single.state),
                        jax.tree_util.tree_leaves(ts_tp.state)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=5e-5)

    def test_params_actually_sharded(self, devices8):
        """Sharded leaves live at 1/n bytes per device; the indivisible
        head stays replicated."""
        model = tiny_model(bn=True)
        ts, _ = train_init(model, TrainConfig(), seed=0)
        mesh = make_tp_mesh(1, 8)
        ts = place_tp_state(mesh, ts)

        sharded = replicated = 0
        for leaf in jax.tree_util.tree_leaves(ts.params):
            spec = leaf.sharding.spec
            local = leaf.addressable_shards[0].data.size
            if MODEL_AXIS in jax.tree_util.tree_leaves(list(spec)):
                assert local == leaf.size // 8
                sharded += 1
            else:
                assert local == leaf.size
                replicated += 1
        assert sharded >= 4  # both 8/16-channel convs' w + bn leaves
        assert replicated >= 1  # the 7-channel head
        # Adam moments shard identically to their params
        mu_leaves = jax.tree_util.tree_leaves(
            ts.opt_state, is_leaf=lambda x: hasattr(x, "sharding"))
        assert any(
            MODEL_AXIS in jax.tree_util.tree_leaves(list(x.sharding.spec))
            for x in mu_leaves if hasattr(x, "sharding"))

    def test_tp_infer_matches_unsharded(self, rng, devices8):
        model = tiny_model(bn=True)
        ts, _ = train_init(model, TrainConfig(), seed=0)
        images = fake_batch(rng, batch=8)[0]

        ref, _ = jax.jit(
            lambda p, s, x: model.apply(p, s, x, train=False))(
            ts.params, ts.state, images)

        mesh = make_tp_mesh(2, 4)
        params = jax.device_put(ts.params, tp_shardings(mesh, ts.params))
        state = jax.device_put(ts.state, tp_shardings(mesh, ts.state))
        infer = make_tp_infer(model, mesh)
        out = infer(params, state, shard_batch_tp(mesh, images))

        np.testing.assert_allclose(np.asarray(out.obj_logit),
                                   np.asarray(ref.obj_logit), atol=2e-5)
        np.testing.assert_allclose(np.asarray(out.cycxhw),
                                   np.asarray(ref.cycxhw), atol=2e-5)

    def test_tp_composes_with_accum(self, rng, devices8):
        model = tiny_model(bn=False)
        config = TrainConfig(lr=LrScheduleConfig(kind="constant", lr=1e-3))
        ts, opt = train_init(model, config, seed=0)
        batch = fake_batch(rng, batch=8)

        single_fn = make_train_step(model, opt, config, accum=2)
        ts_single, m_single = single_fn(
            jax.tree_util.tree_map(jnp.copy, ts), *batch)

        mesh = make_tp_mesh(2, 4)
        tp_fn = make_tp_train_step(model, opt, config, mesh, accum=2)
        ts_tp = place_tp_state(mesh, jax.tree_util.tree_map(jnp.copy, ts))
        ts_tp, m_tp = tp_fn(ts_tp, *shard_batch_tp(mesh, batch))

        np.testing.assert_allclose(
            float(m_single["total_loss"]), float(m_tp["total_loss"]),
            rtol=2e-4)
        for a, b in zip(jax.tree_util.tree_leaves(ts_single.params),
                        jax.tree_util.tree_leaves(ts_tp.params)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=5e-5)
