"""W-fold region rewrite (ops/fold_region.py): exactness vs canonical path."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from yolodl_tpu.config import darknet_cfg as dk
from yolodl_tpu.config import newslab as cfg
from yolodl_tpu.graph.from_darknet import graph_from_darknet
from yolodl_tpu.models.builder import GraphModel
from yolodl_tpu.ops import fold_region as fr
from yolodl_tpu.ops.conv import conv2d_apply, conv_bn_apply, conv_bn_init

MINI_CFG = """
[net]
batch=1
subdivisions=1
width=24
height=24
channels=3

[convolutional]
batch_normalize=1
filters=32
size=3
stride=1
pad=1
activation=mish

[convolutional]
batch_normalize=1
filters=64
size=3
stride=2
pad=1
activation=mish

[convolutional]
batch_normalize=1
filters=32
size=1
stride=1
pad=1
activation=mish

[convolutional]
batch_normalize=1
filters=64
size=3
stride=1
pad=1
activation=mish

[shortcut]
from=-3
activation=linear
"""


class TestFoldOps:
    def test_fold_unfold_layout(self):
        x = jnp.arange(16.0).reshape(1, 2, 8, 1)
        f = fr.fold_w(x)
        assert f.shape == (1, 2, 2, 4)
        # channel index = phase*C + c: folded cell 0 holds w=0..3
        np.testing.assert_allclose(np.asarray(f[0, 0, 0]), [0, 1, 2, 3])
        np.testing.assert_allclose(np.asarray(fr.unfold_w(f)), np.asarray(x))

    def test_folded_conv1x1_exact(self, rng):
        x = jnp.asarray(rng.normal(size=(2, 6, 8, 4)), jnp.float32)
        w = jnp.asarray(rng.normal(size=(1, 1, 4, 3)), jnp.float32)
        ref = conv2d_apply(x, w, padding=0)
        got = fr.unfold_w(conv2d_apply(fr.fold_w(x), fr.fold_conv1x1_weights(w),
                                       padding=0))
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-5)

    def test_folded_conv3x3_exact(self, rng):
        x = jnp.asarray(rng.normal(size=(2, 6, 8, 4)), jnp.float32)
        w = jnp.asarray(rng.normal(size=(3, 3, 4, 5)), jnp.float32)
        ref = conv2d_apply(x, w, padding=1)
        got = fr.unfold_w(conv2d_apply(fr.fold_w(x), fr.fold_conv3x3_weights(w),
                                       padding=1))
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-5)

    def test_folded_conv3x3_grads_match(self, rng):
        x = jnp.asarray(rng.normal(size=(2, 6, 8, 4)), jnp.float32)
        w = jnp.asarray(rng.normal(size=(3, 3, 4, 5)), jnp.float32)

        def loss_ref(w):
            return jnp.sum(conv2d_apply(x, w, padding=1) ** 2)

        def loss_fold(w):
            return jnp.sum(conv2d_apply(
                fr.fold_w(x), fr.fold_conv3x3_weights(w), padding=1) ** 2)

        g_ref = jax.grad(loss_ref)(w)
        g_fold = jax.grad(loss_fold)(w)
        np.testing.assert_allclose(np.asarray(g_fold), np.asarray(g_ref),
                                   rtol=1e-4, atol=1e-3)

    @pytest.mark.parametrize("bn", [True, False])
    @pytest.mark.parametrize("train", [False, True])
    @pytest.mark.parametrize("k", [1, 3])
    def test_fold_conv_bn_apply_matches(self, rng, bn, train, k):
        layer = cfg.ConvBn2D(c=8, k=k, s=1, p=None, act="mish", order="bn_act",
                             bias=not bn, bn=cfg.BatchNormConfig(enabled=bn))
        p, s = conv_bn_init(jax.random.PRNGKey(0), layer, 4)
        if bn:
            s = {"bn": {"mean": jnp.asarray(rng.normal(size=8), jnp.float32),
                        "var": jnp.asarray(rng.uniform(0.5, 2, 8), jnp.float32)}}
        x = jnp.asarray(rng.normal(size=(2, 6, 8, 4)), jnp.float32)

        ref, s_ref = conv_bn_apply(p, s, x, layer, train)
        got_f, s_got = fr.fold_conv_bn_apply(p, s, fr.fold_w(x), layer, train)
        np.testing.assert_allclose(np.asarray(fr.unfold_w(got_f)),
                                   np.asarray(ref), atol=2e-5)
        if bn and train:
            np.testing.assert_allclose(
                np.asarray(s_got["bn"]["mean"]), np.asarray(s_ref["bn"]["mean"]),
                atol=1e-5)
            np.testing.assert_allclose(
                np.asarray(s_got["bn"]["var"]), np.asarray(s_ref["bn"]["var"]),
                atol=1e-5)

    def test_eligibility(self):
        def conv(c_in, c_out, k=3, s=1):
            layer = cfg.ConvBn2D(c=c_out, k=k, s=s, p=None, act="mish",
                                 order="bn_act")
            return fr.conv_is_foldable(layer, c_in)

        assert conv(64, 32, k=1)
        assert conv(32, 64, k=3)
        assert not conv(64, 64)       # product 4096: measured wash/loss
        assert not conv(3, 32)        # folded form still under-packed
        assert not conv(64, 32, s=2)  # not shape-preserving
        assert not conv(64, 32, k=5)  # unsupported kernel


class TestFoldRegionInModel:
    def _mini(self):
        graph = graph_from_darknet(dk.Darknet.from_str(MINI_CFG))
        m_fold = GraphModel(graph, fold_region="on")
        m_off = GraphModel(graph, spd_stem="off", fold_region="off")
        assert len(m_fold._fold_keys) == 3  # 1x1, 3x3, shortcut
        params, state = m_off.init(jax.random.PRNGKey(0))
        return m_fold, m_off, params, state

    @pytest.mark.parametrize("train", [False, True])
    def test_mini_graph_matches(self, rng, train):
        m_fold, m_off, params, state = self._mini()
        x = jnp.asarray(rng.normal(size=(2, 3, 24, 24)), jnp.float32)
        ref, st_ref = m_off.apply(params, state, x, train=train)
        got, st_got = m_fold.apply(params, state, x, train=train)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-4)
        for a, b in zip(jax.tree_util.tree_leaves(st_got),
                        jax.tree_util.tree_leaves(st_ref)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4)

    def test_width_not_divisible_falls_back(self, rng):
        """W %4 != 0 at the region → canonical execution, same result."""
        m_fold, m_off, params, state = self._mini()
        x = jnp.asarray(rng.normal(size=(1, 3, 20, 20)), jnp.float32)
        ref, _ = m_off.apply(params, state, x)
        got, _ = m_fold.apply(params, state, x)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-4)

    def test_flagship_region_detected(self):
        import os
        repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        d = dk.Darknet.load(os.path.join(repo, "cfg/darknet/yolov4-csp.cfg"))
        from yolodl_tpu.models import YoloModel
        m = YoloModel(graph_from_darknet(d), fold_region="on")
        # stage-1: 1x1 64->32, 3x3 32->64, shortcut
        assert len(m._fold_keys) == 3

    def test_flagship_matches_canonical(self, rng):
        import os
        repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        d = dk.Darknet.load(os.path.join(repo, "cfg/darknet/yolov4-csp.cfg"))
        from yolodl_tpu.models import YoloModel
        graph = graph_from_darknet(d)
        m_fold = YoloModel(graph, fold_region="on")
        m_off = YoloModel(graph, spd_stem="off", fold_region="off")
        params, state = m_off.init(jax.random.PRNGKey(0))
        x = jnp.asarray(rng.normal(size=(1, 3, 128, 128)), jnp.float32)
        ref, _ = m_off.apply(params, state, x, train=True)
        got, _ = m_fold.apply(params, state, x, train=True)
        np.testing.assert_allclose(np.asarray(got.obj_logit),
                                   np.asarray(ref.obj_logit), atol=2e-4)
        np.testing.assert_allclose(np.asarray(got.cycxhw),
                                   np.asarray(ref.cycxhw), atol=2e-4)
