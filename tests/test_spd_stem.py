"""Space-to-depth stem rewrite: exactness against the straightforward path."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from yolodl_tpu.config import newslab as cfg
from yolodl_tpu.ops.conv import conv_bn_apply, conv_bn_init
from yolodl_tpu.ops.spd_stem import (
    build_spd_stem_weights,
    space_to_depth,
    spd_stem_apply,
    stem_is_eligible,
)


def stem_cfgs(c0=8, c1=16, bn=True):
    l0 = cfg.ConvBn2D(c=c0, k=3, s=1, p=1, act="mish", order="bn_act",
                      bias=not bn, bn=cfg.BatchNormConfig(enabled=bn))
    l1 = cfg.ConvBn2D(c=c1, k=3, s=2, p=1, act="mish", order="bn_act",
                      bias=not bn, bn=cfg.BatchNormConfig(enabled=bn))
    return l0, l1


class TestSpdStem:
    def test_space_to_depth_layout(self):
        x = jnp.arange(16.0).reshape(1, 4, 4, 1)
        out = space_to_depth(x, 2)
        assert out.shape == (1, 2, 2, 4)
        # channel order (dy, dx, c): cell (0,0) holds pixels (0,0),(0,1),(1,0),(1,1)
        np.testing.assert_allclose(out[0, 0, 0], [0, 1, 4, 5])

    @pytest.mark.parametrize("bn", [True, False])
    @pytest.mark.parametrize("train", [False, True])
    def test_matches_reference_path(self, rng, bn, train):
        l0, l1 = stem_cfgs(bn=bn)
        p0, s0 = conv_bn_init(jax.random.PRNGKey(0), l0, 3)
        p1, s1 = conv_bn_init(jax.random.PRNGKey(1), l1, 8)
        # non-trivial running stats
        if bn:
            s0 = {"bn": {"mean": jnp.asarray(rng.normal(size=8), jnp.float32),
                         "var": jnp.asarray(rng.uniform(0.5, 2, 8), jnp.float32)}}
            s1 = {"bn": {"mean": jnp.asarray(rng.normal(size=16), jnp.float32),
                         "var": jnp.asarray(rng.uniform(0.5, 2, 16), jnp.float32)}}

        x = jnp.asarray(rng.normal(size=(2, 12, 12, 3)), jnp.float32)

        # reference: plain two-layer path
        y0, s0_ref = conv_bn_apply(p0, s0, x, l0, train)
        y1, s1_ref = conv_bn_apply(p1, s1, y0, l1, train)

        out, s0_new, s1_new = spd_stem_apply(p0, s0, l0, p1, s1, l1, x, train)
        assert out.shape == y1.shape
        np.testing.assert_allclose(np.asarray(out), np.asarray(y1), atol=2e-5)

        if bn and train:
            np.testing.assert_allclose(
                np.asarray(s0_new["bn"]["mean"]), np.asarray(s0_ref["bn"]["mean"]),
                atol=1e-5,
            )
            np.testing.assert_allclose(
                np.asarray(s0_new["bn"]["var"]), np.asarray(s0_ref["bn"]["var"]),
                atol=1e-5,
            )
            np.testing.assert_allclose(
                np.asarray(s1_new["bn"]["mean"]), np.asarray(s1_ref["bn"]["mean"]),
                atol=1e-5,
            )

    def test_eligibility(self):
        l0, l1 = stem_cfgs()
        assert stem_is_eligible(l0, l1)
        assert not stem_is_eligible(l1, l0)  # wrong strides
        bad = cfg.ConvBn2D(c=8, k=3, s=1, p=1, order="act_bn")
        assert not stem_is_eligible(bad, l1)  # NEWSLAB order

    def test_model_builder_uses_spd_and_matches(self, rng):
        """yolov4-tiny-style stem in a full model: spd on vs off identical."""
        from yolodl_tpu.config import darknet_cfg as dk
        from yolodl_tpu.graph.from_darknet import graph_from_darknet
        from yolodl_tpu.models import YoloModel
        import glob, os

        repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        d = dk.Darknet.load(os.path.join(repo, "cfg/darknet/yolov4-csp.cfg"))
        graph = graph_from_darknet(d)
        m_spd = YoloModel(graph, spd_stem="auto")
        m_ref = YoloModel(graph, spd_stem="off")
        assert m_spd._spd_pair is not None

        params, state = m_ref.init(jax.random.PRNGKey(0))
        x = jnp.asarray(rng.normal(size=(1, 3, 128, 128)), jnp.float32)
        out_ref, st_ref = m_ref.apply(params, state, x, train=True)
        out_spd, st_spd = m_spd.apply(params, state, x, train=True)
        np.testing.assert_allclose(
            np.asarray(out_spd.obj_logit), np.asarray(out_ref.obj_logit), atol=2e-4
        )
        np.testing.assert_allclose(
            np.asarray(out_spd.cycxhw), np.asarray(out_ref.cycxhw), atol=2e-4
        )
        # BN states also agree
        for a, b in zip(
            jax.tree_util.tree_leaves(st_spd), jax.tree_util.tree_leaves(st_ref)
        ):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4)

    def test_res_block_apply_matches_reference(self, rng):
        """spd_res_block_apply vs the straightforward conv→conv→shortcut
        chain, train and eval."""
        from yolodl_tpu.ops.spd_stem import spd_res_block_apply

        c = 16
        l2 = cfg.ConvBn2D(c=c // 2, k=1, s=1, p=0, act="mish", order="bn_act",
                          bias=False, bn=cfg.BatchNormConfig(enabled=True))
        l3 = cfg.ConvBn2D(c=c, k=3, s=1, p=1, act="mish", order="bn_act",
                          bias=False, bn=cfg.BatchNormConfig(enabled=True))
        p2, s2 = conv_bn_init(jax.random.PRNGKey(1), l2, c)
        p3, s3 = conv_bn_init(jax.random.PRNGKey(2), l3, c // 2)
        y1 = jnp.asarray(rng.normal(size=(2, 12, 20, c)), jnp.float32)

        for train in (False, True):
            h_ref, s2_ref = conv_bn_apply(p2, s2, y1, l2, train)
            h_ref, s3_ref = conv_bn_apply(p3, s3, h_ref, l3, train)
            from yolodl_tpu import activations
            out_ref = activations.apply("linear", h_ref + y1)

            out, s2_n, s3_n = spd_res_block_apply(
                p2, s2, l2, p3, s3, l3, "linear", y1, train)
            np.testing.assert_allclose(
                np.asarray(out), np.asarray(out_ref), atol=3e-5)
            for a, b in zip(jax.tree_util.tree_leaves((s2_n, s3_n)),
                            jax.tree_util.tree_leaves((s2_ref, s3_ref))):
                np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                           atol=1e-5)

    def test_model_builder_uses_spd_region_and_matches(self, rng):
        """Full yolov4-csp model: the extended region (stem + stage-1
        residual pair packed) is detected and matches spd_stem='off' —
        inference exactly, training grads to deep-net fusion noise."""
        import os

        from yolodl_tpu.config import darknet_cfg as dk
        from yolodl_tpu.graph.from_darknet import graph_from_darknet
        from yolodl_tpu.models import YoloModel

        repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        d = dk.Darknet.load(os.path.join(repo, "cfg/darknet/yolov4-csp.cfg"))
        graph = graph_from_darknet(d)
        m_auto = YoloModel(graph, spd_stem="deep")
        m_stem = YoloModel(graph, spd_stem="auto")
        m_off = YoloModel(graph, spd_stem="off")
        assert m_auto._spd_res is not None
        # default "auto" keeps the stem but NOT the region (measured loss)
        assert m_stem._spd_res is None and m_stem._spd_pair is not None

        params, state = m_off.init(jax.random.PRNGKey(0))
        x = jnp.asarray(rng.uniform(0, 1, (1, 3, 128, 128)), jnp.float32)
        out_auto, _ = m_auto.apply(params, state, x, train=False)
        out_off, _ = m_off.apply(params, state, x, train=False)
        np.testing.assert_array_equal(
            np.asarray(out_auto.cycxhw), np.asarray(out_off.cycxhw))
        np.testing.assert_array_equal(
            np.asarray(out_auto.obj_logit), np.asarray(out_off.obj_logit))

        def loss(m):
            def f(p):
                pred, _ = m.apply(p, state, x, train=True)
                return (jnp.sum(pred.cycxhw.astype(jnp.float32) ** 2)
                        + jnp.sum(jax.nn.sigmoid(
                            pred.obj_logit.astype(jnp.float32))))
            return f

        ga = jax.grad(loss(m_auto))(params)
        go = jax.grad(loss(m_off))(params)

        def check(a, b):
            scale = float(np.max(np.abs(np.asarray(b)))) + 1e-8
            np.testing.assert_allclose(
                np.asarray(a) / scale, np.asarray(b) / scale, atol=6e-3)

        jax.tree_util.tree_map(check, ga, go)

    def test_region_eligibility(self):
        from yolodl_tpu.ops.spd_stem import res_block_is_eligible

        l2 = cfg.ConvBn2D(c=8, k=1, s=1, p=0, act="mish", order="bn_act")
        l3 = cfg.ConvBn2D(c=16, k=3, s=1, p=1, act="mish", order="bn_act")
        assert res_block_is_eligible(l2, l3)
        assert not res_block_is_eligible(l3, l2)  # wrong kernel order
        s2conv = cfg.ConvBn2D(c=16, k=3, s=2, p=1, act="mish", order="bn_act")
        assert not res_block_is_eligible(l2, s2conv)  # strided

    def test_depth_to_space_roundtrip(self, rng):
        from yolodl_tpu.ops.spd_stem import depth_to_space

        x = jnp.asarray(rng.normal(size=(2, 8, 6, 5)), jnp.float32)
        np.testing.assert_array_equal(
            np.asarray(depth_to_space(space_to_depth(x, 2), 2)),
            np.asarray(x))

    def test_tiny_stem_not_eligible(self):
        """yolov4-tiny starts with a stride-2 conv — no rewrite."""
        from yolodl_tpu.config import darknet_cfg as dk
        from yolodl_tpu.graph.from_darknet import graph_from_darknet
        from yolodl_tpu.models import YoloModel
        import os

        repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        d = dk.Darknet.load(os.path.join(repo, "cfg/darknet/yolov4-tiny.cfg"))
        m = YoloModel(graph_from_darknet(d))
        assert m._spd_pair is None
