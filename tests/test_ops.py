"""Ops-layer unit tests against numpy references (SURVEY §4 tier-1 parity)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from yolodl_tpu.config import newslab as cfg
from yolodl_tpu.ops import (
    batch_norm_apply,
    batch_norm_init,
    clamp_running_var,
    concat2d,
    conv2d_apply,
    conv_bn_apply,
    conv_bn_init,
    detect_decode,
    dynamic_pad2d,
    fold_batch_norm,
    max_pool2d,
    merge_detections,
    sum2d,
    upsample2d,
)
from yolodl_tpu.ops.norm import DEFAULT_EPS, DEFAULT_MOMENTUM


class TestConv:
    def test_identity_kernel(self):
        x = jnp.asarray(np.random.default_rng(0).normal(size=(1, 5, 5, 3)), jnp.float32)
        w = jnp.zeros((1, 1, 3, 3), jnp.float32)
        w = w.at[0, 0].set(jnp.eye(3))
        out = conv2d_apply(x, w)
        np.testing.assert_allclose(out, x, atol=1e-6)

    def test_stride_padding_shape(self):
        x = jnp.zeros((2, 16, 16, 4))
        w = jnp.zeros((3, 3, 4, 8))
        out = conv2d_apply(x, w, stride=2, padding=1)
        assert out.shape == (2, 8, 8, 8)

    def test_matches_numpy_direct(self, rng):
        x = rng.normal(size=(1, 6, 6, 2)).astype(np.float32)
        w = rng.normal(size=(3, 3, 2, 1)).astype(np.float32)
        out = np.asarray(conv2d_apply(jnp.asarray(x), jnp.asarray(w), padding=1))
        xp = np.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
        expect = np.zeros((1, 6, 6, 1), np.float32)
        for i in range(6):
            for j in range(6):
                patch = xp[0, i : i + 3, j : j + 3, :]
                expect[0, i, j, 0] = np.sum(patch * w[:, :, :, 0])
        np.testing.assert_allclose(out, expect, atol=1e-4)

    def test_groups(self):
        x = jnp.ones((1, 4, 4, 4))
        w = jnp.ones((1, 1, 2, 4))  # groups=2: in_per_group=2
        out = conv2d_apply(x, w, groups=2)
        np.testing.assert_allclose(out, 2.0 * jnp.ones((1, 4, 4, 4)), atol=1e-6)


class TestBatchNorm:
    def test_train_normalizes_batch(self, rng):
        x = jnp.asarray(rng.normal(2.0, 3.0, size=(4, 8, 8, 5)), jnp.float32)
        p, s = batch_norm_init(5)
        out, new_s = batch_norm_apply(p, s, x, train=True)
        m = np.asarray(out).mean(axis=(0, 1, 2))
        v = np.asarray(out).var(axis=(0, 1, 2))
        np.testing.assert_allclose(m, 0.0, atol=1e-3)
        np.testing.assert_allclose(v, 1.0, atol=1e-2)

    def test_running_stats_update_torch_semantics(self, rng):
        x = jnp.asarray(rng.normal(1.0, 2.0, size=(2, 4, 4, 3)), jnp.float32)
        p, s = batch_norm_init(3)
        _, new_s = batch_norm_apply(p, s, x, train=True)
        n = 2 * 4 * 4
        bm = np.asarray(x).mean(axis=(0, 1, 2))
        bv = np.asarray(x).var(axis=(0, 1, 2)) * n / (n - 1)  # unbiased
        np.testing.assert_allclose(
            new_s["mean"], (1 - DEFAULT_MOMENTUM) * 0 + DEFAULT_MOMENTUM * bm, atol=1e-5
        )
        np.testing.assert_allclose(
            new_s["var"], (1 - DEFAULT_MOMENTUM) * 1 + DEFAULT_MOMENTUM * bv, atol=1e-4
        )

    def test_eval_uses_running_stats(self):
        p, s = batch_norm_init(2)
        s = {"mean": jnp.array([1.0, 2.0]), "var": jnp.array([4.0, 9.0])}
        x = jnp.ones((1, 1, 1, 2))
        out, same_s = batch_norm_apply(p, s, x, train=False)
        expect = (1.0 - np.array([1.0, 2.0])) / np.sqrt(np.array([4.0, 9.0]) + DEFAULT_EPS)
        np.testing.assert_allclose(out[0, 0, 0], expect, atol=1e-5)
        assert same_s is s

    def test_clamp_running_var(self):
        s = {"mean": jnp.zeros(3), "var": jnp.array([1e-6, 1.0, 1e6])}
        out = clamp_running_var(s, 0.001, 1000.0)
        np.testing.assert_allclose(out["var"], [0.001, 1.0, 1000.0])

    def test_fold_batch_norm_matches_eval(self, rng):
        c_in, c_out = 3, 4
        x = jnp.asarray(rng.normal(size=(1, 5, 5, c_in)), jnp.float32)
        w = jnp.asarray(rng.normal(size=(1, 1, c_in, c_out)), jnp.float32)
        p, _ = batch_norm_init(c_out)
        p = {"scale": jnp.asarray(rng.uniform(0.5, 2, c_out), jnp.float32),
             "bias": jnp.asarray(rng.normal(size=c_out), jnp.float32)}
        s = {"mean": jnp.asarray(rng.normal(size=c_out), jnp.float32),
             "var": jnp.asarray(rng.uniform(0.5, 2, c_out), jnp.float32)}
        ref = batch_norm_apply(p, s, conv2d_apply(x, w), train=False)[0]
        fw, fb = fold_batch_norm(p, s, w, None)
        out = conv2d_apply(x, fw, fb)
        np.testing.assert_allclose(out, ref, atol=1e-4)


class TestConvBnBlock:
    def test_conv_act_bn_order(self, rng):
        """The reference applies activation BEFORE bn (conv_bn_2d.rs:88-101):
        with a negative-shifting BN bias, outputs can be negative even with
        relu activation — proving act precedes bn."""
        layer = cfg.ConvBn2D(c=4, k=1, act="relu", bn=cfg.BatchNormConfig(affine=True))
        p, s = conv_bn_init(jax.random.PRNGKey(0), layer, 3)
        x = jnp.asarray(rng.normal(size=(2, 6, 6, 3)), jnp.float32)
        out, _ = conv_bn_apply(p, s, x, layer, train=True)
        # batch-normalized output of a relu'd input must contain negatives
        assert float(np.asarray(out).min()) < 0.0

    def test_no_bn(self, rng):
        layer = cfg.ConvBn2D(c=4, k=3, act="linear", bn=cfg.BatchNormConfig(enabled=False))
        p, s = conv_bn_init(jax.random.PRNGKey(0), layer, 3)
        assert "bn" not in p and s == {}
        x = jnp.asarray(rng.normal(size=(1, 8, 8, 3)), jnp.float32)
        out, new_s = conv_bn_apply(p, s, x, layer, train=True)
        assert out.shape == (1, 8, 8, 4)


class TestSimpleOps:
    def test_upsample_nearest(self):
        x = jnp.arange(4.0).reshape(1, 2, 2, 1)
        out = upsample2d(x, 2.0)
        assert out.shape == (1, 4, 4, 1)
        np.testing.assert_allclose(out[0, :, :, 0],
                                   [[0, 0, 1, 1], [0, 0, 1, 1], [2, 2, 3, 3], [2, 2, 3, 3]])

    def test_maxpool_same_spatial(self):
        x = jnp.asarray(np.random.default_rng(0).normal(size=(1, 8, 8, 2)), jnp.float32)
        out = max_pool2d(x, size=5, stride_y=1, stride_x=1, padding=2)
        assert out.shape == x.shape
        assert float(out.min()) >= float(x.min())

    @pytest.mark.parametrize("k", [5, 9, 13])
    def test_spp_pool_composition_exact(self, k):
        """The chained-3×3 rewrite of stride-1 SPP pools matches a direct
        k×k reduce_window exactly, forward and gradient."""
        x = jnp.asarray(
            np.random.default_rng(k).normal(size=(2, 19, 19, 8)), jnp.float32
        )

        def direct(v):
            return jax.lax.reduce_window(
                v, -jnp.inf, jax.lax.max,
                window_dimensions=(1, k, k, 1), window_strides=(1, 1, 1, 1),
                padding=((0, 0), (k // 2, k // 2), (k // 2, k // 2), (0, 0)),
            )

        composed = max_pool2d(x, size=k, stride_y=1, stride_x=1, padding=k // 2)
        np.testing.assert_array_equal(np.asarray(composed), np.asarray(direct(x)))

        # random continuous input → no ties → unique subgradient
        w = jnp.asarray(np.random.default_rng(k + 1).normal(size=x.shape), jnp.float32)
        g_direct = jax.grad(lambda v: jnp.sum(direct(v) * w))(x)
        g_composed = jax.grad(
            lambda v: jnp.sum(max_pool2d(v, k, 1, 1, padding=k // 2) * w)
        )(x)
        # same scatter destinations; accumulation order may differ → rtol
        np.testing.assert_allclose(
            np.asarray(g_composed), np.asarray(g_direct), rtol=1e-5, atol=1e-6
        )

    def test_sum_concat(self):
        a = jnp.ones((1, 2, 2, 3))
        b = 2 * jnp.ones((1, 2, 2, 3))
        np.testing.assert_allclose(sum2d([a, b]), 3.0 * np.ones((1, 2, 2, 3)))
        assert concat2d([a, b]).shape == (1, 2, 2, 6)

    def test_dynamic_pad(self):
        x = jnp.ones((1, 2, 2, 1))
        out = dynamic_pad2d(x, t=1, b=0, l=2, r=0, kind="zero")
        assert out.shape == (1, 3, 4, 1)
        assert float(out[0, 0, 0, 0]) == 0.0


class TestDetectDecode:
    def _head(self, b=2, a=2, fh=4, fw=4, c=3, order="entry_major"):
        rng = np.random.default_rng(0)
        e = 5 + c
        x = jnp.asarray(rng.normal(size=(b, fh, fw, a * e)), jnp.float32)
        anchors = [(0.1, 0.2), (0.3, 0.4)][:a]
        return x, anchors, c

    def test_scaled_decode_ranges(self):
        x, anchors, c = self._head()
        det = detect_decode(x, anchors, c)
        assert det.cycxhw.shape == (2, 2, 4, 4, 4)
        cy = np.asarray(det.cycxhw[..., 0])
        # cy ∈ (row-0.5, row+1.5)/H ⊂ (-0.125, 1.125)
        assert cy.min() > -0.13 and cy.max() < 1.13
        h = np.asarray(det.cycxhw[..., 2])
        assert h.min() >= 0.0 and h.max() <= 4 * 0.3 + 1e-6  # (2σ)² ≤ 4 × anchor_h

    def test_scaled_decode_formula_single_cell(self):
        """Check cy/h against the reference formula (detect_2d.rs:66-139)."""
        x = jnp.zeros((1, 2, 2, 6))  # a=1, c=1 → e=6; logits all 0
        det = detect_decode(x, [(0.4, 0.4)], 1)
        # σ(0)=0.5 → cy = (0.5*2-0.5+row)/2 = (0.5+row)/2
        np.testing.assert_allclose(
            np.asarray(det.cycxhw[0, 0, :, :, 0]),
            [[0.25, 0.25], [0.75, 0.75]],
            atol=1e-6,
        )
        # h = (0.5*2)² * 0.4 = 0.4
        np.testing.assert_allclose(np.asarray(det.cycxhw[..., 2]), 0.4, atol=1e-6)

    def test_darknet_decode_formula(self):
        x = jnp.zeros((1, 2, 2, 6))
        det = detect_decode(x, [(0.4, 0.4)], 1, variant="darknet", scale_xy=1.1)
        # cy = (0.5*1.1 - 0.05 + row)/2 = (0.5+row)/2
        np.testing.assert_allclose(
            np.asarray(det.cycxhw[0, 0, :, :, 0]), [[0.25, 0.25], [0.75, 0.75]], atol=1e-6
        )
        # h = exp(0)*0.4
        np.testing.assert_allclose(np.asarray(det.cycxhw[..., 2]), 0.4, atol=1e-6)

    def test_channel_orders_differ(self):
        x, anchors, c = self._head()
        d1 = detect_decode(x, anchors, c, order="entry_major")
        d2 = detect_decode(x, anchors, c, order="anchor_major")
        assert not np.allclose(np.asarray(d1.obj_logit), np.asarray(d2.obj_logit))

    def test_merge_flat_order(self):
        """Flat index = begin + (a*H + row)*W + col (reference parity)."""
        x, anchors, c = self._head(b=1)
        det = detect_decode(x, anchors, c)
        merged = merge_detections([det, det])
        assert merged.num_flats == 2 * 2 * 4 * 4
        assert merged.infos[0].flat_begin == 0 and merged.infos[1].flat_begin == 32
        # spot-check: flat position of (anchor=1, row=2, col=3) in layer 0
        flat = (1 * 4 + 2) * 4 + 3
        np.testing.assert_allclose(
            np.asarray(merged.cycxhw[0, flat]), np.asarray(det.cycxhw[0, 1, 2, 3]), atol=0
        )

    def test_confidence(self):
        x, anchors, c = self._head(b=1)
        merged = merge_detections([detect_decode(x, anchors, c)])
        conf = merged.confidence()
        assert conf.shape == (1, 32, 3)
        obj = merged.obj_prob()
        assert np.all(np.asarray(conf) <= np.asarray(obj)[..., None] + 1e-6)

    def test_jit_and_grad(self):
        x, anchors, c = self._head(b=1)

        @jax.jit
        def f(x):
            m = merge_detections([detect_decode(x, anchors, c)])
            return m.cycxhw.sum() + m.obj_logit.sum()

        g = jax.grad(f)(x)
        assert g.shape == x.shape
        assert bool(jnp.all(jnp.isfinite(g)))


class TestDeconv:
    @pytest.mark.parametrize("k,s,p,op,d", [
        (2, 2, 0, 0, 1),   # the classic x2 upsample deconv
        (3, 2, 1, 1, 1),
        (3, 1, 1, 0, 1),
        (3, 2, 1, 0, 2),   # dilated
    ])
    def test_matches_torch_conv_transpose2d(self, k, s, p, op, d):
        """DeconvBn2D must be the torch ConvTranspose2d ADJOINT the
        reference wraps (deconv_bn_2d.rs) — including the spatial kernel
        flip lax.conv_transpose does NOT do by itself."""
        import torch

        from yolodl_tpu.config.newslab import BatchNormConfig, DeconvBn2D
        from yolodl_tpu.ops.conv import deconv_bn_apply

        rng = np.random.default_rng(11)
        in_c, out_c, hw = 5, 4, 7
        x = rng.normal(size=(2, hw, hw, in_c)).astype(np.float32)
        w = rng.normal(size=(k, k, in_c, out_c)).astype(np.float32)
        b = rng.normal(size=(out_c,)).astype(np.float32)
        layer = DeconvBn2D(c=out_c, k=k, s=s, p=p, op=op, d=d, act="linear",
                           bn=BatchNormConfig(enabled=False))
        ours, _ = deconv_bn_apply({"w": jnp.asarray(w), "b": jnp.asarray(b)},
                                  {}, jnp.asarray(x), layer, train=False)
        ref = torch.nn.functional.conv_transpose2d(
            torch.from_numpy(x.transpose(0, 3, 1, 2)),
            torch.from_numpy(w.transpose(2, 3, 0, 1)),  # HWIO → (in,out,kh,kw)
            torch.from_numpy(b), stride=s, padding=p, output_padding=op,
            dilation=d,
        ).numpy().transpose(0, 2, 3, 1)
        assert ours.shape == ref.shape, (ours.shape, ref.shape)
        np.testing.assert_allclose(np.asarray(ours), ref, atol=2e-5)
