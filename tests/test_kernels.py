"""Pallas kernel tests (interpret mode on CPU; compiled path runs on TPU)."""

import jax.numpy as jnp
import numpy as np
import pytest

from yolodl_tpu.geometry.boxes import box_iou_pairwise
from yolodl_tpu.kernels import pairwise_iou_pallas


class TestPallasIoU:
    @pytest.mark.parametrize("k", [8, 256, 300])
    def test_matches_jnp_reference(self, rng, k):
        boxes = rng.uniform(0.0, 1.0, (k, 4)).astype(np.float32)
        tlbr = np.stack(
            [
                np.minimum(boxes[:, 0], boxes[:, 2]),
                np.minimum(boxes[:, 1], boxes[:, 3]),
                np.maximum(boxes[:, 0], boxes[:, 2]) + 0.01,
                np.maximum(boxes[:, 1], boxes[:, 3]) + 0.01,
            ],
            axis=1,
        )
        ref = np.asarray(box_iou_pairwise(jnp.asarray(tlbr), jnp.asarray(tlbr)))
        out = np.asarray(pairwise_iou_pallas(jnp.asarray(tlbr), interpret=True))
        assert out.shape == (k, k)
        np.testing.assert_allclose(out, ref, atol=1e-5)

    def test_diag_ones(self, rng):
        tlbr = np.array([[0.1, 0.1, 0.5, 0.5], [0.2, 0.2, 0.9, 0.8]], np.float32)
        out = np.asarray(pairwise_iou_pallas(jnp.asarray(tlbr), interpret=True))
        np.testing.assert_allclose(np.diag(out), 1.0, atol=1e-6)


class TestFusedConv1x1:
    def _reference(self, x, w, scale, shift):
        import jax
        z = x.astype(jnp.float32) @ w.astype(jnp.float32) * scale + shift
        return (z * jnp.tanh(jax.nn.softplus(z))).astype(x.dtype)

    @pytest.mark.parametrize("m,k,n", [(64, 32, 16), (300, 64, 130), (256, 128, 128)])
    def test_matches_composition(self, rng, m, k, n):
        from yolodl_tpu.kernels import fused_conv1x1_mish

        x = jnp.asarray(rng.normal(size=(m, k)) * 0.3, jnp.float32)
        w = jnp.asarray(rng.normal(size=(k, n)) * 0.3, jnp.float32)
        scale = jnp.asarray(rng.uniform(0.5, 2.0, n), jnp.float32)
        shift = jnp.asarray(rng.normal(size=n), jnp.float32)
        out = fused_conv1x1_mish(x, w, scale, shift, True)
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(self._reference(x, w, scale, shift)),
            atol=2e-5,
        )

    def test_nhwc_leading_shape(self, rng):
        from yolodl_tpu.kernels import fused_conv1x1_mish

        x = jnp.asarray(rng.normal(size=(2, 8, 8, 24)), jnp.float32)
        w = jnp.asarray(rng.normal(size=(24, 40)) * 0.2, jnp.float32)
        scale = jnp.ones((40,), jnp.float32)
        shift = jnp.zeros((40,), jnp.float32)
        out = fused_conv1x1_mish(x, w, scale, shift, True)
        assert out.shape == (2, 8, 8, 40)

    def test_gradients_match_autodiff_of_composition(self, rng):
        import jax
        from yolodl_tpu.kernels import fused_conv1x1_mish

        x = jnp.asarray(rng.normal(size=(32, 16)) * 0.3, jnp.float32)
        w = jnp.asarray(rng.normal(size=(16, 8)) * 0.3, jnp.float32)
        scale = jnp.asarray(rng.uniform(0.5, 2.0, 8), jnp.float32)
        shift = jnp.asarray(rng.normal(size=8), jnp.float32)

        def f_fused(x, w, s, b):
            return fused_conv1x1_mish(x, w, s, b, True).sum()

        def f_ref(x, w, s, b):
            z = x @ w * s + b
            return (z * jnp.tanh(jax.nn.softplus(z))).sum()

        g_fused = jax.grad(f_fused, argnums=(0, 1, 2, 3))(x, w, scale, shift)
        g_ref = jax.grad(f_ref, argnums=(0, 1, 2, 3))(x, w, scale, shift)
        for a, b in zip(g_fused, g_ref):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4)
