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


