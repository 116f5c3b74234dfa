"""Geometry/box-algebra unit tests.

Mirrors the reference's inline tests in bbox/src/transform.rs and the IoU
family semantics of tch-goodies/src/compound_tensor/cycxhw.rs.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from yolodl_tpu.geometry import (
    Transform,
    box_iou_pairwise,
    ciou,
    cycxhw_to_tlbr,
    diou,
    giou,
    hausdorff_distance,
    iou,
    tlbr_to_cycxhw,
)


def box(cy, cx, h, w):
    return jnp.array([cy, cx, h, w], dtype=jnp.float32)


class TestConversions:
    def test_roundtrip(self, rng):
        boxes = jnp.asarray(rng.uniform(0.1, 0.9, size=(17, 4)), dtype=jnp.float32)
        back = tlbr_to_cycxhw(cycxhw_to_tlbr(boxes))
        np.testing.assert_allclose(back, boxes, atol=1e-6)

    def test_tlbr_values(self):
        t = cycxhw_to_tlbr(box(0.5, 0.5, 0.2, 0.4))
        np.testing.assert_allclose(t, [0.4, 0.3, 0.6, 0.7], atol=1e-7)


class TestIoUFamily:
    def test_identical_boxes(self):
        a = box(0.5, 0.5, 0.2, 0.2)
        assert float(iou(a, a)) == pytest.approx(1.0, abs=1e-6)
        assert float(giou(a, a)) == pytest.approx(1.0, abs=1e-6)
        assert float(diou(a, a)) == pytest.approx(1.0, abs=1e-6)
        assert float(ciou(a, a)) == pytest.approx(1.0, abs=1e-6)

    def test_disjoint_boxes(self):
        a = box(0.2, 0.2, 0.2, 0.2)
        b = box(0.8, 0.8, 0.2, 0.2)
        assert float(iou(a, b)) == pytest.approx(0.0, abs=1e-6)
        # GIoU penalizes empty closure area: negative for disjoint boxes.
        assert float(giou(a, b)) < 0.0
        assert float(diou(a, b)) < 0.0

    def test_half_overlap(self):
        a = box(0.5, 0.5, 0.2, 0.2)
        b = box(0.5, 0.6, 0.2, 0.2)  # shifted by half width
        # inter = 0.2*0.1 = 0.02, union = 0.04+0.04-0.02
        assert float(iou(a, b)) == pytest.approx(0.02 / 0.06, rel=1e-5)

    def test_ordering(self):
        """DIoU ≤ IoU (center-distance penalty subtracts); CIoU ≥ DIoU because
        the reference *adds* the aspect-ratio term (cycxhw.rs:121 — reference
        parity, diverging from the CIoU paper's sign)."""
        a = box(0.4, 0.4, 0.3, 0.2)
        b = box(0.5, 0.55, 0.2, 0.3)
        v_iou, v_diou, v_ciou = float(iou(a, b)), float(diou(a, b)), float(ciou(a, b))
        assert v_diou <= v_iou + 1e-6
        assert v_ciou >= v_diou - 1e-6

    def test_gradients_flow(self):
        a = box(0.45, 0.45, 0.25, 0.25)
        b = box(0.5, 0.5, 0.2, 0.2)
        for fn in (iou, giou, diou, ciou):
            g = jax.grad(lambda x: fn(x, b).sum())(a)
            assert bool(jnp.all(jnp.isfinite(g)))
            assert float(jnp.abs(g).sum()) > 0.0

    def test_batched(self, rng):
        a = jnp.asarray(rng.uniform(0.3, 0.7, size=(11, 4)), dtype=jnp.float32)
        b = jnp.asarray(rng.uniform(0.3, 0.7, size=(11, 4)), dtype=jnp.float32)
        out = ciou(a, b)
        assert out.shape == (11,)

    def test_hausdorff_zero_for_identical(self):
        a = box(0.5, 0.5, 0.2, 0.2)
        assert float(hausdorff_distance(a, a)) == pytest.approx(0.0, abs=1e-6)

    def test_hausdorff_positive_and_symmetric_shift(self):
        a = box(0.5, 0.5, 0.2, 0.2)
        b = box(0.5, 0.7, 0.2, 0.2)
        d = float(hausdorff_distance(a, b))
        assert d == pytest.approx(0.2, abs=1e-5)


class TestPairwiseIoU:
    def test_matrix_shape_and_diag(self, rng):
        boxes = rng.uniform(0.2, 0.8, size=(6, 4)).astype(np.float32)
        tlbr = np.stack(
            [
                boxes[:, 0] - boxes[:, 2] / 2,
                boxes[:, 1] - boxes[:, 3] / 2,
                boxes[:, 0] + boxes[:, 2] / 2,
                boxes[:, 1] + boxes[:, 3] / 2,
            ],
            axis=1,
        )
        m = box_iou_pairwise(jnp.asarray(tlbr), jnp.asarray(tlbr))
        assert m.shape == (6, 6)
        np.testing.assert_allclose(np.diag(np.asarray(m)), 1.0, atol=1e-5)
        np.testing.assert_allclose(np.asarray(m), np.asarray(m).T, atol=1e-6)


class TestTransform:
    def test_inverse_roundtrip(self):
        t = Transform(sy=2.0, sx=2.0, ty=1.0, tx=1.0)
        assert t.inverse().inverse() == t

    def test_resize_exact(self):
        # Mirrors bbox/src/transform.rs test `rect_resize_exact`.
        t = Transform.from_sizes_exact((80.0, 80.0), (20.0, 40.0))
        assert t == Transform(sy=0.25, sx=0.5, ty=0.0, tx=0.0)

    def test_resize_letterbox(self):
        # Mirrors bbox/src/transform.rs test `rect_resize_letterbox`.
        t = Transform.from_sizes_letterbox((80.0, 80.0), (20.0, 40.0))
        assert t == Transform(sy=0.25, sx=0.25, ty=0.0, tx=10.0)

    def test_compose_matches_sequential(self):
        t1 = Transform.from_sizes_letterbox((100.0, 50.0), (64.0, 64.0))
        t2 = Transform(sy=0.5, sx=0.25, ty=3.0, tx=-1.0)
        pts = np.array([[1.0, 2.0], [10.0, 20.0]])
        np.testing.assert_allclose(
            (t2 * t1).apply_points(pts), t2.apply_points(t1.apply_points(pts))
        )

    def test_apply_cycxhw_letterbox(self):
        t = Transform.from_sizes_letterbox((80.0, 80.0), (20.0, 40.0))
        out = t.apply_cycxhw(np.array([40.0, 40.0, 80.0, 80.0]))
        np.testing.assert_allclose(out, [10.0, 20.0, 20.0, 20.0])

    def test_flip_tlbr_reorders(self):
        flip = Transform(sy=1.0, sx=-1.0, ty=0.0, tx=1.0)  # mirror x in unit frame
        out = flip.apply_tlbr(np.array([0.1, 0.2, 0.3, 0.5]))
        np.testing.assert_allclose(out, [0.1, 0.5, 0.3, 0.8], atol=1e-9)
