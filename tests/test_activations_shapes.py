"""Activation + symbolic-shape unit tests (tch-act, tensor-shape parity)."""

import jax.numpy as jnp
import numpy as np
import pytest

from yolodl_tpu import activations as act
from yolodl_tpu.shapes import Dim, Shape


class TestActivations:
    def test_all_variants_run(self):
        x = jnp.asarray(np.linspace(-3, 3, 24).reshape(2, 3, 2, 2), dtype=jnp.float32)
        for name in act.ALL_ACTIVATIONS:
            y = act.apply(name, x)
            assert y.shape == x.shape, name
            assert bool(jnp.all(jnp.isfinite(y))), name

    def test_mish_reference_values(self):
        # mish(x) = x * tanh(softplus(x)); checked against published values
        x = jnp.array([-1.0, 0.0, 1.0, 2.0])
        y = act.mish(x)
        np.testing.assert_allclose(
            y, [-0.30340147, 0.0, 0.8650984, 1.9439590], atol=1e-4
        )

    def test_leaky_slope(self):
        # darknet leaky slope is 0.1 (tch-act/src/impls.rs:27-29)
        x = jnp.array([-10.0, 10.0])
        np.testing.assert_allclose(act.leaky(x), [-1.0, 10.0], atol=1e-6)

    def test_lrelu_slope(self):
        x = jnp.array([-10.0, 10.0])
        np.testing.assert_allclose(act.lrelu(x), [-2.0, 10.0], atol=1e-6)

    def test_linear_identity(self):
        x = jnp.array([-1.5, 2.5])
        np.testing.assert_allclose(act.apply("linear", x), x)

    def test_hard_mish_matches_reference_form(self):
        x = jnp.array([-3.0, -1.0, 0.0, 2.0])
        # case1 = clamp(x,-2,0); case2 = clamp_min(x,0); out = case1^2/2 + case1 + case2
        np.testing.assert_allclose(
            act.hard_mish(x), [0.0, -0.5, 0.0, 2.0], atol=1e-6
        )

    def test_normalize_channels_sums_to_one(self):
        x = jnp.asarray(np.random.default_rng(1).normal(size=(2, 3, 3, 5)), dtype=jnp.float32)
        # NHWC device layout: apply() normalizes the channel (last) axis
        y = act.normalize_channels_softmax(x)
        np.testing.assert_allclose(np.asarray(y.sum(axis=-1)), 1.0, atol=1e-5)
        y2 = act.apply("normalize_channels", jnp.abs(x) + 0.1)
        np.testing.assert_allclose(np.asarray(y2.sum(axis=-1)), 1.0, atol=1e-5)

    def test_darknet_name_resolution(self):
        assert act.resolve("leaky") is act.leaky
        assert act.resolve("Mish")(jnp.array([1.0]))[0] == pytest.approx(0.8650984, abs=1e-4)
        with pytest.raises(KeyError):
            act.resolve("nope")


class TestShapes:
    def test_dim_parse(self):
        assert Dim.of("_") == Dim(None)
        assert Dim.of(3) == Dim(3)
        assert Dim.of("7") == Dim(7)
        with pytest.raises(ValueError):
            Dim.of(-1)

    def test_dim_equals_unknown_matches(self):
        assert Dim(None).equals(Dim(5))
        assert Dim(5).equals(Dim(5))
        assert not Dim(5).equals(Dim(6))

    def test_unify(self):
        assert Dim(None).unify(Dim(4)) == Dim(4)
        with pytest.raises(ValueError):
            Dim(3).unify(Dim(4))

    def test_dim_arith(self):
        assert Dim(3) * 2 == Dim(6)
        assert Dim(None) * 2 == Dim(None)
        assert Dim(3) + Dim(4) == Dim(7)
        assert Dim(8).map(lambda s: s // 2) == Dim(4)

    def test_shape_json_roundtrip(self):
        s = Shape(["_", 3, 64, 64])
        assert s.to_json() == ["_", 3, 64, 64]
        assert s.equals(Shape([1, 3, 64, 64]))
        assert not s.equals(Shape([1, 4, 64, 64]))

    def test_shape_unify_and_concrete(self):
        s = Shape(["_", 3, "_", "_"]).unify(Shape([2, "_", 64, 64]))
        assert s.concrete() == (2, 3, 64, 64)
        with pytest.raises(ValueError):
            Shape(["_", 3]).concrete()

    def test_with_dim(self):
        s = Shape([1, 3, 8, 8]).with_dim(1, 16)
        assert s.concrete() == (1, 16, 8, 8)


class TestUnits:
    def test_arithmetic_passthrough(self):
        from yolodl_tpu.units import Pixel, Ratio

        a = Pixel(10.0)
        assert (a + Pixel(5.0)).value == 15.0
        assert (a * 2).value == 20.0
        assert a.to_ratio(100.0) == Ratio(0.1)
        assert Ratio(0.25).to_pixel(80.0) == Pixel(20.0)

    def test_mixing_units_rejected(self):
        from yolodl_tpu.units import Pixel, Ratio
        import pytest as _pytest

        with _pytest.raises(TypeError):
            Pixel(1.0) + Ratio(1.0)


class TestTensorExt:
    def test_crop_by_ratio(self):
        import jax.numpy as jnp
        from yolodl_tpu.utils.tensor_ext import crop_by_ratio

        x = jnp.arange(16.0).reshape(4, 4)
        out = crop_by_ratio(x, 0.25, 0.75, 0.0, 0.5)
        assert out.shape == (2, 2)
        np.testing.assert_allclose(out, [[4, 5], [8, 9]])

    def test_multi_softmax_groups(self):
        import jax.numpy as jnp
        from yolodl_tpu.utils.tensor_ext import multi_softmax

        x = jnp.zeros((2, 8))
        out = multi_softmax(x, num_groups=2)
        np.testing.assert_allclose(out, 0.25)  # each group of 4 sums to 1

    def test_cartesian_product(self):
        import jax.numpy as jnp
        from yolodl_tpu.utils.tensor_ext import cartesian_product_nd

        out = cartesian_product_nd(jnp.array([0, 1]), jnp.array([5, 6, 7]))
        assert out.shape == (6, 2)
        assert out.tolist() == [[0, 5], [0, 6], [0, 7], [1, 5], [1, 6], [1, 7]]

    def test_weighted_mean(self):
        import jax.numpy as jnp
        from yolodl_tpu.utils.tensor_ext import weighted_mean_tensors

        out = weighted_mean_tensors([(jnp.asarray(1.0), 1.0), (jnp.asarray(3.0), 3.0)])
        assert float(out) == pytest.approx(2.5)

    def test_resize_exact_and_finite(self):
        import jax.numpy as jnp
        from yolodl_tpu.utils.tensor_ext import all_finite, resize2d_exact

        x = jnp.ones((3, 4, 4))
        assert resize2d_exact(x, 8, 8).shape == (3, 8, 8)
        assert bool(all_finite({"a": x}))
        assert not bool(all_finite({"a": x * jnp.inf}))


class TestExtraNorms:
    def test_instance_norm(self, rng=np.random.default_rng(0)):
        import jax.numpy as jnp
        from yolodl_tpu.ops.norm import instance_norm_apply

        x = jnp.asarray(rng.normal(2, 3, (2, 8, 8, 4)), jnp.float32)
        out = instance_norm_apply({}, x)
        m = np.asarray(out).mean(axis=(1, 2))
        np.testing.assert_allclose(m, 0.0, atol=1e-4)

    def test_group_norm(self, rng=np.random.default_rng(1)):
        import jax.numpy as jnp
        from yolodl_tpu.ops.norm import group_norm_apply

        x = jnp.asarray(rng.normal(size=(2, 4, 4, 8)), jnp.float32)
        out = group_norm_apply({}, x, num_groups=2)
        assert out.shape == x.shape
        grouped = np.asarray(out).reshape(2, 4, 4, 2, 4)
        np.testing.assert_allclose(grouped.mean(axis=(1, 2, 4)), 0.0, atol=1e-4)
