"""Spatial (halo-exchange) sharded convolution tests on the 8-device mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from yolodl_tpu.parallel.spatial import (
    SPACE_AXIS,
    make_space_mesh,
    make_spatial_forward,
    spatial_conv2d,
)


class TestSpatialConv:
    @pytest.mark.parametrize("k,stride", [(3, 1), (3, 2), (1, 1), (5, 1)])
    def test_matches_unsharded(self, rng, devices8, k, stride):
        mesh = make_space_mesh(8)
        c_in, c_out = 4, 6
        x = jnp.asarray(rng.normal(size=(2, 64, 32, c_in)), jnp.float32)
        w = jnp.asarray(rng.normal(size=(k, k, c_in, c_out)), jnp.float32)
        pad = (k - 1) // 2

        ref = jax.lax.conv_general_dilated(
            x, w, (stride, stride), ((pad, pad), (pad, pad)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )

        fwd = make_spatial_forward(
            lambda xl: spatial_conv2d(xl, w, pad, stride), mesh
        )
        out = fwd(x)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)

    def test_conv_stack_with_activation(self, rng, devices8):
        """Two convs + mish, sharded vs not."""
        from yolodl_tpu.activations import mish

        mesh = make_space_mesh(8)
        x = jnp.asarray(rng.normal(size=(1, 64, 16, 3)), jnp.float32)
        w1 = jnp.asarray(rng.normal(size=(3, 3, 3, 8)) * 0.1, jnp.float32)
        w2 = jnp.asarray(rng.normal(size=(3, 3, 8, 4)) * 0.1, jnp.float32)

        def local_forward(xl):
            h = mish(spatial_conv2d(xl, w1, 1, 1))
            return mish(spatial_conv2d(h, w2, 1, 2))

        out = make_spatial_forward(local_forward, mesh)(x)

        def full(x):
            h = mish(jax.lax.conv_general_dilated(
                x, w1, (1, 1), ((1, 1), (1, 1)),
                dimension_numbers=("NHWC", "HWIO", "NHWC")))
            return mish(jax.lax.conv_general_dilated(
                h, w2, (2, 2), ((1, 1), (1, 1)),
                dimension_numbers=("NHWC", "HWIO", "NHWC")))

        np.testing.assert_allclose(np.asarray(out), np.asarray(full(x)), atol=1e-5)

    def test_rejects_valid_padding(self, devices8):
        w = jnp.zeros((3, 3, 2, 2))
        mesh = make_space_mesh(8)
        fwd = make_spatial_forward(lambda xl: spatial_conv2d(xl, w, 0, 1), mesh)
        with pytest.raises(ValueError, match="same-padding"):
            fwd(jnp.zeros((1, 64, 8, 2)))
