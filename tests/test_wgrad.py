"""conv2d_packed_wgrad is numerically identical to the stock XLA conv.

The packed-im2col dW formulation (ops/wgrad.py) and the Pallas wgrad kernel
(kernels/wgrad_pallas.py) are *negative results* on TPU perf (see CLAUDE.md)
but are kept as exact, tested alternatives; this locks their semantics.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from yolodl_tpu.ops.wgrad import conv2d_packed_wgrad
from yolodl_tpu.kernels.wgrad_pallas import conv2d_lowch


SHAPES = [
    (16, 12, 128, 3, 1),
    (16, 64, 32, 1, 1),
    (17, 32, 64, 3, 2),
    (16, 32, 64, 3, 2),
    (16, 64, 64, 1, 2),
    (15, 8, 16, 3, 1),
    (19, 16, 8, 3, 2),
]


def _ref_and_grads(fn, x, w):
    y = fn(x, w)
    gx, gw = jax.grad(lambda x, w: jnp.sum(fn(x, w) ** 2), argnums=(0, 1))(x, w)
    return y, gx, gw


@pytest.mark.parametrize("hw,ci,co,k,s", SHAPES)
def test_packed_wgrad_matches_xla(hw, ci, co, k, s):
    rng = np.random.default_rng(hw * 100 + ci)
    x = jnp.asarray(rng.normal(size=(2, hw, hw, ci)), jnp.float32)
    w = jnp.asarray(rng.normal(size=(k, k, ci, co)), jnp.float32)
    pad = (k - 1) // 2

    def ref(x, w):
        return jax.lax.conv_general_dilated(
            x, w, (s, s), ((pad, pad), (pad, pad)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"))

    y0, gx0, gw0 = _ref_and_grads(ref, x, w)
    y1, gx1, gw1 = _ref_and_grads(
        lambda x, w: conv2d_packed_wgrad(x, w, k, s), x, w)
    np.testing.assert_allclose(y0, y1, rtol=0, atol=0)
    np.testing.assert_allclose(gx0, gx1, rtol=0, atol=0)
    scale = float(jnp.max(jnp.abs(gw0))) + 1e-9
    np.testing.assert_allclose(gw0 / scale, gw1 / scale, atol=3e-6)


@pytest.mark.parametrize("hw,ci,co,k", [(16, 32, 64, 3), (16, 64, 32, 1)])
def test_pallas_lowch_matches_xla(hw, ci, co, k):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(2, hw, hw, ci)), jnp.float32)
    w = jnp.asarray(rng.normal(size=(k, k, ci, co)), jnp.float32)
    pad = (k - 1) // 2

    def ref(x, w):
        return jax.lax.conv_general_dilated(
            x, w, (1, 1), ((pad, pad), (pad, pad)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"))

    y0, gx0, gw0 = _ref_and_grads(ref, x, w)
    y1, gx1, gw1 = _ref_and_grads(lambda x, w: conv2d_lowch(x, w, k), x, w)
    np.testing.assert_allclose(y0, y1, rtol=0, atol=0)
    np.testing.assert_allclose(gx0, gx1, rtol=0, atol=1e-4)
    scale = float(jnp.max(jnp.abs(gw0))) + 1e-9
    np.testing.assert_allclose(gw0 / scale, gw1 / scale, atol=3e-6)


@pytest.mark.parametrize("hw,ci,co,k", [(16, 32, 64, 3), (16, 64, 32, 1),
                                        (8, 16, 8, 3)])
def test_pallas_db_matches_xla(hw, ci, co, k):
    """Double-buffered wgrad kernel (kernels/wgrad_db.py) exactness."""
    from yolodl_tpu.kernels.wgrad_db import conv2d_db

    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(3, hw, hw, ci)), jnp.float32)
    w = jnp.asarray(rng.normal(size=(k, k, ci, co)), jnp.float32)
    pad = (k - 1) // 2

    def ref(x, w):
        return jax.lax.conv_general_dilated(
            x, w, (1, 1), ((pad, pad), (pad, pad)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"))

    y0, gx0, gw0 = _ref_and_grads(ref, x, w)
    y1, gx1, gw1 = _ref_and_grads(lambda x, w: conv2d_db(x, w, k), x, w)
    np.testing.assert_allclose(y0, y1, rtol=0, atol=0)
    np.testing.assert_allclose(gx0, gx1, rtol=0, atol=1e-4)
    scale = float(jnp.max(jnp.abs(gw0))) + 1e-9
    np.testing.assert_allclose(gw0 / scale, gw1 / scale, atol=3e-6)
