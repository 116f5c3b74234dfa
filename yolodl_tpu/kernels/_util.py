"""Shared helpers for the Pallas kernel modules."""

from __future__ import annotations

import jax
import jax.numpy as jnp


def pad_axis(x: jax.Array, size: int, axis: int) -> jax.Array:
    """Zero-pad ``x`` up to ``size`` along ``axis`` (no-op if large enough).

    Kernels pad operands to lane/sublane-aligned tile sizes before
    ``pallas_call`` and slice the result back.
    """
    pad = size - x.shape[axis]
    if pad <= 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths)


def interpret_default() -> bool:
    """Pallas Mosaic kernels need the interpreter on CPU backends; the
    axon backend is a real TPU."""
    return jax.default_backend() == "cpu"


def make_conv2d_with_wgrad(wgrad_fn, doc: str):
    """custom-vjp stride-1 'same' NHWC conv whose backward-filter pass is
    ``wgrad_fn(xp, g, k)`` (pre-padded input, cotangent, kernel size).

    One definition of the forward pre-pad and the dX full-correlation so
    the experimental wgrad kernels (wgrad_pallas / wgrad_db) cannot drift
    apart on the surrounding algebra.
    """
    import functools

    dn = ("NHWC", "HWIO", "NHWC")

    @functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
    def conv2d(x, w, k):
        pad = (k - 1) // 2
        return jax.lax.conv_general_dilated(
            x, w.astype(x.dtype), (1, 1), ((pad, pad), (pad, pad)),
            dimension_numbers=dn)

    def fwd(x, w, k):
        pad = (k - 1) // 2
        xp = jnp.pad(x, ((0, 0), (pad, pad), (pad, pad), (0, 0))) if pad else x
        y = jax.lax.conv_general_dilated(
            xp, w.astype(x.dtype), (1, 1), ((0, 0), (0, 0)),
            dimension_numbers=dn)
        return y, (xp, w)

    def bwd(k, res, g):
        xp, w = res
        pad = (k - 1) // 2
        # dX: full-padded correlation with the spatially-flipped kernel
        wt = jnp.flip(w, (0, 1)).swapaxes(2, 3).astype(g.dtype)
        dxp = jax.lax.conv_general_dilated(
            g, wt, (1, 1), ((k - 1, k - 1), (k - 1, k - 1)),
            dimension_numbers=dn)
        dx = (dxp[:, pad:dxp.shape[1] - pad, pad:dxp.shape[2] - pad, :]
              if pad else dxp)
        return dx, wgrad_fn(xp, g, k).astype(w.dtype)

    conv2d.defvjp(fwd, bwd)
    conv2d.__doc__ = doc
    return conv2d
