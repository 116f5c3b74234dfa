"""Candidate-rewrite microbench for the low-channel conv head (TPU).

conv_roofline.py showed the 304p/152p c<=64 layers of yolov4-csp run at
3-40% MXU efficiency (128-lane padding).  This experiment trace-times, per
target shape, the baseline conv against its space-to-depth (SPD) rewrite:
activations packed [B,H,W,C] -> [B,H/2,W/2,4C], convs executed dense in the
SPD domain (4x FLOPs, zero lane padding; dW backward also becomes
well-packed).  fwd+bwd timed separately so the backward win is visible.

Run under axon: python scripts/exp_lowchannel.py
"""

import functools
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from _trace_util import device_op_ms, timed as _timed

import jax

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(__file__), "..", ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np

from yolodl_tpu.ops.spd_stem import build_spd_stem_weights, space_to_depth

BATCH = int(os.environ.get("EXP_BATCH", "16"))
REPS = int(os.environ.get("EXP_REPS", "6"))


def timed(fn, args):
    return _timed(fn, args, reps=REPS)


def conv(x, w, s=1):
    k = w.shape[0]
    return jax.lax.conv_general_dilated(
        x, w, (s, s), ((k // 2, k // 2),) * 2 if k > 1 else ((0, 0), (0, 0)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


def fwd_bwd(convfn):
    @jax.jit
    def run(x, w):
        y = convfn(x, w)
        g = jax.grad(lambda x, w: jnp.sum(convfn(x, w).astype(jnp.float32) ** 2),
                     argnums=(0, 1))(x, w)
        return jnp.sum(y.astype(jnp.float32) ** 2) + sum(
            jnp.sum(gi.astype(jnp.float32) ** 2) for gi in g)
    return run


def blockdiag_1x1(w):
    """[1,1,C,C'] -> [1,1,4C,4C'] block-diagonal over SPD phases."""
    c, co = w.shape[2], w.shape[3]
    out = jnp.zeros((1, 1, 4 * c, 4 * co), w.dtype)
    for p in range(4):
        out = out.at[0, 0, p * c:(p + 1) * c, p * co:(p + 1) * co].set(w[0, 0])
    return out


def main():
    rng = np.random.default_rng(0)

    def mk(shape):
        return jnp.asarray(rng.normal(size=shape) * 0.1, jnp.bfloat16)

    cases = []

    # ---- E1: 304p 1x1 64->32 vs SPD block-diag 152p 256->128
    x = mk((BATCH, 304, 304, 64))
    w = mk((1, 1, 64, 32))
    xs = space_to_depth(x)
    wbd = blockdiag_1x1(w)
    cases.append(("1x1 304p 64->32  base", fwd_bwd(conv), (x, w)))
    cases.append(("1x1 304p 64->32  spd ", fwd_bwd(conv), (xs, wbd)))

    # ---- E2: 304p 3x3 32->64 vs SPD 152p 128->256
    x = mk((BATCH, 304, 304, 32))
    w = mk((3, 3, 32, 64))
    w0p, _ = build_spd_stem_weights(w, mk((3, 3, 64, 8)))
    xs = space_to_depth(x)
    cases.append(("3x3 304p 32->64  base", fwd_bwd(conv), (x, w)))
    cases.append(("3x3 304p 32->64  spd ", fwd_bwd(conv), (xs, w0p)))

    # ---- E3: 304p 3x3 s2 64->128 vs SPD 152p s1 256->128
    x = mk((BATCH, 304, 304, 64))
    w = mk((3, 3, 64, 128))
    _, w1p = build_spd_stem_weights(mk((3, 3, 8, 64)), w)
    xs = space_to_depth(x)
    cases.append(("3x3s2 304p 64->128 base", fwd_bwd(functools.partial(conv, s=2)), (x, w)))
    cases.append(("3x3s2 304p 64->128 spd ", fwd_bwd(conv), (xs, w1p)))

    # ---- E4: 152p 3x3 64->64 vs SPD 76p 256->256
    x = mk((BATCH, 152, 152, 64))
    w = mk((3, 3, 64, 64))
    w0p, _ = build_spd_stem_weights(w, mk((3, 3, 64, 8)))
    xs = space_to_depth(x)
    cases.append(("3x3 152p 64->64  base", fwd_bwd(conv), (x, w)))
    cases.append(("3x3 152p 64->64  spd ", fwd_bwd(conv), (xs, w0p)))

    # ---- E5: 152p 1x1 128->64 vs SPD 76p 512->256
    x = mk((BATCH, 152, 152, 128))
    w = mk((1, 1, 128, 64))
    xs = space_to_depth(x)
    wbd = blockdiag_1x1(w)
    cases.append(("1x1 152p 128->64 base", fwd_bwd(conv), (x, w)))
    cases.append(("1x1 152p 128->64 spd ", fwd_bwd(conv), (xs, wbd)))

    # ---- E6: fwd-only splits for E4 (locate bwd cost)
    x = mk((BATCH, 152, 152, 64))
    w = mk((3, 3, 64, 64))

    @jax.jit
    def fwd_only(x, w):
        return jnp.sum(conv(x, w).astype(jnp.float32) ** 2)

    @jax.jit
    def dw_only(x, w):
        return jnp.sum(jax.grad(
            lambda w: jnp.sum(conv(x, w).astype(jnp.float32) ** 2))(w)
            .astype(jnp.float32) ** 2)

    cases.append(("3x3 152p 64->64  fwdonly", fwd_only, (x, w)))
    cases.append(("3x3 152p 64->64  dwonly ", dw_only, (x, w)))

    # ---- E7: SPD pack/unpack transpose cost at 304p x64
    x = mk((BATCH, 304, 304, 64))

    @jax.jit
    def pack_unpack(x):
        y = space_to_depth(x)
        b, h, w_, c4 = y.shape
        z = y.reshape(b, h, w_, 2, 2, c4 // 4)
        z = jnp.transpose(z, (0, 1, 3, 2, 4, 5)).reshape(b, 2 * h, 2 * w_, c4 // 4)
        return jnp.sum(z.astype(jnp.float32) ** 2)

    cases.append(("spd pack+unpack 304p x64", pack_unpack, (x,)))

    # ---- E8: full stage-1 chain L3(1x1 64->32) L4(3x3 32->64) L5(add)
    # three ways: base, 2D SPD (transpose pack), 1D W-fold (pure reshape)
    def wfold_1x1(w, f=4):
        c, co = w.shape[2], w.shape[3]
        out = jnp.zeros((1, 1, f * c, f * co), w.dtype)
        for p in range(f):
            out = out.at[0, 0, p * c:(p + 1) * c, p * co:(p + 1) * co].set(w[0, 0])
        return out

    def wfold_k3(w, f=4):
        """k3 s1 conv with both input and output W-folded by f (k3 along
        folded W suffices for f>=2: offsets b+v span -1..f)."""
        k, _, c, co = w.shape
        out = jnp.zeros((k, 3, f * c, f * co), w.dtype)
        for b in range(f):
            for v in range(3):
                t = b + v - 1
                dj, dx = t // f, t % f
                out = out.at[:, dj + 1, dx * c:(dx + 1) * c,
                             b * co:(b + 1) * co].set(w[:, v])
        return out

    x0 = mk((BATCH, 304, 304, 64))
    w3 = mk((1, 1, 64, 32))
    w4 = mk((3, 3, 32, 64))

    def chain_base(x0, w3, w4):
        h = conv(x0, w3)
        h = conv(h, w4)
        return h + x0

    def chain_spd(x0, w3, w4):
        xs = space_to_depth(x0)
        h = conv(xs, blockdiag_1x1(w3))
        w4p, _ = build_spd_stem_weights(w4, jnp.zeros((3, 3, 64, 8), w4.dtype))
        h = conv(h, w4p)
        h = h + xs
        b, hh, ww, c4 = h.shape
        z = h.reshape(b, hh, ww, 2, 2, c4 // 4)
        return jnp.transpose(z, (0, 1, 3, 2, 4, 5)).reshape(
            b, 2 * hh, 2 * ww, c4 // 4)

    def chain_fold(x0, w3, w4):
        b, hh, ww, c = x0.shape
        xf = x0.reshape(b, hh, ww // 4, 4 * c)
        h = conv(xf, wfold_1x1(w3))
        h = conv(h, wfold_k3(w4))
        h = h + xf
        return h.reshape(b, hh, ww, c)

    for nm, f in [("base", chain_base), ("spd ", chain_spd),
                  ("fold", chain_fold)]:
        def run(x0, w3, w4, f=f):
            y = f(x0, w3, w4)
            g = jax.grad(lambda *a: jnp.sum(f(*a).astype(jnp.float32) ** 2),
                         argnums=(0, 1, 2))(x0, w3, w4)
            return jnp.sum(y.astype(jnp.float32) ** 2) + sum(
                jnp.sum(gi.astype(jnp.float32) ** 2) for gi in g)
        cases.append((f"chain L3-L5 {nm}", jax.jit(run), (x0, w3, w4)))

    # correctness cross-check (CPU-exactness not expected in bf16; loose)
    ref = chain_base(x0.astype(jnp.float32), w3.astype(jnp.float32),
                     w4.astype(jnp.float32))
    for nm, f in [("spd", chain_spd), ("fold", chain_fold)]:
        got = f(x0.astype(jnp.float32), w3.astype(jnp.float32),
                w4.astype(jnp.float32))
        err = float(jnp.max(jnp.abs(got - ref)) / (jnp.max(jnp.abs(ref)) + 1e-9))
        print(f"chain {nm} rel-max-err vs base: {err:.2e}", flush=True)

    for name, fn, args in cases:
        ms = timed(fn, args)
        print(f"{name:28} {ms:8.3f} ms", flush=True)


if __name__ == "__main__":
    main()
