"""On-device (TPU) batched augmentation.

Equivalent capability to the reference's ``preprocessor.pipeline.device``
knob (its tch preprocessor can run on a CUDA device;
``train/src/training_stream.rs`` stages call tensor ops on the configured
device).  TPU-first redesign: instead of per-record tensor ops, ALL random
parameters are sampled on the host from the exact same per-slot RNG stream
as the CPU path (``pipeline.TrainingStream``), label geometry stays on the
host (cheap numpy), and the pixel work — HSV jitter, random-affine bilinear
warp, mosaic/mixup/cutmix composition — runs as ONE jitted program over the
whole batch on the accelerator.  With a single host core, this moves the
~60+ ms/record of per-pixel augmentation off the feed path.

Semantics parity:
- the warp reproduces scipy ``affine_transform(order=1, mode="constant")``
  hard-cut borders exactly (native/loader.cpp ydl_affine_warp, same
  arithmetic order), so device and host pipelines agree to float rounding;
- mosaic composition is a pure coordinate select: output pixel (r, c) takes
  quadrant q's pixel AT (r, c) (the host path crops [0:pr, 0:pc] etc. and
  concatenates, which is the same map);
- mixup is λ·A + (1−λ)·B, cutmix a masked paste — bitwise-equal to host.

Record-level gates (apply-jitter / apply-affine / mix kind) vary per record,
so they ride in as data (masks / select indices) and the program stays
shape-static: no retracing across batches.
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional, Sequence, Tuple

import numpy as np

MIX_NONE, MIX_MOSAIC, MIX_MIXUP, MIX_CUTMIX = 0, 1, 2, 3


@dataclasses.dataclass
class DeferredRecord:
    """One pipeline slot with pixel work deferred to the device.

    ``boxes``/``classes`` are final (host-computed through the same affine +
    mix geometry the pixels will see); ``images`` holds the 1/2/4 source
    images the mix needs.
    """

    images: List[np.ndarray]                       # need × [3, H, W] f32
    jit_params: Optional[List[Tuple[float, float, float]]]  # per image
    transforms: List[Optional[np.ndarray]]         # 3×3 ±1-frame, None=skip
    mix_kind: int                                  # MIX_* code
    mix_params: tuple                              # (pivot_row, pivot_col) | (lam,) | (t,b,l,r)
    boxes: np.ndarray
    classes: np.ndarray


def pack_deferred_batch(records: Sequence[DeferredRecord], k_max: int,
                        uint8: bool = True) -> dict:
    """Stack a batch of DeferredRecords into the fixed-shape arrays the
    jitted augment program consumes.  Unused image slots stay zero (their
    output is never selected).

    ``uint8`` (the default) ships the image slots as u8 — 4× less
    host→device traffic (the pack is B·k_max full-resolution slots, the
    dominant feed payload; ~284 MB/batch at 608² with mosaic in f32) — and
    the device program rescales to f32/255.  Decoded sources are u8/255
    grids, so the quantization is exact for them; synthetic continuous
    floats round to the nearest 1/255 step.  ``uint8=False`` keeps f32 for
    bitwise host-parity testing."""
    from .affine import pixel_affine

    b = len(records)
    _, h, w = records[0].images[0].shape
    images = np.zeros((b, k_max, 3, h, w),
                      np.uint8 if uint8 else np.float32)
    jit = np.zeros((b, k_max, 3), np.float32)
    jit_on = np.zeros((b, k_max), bool)
    aff_m = np.tile(np.eye(2, dtype=np.float32), (b, k_max, 1, 1))
    aff_b = np.zeros((b, k_max, 2), np.float32)
    aff_on = np.zeros((b, k_max), bool)
    kind = np.zeros((b,), np.int32)
    pivot = np.zeros((b, 2), np.int32)
    lam = np.ones((b,), np.float32)
    cutbox = np.zeros((b, 4), np.int32)

    for i, rec in enumerate(records):
        n = len(rec.images)
        for k in range(n):
            if uint8:
                # round-to-nearest; assignment into the u8 array truncates
                images[i, k] = np.clip(rec.images[k] * 255.0 + 0.5, 0, 255)
            else:
                images[i, k] = rec.images[k]
            if rec.jit_params is not None:
                jit[i, k] = rec.jit_params[k]
                jit_on[i, k] = True
            t = rec.transforms[k]
            if t is not None:
                m_rc, b_rc = pixel_affine(t, h, w)
                aff_m[i, k] = m_rc.astype(np.float32)
                aff_b[i, k] = b_rc.astype(np.float32)
                aff_on[i, k] = True
        kind[i] = rec.mix_kind
        if rec.mix_kind == MIX_MOSAIC:
            pr_, pc_ = rec.mix_params
            # same pixel rounding as MosaicMixer.__call__
            pivot[i] = (round(pr_ * h), round(pc_ * w))
        elif rec.mix_kind == MIX_MIXUP:
            lam[i] = rec.mix_params[0]
        elif rec.mix_kind == MIX_CUTMIX:
            t_, b_, l_, r_ = rec.mix_params
            # same pixel rounding as CutMixMixer.__call__
            cutbox[i] = (round(t_ * h), round(b_ * h),
                         round(l_ * w), round(r_ * w))
    return dict(images=images, jit=jit, jit_on=jit_on, aff_m=aff_m,
                aff_b=aff_b, aff_on=aff_on, kind=kind, pivot=pivot,
                lam=lam, cutbox=cutbox)


# -- device kernels ---------------------------------------------------------


def _hsv_jitter_jnp(img, hs, ss, vs):
    """[3,H,W] RGB in [0,1] → jittered RGB; mirrors data/color.py exactly."""
    import jax.numpy as jnp

    r, g, b = img[0], img[1], img[2]
    maxc = jnp.max(img, axis=0)
    minc = jnp.min(img, axis=0)
    v = maxc
    delta = maxc - minc
    s = jnp.where(maxc > 0, delta / jnp.maximum(maxc, 1e-12), 0.0)
    rc = jnp.where(delta > 0, (maxc - r) / jnp.maximum(delta, 1e-12), 0.0)
    gc = jnp.where(delta > 0, (maxc - g) / jnp.maximum(delta, 1e-12), 0.0)
    bc = jnp.where(delta > 0, (maxc - b) / jnp.maximum(delta, 1e-12), 0.0)
    h = jnp.where(
        maxc == r, bc - gc, jnp.where(maxc == g, 2.0 + rc - bc, 4.0 + gc - rc)
    )
    h = (h / 6.0) % 1.0
    h = jnp.where(delta > 0, h, 0.0)

    h = (h + hs + 1.0) % 1.0
    s = jnp.clip(s + ss, 0.0, 1.0)
    v = jnp.clip(v + vs, 0.0, 1.0)

    i = jnp.floor(h * 6.0)
    f = h * 6.0 - i
    p = v * (1.0 - s)
    q = v * (1.0 - s * f)
    t = v * (1.0 - s * (1.0 - f))
    i = i.astype(jnp.int32) % 6

    # np.choose equivalent as elementwise selects (no gathers on the VPU)
    def choose6(c0, c1, c2, c3, c4, c5):
        return jnp.where(
            i == 0, c0,
            jnp.where(i == 1, c1,
                      jnp.where(i == 2, c2,
                                jnp.where(i == 3, c3,
                                          jnp.where(i == 4, c4, c5)))))

    r_out = choose6(v, q, p, p, t, v)
    g_out = choose6(t, v, v, q, p, p)
    b_out = choose6(p, p, t, v, v, q)
    return jnp.stack([r_out, g_out, b_out])


def _warp_general_jnp(img, m, b):
    """[3,H,W] bilinear warp, in_(r,c) = m @ out_(r,c) + b; scipy order-1
    mode="constant" hard-cut borders (native/loader.cpp ydl_affine_warp)."""
    import jax.numpy as jnp

    _, h, w = img.shape
    rr = jnp.arange(h, dtype=jnp.float32)[:, None]
    cc = jnp.arange(w, dtype=jnp.float32)[None, :]
    ir = m[0, 0] * rr + m[0, 1] * cc + b[0]
    ic = m[1, 0] * rr + m[1, 1] * cc + b[1]
    valid = (ir >= 0) & (ir <= h - 1) & (ic >= 0) & (ic <= w - 1)
    r0 = jnp.clip(jnp.floor(ir), 0, h - 1)
    c0 = jnp.clip(jnp.floor(ic), 0, w - 1)
    fr = ir - r0
    fc = ic - c0
    r0i = r0.astype(jnp.int32)
    c0i = c0.astype(jnp.int32)
    r1i = jnp.minimum(r0i + 1, h - 1)
    c1i = jnp.minimum(c0i + 1, w - 1)
    v00 = img[:, r0i, c0i]
    v01 = img[:, r0i, c1i]
    v10 = img[:, r1i, c0i]
    v11 = img[:, r1i, c1i]
    top = v00 + fc * (v01 - v00)
    bot = v10 + fc * (v11 - v10)
    out = top + fr * (bot - top)
    return jnp.where(valid, out, 0.0)


def _warp_separable_jnp(img, m, b):
    """Axis-separable warp for rotation-free transforms (flip/scale/
    translate give a diagonal pixel matrix): two 1-D gathers instead of a
    2-D gather — much friendlier to the TPU memory system.  Arithmetic
    order matches the general kernel (columns interpolated first)."""
    import jax.numpy as jnp

    _, h, w = img.shape
    rvec = m[0, 0] * jnp.arange(h, dtype=jnp.float32) + b[0]
    cvec = m[1, 1] * jnp.arange(w, dtype=jnp.float32) + b[1]
    rvalid = (rvec >= 0) & (rvec <= h - 1)
    cvalid = (cvec >= 0) & (cvec <= w - 1)
    r0 = jnp.clip(jnp.floor(rvec), 0, h - 1)
    c0 = jnp.clip(jnp.floor(cvec), 0, w - 1)
    fr = (rvec - r0)[None, :, None]
    fc = (cvec - c0)[None, None, :]
    r0i = r0.astype(jnp.int32)
    c0i = c0.astype(jnp.int32)
    r1i = jnp.minimum(r0i + 1, h - 1)
    c1i = jnp.minimum(c0i + 1, w - 1)
    g0 = img[:, :, c0i]
    g1 = img[:, :, c1i]
    gc = g0 + fc * (g1 - g0)          # column interp on the full image
    t0 = gc[:, r0i, :]
    t1 = gc[:, r1i, :]
    out = t0 + fr * (t1 - t0)
    return jnp.where(rvalid[None, :, None] & cvalid[None, None, :], out, 0.0)


def _warp_twopass_jnp(img, m, b, d1: int, d2: int, block: int = 8):
    """Rotation-capable warp without any 2-D gather: Catmull–Smith two-pass
    decomposition of the affine into a column pass then a row pass, each a
    1-D bilinear resample whose line offset varies along the other axis.

    The TPU executes ``_warp_general_jnp``'s [H,W]-indexed gather at ~100 M
    elem/s (≈2 s for a 608² mosaic batch — measured, scripts/
    bench_device_augment.py); this kernel replaces it with banded
    shift-style taps: rows (then columns) are processed in blocks of
    ``block``, so within a block the resample coordinate spans at most
    ``d1``/``d2`` source lines (static, sized from the config's worst-case
    rotation/scale by :func:`twopass_bands`), and every tap is a gather
    with a per-block 1-D index vector — the same access pattern as the
    fast separable kernel.

    Index maps (in_(r,c) = m @ out_(r,c) + b, m[0,0] != 0):
      pass 1 (columns):  tmp(r', c) = img(r', a·c + p·r' + q)
          with p = m10/m00, a = m11 − m01·m10/m00, q = b1 − p·b0
      pass 2 (rows):     out(r, c) = tmp(m00·r + m01·c + b0, c)
    so the composite continuous map is exact; only the interpolation
    differs from the direct bilinear (each pass interpolates along the
    true map instead of reusing one fractional weight for both source
    rows).  Borders are the same hard-cut mask as the general kernel,
    computed from the composite coordinates.
    """
    import jax
    import jax.numpy as jnp

    _, h, w = img.shape
    # pad to a block multiple; padded lines carry zero weight (their
    # coordinates fall outside every band) and are cropped at the end
    hp = -(-h // block) * block
    wp = -(-w // block) * block

    p = m[1, 0] / m[0, 0]
    a = m[1, 1] - m[0, 1] * m[1, 0] / m[0, 0]
    q = b[1] - p * b[0]

    # ---- pass 1: resample columns, per-row coordinate ic = a·c + p·r + q
    nb1 = hp // block
    r_blk = (jnp.arange(nb1, dtype=jnp.float32)[:, None] * block
             + jnp.arange(block, dtype=jnp.float32)[None, :])   # [NB, R]
    o1 = p * r_blk + q                                          # [NB, R]
    o1_min = jnp.min(o1, axis=1)                                # [NB]
    c_ar = jnp.arange(w, dtype=jnp.float32)
    base1 = jnp.floor(a * c_ar[None, :] + o1_min[:, None])      # [NB, W]
    ic = a * c_ar[None, None, :] + o1[:, :, None]               # [NB, R, W]

    img_p = jnp.pad(img, ((0, 0), (0, hp - h), (0, 0)))
    img_b = img_p.reshape(3, nb1, block, w)
    # per-block 1-D-index gather along the last axis — the separable
    # kernel's proven-fast idiom under vmap (a broadcast take_along_axis
    # hits the TPU's slow elementwise-gather path: measured 9.5 s/batch)
    gather_last = jax.vmap(lambda blk, ix: blk[:, :, ix],
                           in_axes=(1, 0), out_axes=1)
    acc = jnp.zeros((3, nb1, block, w), img.dtype)
    for d in range(d1):
        j = base1 + d                                           # [NB, W]
        wgt = jnp.maximum(0.0, 1.0 - jnp.abs(ic - j[:, None, :]))
        idx = jnp.clip(j, 0, w - 1).astype(jnp.int32)
        g = gather_last(img_b, idx)                             # [3,NB,R,W]
        acc = acc + g * wgt[None]
    tmp = acc.reshape(3, hp, w)[:, :h, :]

    # ---- pass 2: resample rows, per-column coordinate ir = m00·r + m01·c + b0
    nb2 = wp // block
    c_blk = (jnp.arange(nb2, dtype=jnp.float32)[:, None] * block
             + jnp.arange(block, dtype=jnp.float32)[None, :])   # [NBc, C]
    o2 = m[0, 1] * c_blk + b[0]                                 # [NBc, C]
    o2_min = jnp.min(o2, axis=1)                                # [NBc]
    r_ar = jnp.arange(h, dtype=jnp.float32)
    base2 = jnp.floor(m[0, 0] * r_ar[None, :] + o2_min[:, None])  # [NBc, H]
    ir = m[0, 0] * r_ar[None, None, :] + o2[:, :, None]         # [NBc, C, H]

    tmp_p = jnp.pad(tmp, ((0, 0), (0, 0), (0, wp - w)))
    # [3, H, NBc, C] → put the gathered axis (H) last: [3, NBc, C, H]
    tmp_b = tmp_p.reshape(3, h, nb2, block).transpose(0, 2, 3, 1)
    acc2 = jnp.zeros((3, nb2, block, h), img.dtype)
    for d in range(d2):
        i = base2 + d                                           # [NBc, H]
        wgt = jnp.maximum(0.0, 1.0 - jnp.abs(ir - i[:, None, :]))
        idx = jnp.clip(i, 0, h - 1).astype(jnp.int32)
        g = gather_last(tmp_b, idx)                             # [3,NBc,C,H]
        acc2 = acc2 + g * wgt[None]
    out = acc2.transpose(0, 3, 1, 2).reshape(3, h, wp)[:, :, :w]

    # hard-cut borders from the composite coordinates (== general kernel)
    rr = jnp.arange(h, dtype=jnp.float32)[:, None]
    cc = jnp.arange(w, dtype=jnp.float32)[None, :]
    irf = m[0, 0] * rr + m[0, 1] * cc + b[0]
    icf = m[1, 0] * rr + m[1, 1] * cc + b[1]
    valid = (irf >= 0) & (irf <= h - 1) & (icf >= 0) & (icf <= w - 1)
    return jnp.where(valid, out, 0.0)


def twopass_bands(rotate_degrees: float, scale_min: float,
                  block: int = 8, aspect: float = 1.0) -> Tuple[int, int]:
    """Static band sizes for :func:`_warp_twopass_jnp` covering every
    transform ``RandomAffine`` can sample with rotation up to
    ``rotate_degrees`` and isotropic scale down to ``scale_min``:
    |m10/m00| = tan θ (scale cancels) bounds pass 1, |m01| = sin θ / s
    bounds pass 2.  For non-square inputs the pixel-space matrix carries
    aspect factors (m10/m00 = tan θ · w/h, m01 = sin θ / s · h/w) —
    ``aspect`` = max(h/w, w/h) widens both bounds to the worst case."""
    th = float(np.deg2rad(rotate_degrees))
    s = min(1.0, float(scale_min))
    a = max(1.0, float(aspect))
    d1 = int(np.ceil(np.tan(th) * a * (block - 1))) + 2
    d2 = int(np.ceil(np.sin(th) / s * a * (block - 1))) + 2
    return d1, d2


def make_augment_fn(h: int, w: int, *, separable: bool,
                    has_jitter: bool, has_affine: bool,
                    has_mosaic: bool, has_mixup: bool, has_cutmix: bool,
                    bands: Optional[Tuple[int, int]] = None):
    """Build the jitted batched augment program: pack dict → images [B,3,H,W].

    Warp kernel choice: ``separable=True`` → the diagonal-matrix fast path
    (no rotation in the config).  Otherwise ``bands=(d1, d2)`` (from
    :func:`twopass_bands`) selects the two-pass rotation kernel — the
    production default, ~60x the general kernel's throughput at 608² —
    while ``bands=None`` (or env ``YDL_AUG_GENERAL_WARP=1``) falls back to
    the exact-but-slow gather kernel."""
    import os

    import jax
    import jax.numpy as jnp

    if separable:
        warp = _warp_separable_jnp
    elif bands is None or os.environ.get("YDL_AUG_GENERAL_WARP") == "1":
        warp = _warp_general_jnp
    else:
        d1, d2 = bands

        def warp(img, m, bb):
            return _warp_twopass_jnp(img, m, bb, d1, d2)

    def per_image(img, p, jon, m, bb, aon):
        if has_jitter:
            img = jnp.where(jon, _hsv_jitter_jnp(img, p[0], p[1], p[2]), img)
        if has_affine:
            img = jnp.where(aon, warp(img, m, bb), img)
        return img

    def slot(args):
        # one mix-source slot for the whole batch: [B,3,H,W] + params.
        # u8→f32 conversion happens per slot, inside the map, so only one
        # slot's worth of f32 source is ever live.
        img, p, jon, m, bb, aon = args
        if img.dtype == jnp.uint8:
            img = img.astype(jnp.float32) * (1.0 / 255.0)
        return jax.vmap(per_image)(img, p, jon, m, bb, aon)

    @jax.jit
    def augment(pack):
        # lax.map over the SLOT axis (k ≤ 4), vmap over the batch inside:
        # a [B, k_max, 3, H, W] pack double-vmapped holds k× the live
        # buffers and OOM'd HBM at 608² (24 G > 15.75 G, measured) — the
        # sequential slot map bounds the working set to one slot.
        to_slot_major = lambda x: jnp.moveaxis(x, 1, 0)
        imgs = jax.lax.map(slot, (
            to_slot_major(pack["images"]), to_slot_major(pack["jit"]),
            to_slot_major(pack["jit_on"]), to_slot_major(pack["aff_m"]),
            to_slot_major(pack["aff_b"]), to_slot_major(pack["aff_on"]),
        ))  # [k, B, 3, H, W]

        kind = pack["kind"]                      # [B]
        out = imgs[0]
        if has_mosaic or has_cutmix:
            rr = jnp.arange(h)[None, :, None]    # [1, H, 1]
            cc = jnp.arange(w)[None, None, :]    # [1, 1, W]

        def sel(mask_b, a, b):                   # [B] mask over [B,3,H,W]
            return jnp.where(mask_b[:, None, None, None], a, b)

        if has_mosaic:
            pivot = pack["pivot"]                # [B, 2]
            top = (rr < pivot[:, 0, None, None])[:, None]    # [B,1,H,1]
            left = (cc < pivot[:, 1, None, None])[:, None]   # [B,1,1,W]
            mos = jnp.where(
                top & left, imgs[0],
                jnp.where(top, imgs[1], jnp.where(left, imgs[2], imgs[3])),
            )
            out = sel(kind == MIX_MOSAIC, mos, out)
        if has_mixup:
            lam = pack["lam"][:, None, None, None]
            mixed = lam * imgs[0] + (1.0 - lam) * imgs[1]
            out = sel(kind == MIX_MIXUP, mixed, out)
        if has_cutmix:
            cb = pack["cutbox"]                  # [B, 4]
            inwin = ((rr >= cb[:, 0, None, None]) & (rr < cb[:, 1, None, None]))[:, None] \
                & ((cc >= cb[:, 2, None, None]) & (cc < cb[:, 3, None, None]))[:, None]
            cut = jnp.where(inwin, imgs[1], imgs[0])
            out = sel(kind == MIX_CUTMIX, cut, out)
        return out

    return augment


def apply_device_augmentation(iterator, stream_cfg, device=None,
                              depth: int = 2):
    """Wrap a deferred TrainingStream: runs the jitted augment program per
    batch and yields ``(TrainingRecord, (images, boxes, classes, mask))``
    with device-resident arrays — the same contract as
    ``pipeline.device_prefetch`` so the train loop is agnostic.

    The H2D upload (B x k_max full-resolution slots — up to 4x the image
    payload when mosaic is enabled) and the augment dispatch run on a
    lookahead thread ``depth`` batches ahead, so the feed overlaps the
    training step exactly like ``device_prefetch`` does for the CPU
    pipeline (round-2 advisor finding: the first wiring ran them serially
    in the train-loop thread and lost the overlap on one-core hosts)."""
    import jax

    from .pipeline import lookahead_map

    state: dict = {"fn": None}

    def augment_batch(record):
        pack = record.deferred
        if state["fn"] is None:
            _, _, _, h, w = pack["images"].shape
            aff = stream_cfg.random_affine
            separable = aff is None or not (aff.rotate_prob and aff.rotate_degrees)
            bands = None
            # the 60°-equivalent band-width cutoff, aspect-adjusted: the
            # pixel-space matrix scales tan θ by max(h/w, w/h), so a
            # non-square input reaches the too-wide-bands regime at a
            # smaller angle (general gather kernel takes over there)
            aspect = max(h / w, w / h)
            if not separable and float(np.tan(np.deg2rad(
                    aff.rotate_degrees))) * aspect < float(np.tan(np.deg2rad(60.0))):
                bands = twopass_bands(
                    aff.rotate_degrees,
                    min(aff.scale) if (aff.scale_prob and aff.scale) else 1.0,
                    aspect=aspect)
            state["fn"] = make_augment_fn(
                h, w,
                separable=separable,
                bands=bands,
                has_jitter=stream_cfg.color_jitter is not None,
                has_affine=aff is not None,
                has_mosaic=stream_cfg.mosaic_prob > 0,
                has_mixup=stream_cfg.mixup_prob > 0,
                has_cutmix=stream_cfg.cutmix_prob > 0,
            )
        pack_dev = {k: jax.device_put(v, device) for k, v in pack.items()}
        images = state["fn"](pack_dev)
        boxes = jax.device_put(record.boxes, device)
        classes = jax.device_put(record.classes, device)
        mask = jax.device_put(record.mask, device)
        rec = dataclasses.replace(record, images=images, deferred=None)
        return rec, (images, boxes, classes, mask)

    return lookahead_map(iterator, augment_batch, depth)
