"""On-device (jitted, batched) augmentation vs the host CPU pipeline.

The device path samples the SAME per-slot RNG stream and computes label
geometry on the host, so boxes/classes/mask must be bit-identical; pixel
composition (mosaic/mixup/cutmix) is exact, and the warp/jitter kernels
match the host float implementations to rounding.
"""

import numpy as np
import pytest

# fast tier ON PURPOSE (round-4, advisor finding): the production feed
# defaults (u8 pack shipping, two-pass rotation kernel selection) live
# here, and the whole module runs in ~45 s — a regression in the default
# feed path must surface per-commit, not at the release gate

from yolodl_tpu.data import device_augment as da
from yolodl_tpu.data.affine import RandomAffine, pixel_affine, warp_image
from yolodl_tpu.data.color import ColorJitter
from yolodl_tpu.data.mosaic import MosaicMixer
from yolodl_tpu.data.pipeline import TrainingStream, TrainingStreamConfig
from yolodl_tpu.data.records import DataRecord


class SyntheticLoader:
    """Deterministic record synthesizer (no file IO)."""

    def __init__(self, h, w):
        self.h, self.w = h, w

    def load(self, i):
        rng = np.random.default_rng(1000 + int(i))
        img = rng.random((3, self.h, self.w)).astype(np.float32)
        n = int(rng.integers(1, 4))
        cy = rng.uniform(0.25, 0.75, n)
        cx = rng.uniform(0.25, 0.75, n)
        bh = rng.uniform(0.1, 0.3, n)
        bw = rng.uniform(0.1, 0.3, n)
        boxes = np.stack([cy, cx, bh, bw], -1).astype(np.float32)
        classes = rng.integers(0, 3, n).astype(np.int32)
        return DataRecord(img, boxes, classes)


def _host_vs_device_streams(defer_cfg, host_cfg, h=32, w=48, batches=2):
    records = list(range(12))
    host_stream = TrainingStream(records, SyntheticLoader(h, w), host_cfg)
    dev_stream = TrainingStream(records, SyntheticLoader(h, w), defer_cfg)
    dev_it = da.apply_device_augmentation(iter(dev_stream), defer_cfg)
    host_it = iter(host_stream)
    out = []
    for _ in range(batches):
        host_rec = next(host_it)
        dev_rec, arrays = next(dev_it)
        out.append((host_rec, dev_rec, np.asarray(arrays[0])))
    return out


def _cfg(defer, **kw):
    # parity tests pin f32 packs: synthetic images are continuous floats,
    # so the production u8 shipping would add 1/255 rounding
    # (TestStreamParity.test_u8_pack_quantization covers the u8 path)
    kw.setdefault("pack_uint8", False)
    return TrainingStreamConfig(
        batch_size=4, max_gt=16, seed=3, workers=1, defer_images=defer, **kw)


class TestWarpKernels:
    def _host_warp(self, img, transform):
        _, h, w = img.shape
        m, b = pixel_affine(transform, h, w)
        return warp_image(img, m, b), m, b

    @pytest.mark.parametrize("seed", [0, 1, 2])
    def test_general_warp_matches_host(self, seed):
        import jax.numpy as jnp

        rng = np.random.default_rng(seed)
        img = rng.random((3, 33, 47)).astype(np.float32)
        aff = RandomAffine(rotate_prob=1.0, rotate_degrees=30.0,
                           translation_prob=1.0, translation=0.1,
                           scale_prob=1.0, scale=(0.8, 1.2),
                           horizontal_flip_prob=0.5)
        t = aff.sample_transform(rng)
        host, m, b = self._host_warp(img, t)
        dev = np.asarray(da._warp_general_jnp(
            jnp.asarray(img), jnp.asarray(m, jnp.float32),
            jnp.asarray(b, jnp.float32)))
        # f32 coordinate math vs the host's f64: tiny value noise plus a
        # vanishing fraction of border/floor flips
        assert np.mean(np.abs(dev - host)) < 1e-4
        assert np.mean(np.abs(dev - host) > 1e-2) < 0.005

    @pytest.mark.parametrize("seed", [0, 1])
    def test_separable_warp_matches_host(self, seed):
        import jax.numpy as jnp

        rng = np.random.default_rng(seed)
        img = rng.random((3, 32, 48)).astype(np.float32)
        aff = RandomAffine(translation_prob=1.0, translation=0.15,
                           scale_prob=1.0, scale=(0.7, 1.3),
                           horizontal_flip_prob=0.5, vertical_flip_prob=0.5)
        t = aff.sample_transform(rng)
        host, m, b = self._host_warp(img, t)
        assert abs(m[0, 1]) < 1e-12 and abs(m[1, 0]) < 1e-12  # diagonal
        dev = np.asarray(da._warp_separable_jnp(
            jnp.asarray(img), jnp.asarray(m, jnp.float32),
            jnp.asarray(b, jnp.float32)))
        gen = np.asarray(da._warp_general_jnp(
            jnp.asarray(img), jnp.asarray(m, jnp.float32),
            jnp.asarray(b, jnp.float32)))
        assert np.mean(np.abs(dev - host)) < 1e-4
        np.testing.assert_allclose(dev, gen, atol=1e-5)

    @pytest.mark.parametrize("seed", [0, 1, 2])
    def test_twopass_matches_general_on_smooth(self, seed):
        """Rotation-capable two-pass kernel: same map, different (valid)
        interpolation — on smooth images it tracks the direct bilinear
        closely and the hard-cut border mask is identical."""
        import jax.numpy as jnp
        from scipy import ndimage

        rng = np.random.default_rng(seed)
        img = ndimage.gaussian_filter(
            rng.random((3, 64, 80)).astype(np.float32), (0, 2, 2))
        aff = RandomAffine(rotate_prob=1.0, rotate_degrees=25.0,
                           translation_prob=1.0, translation=0.1,
                           scale_prob=1.0, scale=(0.8, 1.2),
                           horizontal_flip_prob=0.5, vertical_flip_prob=0.5)
        t = aff.sample_transform(rng)
        m, b = pixel_affine(t, 64, 80)
        d1, d2 = da.twopass_bands(25.0, 0.8)
        args = (jnp.asarray(img), jnp.asarray(m, jnp.float32),
                jnp.asarray(b, jnp.float32))
        gen = np.asarray(da._warp_general_jnp(*args))
        two = np.asarray(da._warp_twopass_jnp(*args, d1, d2))
        np.testing.assert_array_equal(gen == 0.0, two == 0.0)  # border mask
        assert np.abs(gen - two).max() < 0.01
        assert np.abs(gen - two).mean() < 1e-3

    @pytest.mark.parametrize("seed", [0, 1, 2])
    def test_twopass_nonsquare_aspect_bands_cover(self, seed):
        """Round-4 advisor fix: on a strongly non-square image the
        pixel-space matrix carries aspect factors (m10/m00 = tanθ·w/h),
        so the static bands must widen by max(h/w, w/h) or taps silently
        drop near the angle cutoff.  48x96 (aspect 2) at 40° would
        under-cover with square bands — with the aspect-widened bands the
        two-pass kernel must track the general kernel."""
        import jax.numpy as jnp
        from scipy import ndimage

        h, w = 48, 96
        rng = np.random.default_rng(seed)
        img = ndimage.gaussian_filter(
            rng.random((3, h, w)).astype(np.float32), (0, 2, 2))
        aff = RandomAffine(rotate_prob=1.0, rotate_degrees=40.0,
                           scale_prob=1.0, scale=(0.8, 1.2))
        t = aff.sample_transform(rng)
        m, b = pixel_affine(t, h, w)
        d1, d2 = da.twopass_bands(40.0, 0.8, aspect=max(h / w, w / h))
        args = (jnp.asarray(img), jnp.asarray(m, jnp.float32),
                jnp.asarray(b, jnp.float32))
        gen = np.asarray(da._warp_general_jnp(*args))
        two = np.asarray(da._warp_twopass_jnp(*args, d1, d2))
        np.testing.assert_array_equal(gen == 0.0, two == 0.0)
        # the load-bearing band check: widening the bands further must
        # change NOTHING — every bilinear tap is already covered.
        # (gen-vs-two differences at this angle are pure interpolation
        # divergence of the two formulations, bounded loosely below.)
        big = np.asarray(da._warp_twopass_jnp(*args, d1 + 20, d2 + 20))
        np.testing.assert_array_equal(two, big)
        assert np.abs(gen - two).max() < 0.02
        assert np.abs(gen - two).mean() < 2e-3
        # square bands at this aspect/angle WOULD drop taps — pin that the
        # widening is actually load-bearing, not slack
        d1s, d2s = da.twopass_bands(40.0, 0.8)
        assert (d1, d2) != (d1s, d2s)
        short = np.asarray(da._warp_twopass_jnp(*args, d1s, d2s))
        assert np.abs(short - big).max() > 0.02  # square bands under-cover

    @pytest.mark.parametrize("seed", [0, 1])
    def test_twopass_exact_without_rotation(self, seed):
        import jax.numpy as jnp

        rng = np.random.default_rng(seed)
        img = rng.random((3, 33, 47)).astype(np.float32)
        aff = RandomAffine(translation_prob=1.0, translation=0.15,
                           scale_prob=1.0, scale=(0.7, 1.3),
                           horizontal_flip_prob=0.5, vertical_flip_prob=0.5)
        t = aff.sample_transform(rng)
        m, b = pixel_affine(t, 33, 47)
        args = (jnp.asarray(img), jnp.asarray(m, jnp.float32),
                jnp.asarray(b, jnp.float32))
        gen = np.asarray(da._warp_general_jnp(*args))
        two = np.asarray(da._warp_twopass_jnp(*args, 3, 3))
        np.testing.assert_allclose(two, gen, atol=1e-6)

    def test_twopass_identity_is_exact(self):
        import jax.numpy as jnp

        img = np.random.default_rng(0).random((3, 19, 23)).astype(np.float32)
        out = np.asarray(da._warp_twopass_jnp(
            jnp.asarray(img), jnp.asarray(np.eye(2, dtype=np.float32)),
            jnp.asarray(np.zeros(2, np.float32)), 3, 3))
        np.testing.assert_array_equal(out, img)

    def test_identity_warp_is_exact(self):
        import jax.numpy as jnp

        img = np.random.default_rng(0).random((3, 16, 16)).astype(np.float32)
        m = np.eye(2, dtype=np.float32)
        b = np.zeros(2, np.float32)
        out = np.asarray(da._warp_general_jnp(jnp.asarray(img),
                                              jnp.asarray(m), jnp.asarray(b)))
        np.testing.assert_array_equal(out, img)


class TestJitterKernel:
    @pytest.mark.parametrize("shift", [(0.1, 0.2, -0.15), (-0.3, 0.0, 0.4)])
    def test_matches_host(self, shift):
        import jax.numpy as jnp

        img = np.random.default_rng(7).random((3, 24, 31)).astype(np.float32)
        host = ColorJitter(hue_shift=0.5, saturation_shift=0.5,
                           value_shift=0.5).apply(img, *shift)
        dev = np.asarray(da._hsv_jitter_jnp(jnp.asarray(img), *shift))
        # hue-sextant boundary pixels can flip under f32; everything else
        # must agree tightly
        assert np.mean(np.abs(dev - host)) < 1e-5
        assert np.mean(np.abs(dev - host) > 1e-3) < 0.002


class TestStreamParity:
    def test_mix_only_exact(self):
        kw = dict(mosaic_prob=0.4, mixup_prob=0.3, cutmix_prob=0.3,
                  mosaic=MosaicMixer(mosaic_margin=0.25))
        for host_rec, dev_rec, dev_images in _host_vs_device_streams(
                _cfg(True, **kw), _cfg(False, **kw)):
            np.testing.assert_array_equal(host_rec.boxes, dev_rec.boxes)
            np.testing.assert_array_equal(host_rec.classes, dev_rec.classes)
            np.testing.assert_array_equal(host_rec.mask, dev_rec.mask)
            np.testing.assert_allclose(dev_images, host_rec.images, atol=2e-6)

    def test_full_pipeline_parity(self, monkeypatch):
        # pin the exact gather warp: this test's bounds are for bilinear
        # parity with the host, not the two-pass rotation kernel (which
        # test_rotation_twopass_pipeline covers with its own bounds)
        monkeypatch.setenv("YDL_AUG_GENERAL_WARP", "1")
        kw = dict(
            mosaic_prob=0.5,
            mosaic=MosaicMixer(mosaic_margin=0.25),
            color_jitter=ColorJitter(hue_shift=0.1, saturation_shift=0.2,
                                     value_shift=0.2),
            color_jitter_prob=0.7,
            random_affine=RandomAffine(rotate_prob=0.5, rotate_degrees=15.0,
                                       translation_prob=0.5, translation=0.1,
                                       horizontal_flip_prob=0.5),
            affine_prob=0.8,
        )
        for host_rec, dev_rec, dev_images in _host_vs_device_streams(
                _cfg(True, **kw), _cfg(False, **kw)):
            # label geometry is host-computed in both modes: bit-identical
            np.testing.assert_array_equal(host_rec.boxes, dev_rec.boxes)
            np.testing.assert_array_equal(host_rec.classes, dev_rec.classes)
            np.testing.assert_array_equal(host_rec.mask, dev_rec.mask)
            diff = np.abs(dev_images - host_rec.images)
            assert np.mean(diff) < 2e-4
            assert np.mean(diff > 1e-2) < 0.005

    def test_rotation_twopass_pipeline(self):
        """Production default for rotation configs: the two-pass kernel.
        Label geometry stays bit-identical to the host; pixels agree up to
        the documented interpolation-filter difference."""
        kw = dict(
            color_jitter=ColorJitter(hue_shift=0.1, saturation_shift=0.2,
                                     value_shift=0.2),
            color_jitter_prob=0.7,
            random_affine=RandomAffine(rotate_prob=0.5, rotate_degrees=15.0,
                                       translation_prob=0.5, translation=0.1,
                                       horizontal_flip_prob=0.5),
            affine_prob=0.8,
        )
        for host_rec, dev_rec, dev_images in _host_vs_device_streams(
                _cfg(True, **kw), _cfg(False, **kw)):
            np.testing.assert_array_equal(host_rec.boxes, dev_rec.boxes)
            np.testing.assert_array_equal(host_rec.classes, dev_rec.classes)
            np.testing.assert_array_equal(host_rec.mask, dev_rec.mask)
            diff = np.abs(dev_images - host_rec.images)
            # white-noise rotations are the worst case for the filter
            # difference (≈0.008 mean observed); smooth-image closeness is
            # pinned by test_twopass_matches_general_on_smooth
            assert np.mean(diff) < 0.02
            assert np.mean(diff > 0.25) < 0.02

    def test_u8_pack_quantization(self):
        """Production default ships the pack as u8 (4x less H2D): output
        within the 1/(2·255) rounding step of the f32-pack path."""
        kw = dict(mosaic_prob=0.5, mosaic=MosaicMixer(mosaic_margin=0.25),
                  color_jitter=ColorJitter(hue_shift=0.1,
                                           saturation_shift=0.2,
                                           value_shift=0.2))
        for host_rec, dev_rec, dev_images in _host_vs_device_streams(
                _cfg(True, pack_uint8=True, **kw), _cfg(False, **kw),
                batches=1):
            # jitter is hue-sextant-discontinuous: quantization can flip
            # boundary pixels; everything else stays within the step
            diff = np.abs(dev_images - host_rec.images)
            assert np.mean(diff) < 1.5 / 255
            assert np.mean(diff > 4 / 255) < 0.01

    def test_no_augments_passthrough(self):
        for host_rec, dev_rec, dev_images in _host_vs_device_streams(
                _cfg(True), _cfg(False), batches=1):
            np.testing.assert_array_equal(dev_images, host_rec.images)

    def test_separable_config_parity(self):
        kw = dict(
            mixup_prob=0.5,
            random_affine=RandomAffine(scale_prob=1.0, scale=(0.8, 1.2),
                                       translation_prob=1.0, translation=0.1,
                                       horizontal_flip_prob=0.5),
        )
        for host_rec, dev_rec, dev_images in _host_vs_device_streams(
                _cfg(True, **kw), _cfg(False, **kw)):
            np.testing.assert_array_equal(host_rec.boxes, dev_rec.boxes)
            diff = np.abs(dev_images - host_rec.images)
            assert np.mean(diff) < 2e-4
            assert np.mean(diff > 1e-2) < 0.005
