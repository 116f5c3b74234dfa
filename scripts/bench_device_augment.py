"""Benchmark the on-device augmentation path (data/device_augment.py).

Measures, at flagship shape (608², batch 16, mosaic+jitter+affine):

1. host CPU pipeline rate (records/s) — full per-record pixel augmentation
   (native kernels when built);
2. deferred host prep rate (records/s) — sampling + label geometry + pack
   only (the work that remains on the host with pipeline.device="tpu");
3. the device augment program itself (ms/batch) on the active backend,
   general and separable warp variants, pack resident in HBM (a local TPU
   host pays PCIe H2D once per batch; the tunnel is not representative).

Run on the TPU: ``python scripts/bench_device_augment.py``
Knobs: BENCH_AUG_BATCH (16), BENCH_AUG_SIZE (608), BENCH_AUG_ITERS (20).
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from yolodl_tpu.data.affine import RandomAffine
from yolodl_tpu.data.color import ColorJitter
from yolodl_tpu.data.mosaic import MosaicMixer
from yolodl_tpu.data.pipeline import TrainingStream, TrainingStreamConfig
from yolodl_tpu.data.records import DataRecord

B = int(os.environ.get("BENCH_AUG_BATCH", 16))
S = int(os.environ.get("BENCH_AUG_SIZE", 608))
ITERS = int(os.environ.get("BENCH_AUG_ITERS", 20))


class SyntheticLoader:
    def __init__(self, h, w):
        self.h, self.w = h, w
        rng = np.random.default_rng(0)
        # one decoded base image reused (decode cost is not under test)
        self.base = rng.random((3, h, w)).astype(np.float32)

    def load(self, i):
        rng = np.random.default_rng(1000 + int(i))
        n = int(rng.integers(1, 8))
        cy, cx = rng.uniform(0.2, 0.8, (2, n))
        bh, bw = rng.uniform(0.05, 0.3, (2, n))
        boxes = np.stack([cy, cx, bh, bw], -1).astype(np.float32)
        return DataRecord(self.base.copy(), boxes,
                          rng.integers(0, 3, n).astype(np.int32))


def stream_cfg(defer, rotate=True):
    return TrainingStreamConfig(
        batch_size=B, max_gt=64, seed=0, workers=1, defer_images=defer,
        mosaic_prob=0.5, mosaic=MosaicMixer(mosaic_margin=0.25),
        color_jitter=ColorJitter(hue_shift=0.1, saturation_shift=0.2,
                                 value_shift=0.2),
        random_affine=RandomAffine(
            rotate_prob=0.5 if rotate else 0.0,
            rotate_degrees=10.0 if rotate else None,
            translation_prob=0.5, translation=0.1,
            scale_prob=0.5, scale=(0.8, 1.2), horizontal_flip_prob=0.5),
    )


def host_rate(defer, n_batches=3):
    stream = TrainingStream(list(range(64)), SyntheticLoader(S, S),
                            stream_cfg(defer))
    it = iter(stream)
    next(it)  # warm
    t0 = time.perf_counter()
    for _ in range(n_batches):
        next(it)
    dt = time.perf_counter() - t0
    return n_batches * B / dt


def device_ms(rotate, twopass=True):
    import jax

    from yolodl_tpu.data import device_augment as da

    cfg = stream_cfg(True, rotate)
    stream = TrainingStream(list(range(64)), SyntheticLoader(S, S), cfg)
    rec = next(iter(stream))
    pack = {k: jax.device_put(v) for k, v in rec.deferred.items()}
    aff = cfg.random_affine
    separable = not (aff.rotate_prob and aff.rotate_degrees)
    bands = (None if separable or not twopass
             else da.twopass_bands(aff.rotate_degrees, min(aff.scale)))
    fn = da.make_augment_fn(
        S, S,
        separable=separable, bands=bands,
        has_jitter=True, has_affine=True,
        has_mosaic=True, has_mixup=False, has_cutmix=False)
    out = fn(pack)
    float(out.sum())  # compile + fence
    t0 = time.perf_counter()
    for _ in range(ITERS):
        out = fn(pack)
    float(out.sum())  # completion fence via value readout (CLAUDE.md)
    return (time.perf_counter() - t0) / ITERS * 1e3


def main():
    print(f"batch {B} size {S}² mosaic+jitter+affine")
    r_host = host_rate(False)
    r_defer = host_rate(True)
    print(f"host pipeline (full pixel augment): {r_host:8.1f} records/s/core")
    print(f"host prep with pipeline.device=tpu: {r_defer:8.1f} records/s/core "
          f"({r_defer / r_host:.1f}x)")
    import jax

    plat = jax.devices()[0].platform
    ms_two = device_ms(rotate=True, twopass=True)
    ms_sep = device_ms(rotate=False)
    print(f"device augment program [{plat}]: rotation(two-pass) "
          f"{ms_two:.2f} ms/batch ({B / ms_two * 1e3:.0f} img/s), "
          f"separable {ms_sep:.2f} ms/batch ({B / ms_sep * 1e3:.0f} img/s)")
    if os.environ.get("BENCH_AUG_GENERAL", "0") == "1":
        ms_gen = device_ms(rotate=True, twopass=False)
        print(f"  general gather warp (debug): {ms_gen:.2f} ms/batch "
              f"({B / ms_gen * 1e3:.0f} img/s)")


if __name__ == "__main__":
    main()
