"""Host data-pipeline throughput: decode → letterbox → jitter → affine →
mosaic → batch, in records/s.

SURVEY §7.3 flags host-pipeline throughput as the thing that decides
whether the chip stays fed; this prints the measured number for BASELINE.md.
Generates a synthetic JPEG dataset once (BENCH_PIPE_N images of
BENCH_PIPE_SRC px), then streams it with the full augmentation stack at
BENCH_PIPE_SIZE (default 608, the flagship input size).

Knobs: BENCH_PIPE_WORKERS (thread count), BENCH_PIPE_CACHE=1 to measure the
letterbox-cache hot path instead of raw decode.
"""

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
from PIL import Image

from yolodl_tpu.data.affine import RandomAffine
from yolodl_tpu.data.cache import FileCache, OnDemandLoader
from yolodl_tpu.data.color import ColorJitter
from yolodl_tpu.data.pipeline import TrainingStream, TrainingStreamConfig
from yolodl_tpu.data.records import FileRecord

N = int(os.environ.get("BENCH_PIPE_N", "64"))
SRC = int(os.environ.get("BENCH_PIPE_SRC", "640"))
SIZE = int(os.environ.get("BENCH_PIPE_SIZE", "608"))
WORKERS = int(os.environ.get("BENCH_PIPE_WORKERS", str(os.cpu_count() or 2)))
BATCH = int(os.environ.get("BENCH_PIPE_BATCH", "16"))
STEPS = int(os.environ.get("BENCH_PIPE_STEPS", "12"))
USE_CACHE = os.environ.get("BENCH_PIPE_CACHE", "0") == "1"


def main():
    tmp = tempfile.mkdtemp(prefix="yolodl_pipe_")
    rng = np.random.default_rng(0)
    records = []
    for i in range(N):
        arr = rng.integers(0, 255, (SRC, SRC, 3), np.uint8)
        path = os.path.join(tmp, f"i{i}.jpg")
        Image.fromarray(arr).save(path, quality=85)
        records.append(FileRecord(
            path=path, height=SRC, width=SRC,
            boxes_pixel=np.asarray(
                [[SRC / 2, SRC / 2, SRC * 0.4, SRC * 0.4]], np.float32),
            classes=np.asarray([0], np.int32),
        ))

    if USE_CACHE:
        loader = FileCache(os.path.join(tmp, "cache"), (SIZE, SIZE))
        for rec in records:  # warm the cache
            loader.load(rec)
        kind = "cache-hit"
    else:
        loader = OnDemandLoader((SIZE, SIZE))
        kind = "decode"

    cfg = TrainingStreamConfig(
        batch_size=BATCH,
        max_gt=32,
        mosaic_prob=0.25,
        color_jitter=ColorJitter(0.05, 0.2, 0.2),
        random_affine=RandomAffine(rotate_prob=0.5, rotate_degrees=10.0,
                                   scale_prob=0.5, scale=(0.8, 1.2),
                                   translation_prob=0.5, translation=0.1),
        workers=WORKERS,
        seed=0,
    )
    stream = TrainingStream(records, loader, cfg)
    it = iter(stream)
    next(it)  # warm up workers

    t0 = time.perf_counter()
    for _ in range(STEPS):
        next(it)
    dt = time.perf_counter() - t0
    rec_s = BATCH * STEPS / dt
    print(json.dumps({
        "metric": f"host pipeline records/s ({kind}, {SIZE}px, "
                  f"{WORKERS} workers, mosaic+jitter+affine)",
        "value": round(rec_s, 1),
        "unit": "records/s",
    }))


if __name__ == "__main__":
    main()
