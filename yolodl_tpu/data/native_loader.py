"""ctypes bridge to the native C++ image loader (native/loader.cpp).

Drop-in alternative to :class:`OnDemandLoader`: decode (libjpeg/libpng) and
letterbox run in C++ with the GIL released, so the pipeline's Python worker
threads decode genuinely in parallel.  Falls back to the PIL path when the
shared library hasn't been built (``native/build.sh``).
"""

from __future__ import annotations

import ctypes
import os
from typing import Tuple

import numpy as np

from .cache import OnDemandLoader, _boxes_to_ratio
from .letterbox import letterbox_unit_transform
from .records import DataRecord, FileRecord

_LIB_PATH = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "native",
    "libyolodl_loader.so",
)


def native_loader_available() -> bool:
    return os.path.exists(_LIB_PATH)


_aug_lib_cache = None


def _aug_lib():
    """Lazily-loaded CDLL exposing the augmentation kernels
    (ydl_affine_warp / ydl_color_jitter); None when not built."""
    global _aug_lib_cache
    if _aug_lib_cache is not None:
        return _aug_lib_cache or None
    if not native_loader_available():
        _aug_lib_cache = False
        return None
    lib = ctypes.CDLL(_LIB_PATH)
    if not hasattr(lib, "ydl_affine_warp"):  # older build of the .so
        _aug_lib_cache = False
        return None
    lib.ydl_affine_warp.argtypes = [
        ctypes.POINTER(ctypes.c_float), ctypes.c_int, ctypes.c_int,
        ctypes.c_int, ctypes.POINTER(ctypes.c_double),
        ctypes.POINTER(ctypes.c_double), ctypes.POINTER(ctypes.c_float),
    ]
    lib.ydl_color_jitter.argtypes = [
        ctypes.POINTER(ctypes.c_float), ctypes.c_int, ctypes.c_int,
        ctypes.c_float, ctypes.c_float, ctypes.c_float,
    ]
    _aug_lib_cache = lib
    return lib


def affine_warp_native(image_chw: np.ndarray, m_rc: np.ndarray,
                       b_rc: np.ndarray):
    """C++ bilinear inverse warp (scipy affine_transform order=1 semantics);
    returns None when the native library isn't available."""
    lib = _aug_lib()
    if lib is None:
        return None
    src = np.ascontiguousarray(image_chw, np.float32)
    c, h, w = src.shape
    dst = np.empty_like(src)
    m = np.ascontiguousarray(m_rc, np.float64).reshape(4)
    off = np.ascontiguousarray(b_rc, np.float64).reshape(2)
    lib.ydl_affine_warp(
        src.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), c, h, w,
        m.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        off.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        dst.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
    )
    return dst


def color_jitter_native(rgb_chw: np.ndarray, hue_shift: float,
                        sat_shift: float, val_shift: float):
    """Fused C++ HSV jitter; returns None when unavailable."""
    lib = _aug_lib()
    if lib is None:
        return None
    img = np.ascontiguousarray(rgb_chw, np.float32).copy()
    _, h, w = img.shape
    lib.ydl_color_jitter(
        img.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), h, w,
        float(hue_shift), float(sat_shift), float(val_shift),
    )
    return img


class NativeLoader:
    """C++ decode+letterbox; same .load contract as OnDemandLoader.

    ``ldr_load`` is synchronous, GIL-free, and thread-safe — parallelism
    comes from the PYTHON pipeline's worker threads calling it
    concurrently, not from a native pool (``threads`` is ignored, kept for
    call-site compatibility)."""

    def __init__(self, cache_hw: Tuple[int, int], threads: int = 0,
                 scaled_decode: bool = True):
        """``scaled_decode`` turns on libjpeg DCT-domain scaled decode for
        JPEGs much larger than the letterbox frame (a 4000px photo headed
        for 608px decodes ~4-8x cheaper).  Letterbox geometry (and thus box
        transforms) is computed from the original dims either way — only the
        resampling source resolution changes."""
        if not native_loader_available():
            raise FileNotFoundError(
                f"{_LIB_PATH} not built — run native/build.sh"
            )
        self.cache_hw = cache_hw
        self._lib = ctypes.CDLL(_LIB_PATH)
        self._lib.ldr_create.restype = ctypes.c_void_p
        self._lib.ldr_create.argtypes = [ctypes.c_int, ctypes.c_int, ctypes.c_int]
        self._lib.ldr_load.restype = ctypes.c_int
        self._lib.ldr_load.argtypes = [
            ctypes.c_void_p, ctypes.c_char_p, ctypes.POINTER(ctypes.c_float)
        ]
        self._lib.ldr_destroy.argtypes = [ctypes.c_void_p]
        if scaled_decode and hasattr(self._lib, "ldr_create2"):
            self._lib.ldr_create2.restype = ctypes.c_void_p
            self._lib.ldr_create2.argtypes = [
                ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int]
            self._handle = ctypes.c_void_p(
                self._lib.ldr_create2(threads, cache_hw[0], cache_hw[1], 1)
            )
        else:
            self._handle = ctypes.c_void_p(
                self._lib.ldr_create(threads, cache_hw[0], cache_hw[1])
            )
        self._fallback = OnDemandLoader(cache_hw)

    def load(self, record: FileRecord) -> DataRecord:
        h, w = self.cache_hw
        out = np.empty((3, h, w), np.float32)
        rc = self._lib.ldr_load(
            self._handle,
            record.path.encode(),
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        )
        if rc != 0:
            # unsupported format → PIL fallback
            return self._fallback.load(record)
        if len(record.boxes_pixel):
            if record.height <= 0 or record.width <= 0:
                # the PIL path fails loudly on this corruption
                # (ZeroDivisionError in _boxes_to_ratio) — silently
                # dropping the labels here would train on unlabeled images
                raise ValueError(
                    f"{record.path}: record carries {len(record.boxes_pixel)}"
                    f" boxes but no image dimensions "
                    f"({record.height}x{record.width})")
            unit = letterbox_unit_transform(
                (record.height, record.width), self.cache_hw)
            boxes = unit.apply_cycxhw(_boxes_to_ratio(record)).astype(np.float32)
        else:
            # box-less records (e.g. classification) may carry 0x0 dims
            boxes = np.zeros((0, 4), np.float32)
        return DataRecord(image=out, boxes=boxes, classes=record.classes)

    def __del__(self):
        try:
            if getattr(self, "_handle", None):
                self._lib.ldr_destroy(self._handle)
                self._handle = None
        except Exception:
            pass
