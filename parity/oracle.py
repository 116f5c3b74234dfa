"""Python wrapper over the darknet-C parity oracle (dk_shim.so).

Replaces the reference's darknet-test Rust FFI layer
(darknet-test/src/darknet/network.rs:10-100): load a cfg+weights in the
original AlexeyAB C implementation (CPU), run a forward pass, and read
per-layer feature maps for comparison against the JAX model.

Darknet layer outputs are [c, h, w] row-major for batch 1 — the same CHW
order as our NCHW logical layout, so comparisons are direct.
"""

from __future__ import annotations

import ctypes
import os
from typing import List, Optional, Tuple

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))

# darknet LAYER_TYPE enum prefix (include/darknet.h) — order matters
LAYER_TYPES = [
    "convolutional", "deconvolutional", "connected", "maxpool", "local_avgpool",
    "softmax", "detection", "dropout", "crop", "route", "cost", "normalization",
    "avgpool", "local", "shortcut", "scale_channels", "sam", "active", "rnn",
    "gru", "lstm", "conv_lstm", "history", "crnn", "batchnorm", "network",
    "xnor", "region", "yolo", "gaussian_yolo", "iseg", "reorg", "reorg_old",
    "upsample", "logxent", "l2norm", "empty", "blank", "contrastive",
]


class DarknetOracle:
    def __init__(self, cfg_path: str, weights_path: str, batch: int = 1,
                 train: bool = False):
        self._batch = batch
        self._train = train  # dk_load_train uses the cfg's own batch
        self.lib = ctypes.CDLL(os.path.join(_DIR, "dk_shim.so"))
        self.lib.dk_load.restype = ctypes.c_void_p
        self.lib.dk_load.argtypes = [ctypes.c_char_p, ctypes.c_char_p, ctypes.c_int]
        self.lib.dk_forward.argtypes = [ctypes.c_void_p, ctypes.POINTER(ctypes.c_float)]
        for name in ("dk_num_layers", "dk_input_w", "dk_input_h", "dk_input_c",
                     "dk_layer_type", "dk_layer_out_w", "dk_layer_out_h",
                     "dk_layer_out_c", "dk_layer_outputs"):
            fn = getattr(self.lib, name)
            fn.restype = ctypes.c_int
            fn.argtypes = [ctypes.c_void_p] + (
                [ctypes.c_int] if name.startswith("dk_layer") else []
            )
        self.lib.dk_layer_output.restype = ctypes.c_int
        self.lib.dk_layer_output.argtypes = [
            ctypes.c_void_p, ctypes.c_int,
            ctypes.POINTER(ctypes.c_float), ctypes.c_int,
        ]
        self.lib.dk_detections.restype = ctypes.c_int
        self.lib.dk_detections.argtypes = [
            ctypes.c_void_p, ctypes.c_int, ctypes.c_int, ctypes.c_float,
            ctypes.POINTER(ctypes.c_float), ctypes.c_int,
        ]

        # training oracle additions (network.c train path) — tolerate a
        # dk_shim.so built before these symbols existed: the forward parity
        # suite needs none of them, so only flag the absence here and raise
        # a clear "rebuild" error if the training API is actually used
        self.has_train_api = True
        try:
            self.lib.dk_train.restype = ctypes.c_float
            self.lib.dk_train.argtypes = [
                ctypes.c_void_p, ctypes.POINTER(ctypes.c_float),
                ctypes.POINTER(ctypes.c_float), ctypes.c_int, ctypes.c_int,
                ctypes.c_int,
            ]
            self.lib.dk_current_rate.restype = ctypes.c_float
            self.lib.dk_current_rate.argtypes = [ctypes.c_void_p]
            self.lib.dk_seen.restype = ctypes.c_long
            self.lib.dk_seen.argtypes = [ctypes.c_void_p]
            for name in ("dk_layer_nweights", "dk_layer_nfilters"):
                fn = getattr(self.lib, name)
                fn.restype = ctypes.c_int
                fn.argtypes = [ctypes.c_void_p, ctypes.c_int]
            for name in ("dk_layer_weights", "dk_layer_biases",
                         "dk_layer_scales", "dk_layer_rolling_mean",
                         "dk_layer_rolling_variance"):
                fn = getattr(self.lib, name)
                fn.restype = ctypes.c_int
                fn.argtypes = [
                    ctypes.c_void_p, ctypes.c_int,
                    ctypes.POINTER(ctypes.c_float), ctypes.c_int,
                ]
            self.lib.dk_load_train.restype = ctypes.c_void_p
            self.lib.dk_load_train.argtypes = [ctypes.c_char_p, ctypes.c_char_p]
        except AttributeError:
            self.has_train_api = False

        # detection-loss oracle extensions (optional, newer shim builds)
        self.has_detection_loss_api = True
        try:
            self.lib.dk_layer_truths.restype = ctypes.c_int
            self.lib.dk_layer_truths.argtypes = [ctypes.c_void_p, ctypes.c_int]
            self.lib.dk_layer_cost.restype = ctypes.c_float
            self.lib.dk_layer_cost.argtypes = [ctypes.c_void_p, ctypes.c_int]
            self.lib.dk_layer_delta.restype = ctypes.c_int
            self.lib.dk_layer_delta.argtypes = [
                ctypes.c_void_p, ctypes.c_int,
                ctypes.POINTER(ctypes.c_float), ctypes.c_int,
            ]
        except AttributeError:
            self.has_detection_loss_api = False

        if train and not self.has_train_api:
            raise RuntimeError(
                "dk_shim.so predates the training oracle API — rerun "
                "parity/build.sh to rebuild it")
        if train:
            # batch comes from the cfg's [net] batch/subdivisions; only this
            # load path allocates darknet's training buffers
            self.net = ctypes.c_void_p(
                self.lib.dk_load_train(cfg_path.encode(), weights_path.encode())
            )
        else:
            self.net = ctypes.c_void_p(
                self.lib.dk_load(cfg_path.encode(), weights_path.encode(), batch)
            )
        if not self.net:
            raise RuntimeError(f"darknet failed to load {cfg_path} + {weights_path}")
        self.num_layers = self.lib.dk_num_layers(self.net)
        self.input_hw = (self.lib.dk_input_h(self.net), self.lib.dk_input_w(self.net))
        self.input_c = self.lib.dk_input_c(self.net)

    def forward(self, image_chw: np.ndarray) -> None:
        if image_chw.ndim == 3:
            c, h, w = image_chw.shape
            assert (h, w) == self.input_hw and c == self.input_c
        # darknet reads net.batch*inputs floats unconditionally
        # (network_predict does NOT reset net.batch) — an undersized buffer
        # is an out-of-bounds read in C, so validate the TOTAL size when
        # the spatial input geometry is known (inputs-only sequence nets
        # report 0/1 dims and are exercised with exact-size vectors)
        if (not self._train and self.input_c > 0
                and all(v > 1 for v in self.input_hw)):
            expect = (self._batch * self.input_c
                      * self.input_hw[0] * self.input_hw[1])
            assert image_chw.size == expect, (
                f"oracle batch={self._batch} expects {expect} floats, "
                f"got {image_chw.size}")
        buf = np.ascontiguousarray(image_chw, np.float32)
        self.lib.dk_forward(
            self.net, buf.ctypes.data_as(ctypes.POINTER(ctypes.c_float))
        )

    def layer_type(self, i: int) -> str:
        t = self.lib.dk_layer_type(self.net, i)
        return LAYER_TYPES[t] if 0 <= t < len(LAYER_TYPES) else f"unknown{t}"

    def layer_output(self, i: int) -> np.ndarray:
        """[c, h, w] float32 output of layer i (batch 1)."""
        n = self.lib.dk_layer_outputs(self.net, i)
        out = np.zeros((n,), np.float32)
        got = self.lib.dk_layer_output(
            self.net, i, out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), n
        )
        assert got == n
        c = self.lib.dk_layer_out_c(self.net, i)
        h = self.lib.dk_layer_out_h(self.net, i)
        w = self.lib.dk_layer_out_w(self.net, i)
        if c * h * w == n:
            return out.reshape(c, h, w)
        return out  # 1-D layers (connected/rnn/softmax) leave out_* at 0

    # ---- training oracle ------------------------------------------------

    def train(self, images_chw: np.ndarray, truth: np.ndarray) -> float:
        """One darknet training iteration (rows/batch fwd+bwd accumulations
        then one SGD update — network.c train_network).  ``images_chw``:
        [rows, c, h, w]; ``truth``: [rows, y_cols].  Returns the reported
        cost (sum of cost-layer outputs / (n_subbatches * batch))."""
        rows = images_chw.shape[0]
        x = np.ascontiguousarray(images_chw.reshape(rows, -1), np.float32)
        y = np.ascontiguousarray(truth.reshape(rows, -1), np.float32)
        return float(self.lib.dk_train(
            self.net,
            x.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            y.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            rows, x.shape[1], y.shape[1],
        ))

    def layer_truths(self, i: int) -> int:
        """net->layers[i].truths — the per-image y-row float count a
        detection layer expects (max_boxes * truth_size)."""
        return int(self.lib.dk_layer_truths(self.net, i))

    def layer_cost(self, i: int) -> float:
        """l.cost[0] after a train() call (|delta|^2 for yolo layers)."""
        return float(self.lib.dk_layer_cost(self.net, i))

    def layer_delta(self, i: int, batch: int) -> np.ndarray:
        """l.delta after a train() call, [batch * outputs] flat CHW."""
        n = self.lib.dk_layer_outputs(self.net, i) * batch
        buf = np.zeros(n, np.float32)
        got = self.lib.dk_layer_delta(
            self.net, i, buf.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), n)
        assert got == n, (got, n)
        return buf

    def current_rate(self) -> float:
        return float(self.lib.dk_current_rate(self.net))

    def seen(self) -> int:
        return int(self.lib.dk_seen(self.net))

    def _read_layer_array(self, fn_name: str, i: int, n: int) -> Optional[np.ndarray]:
        if n <= 0:
            return None
        out = np.zeros((n,), np.float32)
        got = getattr(self.lib, fn_name)(
            self.net, i, out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), n
        )
        return out if got == n else None

    def layer_weights(self, i: int) -> Optional[np.ndarray]:
        """Conv layer i's kernel, flat [n, c, kh, kw] row-major."""
        return self._read_layer_array(
            "dk_layer_weights", i, self.lib.dk_layer_nweights(self.net, i))

    def layer_biases(self, i: int) -> Optional[np.ndarray]:
        return self._read_layer_array(
            "dk_layer_biases", i, self.lib.dk_layer_nfilters(self.net, i))

    def layer_scales(self, i: int) -> Optional[np.ndarray]:
        return self._read_layer_array(
            "dk_layer_scales", i, self.lib.dk_layer_nfilters(self.net, i))

    def layer_rolling_mean(self, i: int) -> Optional[np.ndarray]:
        return self._read_layer_array(
            "dk_layer_rolling_mean", i, self.lib.dk_layer_nfilters(self.net, i))

    def layer_rolling_variance(self, i: int) -> Optional[np.ndarray]:
        return self._read_layer_array(
            "dk_layer_rolling_variance", i,
            self.lib.dk_layer_nfilters(self.net, i))

    def detections(self, img_w: int, img_h: int, thresh: float = 0.25,
                   capacity: int = 4096) -> np.ndarray:
        """[(x, y, w, h, obj, class, prob)] rows from darknet's own decode.

        The shim truncates at ``capacity`` — a truncated oracle set would
        silently fail parity comparisons, so retry with a bigger buffer
        until the result fits."""
        while True:
            out = np.zeros((capacity, 7), np.float32)
            n = self.lib.dk_detections(
                self.net, img_w, img_h, thresh,
                out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), capacity,
            )
            if n < capacity:
                return out[:n]
            capacity *= 4
