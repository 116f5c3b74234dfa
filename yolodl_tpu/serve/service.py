"""Micro-batching detection service.

TPU-first serving design: the model is compiled ONCE for a fixed batch
shape [B, S, S, 3] uint8 (pixels stay uint8 on the host and over the
host→device link — 4× less wire than f32 — and are normalized to bf16 on
device); a single dispatcher thread drains a request queue,
packs up to B requests arriving within ``window_ms`` into one device
batch (padding the tail by repeating the last image — fixed shapes, no
recompiles), runs the two-stage forward→NMS program, and fans results
back to the per-request events.  Decode + letterbox run in the *caller's*
thread (the HTTP server is threaded), so host preprocessing parallelizes
while device work stays single-stream.

Coordinates are mapped back to original-image pixels with the inverse
letterbox transform, exactly like the batch detect CLI
(reference semantics: detect/src/main.rs:169 Transform::from_sizes_letterbox).
"""

from __future__ import annotations

import io
import queue
import threading
import time
from dataclasses import dataclass, field
from typing import Dict, List, Optional, Tuple

import numpy as np


class ServiceOverloadedError(RuntimeError):
    """Raised when the request queue is full — a retryable client-side
    condition, distinct from internal device/runtime failures."""


class ServiceShutdownError(RuntimeError):
    """Raised on requests caught by (or arriving after) shutdown()."""


@dataclass
class ServiceStats:
    """Monotonic counters + latency quantiles (thread-safe via the lock)."""

    requests: int = 0
    images_done: int = 0
    batches: int = 0
    batch_fill_sum: int = 0  # Σ real images per batch, for mean fill ratio
    errors: int = 0
    _lat_ms: List[float] = field(default_factory=list)  # ring buffer
    _lock: threading.Lock = field(default_factory=threading.Lock)
    _RING = 2048

    def record(self, latency_ms: float) -> None:
        with self._lock:
            self.images_done += 1
            self._lat_ms.append(latency_ms)
            if len(self._lat_ms) > self._RING:
                del self._lat_ms[: -self._RING]

    def snapshot(self, batch_size: int) -> Dict:
        with self._lock:  # one lock scope: no torn counter pairs
            lat = np.asarray(self._lat_ms, np.float64)
            out = {
                "requests": self.requests,
                "images_done": self.images_done,
                "batches": self.batches,
                "errors": self.errors,
                "mean_batch_fill": (
                    round(self.batch_fill_sum / (self.batches * batch_size), 3)
                    if self.batches else 0.0
                ),
            }
        if len(lat):
            out["latency_ms"] = {
                "p50": round(float(np.percentile(lat, 50)), 2),
                "p95": round(float(np.percentile(lat, 95)), 2),
                "p99": round(float(np.percentile(lat, 99)), 2),
                "max": round(float(lat.max()), 2),
            }
        return out


class _Pending:
    __slots__ = ("image", "src_hw", "event", "result", "error", "t_submit",
                 "err_counted")

    def __init__(self, image: np.ndarray, src_hw: Tuple[int, int]):
        self.image = image
        self.src_hw = src_hw
        self.event = threading.Event()
        self.result: Optional[List[dict]] = None
        self.error: Optional[Exception] = None
        self.t_submit = time.perf_counter()
        # an errored request counts ONCE even when two paths see it (a
        # client timeout followed by the batch failing on-device)
        self.err_counted = False


class DetectionService:
    """Keeps a compiled detector warm and serves micro-batched requests.

    Parameters mirror the detect CLI's knobs; ``window_ms`` bounds how long
    the dispatcher waits to fill a batch (tail latency vs MXU efficiency).
    """

    def __init__(
        self,
        model,
        params,
        state,
        *,
        image_size: int,
        batch_size: int = 8,
        window_ms: float = 5.0,
        nms_iou_thresh: float = 0.45,
        nms_conf_thresh: float = 0.25,
        nms_kind: str = "greedy",
        nms_beta: float = 0.6,
        class_names: Optional[List[str]] = None,
        max_queue: int = 256,
        forward_fn=None,
        devices: int = 1,
    ):
        import jax
        import jax.numpy as jnp

        from ..loss import non_max_suppression, yolo_inference

        self.image_size = int(image_size)
        self.batch_size = int(batch_size)
        # data-parallel serving: batch axis sharded over a 1-D mesh via
        # GSPMD (params replicated) — one SPMD program, collectives on ICI
        self._batch_sharding = None
        if devices > 1:
            if forward_fn is not None:
                raise ValueError(
                    "artifact serving is single-device (the exported "
                    "StableHLO has a fixed lowering); use live-model "
                    "serving for devices > 1")
            if batch_size % devices:
                raise ValueError(
                    f"batch_size {batch_size} not divisible by "
                    f"devices {devices}")
            from ..parallel import make_dp_shardings

            replicated, self._batch_sharding = make_dp_shardings(devices)
            params = jax.device_put(params, replicated)
            state = jax.device_put(state, replicated)
        self.window_s = window_ms / 1e3
        self.class_names = class_names
        self.stats = ServiceStats()
        self._params = params
        self._state = state
        self._queue: "queue.Queue[_Pending]" = queue.Queue(maxsize=max_queue)
        self._inflight: "queue.Queue" = queue.Queue(maxsize=2)
        self._stop = threading.Event()
        self._jnp = jnp
        self._jax = jax

        # two-stage jit (NMS fused into the conv program inherits layouts
        # that send XLA's TopK down a slow path — see detect CLI).
        # Input is uint8 NHWC: pixels stay u8 on the host and over the
        # host→device link (4× less transfer than f32), normalized to
        # bf16/255 on device where the divide is free.
        if forward_fn is not None:
            forward = forward_fn  # e.g. a deserialized serving artifact
        else:
            @jax.jit
            def forward(params, state, images_u8):
                x = images_u8.astype(jnp.bfloat16) / jnp.bfloat16(255.0)
                pred, _ = model.apply(params, state, x, train=False,
                                      data_format="NHWC")
                return pred

        @jax.jit
        def postprocess(pred):
            nms = non_max_suppression(
                pred,
                iou_threshold=nms_iou_thresh,
                confidence_threshold=nms_conf_thresh,
                suppress_by_class=False,
                class_mode="argmax",
                kind=nms_kind,
                beta=nms_beta,
            )
            return yolo_inference(nms, pred.num_flats)

        self._forward = forward
        self._postprocess = postprocess
        self._thread = threading.Thread(
            target=self._dispatch_loop, name="detection-dispatcher", daemon=True
        )
        self._completer = threading.Thread(
            target=self._complete_loop, name="detection-completer", daemon=True
        )

    @classmethod
    def from_artifact(
        cls,
        path: str,
        *,
        window_ms: float = 5.0,
        nms_iou_thresh: float = 0.45,
        nms_conf_thresh: float = 0.25,
        nms_kind: str = "greedy",
        nms_beta: float = 0.6,
        class_names: Optional[List[str]] = None,
        max_queue: int = 256,
    ) -> "DetectionService":
        """Serve a deserialized StableHLO *serving* artifact (``yolo-tool
        export --serving``): no model-building code on the inference path;
        image size and batch come from the artifact's compiled shape."""
        from ..models.export import load_exported

        infer, meta = load_exported(path)
        if not meta.get("serving"):
            raise ValueError(
                f"{path} is a plain inference artifact; serving needs the "
                "uint8 NHWC ingest baked in — re-export with --serving")
        batch, size = meta["input_shape"][0], meta["input_shape"][1]
        return cls(
            None, None, None,
            image_size=size, batch_size=batch, window_ms=window_ms,
            nms_iou_thresh=nms_iou_thresh, nms_conf_thresh=nms_conf_thresh,
            nms_kind=nms_kind, nms_beta=nms_beta, class_names=class_names,
            max_queue=max_queue,
            forward_fn=lambda params, state, images_u8: infer(images_u8),
        )

    # -- lifecycle ---------------------------------------------------------

    def warmup(self) -> float:
        """Compile + run one dummy batch; returns seconds spent."""
        import jax

        t0 = time.perf_counter()
        dummy = np.zeros(
            (self.batch_size, self.image_size, self.image_size, 3), np.uint8)
        if self._batch_sharding is not None:
            # warm the SAME sharded program the dispatcher will run
            dummy = jax.device_put(dummy, self._batch_sharding)
        out = self._postprocess(self._forward(self._params, self._state, dummy))
        jax.block_until_ready(out.valid)
        np.asarray(out.valid)  # value readout = true completion fence
        return time.perf_counter() - t0

    def start(self) -> None:
        self._thread.start()
        self._completer.start()

    def shutdown(self, timeout: float = 10.0) -> None:
        self._stop.set()
        self._thread.join(timeout=timeout)
        self._completer.join(timeout=timeout)
        # fail requests still sitting in the queue so their callers wake
        # immediately instead of blocking out their full client timeout
        while True:
            try:
                p = self._queue.get_nowait()
            except queue.Empty:
                break
            self._fail_batch([p], ServiceShutdownError("service shut down"))

    # -- request path ------------------------------------------------------

    def submit_bytes(self, data: bytes, timeout: float = 30.0) -> List[dict]:
        """Decode an encoded image (JPEG/PNG/...), run detection, return
        per-detection dicts with original-pixel COCO-style boxes."""
        from PIL import Image

        from ..data.letterbox import letterbox_geometry

        with Image.open(io.BytesIO(data)) as im:
            w, h = im.size
            # JPEG DCT-scaled decode: a phone photo headed for a 608px
            # frame decodes ~4-8x cheaper.  draft() never goes below the
            # requested (content) size; geometry stays keyed to the
            # ORIGINAL size via src_hw so box mapping is unchanged.
            new_h, new_w, _, _ = letterbox_geometry(
                (h, w), (self.image_size, self.image_size))
            im.draft("RGB", (new_w, new_h))
            rgb = im.convert("RGB")
            return self._submit_pil(rgb, (h, w), timeout)

    def submit_u8(self, image_hwc: np.ndarray, timeout: float = 30.0) -> List[dict]:
        """Submit a decoded [H,W,3] uint8 image (the fast path: pixels stay
        uint8 through letterbox and upload)."""
        from PIL import Image

        if image_hwc.ndim != 3 or image_hwc.shape[2] != 3 \
                or image_hwc.dtype != np.uint8:
            raise ValueError(
                f"expected [H,W,3] uint8 image, got "
                f"{image_hwc.shape} {image_hwc.dtype}")
        return self._submit_pil(
            Image.fromarray(image_hwc), image_hwc.shape[:2], timeout)

    def submit_array(self, image_chw: np.ndarray, timeout: float = 30.0) -> List[dict]:
        """Submit a [3,H,W] float32 image in [0,1]; blocks for the result."""
        if image_chw.ndim != 3 or image_chw.shape[0] != 3:
            raise ValueError(f"expected [3,H,W] image, got {image_chw.shape}")
        u8 = np.rint(
            np.clip(np.transpose(image_chw, (1, 2, 0)), 0, 1) * 255
        ).astype(np.uint8)
        return self.submit_u8(u8, timeout=timeout)

    def _count_error(self, pending: "_Pending") -> None:
        with self.stats._lock:
            if not pending.err_counted:
                pending.err_counted = True
                self.stats.errors += 1

    def _submit_pil(self, pil_img, src_hw, timeout: float) -> List[dict]:
        from ..data.letterbox import letterbox_u8_pil

        if self._stop.is_set():
            raise ServiceShutdownError("service shut down")
        boxed = letterbox_u8_pil(
            pil_img, (self.image_size, self.image_size), src_hw=src_hw)
        pending = _Pending(boxed, src_hw)
        with self.stats._lock:
            self.stats.requests += 1
        deadline = time.perf_counter() + timeout  # one budget for put+wait
        try:
            self._queue.put(pending, timeout=timeout)
        except queue.Full:
            self._count_error(pending)
            raise ServiceOverloadedError(
                "service overloaded: request queue full")
        if self._stop.is_set() and not pending.event.is_set():
            # shutdown raced the enqueue: its one-shot queue drain may have
            # already passed this entry, and no dispatcher will — fail
            # deterministically instead of blocking out the client timeout
            pending.error = pending.error or ServiceShutdownError(
                "service shut down")
            pending.event.set()
        if not pending.event.wait(max(0.0, deadline - time.perf_counter())):
            self._count_error(pending)
            raise TimeoutError("detection timed out")
        if pending.error is not None:
            self._count_error(pending)
            raise pending.error
        self.stats.record((time.perf_counter() - pending.t_submit) * 1e3)
        return pending.result

    # -- dispatcher --------------------------------------------------------

    def _collect_batch(self) -> List[_Pending]:
        """Block for the first request, then fill up to batch_size within
        the window."""
        try:
            first = self._queue.get(timeout=0.1)
        except queue.Empty:
            return []
        batch = [first]
        deadline = time.perf_counter() + self.window_s
        while len(batch) < self.batch_size:
            remaining = deadline - time.perf_counter()
            if remaining <= 0:
                break
            try:
                batch.append(self._queue.get(timeout=remaining))
            except queue.Empty:
                break
        return batch

    def _dispatch_loop(self) -> None:
        """Stage 1: pack batches and issue device work.  Results go through
        a depth-2 in-flight queue to the completer thread, so the device
        computes batch N+1 while batch N's outputs transfer to the host and
        fan out — the device never idles on host-side unpacking."""
        while not self._stop.is_set():
            batch = self._collect_batch()
            if not batch:
                continue
            try:
                images = [p.image for p in batch]
                while len(images) < self.batch_size:  # fixed-shape pad
                    images.append(images[-1])
                stacked = np.stack(images)  # u8 NHWC
                if self._batch_sharding is not None:
                    dev = self._jax.device_put(stacked, self._batch_sharding)
                else:
                    dev = self._jnp.asarray(stacked)
                out = self._postprocess(
                    self._forward(self._params, self._state, dev)
                )
                if not self._put_inflight((batch, out)):
                    self._fail_batch(
                        batch, ServiceShutdownError("service shut down"))
            except Exception as e:  # deliver the failure, don't kill the loop
                self._fail_batch(batch, e)
        self._put_inflight(None)  # unblock the completer

    def _put_inflight(self, item) -> bool:
        """Bounded put that keeps observing _stop: a wedged completer (e.g.
        a device readout that never returns) must not be able to hang
        shutdown() behind a full in-flight queue."""
        while True:
            try:
                self._inflight.put(item, timeout=0.2)
                return True
            except queue.Full:
                if self._stop.is_set():
                    return False

    def _complete_loop(self) -> None:
        """Stage 2: host-side unpack + coordinate mapping + fan-out."""
        from ..loss.inference import to_host_detections

        while True:
            try:
                item = self._inflight.get(timeout=0.2)
            except queue.Empty:
                # normal exit is the dispatcher's None sentinel; this guards
                # the case where the dispatcher died without delivering it
                if self._stop.is_set() and not self._thread.is_alive():
                    return
                continue
            if item is None:
                return
            batch, out = item
            try:
                dets = to_host_detections(out)
                with self.stats._lock:
                    self.stats.batches += 1
                    self.stats.batch_fill_sum += len(batch)
                for i, p in enumerate(batch):
                    p.result = self._to_original_pixels(dets[i], p.src_hw)
                    p.event.set()
            except Exception as e:
                self._fail_batch(batch, e)

    def _fail_batch(self, batch: List[_Pending], e: Exception) -> None:
        with self.stats._lock:
            for p in batch:
                if not p.err_counted:
                    p.err_counted = True
                    self.stats.errors += 1
        for p in batch:
            p.error = e
            p.event.set()

    def _to_original_pixels(self, dets: List[dict], src_hw) -> List[dict]:
        from ..data.letterbox import letterbox_unit_transform

        src_h, src_w = src_hw
        inv = letterbox_unit_transform(
            (src_h, src_w), (self.image_size, self.image_size)
        ).inverse()
        out = []
        for det in dets:
            t, l, b, r = det["tlbr"]
            (ot, ol), (ob, orr) = inv.apply_points(
                np.asarray([[t, l], [b, r]])
            )
            # clip to the image (an API consumer should never see
            # out-of-frame coordinates; decoded boxes can overhang)
            x0 = min(max(float(ol * src_w), 0.0), src_w)
            y0 = min(max(float(ot * src_h), 0.0), src_h)
            x1 = min(max(float(orr * src_w), 0.0), src_w)
            y1 = min(max(float(ob * src_h), 0.0), src_h)
            entry = {
                "class": det["class"],
                "score": round(det["confidence"], 5),
                # COCO-style [x, y, w, h] in original-image pixels
                "bbox": [round(x0, 2), round(y0, 2),
                         round(x1 - x0, 2), round(y1 - y0, 2)],
            }
            if self.class_names and 0 <= det["class"] < len(self.class_names):
                entry["class_name"] = self.class_names[det["class"]]
            out.append(entry)
        return out
