"""Serving subsystem: micro-batching DetectionService + HTTP front-end.

The reference has no serving path (its detect crate is batch-only,
detect/src/main.rs) — these tests pin the deployment surface: fixed-shape
batching, concurrent submission, original-pixel coordinate mapping,
error isolation, and the HTTP endpoints.
"""

import io
import json
import threading
import time
import urllib.request

import jax
import numpy as np
import pytest

pytestmark = pytest.mark.slow  # e2e/CLI tier: excluded from `pytest -m 'not slow'`
from PIL import Image

from yolodl_tpu.config import newslab as cfg
from yolodl_tpu.graph import Graph
from yolodl_tpu.models import YoloModel
from yolodl_tpu.serve import DetectionService, make_http_server

TOY = {
    "main_group": "m",
    "groups": {
        "m": [
            {"name": "input", "kind": "Input", "shape": ["_", 3, 32, 32]},
            {"kind": "ConvBn2D", "c": 8, "k": 3, "s": 2},
            {"name": "head", "kind": "ConvBn2D", "c": 6, "k": 1,
             "act": "linear", "bn": {"enabled": False}},
            {"name": "det", "kind": "Detect2D", "classes": 1,
             "anchors": [[0.4, 0.4]]},
            {"name": "output", "kind": "MergeDetect2D", "from": ["det"]},
        ]
    },
}


@pytest.fixture(scope="module")
def service():
    graph = Graph.from_model(cfg.parse_model_dict(TOY))
    model = YoloModel(graph)
    params, state = model.init(jax.random.PRNGKey(0))
    svc = DetectionService(
        model, params, state,
        image_size=32, batch_size=4, window_ms=20.0,
        nms_conf_thresh=0.01, class_names=["square"],
    )
    svc.warmup()
    svc.start()
    yield svc
    svc.shutdown()


def _image(h=48, w=64, seed=0):
    rng = np.random.default_rng(seed)
    return rng.uniform(0, 1, (3, h, w)).astype(np.float32)


class TestService:
    def test_single_request(self, service):
        dets = service.submit_array(_image())
        assert isinstance(dets, list)
        for d in dets:
            assert set(d) >= {"class", "score", "bbox", "class_name"}
            x, y, w, h = d["bbox"]
            # original-pixel frame of the 48x64 input
            assert 0 <= x <= 64 and 0 <= y <= 48  # clipped to the image
            assert 0 <= w <= 64 and 0 <= h <= 48
            assert d["class_name"] == "square"

    def test_concurrent_requests_micro_batch(self, service):
        before = service.stats.batches
        results = [None] * 8
        def worker(i):
            results[i] = service.submit_array(_image(seed=i))
        threads = [threading.Thread(target=worker, args=(i,)) for i in range(8)]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        assert all(r is not None for r in results)
        # 8 requests with a 20 ms window and batch 4 must take < 8 batches
        assert service.stats.batches - before < 8
        snap = service.stats.snapshot(service.batch_size)
        assert snap["images_done"] >= 8
        assert 0 < snap["mean_batch_fill"] <= 1
        assert "latency_ms" in snap

    def test_deterministic_across_batch_position(self, service):
        """A request's result must not depend on its batch neighbors."""
        img = _image(seed=42)
        solo = service.submit_array(img)
        # submit alongside 3 other images
        results = {}
        def worker(name, arr):
            results[name] = service.submit_array(arr)
        threads = [threading.Thread(target=worker, args=("x", img))] + [
            threading.Thread(target=worker, args=(f"o{i}", _image(seed=i)))
            for i in range(3)
        ]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        assert json.dumps(solo) == json.dumps(results["x"])

    def test_u8_fast_path_matches_float_path(self, service):
        """submit_u8 (serving fast path) == submit_array of the same pixels:
        both route through the identical uint8 letterbox + device batch."""
        u8 = np.rint(_image(seed=7) * 255).astype(np.uint8)  # [3,H,W]
        via_u8 = service.submit_u8(np.transpose(u8, (1, 2, 0)))
        via_f32 = service.submit_array(u8.astype(np.float32) / 255.0)
        assert json.dumps(via_u8) == json.dumps(via_f32)

    def test_u8_bad_input_rejected(self, service):
        with pytest.raises(ValueError):
            service.submit_u8(np.zeros((48, 64, 3), np.float32))  # not u8
        with pytest.raises(ValueError):
            service.submit_u8(np.zeros((3, 48, 64), np.uint8))  # CHW

    def test_bytes_roundtrip(self, service):
        arr = (_image() * 255).astype(np.uint8)
        buf = io.BytesIO()
        Image.fromarray(np.transpose(arr, (1, 2, 0))).save(buf, format="PNG")
        dets = service.submit_bytes(buf.getvalue())
        assert isinstance(dets, list)

    def test_data_parallel_serving_matches_single_device(self, service):
        """devices=8: the batch axis sharded over the CPU mesh via GSPMD,
        params replicated — detections must equal single-device serving."""
        graph = Graph.from_model(cfg.parse_model_dict(TOY))
        model = YoloModel(graph)
        params, state = model.init(jax.random.PRNGKey(0))
        svc8 = DetectionService(
            model, params, state,
            image_size=32, batch_size=8, window_ms=20.0,
            nms_conf_thresh=0.01, class_names=["square"], devices=8,
        )
        svc8.warmup()
        svc8.start()
        try:
            for seed in range(3):
                img = _image(seed=seed)
                a = service.submit_array(img)
                b = svc8.submit_array(img)
                assert len(a) == len(b)
                for da, db in zip(a, b):
                    assert da["class"] == db["class"]
                    np.testing.assert_allclose(da["bbox"], db["bbox"],
                                               rtol=1e-4, atol=1e-3)
                    np.testing.assert_allclose(da["score"], db["score"],
                                               rtol=1e-4)
        finally:
            svc8.shutdown()

    def test_devices_rejects_bad_combinations(self):
        graph = Graph.from_model(cfg.parse_model_dict(TOY))
        model = YoloModel(graph)
        params, state = model.init(jax.random.PRNGKey(0))
        with pytest.raises(ValueError, match="not divisible"):
            DetectionService(model, params, state, image_size=32,
                             batch_size=6, devices=4)
        with pytest.raises(ValueError, match="single-device"):
            DetectionService(None, None, None, image_size=32, batch_size=8,
                             devices=2, forward_fn=lambda p, s, x: x)

    def test_shutdown_with_wedged_completer(self, monkeypatch):
        """A completer stuck in a device readout (hung-tunnel mode) must not
        wedge shutdown() behind the full in-flight queue: the dispatcher
        keeps observing _stop and fails the batches it cannot hand off."""
        import yolodl_tpu.loss.inference as inference_mod

        graph = Graph.from_model(cfg.parse_model_dict(TOY))
        model = YoloModel(graph)
        params, state = model.init(jax.random.PRNGKey(0))
        svc = DetectionService(
            model, params, state, image_size=32, batch_size=2, window_ms=1.0,
            nms_conf_thresh=0.01,
        )
        svc.warmup()
        wedge = threading.Event()
        monkeypatch.setattr(
            inference_mod, "to_host_detections",
            lambda out: wedge.wait(30) and [],
        )
        svc.start()

        outcomes = []
        def submit(i):
            try:
                svc.submit_array(_image(32, 32, seed=i), timeout=8)
                outcomes.append("ok")
            except Exception as e:
                outcomes.append(type(e).__name__)
        threads = [threading.Thread(target=submit, args=(i,)) for i in range(8)]
        for t in threads:
            t.start()
        time.sleep(1.0)  # dispatcher fills the depth-2 in-flight queue

        t0 = time.perf_counter()
        svc.shutdown(timeout=3)
        assert time.perf_counter() - t0 < 8
        assert not svc._thread.is_alive()  # dispatcher exited despite the wedge
        wedge.set()  # release the stuck completer
        for t in threads:
            t.join(timeout=10)
        assert len(outcomes) == 8  # every caller resolved (error or result)

    def test_shutdown_fails_queued_requests(self):
        """shutdown() must fail requests still sitting in the queue so
        callers wake immediately instead of blocking out their full client
        timeout (previously a 30 s hang per queued caller)."""
        from yolodl_tpu.serve.service import ServiceShutdownError

        graph = Graph.from_model(cfg.parse_model_dict(TOY))
        model = YoloModel(graph)
        params, state = model.init(jax.random.PRNGKey(0))
        svc = DetectionService(
            model, params, state, image_size=32, batch_size=2, window_ms=1.0,
            nms_conf_thresh=0.01,
        )
        svc.warmup()
        release = threading.Event()
        real_forward = svc._forward
        def slow_forward(p, s, imgs):  # holds one batch in flight
            release.wait(20)
            return real_forward(p, s, imgs)
        svc._forward = slow_forward
        svc.start()

        outcomes = []
        def submit(i):
            try:
                svc.submit_array(_image(32, 32, seed=i), timeout=30)
                outcomes.append("ok")
            except Exception as e:
                outcomes.append(type(e).__name__)
        threads = [threading.Thread(target=submit, args=(i,)) for i in range(8)]
        for t in threads:
            t.start()
        time.sleep(0.5)  # one batch wedged in forward, the rest queued

        svc.shutdown(timeout=1)
        # queued (not in-flight) callers resolve promptly with the shutdown
        # error despite their 30 s client timeout
        deadline = time.perf_counter() + 5
        while (outcomes.count(ServiceShutdownError.__name__) < 4
               and time.perf_counter() < deadline):
            time.sleep(0.05)
        assert outcomes.count("ServiceShutdownError") >= 4
        release.set()  # free the wedged forward; in-flight callers resolve
        for t in threads:
            t.join(timeout=15)
        assert len(outcomes) == 8

    def test_bad_shape_rejected(self, service):
        with pytest.raises(ValueError):
            service.submit_array(np.zeros((48, 64, 3), np.float32))

    def test_bad_bytes_rejected(self, service):
        with pytest.raises(Exception):
            service.submit_bytes(b"not an image")


class TestHttp:
    @pytest.fixture(scope="class")
    def server(self, service):
        httpd = make_http_server(service, "127.0.0.1", 0)
        port = httpd.server_address[1]
        thread = threading.Thread(target=httpd.serve_forever, daemon=True)
        thread.start()
        yield f"http://127.0.0.1:{port}"
        httpd.shutdown()
        httpd.server_close()

    def test_healthz(self, server):
        with urllib.request.urlopen(f"{server}/healthz") as r:
            assert json.load(r) == {"ok": True}

    def test_detect_roundtrip(self, server):
        arr = (np.random.default_rng(0).uniform(0, 255, (40, 56, 3))).astype(np.uint8)
        buf = io.BytesIO()
        Image.fromarray(arr).save(buf, format="JPEG")
        req = urllib.request.Request(
            f"{server}/detect", data=buf.getvalue(),
            headers={"Content-Type": "image/jpeg"})
        with urllib.request.urlopen(req) as r:
            payload = json.load(r)
        assert "detections" in payload and "latency_ms" in payload

    def test_stats(self, server):
        with urllib.request.urlopen(f"{server}/stats") as r:
            snap = json.load(r)
        assert snap["requests"] >= 1

    def test_bad_body_400(self, server):
        req = urllib.request.Request(f"{server}/detect", data=b"junk")
        with pytest.raises(urllib.error.HTTPError) as exc:
            urllib.request.urlopen(req)
        assert exc.value.code == 400

    def test_unknown_route_404(self, server):
        with pytest.raises(urllib.error.HTTPError) as exc:
            urllib.request.urlopen(f"{server}/nope")
        assert exc.value.code == 404


class TestServeCli:
    """serve_main launched as a real subprocess: config load, model build,
    warmup, ephemeral --port 0 reporting, HTTP round-trip, shutdown."""

    def test_serve_main_end_to_end(self, tmp_path):
        import os
        import re
        import subprocess
        import sys

        repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        (tmp_path / "model.json5").write_text(json.dumps(TOY))
        detect_cfg = {
            "version": "0.1.0",
            "model": {"kind": "NewslabV1", "cfg_file": "model.json5"},
            "input": {"kind": {"type": "Csv", "image_size": 32,
                               "input_channels": 3, "image_dir": "i",
                               "label_file": "l.csv",
                               "classes_file": "c.txt"}},
            "output": {"output_dir": str(tmp_path / "out"),
                       "nms_iou_thresh": 0.5, "nms_conf_thresh": 0.01},
        }
        (tmp_path / "detect.json5").write_text(json.dumps(detect_cfg))

        env = dict(os.environ)
        env.update(JAX_PLATFORMS="cpu", PALLAS_AXON_POOL_IPS="",
                   PYTHONPATH=repo)
        proc = subprocess.Popen(
            [sys.executable, "-m", "yolodl_tpu.cli.serve_main",
             "--config-file", str(tmp_path / "detect.json5"),
             "--port", "0", "--batch-size", "2", "--window-ms", "5"],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
            env=env, cwd=repo)
        try:
            # warmup compiles the forward — allow a slow CPU a while.
            # Read stdout on a helper thread: readline() itself has no
            # timeout, so a silent-but-alive subprocess (e.g. a backend
            # init hang) must not wedge the test past the deadline.
            import queue
            import threading

            lines: "queue.Queue[str]" = queue.Queue()
            threading.Thread(
                target=lambda: [lines.put(l) for l in proc.stdout],
                daemon=True).start()
            port = None
            deadline = time.time() + 240
            while time.time() < deadline:
                try:
                    line = lines.get(timeout=min(5.0, max(
                        0.1, deadline - time.time())))
                except queue.Empty:
                    if proc.poll() is not None:
                        raise AssertionError(
                            "serve_main exited during startup")
                    continue
                m = re.search(r"serving on http://127\.0\.0\.1:(\d+)", line)
                if m:
                    port = int(m.group(1))
                    break
            assert port is not None, \
                "never printed the bound port within the deadline"
            assert port != 0, "--port 0 must report the OS-assigned port"

            with urllib.request.urlopen(
                    f"http://127.0.0.1:{port}/healthz", timeout=30) as r:
                assert json.load(r) == {"ok": True}
            arr = (np.random.default_rng(0).uniform(0, 255, (40, 56, 3))
                   ).astype(np.uint8)
            buf = io.BytesIO()
            Image.fromarray(arr).save(buf, format="JPEG")
            req = urllib.request.Request(
                f"http://127.0.0.1:{port}/detect", data=buf.getvalue(),
                headers={"Content-Type": "image/jpeg"})
            with urllib.request.urlopen(req, timeout=60) as r:
                payload = json.load(r)
            assert "detections" in payload
        finally:
            proc.terminate()
            try:
                proc.wait(timeout=30)
            except subprocess.TimeoutExpired:
                proc.kill()
                proc.wait()


class TestServingArtifact:
    """Serving from an exported StableHLO artifact (yolo-tool export
    --serving → DetectionService.from_artifact): same uint8 ingest + NMS
    as the live service, no model-building code on the inference path."""

    def test_artifact_service_matches_live(self, service, tmp_path):
        from yolodl_tpu.models.export import export_inference

        graph = Graph.from_model(cfg.parse_model_dict(TOY))
        model = YoloModel(graph)
        params, state = model.init(jax.random.PRNGKey(0))  # same seed as
        # the `service` fixture → identical weights
        out_dir = str(tmp_path / "serving_artifact")
        export_inference(model, params, state, out_dir,
                         batch_size=4, image_size=32, serving=True)

        svc = DetectionService.from_artifact(
            out_dir, window_ms=20.0, nms_conf_thresh=0.01,
            class_names=["square"])
        assert svc.batch_size == 4 and svc.image_size == 32
        svc.warmup()
        svc.start()
        try:
            img = np.rint(_image(seed=11) * 255).astype(np.uint8)
            via_artifact = svc.submit_u8(np.transpose(img, (1, 2, 0)))
            via_live = service.submit_u8(np.transpose(img, (1, 2, 0)))
            assert json.dumps(via_artifact) == json.dumps(via_live)
        finally:
            svc.shutdown()

    def test_plain_artifact_rejected(self, tmp_path):
        from yolodl_tpu.models.export import export_inference

        graph = Graph.from_model(cfg.parse_model_dict(TOY))
        model = YoloModel(graph)
        params, state = model.init(jax.random.PRNGKey(0))
        out_dir = str(tmp_path / "plain_artifact")
        export_inference(model, params, state, out_dir,
                         batch_size=1, image_size=32)
        with pytest.raises(ValueError, match="serving"):
            DetectionService.from_artifact(out_dir)
