"""Coverage for host-side utilities: detections unpack, logging worker,
timing, rate counter, flat↔instance conversion."""

import os
import time

import jax.numpy as jnp
import numpy as np
import pytest


class TestToHostDetections:
    def test_unpack_sorted_and_masked(self):
        from yolodl_tpu.loss.inference import to_host_detections
        from yolodl_tpu.loss.nms import NmsOutput

        out = NmsOutput(
            tlbr=jnp.asarray([[[0.1, 0.1, 0.2, 0.2], [0.3, 0.3, 0.4, 0.4]]]),
            confidence=jnp.asarray([[0.4, 0.9]]),
            classes=jnp.asarray([[1, 0]], jnp.int32),
            instances=jnp.asarray([[5, 7]], jnp.int32),
            valid=jnp.asarray([[True, True]]),
        )
        dets = to_host_detections(out)
        assert len(dets) == 1 and len(dets[0]) == 2
        assert dets[0][0]["confidence"] == pytest.approx(0.9)  # sorted desc
        assert dets[0][0]["class"] == 0

    def test_invalid_dropped(self):
        from yolodl_tpu.loss.inference import to_host_detections
        from yolodl_tpu.loss.nms import NmsOutput

        out = NmsOutput(
            tlbr=jnp.zeros((1, 2, 4)),
            confidence=jnp.asarray([[0.5, 0.6]]),
            classes=jnp.zeros((1, 2), jnp.int32),
            instances=jnp.zeros((1, 2), jnp.int32),
            valid=jnp.asarray([[False, True]]),
        )
        assert len(to_host_detections(out)[0]) == 1


class TestLoggingWorker:
    def test_scalars_and_images_written(self, tmp_path):
        from yolodl_tpu.train.logging import LoggingWorker

        worker = LoggingWorker(str(tmp_path)).start()
        worker.log_training_output(1, 0.01, {
            "total_loss": 1.0, "iou_loss": 0.1,
            "classification_loss": 0.2, "objectness_loss": 0.7,
        })
        worker.log_image(1, "test/img", np.zeros((3, 8, 8), np.float32))
        worker.log_weights_and_grads(1, {"w": jnp.ones((2, 2))})
        worker.close()
        assert any(n.startswith("events.out") for n in os.listdir(tmp_path))

    def test_tb_scalars_reads_back(self, tmp_path):
        """scripts/tb_scalars.py round-trips what LoggingWorker writes."""
        import importlib.util
        import os as _os

        from yolodl_tpu.train.logging import LoggingWorker

        worker = LoggingWorker(str(tmp_path)).start()
        for step, loss in ((1, 3.5), (2, 2.25)):
            worker.log_training_output(step, 0.01, {
                "total_loss": loss, "iou_loss": 0.1,
                "classification_loss": 0.2, "objectness_loss": 0.7,
            })
        worker.close()

        spec = importlib.util.spec_from_file_location(
            "tb_scalars", _os.path.join(
                _os.path.dirname(__file__), "..", "scripts", "tb_scalars.py"))
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
        scalars = mod.load_scalars(str(tmp_path))
        assert scalars["loss/total_loss"] == [(1, 3.5), (2, 2.25)]
        assert set(scalars) >= {"loss/iou_loss", "params/learning_rate"}

    def test_objectness_heatmap(self, tmp_path):
        from yolodl_tpu.ops.detect import DetectionInfo
        from yolodl_tpu.train.logging import LoggingWorker

        worker = LoggingWorker(str(tmp_path)).start()
        infos = (DetectionInfo(4, 4, ((0.2, 0.2),), 0, 16),)
        worker.log_objectness_heatmap(
            0, np.zeros((3, 16, 16), np.float32),
            np.random.default_rng(0).uniform(size=16).astype(np.float32), infos,
        )
        worker.close()


class TestTimingUtils:
    def test_timing_disabled_by_default(self):
        from yolodl_tpu.utils.timing import Timing

        t = Timing("x")
        t.add_event("a")
        with t.timed("b"):
            pass
        assert t.events == {} or all(v >= 0 for v in t.events.values())

    def test_rate_counter(self):
        from yolodl_tpu.utils.timing import RateCounter

        rc = RateCounter(window_secs=10)
        assert rc.rate() == 0.0
        rc.add(5)
        time.sleep(0.01)
        rc.add(5)
        assert rc.rate() > 0


class TestFlatInstance:
    def test_roundtrip(self):
        from yolodl_tpu.ops.detect import (
            DetectionInfo, flat_to_instance, instance_to_flat,
        )

        infos = (
            DetectionInfo(4, 6, ((0.1, 0.1), (0.2, 0.2)), 0, 48),
            DetectionInfo(2, 3, ((0.3, 0.3),), 48, 54),
        )
        for flat in [0, 7, 23, 47, 48, 53]:
            layer, a, r, c = flat_to_instance(infos, flat)
            back = int(instance_to_flat(infos, layer, a, r, c))
            assert back == flat
        with pytest.raises(IndexError):
            flat_to_instance(infos, 54)


class TestToolCliClassifier:
    def test_info_on_classifier_cfg(self):
        import subprocess
        import sys

        repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        env = dict(os.environ)
        env["JAX_PLATFORMS"] = "cpu"
        env["PALLAS_AXON_POOL_IPS"] = ""
        env["PYTHONPATH"] = repo
        out = subprocess.run(
            [sys.executable, "-m", "yolodl_tpu.cli.tool_main", "info",
             os.path.join(repo, "cfg/darknet/darknet53.cfg")],
            capture_output=True, text=True, env=env, cwd=repo, timeout=300,
        )
        assert out.returncode == 0, out.stderr
        assert "Softmax" in out.stdout
        assert "GlobalAvgPool2D" in out.stdout
