"""AOT StableHLO export artifacts (models/export.py + yolo-tool export)."""

import json
import os
import subprocess
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.slow  # e2e/CLI tier: excluded from `pytest -m 'not slow'`

from yolodl_tpu.models.export import export_inference, load_exported

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def tiny_model():
    from yolodl_tpu.config import newslab
    from yolodl_tpu.graph import Graph
    from yolodl_tpu.models import YoloModel

    model_dict = {
        "main_group": "m",
        "groups": {
            "m": [
                {"name": "input", "kind": "Input", "shape": ["_", 3, 32, 32]},
                {"kind": "ConvBn2D", "c": 8, "k": 3, "s": 2},
                {"kind": "ConvBn2D", "c": 16, "k": 3, "s": 2},
                {"name": "head", "kind": "ConvBn2D", "c": 7 * 2, "k": 1,
                 "act": "linear", "bn": {"enabled": False}},
                {"name": "det", "kind": "Detect2D", "classes": 2,
                 "anchors": [[0.3, 0.3], [0.6, 0.6]]},
                {"name": "output", "kind": "MergeDetect2D", "from": ["det"]},
            ]
        },
    }
    return YoloModel(Graph.from_model(newslab.parse_model_dict(model_dict)))


class TestExportRoundTrip:
    def test_artifact_matches_live_model(self, rng, tmp_path):
        model = tiny_model()
        params, state = model.init(jax.random.PRNGKey(0))
        out_dir = str(tmp_path / "artifact")
        export_inference(model, params, state, out_dir,
                         batch_size=2, image_size=32)
        assert os.path.exists(os.path.join(out_dir, "model.stablehlo"))

        infer, meta = load_exported(out_dir)
        assert meta["num_classes"] == 2
        images = jnp.asarray(rng.normal(size=(2, 3, 32, 32)), jnp.float32)
        pred_live, _ = model.apply(params, state, images, train=False)
        pred_art = infer(images)
        np.testing.assert_allclose(np.asarray(pred_art.cycxhw),
                                   np.asarray(pred_live.cycxhw), atol=1e-5)
        np.testing.assert_allclose(np.asarray(pred_art.obj_logit),
                                   np.asarray(pred_live.obj_logit), atol=1e-5)
        # static head layout survives the round trip
        assert pred_art.infos == pred_live.infos

    def test_artifact_feeds_nms(self, rng, tmp_path):
        from yolodl_tpu.loss import non_max_suppression, yolo_inference

        model = tiny_model()
        params, state = model.init(jax.random.PRNGKey(1))
        out_dir = str(tmp_path / "artifact")
        export_inference(model, params, state, out_dir,
                         batch_size=1, image_size=32)
        infer, _ = load_exported(out_dir)
        images = jnp.asarray(rng.normal(size=(1, 3, 32, 32)), jnp.float32)
        pred = infer(images)
        nms = non_max_suppression(pred, iou_threshold=0.5,
                                  confidence_threshold=0.001)
        out = yolo_inference(nms, pred.num_flats)
        assert np.asarray(out.valid).shape[0] == 1

    def test_nhwc_artifact_matches_nchw(self, rng, tmp_path):
        """data_format='NHWC' must trace with an NHWC input shape (a prior
        bug always built the NCHW trace shape and produced garbage)."""
        model = tiny_model()
        params, state = model.init(jax.random.PRNGKey(2))
        nchw_dir = str(tmp_path / "nchw")
        nhwc_dir = str(tmp_path / "nhwc")
        export_inference(model, params, state, nchw_dir,
                         batch_size=2, image_size=32)
        export_inference(model, params, state, nhwc_dir,
                         batch_size=2, image_size=32, data_format="NHWC")
        infer_c, meta_c = load_exported(nchw_dir)
        infer_h, meta_h = load_exported(nhwc_dir)
        assert meta_h["input_shape"] == [2, 32, 32, 3]
        images = jnp.asarray(rng.normal(size=(2, 3, 32, 32)), jnp.float32)
        pred_c = infer_c(images)
        pred_h = infer_h(jnp.transpose(images, (0, 2, 3, 1)))
        np.testing.assert_allclose(np.asarray(pred_h.cycxhw),
                                   np.asarray(pred_c.cycxhw), atol=1e-5)

    def test_version_mismatch_rejected(self, tmp_path):
        model = tiny_model()
        params, state = model.init(jax.random.PRNGKey(0))
        out_dir = str(tmp_path / "artifact")
        export_inference(model, params, state, out_dir,
                         batch_size=1, image_size=32)
        meta_path = os.path.join(out_dir, "meta.json")
        meta = json.load(open(meta_path))
        meta["format_version"] = 999
        json.dump(meta, open(meta_path, "w"))
        with pytest.raises(ValueError, match="format"):
            load_exported(out_dir)


class TestDetectArtifact:
    def test_detect_runs_exported_artifact(self, tmp_path, rng):
        """detect --artifact draws boxes from a deserialized StableHLO
        artifact with no model-building code on the inference path."""
        import json as json_mod

        from PIL import Image

        img_dir = tmp_path / "images"
        img_dir.mkdir()
        for i in range(2):
            arr = rng.uniform(0, 255, (48, 48, 3)).astype(np.uint8)
            Image.fromarray(arr).save(img_dir / f"i{i}.png")
        (tmp_path / "classes.txt").write_text("thing\n")
        (tmp_path / "label.csv").write_text(
            "image_file,class_name,cy,cx,h,w\n"
            "i0.png,thing,20,20,20,20\ni1.png,thing,20,20,20,20\n")
        model_dict = {
            "main_group": "m",
            "groups": {"m": [
                {"name": "input", "kind": "Input", "shape": ["_", 3, 32, 32]},
                {"kind": "ConvBn2D", "c": 8, "k": 3, "s": 2},
                {"name": "head", "kind": "ConvBn2D", "c": 6, "k": 1,
                 "act": "linear", "bn": {"enabled": False}},
                {"name": "det", "kind": "Detect2D", "classes": 1,
                 "anchors": [[0.4, 0.4]]},
                {"name": "output", "kind": "MergeDetect2D", "from": ["det"]},
            ]},
        }
        (tmp_path / "model.json5").write_text(json_mod.dumps(model_dict))
        detect_cfg = {
            "version": "0.1.0",
            "model": {"kind": "NewslabV1", "cfg_file": "model.json5",
                      "minibatch_size": 4},
            "input": {"kind": {
                "type": "Csv", "image_size": 32, "input_channels": 3,
                "image_dir": str(img_dir),
                "label_file": str(tmp_path / "label.csv"),
                "classes_file": str(tmp_path / "classes.txt")}},
            "output": {"output_dir": str(tmp_path / "out"),
                       "nms_iou_thresh": 0.5, "nms_conf_thresh": 0.05},
        }
        (tmp_path / "detect.json5").write_text(json_mod.dumps(detect_cfg))

        env = dict(os.environ)
        env.update(JAX_PLATFORMS="cpu", PALLAS_AXON_POOL_IPS="",
                   PYTHONPATH=REPO)
        out = subprocess.run(
            [sys.executable, "-m", "yolodl_tpu.cli.tool_main", "export",
             str(tmp_path / "model.json5"), str(tmp_path / "art"),
             "--size", "32", "--batch", "2"],
            env=env, capture_output=True, text=True)
        assert out.returncode == 0, out.stderr[-3000:]
        out = subprocess.run(
            [sys.executable, "-m", "yolodl_tpu.cli.detect_main",
             "--config-file", str(tmp_path / "detect.json5"),
             "--artifact", str(tmp_path / "art")],
            env=env, capture_output=True, text=True)
        assert out.returncode == 0, out.stderr[-3000:]
        assert "overrides minibatch_size" in out.stdout
        written = os.listdir(tmp_path / "out")
        assert len(written) == 2, written

    def test_detect_serving_artifact_matches_live(self, tmp_path, rng):
        """detect --artifact on a SERVING artifact (uint8 ingest, /255
        baked in) must agree with the live-model detect on the same
        seed-0 weights — regression for the float-[0,1]→astype(uint8)
        truncation that fed the artifact all-black images."""
        import json as json_mod

        from PIL import Image

        img_dir = tmp_path / "images"
        img_dir.mkdir()
        arr = rng.uniform(0, 255, (48, 48, 3)).astype(np.uint8)
        Image.fromarray(arr).save(img_dir / "i0.png")
        (tmp_path / "classes.txt").write_text("thing\n")
        (tmp_path / "label.csv").write_text(
            "image_file,class_name,cy,cx,h,w\ni0.png,thing,20,20,20,20\n")
        model_dict = {
            "main_group": "m",
            "groups": {"m": [
                {"name": "input", "kind": "Input", "shape": ["_", 3, 32, 32]},
                {"kind": "ConvBn2D", "c": 8, "k": 3, "s": 2},
                {"name": "head", "kind": "ConvBn2D", "c": 6, "k": 1,
                 "act": "linear", "bn": {"enabled": False}},
                {"name": "det", "kind": "Detect2D", "classes": 1,
                 "anchors": [[0.4, 0.4]]},
                {"name": "output", "kind": "MergeDetect2D", "from": ["det"]},
            ]},
        }
        (tmp_path / "model.json5").write_text(json_mod.dumps(model_dict))
        detect_cfg = {
            "version": "0.1.0",
            "model": {"kind": "NewslabV1", "cfg_file": "model.json5",
                      "minibatch_size": 1},
            "input": {"kind": {
                "type": "Csv", "image_size": 32, "input_channels": 3,
                "image_dir": str(img_dir),
                "label_file": str(tmp_path / "label.csv"),
                "classes_file": str(tmp_path / "classes.txt")}},
            "output": {"output_dir": str(tmp_path / "out"),
                       "nms_iou_thresh": 0.5, "nms_conf_thresh": 0.05},
        }
        (tmp_path / "detect.json5").write_text(json_mod.dumps(detect_cfg))

        env = dict(os.environ)
        env.update(JAX_PLATFORMS="cpu", PALLAS_AXON_POOL_IPS="",
                   PYTHONPATH=REPO)
        out = subprocess.run(
            [sys.executable, "-m", "yolodl_tpu.cli.tool_main", "export",
             str(tmp_path / "model.json5"), str(tmp_path / "art"),
             "--size", "32", "--batch", "1", "--serving"],
            env=env, capture_output=True, text=True)
        assert out.returncode == 0, out.stderr[-3000:]
        runs = {}
        for name, extra in (
            # the serving artifact bakes bf16 compute in — run the live arm
            # in bf16 too, so the only numeric difference left is the u8
            # pixel round-trip (an f32 live arm drifts borderline boxes by
            # several px on a random-init net, CPU-codegen-dependent)
            ("live", ["--precision", "bfloat16"]),
            ("art", ["--artifact", str(tmp_path / "art")]),
        ):
            out = subprocess.run(
                [sys.executable, "-m", "yolodl_tpu.cli.detect_main",
                 "--config-file", str(tmp_path / "detect.json5"),
                 "--save-json", str(tmp_path / f"{name}.json")] + extra,
                env=env, capture_output=True, text=True)
            assert out.returncode == 0, out.stderr[-3000:]
            runs[name] = json_mod.load(open(tmp_path / f"{name}.json"))
        n_live, n_art = len(runs["live"]), len(runs["art"])
        # bf16/255 ingest + uint8 round-trip lets borderline detections
        # flicker across the confidence threshold — counts must be close
        # (an all-black artifact input yields a wildly different set)
        assert n_live > 0 and abs(n_live - n_art) <= max(2, n_live // 10), \
            (n_live, n_art)
        # near-tied random-init scores make rank order unstable between the
        # two numeric paths — match each live detection to its nearest
        # artifact box instead and bound the positional drift
        art_boxes = np.asarray([d["bbox"] for d in runs["art"]], np.float64)
        # the residual numeric gap is the artifact's u8 pixel round-trip
        # (±1/510 per pixel), which a RANDOM-INIT net amplifies into a few
        # px of box drift (CPU-codegen dependent).  The bound guards the
        # real failure modes — wrong layout/scale/black input throw boxes
        # tens of px or change the detection count — not bit parity (the
        # serving from_artifact test pins byte-identical responses on the
        # same-ingest path).
        for a in sorted(runs["live"], key=lambda d: -d["score"])[:10]:
            dist = np.abs(art_boxes - np.asarray(a["bbox"])).max(axis=1)
            j = int(dist.argmin())
            assert dist[j] < 5.0, (a, runs["art"][j])
            assert runs["art"][j]["category_id"] == a["category_id"]

    def test_artifact_rejects_checkpoint_combo(self, tmp_path):
        env = dict(os.environ)
        env.update(JAX_PLATFORMS="cpu", PALLAS_AXON_POOL_IPS="",
                   PYTHONPATH=REPO)
        out = subprocess.run(
            [sys.executable, "-m", "yolodl_tpu.cli.detect_main",
             "--config-file", "nonexistent.json5",
             "--artifact", "x", "--checkpoint", "y"],
            env=env, capture_output=True, text=True)
        assert out.returncode == 1


class TestExportCli:
    def test_tool_export_darknet_cfg(self, tmp_path):
        env = dict(os.environ)
        env.update(JAX_PLATFORMS="cpu", PALLAS_AXON_POOL_IPS="",
                   PYTHONPATH=REPO)
        out = subprocess.run(
            [sys.executable, "-m", "yolodl_tpu.cli.tool_main", "export",
             os.path.join(REPO, "cfg/darknet/yolov4-tiny.cfg"),
             str(tmp_path / "art"), "--size", "160"],
            env=env, capture_output=True, text=True)
        assert out.returncode == 0, out.stderr[-3000:]
        infer, meta = load_exported(str(tmp_path / "art"))
        assert meta["input_shape"] == [1, 3, 160, 160]
        pred = infer(jnp.zeros((1, 3, 160, 160), jnp.float32))
        assert np.isfinite(np.asarray(pred.cycxhw)).all()
