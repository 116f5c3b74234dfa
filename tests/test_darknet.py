"""Darknet .cfg parser / graph / .weights tests.

Mirrors the reference's corpus test darknet-config/tests/load_config.rs
(parse every cfg under cfg/darknet) and adds what the reference lacks: a
buildable darknet graph and a .weights round-trip.
"""

import glob
import io
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from yolodl_tpu.config import darknet_cfg as dk
from yolodl_tpu.graph.from_darknet import graph_from_darknet
from yolodl_tpu.models import YoloModel
from yolodl_tpu.models.weights import (
    load_darknet_weights,
    merge_into_model_tree,
    save_darknet_weights,
)

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
ALL_CFGS = sorted(glob.glob(os.path.join(REPO, "cfg/darknet/*.cfg")))

# detection models whose graphs must build (subset with yolo heads)
DETECTION_CFGS = [
    os.path.join(REPO, "cfg/darknet", n)
    for n in ["yolov4-tiny.cfg", "yolov4.cfg", "yolov4-csp.cfg", "yolov3.cfg",
              "yolov3-tiny.cfg", "yolov4x-mish.cfg"]
]


@pytest.mark.parametrize("path", ALL_CFGS, ids=[os.path.basename(p) for p in ALL_CFGS])
def test_cfg_corpus_parses(path):
    d = dk.Darknet.load(path)
    assert d.net.channels >= 1
    assert len(d.layers) > 0


class TestParser:
    def test_comment_stripping_and_values(self):
        text = """
[net]
width=32  # trailing comment
height=32
channels=3
; full-line comment
[convolutional]
filters=8
size=3
stride=1
pad=1
batch_normalize=1
activation=leaky
"""
        d = dk.Darknet.from_str(text)
        assert d.net.width == 32
        conv = d.layers[0]
        assert conv.padding == 1  # pad=1 → size//2
        assert conv.batch_normalize and conv.activation == "leaky"

    def test_net_must_be_first(self):
        with pytest.raises(ValueError, match="first section"):
            dk.Darknet.from_str("[convolutional]\nfilters=1\nsize=1\n")

    def test_yolo_masked_anchors(self):
        d = dk.Darknet.load(os.path.join(REPO, "cfg/darknet/yolov4-tiny.cfg"))
        yolos = [l for l in d.layers if isinstance(l, dk.Yolo)]
        assert len(yolos) == 2
        assert yolos[0].mask == (3, 4, 5)
        assert yolos[0].masked_anchors == ((81, 82), (135, 169), (344, 319))
        assert yolos[0].scale_x_y == pytest.approx(1.05)

    def test_resolve_index(self):
        assert dk.resolve_index(-1, 5) == 4
        assert dk.resolve_index(3, 5) == 3
        with pytest.raises(ValueError):
            dk.resolve_index(-6, 5)

    def test_output_shapes_yolov4_tiny(self):
        d = dk.Darknet.load(os.path.join(REPO, "cfg/darknet/yolov4-tiny.cfg"))
        shapes = d.output_shapes()
        # head feature maps at 416 input: 13×13 and 26×26, 255 channels (COCO)
        yolo_idx = [i for i, l in enumerate(d.layers) if isinstance(l, dk.Yolo)]
        assert shapes[yolo_idx[0]] == (13, 13, 255)
        assert shapes[yolo_idx[1]] == (26, 26, 255)


@pytest.mark.parametrize(
    "path", DETECTION_CFGS, ids=[os.path.basename(p) for p in DETECTION_CFGS]
)
def test_detection_graphs_build(path):
    g = graph_from_darknet(dk.Darknet.load(path))
    out = g.output_node()
    assert out.config.kind == "MergeDetect2D"
    model = YoloModel(g)
    assert model.num_classes == 80


class TestYoloV4TinyForward:
    @pytest.fixture(scope="class")
    def tiny(self):
        d = dk.Darknet.load(os.path.join(REPO, "cfg/darknet/yolov4-tiny.cfg"))
        model = YoloModel(graph_from_darknet(d))
        params, state = model.init(jax.random.PRNGKey(0))
        return d, model, params, state

    def test_forward_shapes(self, tiny):
        _, model, params, state = tiny
        x = jnp.zeros((1, 3, 416, 416), jnp.float32)
        out, _ = model.apply(params, state, x, train=False)
        # 3 anchors × (13² + 26²)
        assert out.num_flats == 3 * (13 * 13) + 3 * (26 * 26)
        assert out.class_logit.shape == (1, out.num_flats, 80)
        assert bool(jnp.all(jnp.isfinite(out.cycxhw)))

    def test_weights_roundtrip(self, tiny, tmp_path):
        d, model, params, state = tiny
        path = tmp_path / "tiny.weights"
        save_darknet_weights(d, params, state, path, seen=1234)
        loaded_p, loaded_s, seen = load_darknet_weights(d, path)
        assert seen == 1234
        p2, s2 = merge_into_model_tree(loaded_p, loaded_s, params, state)
        for leaf_a, leaf_b in zip(
            jax.tree_util.tree_leaves(params), jax.tree_util.tree_leaves(p2)
        ):
            np.testing.assert_allclose(np.asarray(leaf_a), np.asarray(leaf_b), atol=0)

    def test_weights_roundtrip_with_pruned_tail(self, tmp_path):
        """Regression: cfgs whose training-only tail is graph-pruned (the
        [contrastive] branch of yolov4-tiny_contrastive.cfg) must still
        save (positional identity-init placeholder blocks for the pruned
        convs) and load (pruned layers dropped by the merge)."""
        import re

        text = open(os.path.join(
            REPO, "cfg/darknet/yolov4-tiny_contrastive.cfg")).read()
        text = re.sub(r"(?m)^height *= *\d+", "height=128", text)
        text = re.sub(r"(?m)^width *= *\d+", "width=128", text)
        d = dk.Darknet.from_str(text)
        model = YoloModel(graph_from_darknet(d))
        params, state = model.init(jax.random.PRNGKey(0))
        pruned = [f"layer{i}" for i, layer in enumerate(d.layers)
                  if isinstance(layer, dk.Convolutional)
                  and f"layer{i}" not in params]
        assert pruned, "expected a pruned conv in the contrastive tail"

        path = tmp_path / "contrastive.weights"
        save_darknet_weights(d, params, state, path, seen=7)
        loaded_p, loaded_s, seen = load_darknet_weights(d, path)
        assert seen == 7
        for name in pruned:  # placeholder read back, then dropped by merge
            assert name in loaded_p
        p2, s2 = merge_into_model_tree(loaded_p, loaded_s, params, state)
        for name in pruned:
            assert name not in p2 and name not in s2
        for leaf_a, leaf_b in zip(
            jax.tree_util.tree_leaves(params), jax.tree_util.tree_leaves(p2)
        ):
            np.testing.assert_allclose(
                np.asarray(leaf_a), np.asarray(leaf_b), atol=0)

    def test_weights_mismatch_detected(self, tiny, tmp_path):
        d, model, params, state = tiny
        path = tmp_path / "bad.weights"
        save_darknet_weights(d, params, state, path)
        with open(path, "ab") as f:
            f.write(b"\x00" * 16)
        with pytest.raises(ValueError, match="bytes left"):
            load_darknet_weights(d, path)


def test_darknet_decode_is_anchor_major_darknet_variant():
    d = dk.Darknet.load(os.path.join(REPO, "cfg/darknet/yolov4-tiny.cfg"))
    g = graph_from_darknet(d)
    dets = [n.config for n in g.nodes.values() if n.config.kind == "Detect2D"]
    assert all(c.channel_order == "anchor_major" for c in dets)
    assert all(c.variant == "darknet" for c in dets)
    # anchors converted to (h, w) ratios
    first = dets[0]
    assert first.anchors[0] == pytest.approx((82 / 416, 81 / 416))


def test_new_coords_cfg_uses_scaled_decode():
    d = dk.Darknet.load(os.path.join(REPO, "cfg/darknet/yolov4-csp.cfg"))
    g = graph_from_darknet(d)
    dets = [n.config for n in g.nodes.values() if n.config.kind == "Detect2D"]
    assert all(c.variant == "scaled" for c in dets)


class TestCfgRoundTrip:
    @pytest.mark.parametrize(
        "name", ["yolov4-tiny.cfg", "yolov4-csp.cfg", "yolov4.cfg",
                 "Gaussian_yolov3_BDD.cfg",  # [Gaussian_yolo]: 9-entry head
                 "crnn.train.cfg",           # [crnn] geometry fields
                 "t1.test.cfg"]              # [detection] incl. rescore
    )
    def test_parse_serialize_parse_identity(self, name):
        from yolodl_tpu.config.darknet_cfg import to_cfg_string

        path = os.path.join(REPO, "cfg/darknet", name)
        first = dk.Darknet.load(path)
        text = to_cfg_string(first)
        second = dk.Darknet.from_str(text)
        assert len(first.layers) == len(second.layers)
        assert first.net.input_shape_hwc == second.net.input_shape_hwc
        for a, b in zip(first.layers, second.layers):
            assert type(a) is type(b)
            if isinstance(a, dk.Convolutional):
                assert (a.filters, a.size, a.stride_x, a.padding,
                        a.batch_normalize, a.activation) == \
                       (b.filters, b.size, b.stride_x, b.padding,
                        b.batch_normalize, b.activation)
            if isinstance(a, dk.Yolo):
                assert a.masked_anchors == b.masked_anchors
                assert a.scale_x_y == b.scale_x_y
                assert a.new_coords == b.new_coords
                assert a.gaussian == b.gaussian
                assert (a.iou_normalizer, a.obj_normalizer,
                        a.cls_normalizer, a.label_smooth_eps) == \
                       (b.iou_normalizer, b.obj_normalizer,
                        b.cls_normalizer, b.label_smooth_eps)
            if isinstance(a, dk.Detection):
                assert (a.rescore, a.softmax, a.sqrt) == \
                       (b.rescore, b.softmax, b.sqrt)
            if isinstance(a, dk.Crnn):
                assert (a.dilation, a.groups) == (b.dilation, b.groups)
        # [net] keys the serializer doesn't model ride through verbatim
        assert first.net.saturation == second.net.saturation
        assert first.net.exposure == second.net.exposure
        # output shapes identical → structural identity
        assert first.output_shapes() == second.output_shapes()


class TestCfgRoundTripCorpus:
    def test_whole_corpus_round_trips_semantically(self):
        """Every corpus cfg: parse→serialize→parse preserves EVERY typed
        field of every layer (dataclasses.asdict equality — the reference's
        to_string round-trip bar, darknet-config/src/darknet.rs:23-25),
        the preserved-verbatim extras, inferred output shapes, and the
        stopbackward/onlyforward maps — to_cfg_string is what fold-weights
        writes, so a serializer gap silently changes deployed models.
        The parse must also be WARNING-FREE: an unknown-key warning on a
        corpus cfg means the parser's field surface regressed."""
        import dataclasses
        import glob
        import warnings as _warnings

        from yolodl_tpu.config.darknet_cfg import to_cfg_string

        for path in sorted(glob.glob(os.path.join(REPO, "cfg/darknet/*.cfg"))):
            name = os.path.basename(path)
            with _warnings.catch_warnings(record=True) as caught:
                _warnings.simplefilter("always")
                a = dk.Darknet.load(path)
            assert not caught, (name, [str(w.message) for w in caught])
            b = dk.Darknet.from_str(to_cfg_string(a))
            assert [type(x) for x in a.layers] == \
                   [type(y) for y in b.layers], name
            for i, (x, y) in enumerate(zip(a.layers, b.layers)):
                assert dataclasses.asdict(x) == dataclasses.asdict(y), \
                    (name, i, x, y)
            assert a.extras == b.extras, name
            if name != "resnet152_trident.cfg":  # broken upstream
                assert a.output_shapes() == b.output_shapes(), name
            assert (a.stop_backward, a.only_forward) == \
                   (b.stop_backward, b.only_forward), name

    def test_flagship_training_keys_parsed_and_preserved(self):
        """yolov4-csp.cfg (the bench/quality flagship) carries
        iou_thresh/objectness_smooth/max_delta — previously silently
        dropped (round-3 VERDICT item 1).  Pin that they parse to the
        typed fields AND survive a parse→print→parse cycle."""
        from yolodl_tpu.config.darknet_cfg import to_cfg_string

        a = dk.Darknet.load(os.path.join(REPO, "cfg/darknet/yolov4-csp.cfg"))
        heads = [l for l in a.layers if isinstance(l, dk.Yolo)]
        assert heads and all(h.iou_thresh == 0.2 for h in heads)
        assert [h.max_delta for h in heads] == [5.0, 5.0, 2.0]
        assert all(h.new_coords for h in heads)
        assert all(h.iou_loss == "ciou" for h in heads)
        assert all(h.resize == 1.5 for h in heads)
        b = dk.Darknet.from_str(to_cfg_string(a))
        heads_b = [l for l in b.layers if isinstance(l, dk.Yolo)]
        assert [(h.iou_thresh, h.max_delta, h.iou_loss) for h in heads_b] \
            == [(0.2, 5.0, "ciou"), (0.2, 5.0, "ciou"), (0.2, 2.0, "ciou")]
        # yolov4.cfg carries iou_thresh=0.213 on every head
        c = dk.Darknet.load(os.path.join(REPO, "cfg/darknet/yolov4.cfg"))
        heads4 = [l for l in c.layers if isinstance(l, dk.Yolo)]
        assert heads4 and all(h.iou_thresh == 0.213 for h in heads4)

    def test_unknown_layer_key_warns_and_round_trips(self):
        """An unknown key in any typed section warns (one warning naming
        section + key) and is still emitted verbatim by to_cfg_string —
        the silent-drop failure class is permanently loud."""
        import warnings as _warnings

        from yolodl_tpu.config.darknet_cfg import to_cfg_string

        text = ("[net]\nwidth=32\nheight=32\nchannels=3\n"
                "[yolo]\nanchors=4,6\nclasses=2\nfrobnicate=3\n")
        with _warnings.catch_warnings(record=True) as caught:
            _warnings.simplefilter("always")
            d = dk.Darknet.from_str(text)
        msgs = [str(w.message) for w in caught]
        assert any("frobnicate" in m and "[yolo]" in m for m in msgs), msgs
        assert "frobnicate=3" in to_cfg_string(d)
        # known-but-unmodeled reference keys are preserved WITHOUT warning
        text2 = ("[net]\nwidth=32\nheight=32\nchannels=3\n"
                 "[yolo]\nanchors=4,6\nclasses=2\ntrack_history_size=5\n")
        with _warnings.catch_warnings(record=True) as caught2:
            _warnings.simplefilter("always")
            d2 = dk.Darknet.from_str(text2)
        assert not caught2, [str(w.message) for w in caught2]
        assert "track_history_size=5" in to_cfg_string(d2)


class TestGaussianYolo:
    def test_gaussian_cfg_builds_and_runs(self):
        path = os.path.join(REPO, "cfg/darknet/Gaussian_yolov3_BDD.cfg")
        d = dk.Darknet.load(path)
        yolos = [l for l in d.layers if isinstance(l, dk.Yolo)]
        assert all(y.gaussian for y in yolos)
        g = graph_from_darknet(d)
        model = YoloModel(g)
        params, state = model.init(jax.random.PRNGKey(0))
        # run at reduced input size for CPU speed: gaussian bdd is 512
        x = jnp.zeros((1, 3, d.net.height, d.net.width), jnp.float32)
        out, _ = model.apply(params, state, x, train=False)
        assert out.uncertainty is not None
        assert out.uncertainty.shape == (1, out.num_flats)
        u = np.asarray(out.uncertainty)
        assert np.all((u >= 0) & (u <= 1))
        # confidence is scaled down by uncertainty
        conf = np.asarray(out.confidence())
        plain = np.asarray(out.obj_prob())[..., None] * np.asarray(out.class_prob())
        assert np.all(conf <= plain + 1e-6)

    def test_gaussian_decode_formula(self):
        from yolodl_tpu.ops.detect import detect_decode

        # 1 anchor, 1 class → 10 channels; zero logits
        x = jnp.zeros((1, 2, 2, 10))
        det = detect_decode(
            x, [(0.4, 0.6)], 1, order="anchor_major", variant="darknet",
            scale_xy=1.0, entry_layout="xywh", gaussian=True,
        )
        # mu = σ(0)=0.5 → cy = (0.5+row)/2; h = exp(0)*0.4
        np.testing.assert_allclose(
            np.asarray(det.cycxhw[0, 0, :, :, 0]), [[0.25, 0.25], [0.75, 0.75]],
            atol=1e-6,
        )
        np.testing.assert_allclose(np.asarray(det.cycxhw[..., 2]), 0.4, atol=1e-6)
        # sigmas all σ(0)=0.5 → uncertainty 0.5
        np.testing.assert_allclose(np.asarray(det.uncertainty), 0.5, atol=1e-6)


class TestClassifierModels:
    def test_darknet53_builds_and_runs(self, tmp_path):
        from yolodl_tpu.models import GraphModel

        path = os.path.join(REPO, "cfg/darknet/darknet53.cfg")
        text = open(path).read().replace("width=256", "width=64").replace(
            "height=256", "height=64"
        )
        small = tmp_path / "d53.cfg"
        small.write_text(text)
        d = dk.Darknet.load(str(small))
        model = GraphModel(graph_from_darknet(d))
        params, state = model.init(jax.random.PRNGKey(0))
        x = jnp.zeros((1, 3, 64, 64), jnp.float32)
        out, _ = model.apply(params, state, x, train=False)
        # softmax over 1000 classes sums to 1 (NHWC [b, 1, 1, 1000])
        assert out.shape == (1, 1, 1, 1000)
        np.testing.assert_allclose(float(out.sum()), 1.0, atol=1e-4)

    def test_alexnet_connected_weights_roundtrip(self, tmp_path):
        from yolodl_tpu.models import GraphModel
        from yolodl_tpu.models.weights import (
            load_darknet_weights, merge_into_model_tree, save_darknet_weights,
        )

        path = os.path.join(REPO, "cfg/darknet/alexnet.cfg")
        d = dk.Darknet.load(path)
        model = GraphModel(graph_from_darknet(d))
        params, state = model.init(jax.random.PRNGKey(0))
        wpath = tmp_path / "alex.weights"
        save_darknet_weights(d, params, state, wpath)
        lp, ls, _ = load_darknet_weights(d, wpath)
        p2, s2 = merge_into_model_tree(lp, ls, params, state)
        for a, b in zip(jax.tree_util.tree_leaves(params), jax.tree_util.tree_leaves(p2)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=0)

    def test_dropout_active_with_rng(self, tmp_path):
        from yolodl_tpu.models import GraphModel
        from yolodl_tpu.config import newslab
        from yolodl_tpu.graph import Graph

        model_dict = {
            "main_group": "m",
            "groups": {
                "m": [
                    {"name": "input", "kind": "Input", "shape": ["_", 4, 4, 4]},
                    {"name": "gap", "kind": "GlobalAvgPool2D"},
                    {"name": "drop", "kind": "Dropout", "probability": 0.5},
                ]
            },
        }
        # Dropout/GlobalAvgPool parse via dataclass construction only (no
        # JSON kind registered) — build the model directly
        from yolodl_tpu.config.newslab import Dropout, GlobalAvgPool2D, Input, Model
        from yolodl_tpu.shapes import Shape
        from yolodl_tpu.graph.ir import _flatten

        m = Model(groups={"m": (
            Input(name="input", shape=Shape(["_", 4, 4, 4])),
            GlobalAvgPool2D(name="gap", from_="input"),
            Dropout(name="drop", from_="gap", probability=0.5),
        )}, main_group="m")
        gm = GraphModel(_flatten(m))
        params, state = gm.init(jax.random.PRNGKey(0))
        x = jnp.ones((2, 4, 4, 4), jnp.float32)
        out_eval, _ = gm.apply(params, state, x, train=False)
        np.testing.assert_allclose(np.asarray(out_eval), 1.0)
        out_train, _ = gm.apply(params, state, x, train=True,
                                rng=jax.random.PRNGKey(1))
        vals = np.unique(np.asarray(out_train))
        assert set(np.round(vals, 4)).issubset({0.0, 2.0})  # dropped or scaled


# sections with no graph mapping (yolov1 detection head, contrastive loss,
# trident multi-branch) — everything else in the 74-cfg corpus must build,
# including the sequence models ([rnn]/[gru]/[lstm]/[crnn], test_recurrent.py)
UNBUILDABLE = {
    # trident: routes layers of different spatial sizes; darknet itself
    # degenerates these to 0-size outputs (parse_route warning), so the cfg
    # is broken upstream — we fail fast instead
    "resnet152_trident.cfg",
}


def test_corpus_build_coverage():
    """At least 73 of the 74 corpus cfgs build into runnable graphs."""
    built, failed = [], []
    for path in ALL_CFGS:
        name = os.path.basename(path)
        try:
            graph_from_darknet(dk.Darknet.load(path))
            built.append(name)
        except Exception:
            failed.append(name)
    unexpected = [n for n in failed if n not in UNBUILDABLE]
    assert not unexpected, f"cfgs newly failing to build: {unexpected}"
    assert len(built) >= 73, (len(built), failed)
