"""darknet stopbackward / onlyforward (frozen-layer fine-tuning).

parser.c:1589-1593 parses both for every section kind; network.c:362-363
consumes them in the backward loop: a nonzero ``stopbackward`` BREAKS the
last→first loop (that layer and every earlier one get no gradient or
weight update — the frozen-backbone idiom of yolov4-custom.cfg), while
``onlyforward`` skips one layer's backward (no updates for it, no
gradient through it).  Here both map to lax.stop_gradient on node outputs
(models/builder.py), which also lets XLA prune the frozen prefix's
backward pass entirely.
"""

import numpy as np
import pytest

from yolodl_tpu.config import darknet_cfg as dk
from yolodl_tpu.graph.from_darknet import graph_from_darknet

HEAD = """[net]
width=16
height=16
channels=3
batch=2
subdivisions=1
learning_rate=0.001
policy=constant
"""

CONV = """
[convolutional]
filters=4
size=3
stride=1
pad=1
activation=leaky
{extra}"""


def _grads(model, params, state, x):
    import jax
    import jax.numpy as jnp

    def loss(p):
        out, _ = model.apply(p, state, x, train=True, data_format="NCHW")
        return jnp.sum(out.astype(jnp.float32) ** 2)

    return jax.grad(loss)(params)


def _max_abs(tree):
    import jax

    leaves = jax.tree_util.tree_leaves(tree)
    return max(float(np.max(np.abs(np.asarray(v)))) for v in leaves)


class TestParser:
    def test_stopbackward_parsed_and_round_trips(self):
        text = (HEAD + CONV.format(extra="") +
                CONV.format(extra="stopbackward=800\n") +
                CONV.format(extra=""))
        net = dk.Darknet.from_str(text)
        assert net.stop_backward == ((1, 800),)
        assert net.only_forward == ()
        # serialize → parse is identity including the flag
        again = dk.Darknet.from_str(dk.to_cfg_string(net))
        assert again == net

    def test_onlyforward_parsed_and_round_trips(self):
        text = (HEAD + CONV.format(extra="") +
                "\n[route]\nlayers=0\nonlyforward=1\n" +
                CONV.format(extra=""))
        net = dk.Darknet.from_str(text)
        assert net.only_forward == (1,)
        again = dk.Darknet.from_str(dk.to_cfg_string(net))
        assert again == net

    def test_unsupported_training_options_warn(self):
        text = HEAD + CONV.format(extra="train_only_bn=1\n")
        with pytest.warns(UserWarning, match="train_only_bn"):
            dk.Darknet.from_str(text)

    def test_flagged_corpus_cfgs(self):
        # the two real users of stopbackward in the corpus
        net = dk.Darknet.load("cfg/darknet/yolov4-custom.cfg")
        assert len(net.stop_backward) == 1
        idx, val = net.stop_backward[0]
        assert val == 800
        assert isinstance(net.layers[idx], dk.Convolutional)


class TestFreezeConfig:
    def test_ancestor_paths_and_node_fallback(self):
        # darknet graph: all nodes named layerN
        text = (HEAD + CONV.format(extra="") + CONV.format(extra="") +
                "\n[route]\nlayers=0,1\n" + CONV.format(extra=""))
        graph = graph_from_darknet(dk.Darknet.from_str(text))
        anc = graph.ancestor_paths("layer2")
        assert anc == frozenset({"input", "layer0", "layer1", "layer2"})
        with pytest.raises(ValueError, match="unknown node path"):
            graph.ancestor_paths("nope")

    def test_training_freeze_parses(self, tmp_path):
        import json

        from yolodl_tpu.config.app_config import TrainAppConfig

        cfg = {
            "version": "0.1.0",
            "model": {"kind": "Darknet", "cfg_file": "m.cfg"},
            "dataset": {"kind": {"type": "Csv", "image_size": 32,
                                  "input_channels": 3, "image_dir": "i",
                                  "label_file": "l.csv",
                                  "classes_file": "c.txt"}},
            "logging": {"dir": "logs"},
            "preprocessor": {},
            "training": {
                "batch_size": 2,
                "device_config": {"type": "SingleDevice", "device": "tpu:0"},
                "optimizer": {"lr_schedule": {"type": "Constant", "lr": 0.01}},
                "loss": {},
                "freeze": ["layer0", "layer3"],
                "freeze_through": "layer5",
            },
            "benchmark": {"nms_iou_thresh": 0.5, "nms_conf_thresh": 0.4},
        }
        p = tmp_path / "train.json5"
        p.write_text(json.dumps(cfg))
        parsed = TrainAppConfig.load(p)
        assert parsed.freeze == ("layer0", "layer3")
        assert parsed.freeze_through == "layer5"

        # a bare string is one path, not a char sequence
        cfg["training"]["freeze"] = "layer0"
        p.write_text(json.dumps(cfg))
        assert TrainAppConfig.load(p).freeze == ("layer0",)
        # non-string entries are a clear config error
        cfg["training"]["freeze"] = [0]
        p.write_text(json.dumps(cfg))
        with pytest.raises(ValueError, match="node-path strings"):
            TrainAppConfig.load(p)
        cfg["training"]["freeze"] = {"a": 1}
        p.write_text(json.dumps(cfg))
        with pytest.raises(ValueError, match="node path"):
            TrainAppConfig.load(p)


class TestFreezeSemantics:
    def _model(self, text):
        import jax

        from yolodl_tpu.models.builder import GraphModel

        graph = graph_from_darknet(dk.Darknet.from_str(text))
        model = GraphModel(graph)
        params, state = model.init(jax.random.PRNGKey(0))
        x = np.random.default_rng(3).normal(
            0, 1, (2, 3, 16, 16)).astype(np.float32)
        return model, params, state, x

    def test_stopbackward_freezes_prefix_including_route_escape(self):
        # L0 conv, L1 conv(stopbackward), L2 conv, L3 route(0,2), L4 conv.
        # L0 feeds L3 AFTER the cut, but darknet's backward loop broke at
        # L1 before reaching L0 — L0 must be frozen too (network.c:362).
        text = (HEAD + CONV.format(extra="") +
                CONV.format(extra="stopbackward=800\n") +
                CONV.format(extra="") +
                "\n[route]\nlayers=0,2\n" +
                CONV.format(extra=""))
        model, params, state, x = self._model(text)
        g = _grads(model, params, state, x)
        assert _max_abs(g["layer0"]) == 0.0
        assert _max_abs(g["layer1"]) == 0.0
        assert _max_abs(g["layer2"]) > 0.0
        assert _max_abs(g["layer4"]) > 0.0

    def test_onlyforward_freezes_one_layer_not_other_paths(self):
        # L0 conv, L1 route(0, onlyforward), L2 conv, L3 route(0,2),
        # L4 conv: no gradient THROUGH L1, but L0 still trains via L3's
        # direct reference (network.c:363 `continue` skips only L1).
        text = (HEAD + CONV.format(extra="") +
                "\n[route]\nlayers=0\nonlyforward=1\n" +
                CONV.format(extra="") +
                "\n[route]\nlayers=0,2\n" +
                CONV.format(extra=""))
        model, params, state, x = self._model(text)
        g = _grads(model, params, state, x)
        assert _max_abs(g["layer0"]) > 0.0
        assert _max_abs(g["layer2"]) > 0.0

        # cut the direct escape route: now L0's only consumer is the
        # onlyforward route, so its gradient must vanish
        text2 = (HEAD + CONV.format(extra="") +
                 "\n[route]\nlayers=0\nonlyforward=1\n" +
                 CONV.format(extra="") +
                 CONV.format(extra=""))
        model2, params2, state2, x2 = self._model(text2)
        g2 = _grads(model2, params2, state2, x2)
        assert _max_abs(g2["layer0"]) == 0.0
        assert _max_abs(g2["layer2"]) > 0.0

    def test_frozen_spd_stem(self):
        # an spd-eligible stem (k3s1 → k3s2) under stopbackward: the fused
        # fast path must freeze both convs and still match the unfused
        # forward exactly
        import jax

        from yolodl_tpu.models.builder import GraphModel

        text = (HEAD + CONV.format(extra="") +
                "\n[convolutional]\nfilters=8\nsize=3\nstride=2\npad=1\n"
                "activation=leaky\nstopbackward=1\n" +
                CONV.format(extra="").replace("filters=4", "filters=8")
                .replace("stride=1", "stride=1"))
        graph = graph_from_darknet(dk.Darknet.from_str(text))
        model = GraphModel(graph, spd_stem="auto")
        assert model._spd_pair is not None  # rewrite stays active
        params, state = model.init(jax.random.PRNGKey(0))
        x = np.random.default_rng(5).normal(
            0, 1, (2, 3, 16, 16)).astype(np.float32)
        g = _grads(model, params, state, x)
        assert _max_abs(g["layer0"]) == 0.0
        assert _max_abs(g["layer1"]) == 0.0
        assert _max_abs(g["layer2"]) > 0.0

        ref = GraphModel(graph, spd_stem="off")
        out_a, _ = model.apply(params, state, x, data_format="NCHW")
        out_b, _ = ref.apply(params, state, x, data_format="NCHW")
        np.testing.assert_allclose(np.asarray(out_a), np.asarray(out_b),
                                   rtol=1e-5, atol=1e-5)

    def test_bn_running_stats_still_update_when_frozen(self):
        # darknet's training forward updates batch-norm rolling stats for
        # frozen layers too (freeze only breaks backward)
        import jax

        from yolodl_tpu.models.builder import GraphModel

        text = (HEAD +
                CONV.format(extra="batch_normalize=1\nstopbackward=1\n") +
                CONV.format(extra=""))
        graph = graph_from_darknet(dk.Darknet.from_str(text))
        model = GraphModel(graph)
        params, state = model.init(jax.random.PRNGKey(0))
        x = np.random.default_rng(7).normal(
            0, 1, (2, 3, 16, 16)).astype(np.float32)
        _, new_state = model.apply(params, state, x, train=True,
                                   data_format="NCHW")
        before = np.asarray(state["layer0"]["bn"]["mean"])
        after = np.asarray(new_state["layer0"]["bn"]["mean"])
        assert np.max(np.abs(after - before)) > 0.0
