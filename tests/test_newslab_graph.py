"""NEWSLABv1 parser + graph IR tests.

Mirrors the reference's corpus tests (model-config/tests/config_test.rs and
model-graph/tests/config_test.rs): every model JSON5 under cfg/ must parse,
flatten, and shape-infer.
"""

import glob
import os

import pytest

from yolodl_tpu.config import newslab
from yolodl_tpu.graph import Graph
from yolodl_tpu.graph.ir import DETECT_2D, MERGE_DETECT_2D
from yolodl_tpu.shapes import Shape

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
MODEL_CFGS = sorted(
    glob.glob(os.path.join(REPO, "cfg/model/*.json5"))
    + glob.glob(os.path.join(REPO, "cfg/tests/yolov4-csp-*.json5"))
)


@pytest.mark.parametrize("path", MODEL_CFGS, ids=[os.path.basename(p) for p in MODEL_CFGS])
def test_model_corpus_loads_and_infers(path):
    graph = Graph.load_newslab_v1_json(path)
    assert len(graph.nodes) > 0
    out = graph.output_node()
    assert out.output_shape.kind == MERGE_DETECT_2D
    # every non-input node has resolved inputs
    for node in graph.nodes.values():
        for src in node.input_keys.iter_keys():
            assert src in graph.nodes
    # topological: inputs come before consumers
    pos = {k: i for i, k in enumerate(graph.order)}
    for node in graph.nodes.values():
        for src in node.input_keys.iter_keys():
            assert pos[src] < pos[node.key]


def test_empty_model():
    model = newslab.parse_model_dict({"groups": {"main": []}, "main_group": "main"})
    g = Graph.from_model(model)
    assert len(g.nodes) == 0


def test_64x64_toy_model_shapes():
    path = os.path.join(REPO, "cfg/model/yolov4-csp-custom-64x64-2021-08-21.json5")
    graph = Graph.load_newslab_v1_json(path)

    # detect head input must be (5+1)*1 = 6 channels
    det = [n for n in graph.nodes.values() if n.kind == "Detect2D"]
    assert len(det) == 1
    assert det[0].output_shape.kind == DETECT_2D
    src = graph.nodes[det[0].input_keys.single_key]
    b, c, h, w = src.output_shape.tensor_shape()
    assert c.size == 6

    # the input is declared [_, 3, 64, 64]
    inp = graph.input_nodes()
    assert len(inp) >= 1
    top = [n for n in inp if n.path and "." not in n.path]
    assert len(top) == 1
    assert top[0].output_shape.tensor_shape().equals(Shape(["_", 3, 64, 64]))


def test_group_ref_flattening_paths():
    model = newslab.parse_model_dict(
        {
            "main_group": "Main",
            "groups": {
                "Sub": [
                    {"name": "input", "kind": "Input", "shape": ["_", 8, "_", "_"]},
                    {"name": "output", "kind": "ConvBn2D", "c": 8, "k": 1},
                ],
                "Main": [
                    {"name": "input", "kind": "Input", "shape": ["_", 3, 32, 32]},
                    {"name": "stem", "kind": "ConvBn2D", "c": 8, "k": 3},
                    {
                        "name": "blk",
                        "kind": "GroupRef",
                        "from": {"input": "stem"},
                        "group": "Sub",
                    },
                    {"name": "head", "kind": "ConvBn2D", "from": "blk.output", "c": 4, "k": 1},
                ],
            },
        }
    )
    g = Graph.from_model(model)
    assert "blk.input" in g.by_path and "blk.output" in g.by_path
    head = g.nodes[g.by_path["head"]]
    assert head.output_shape.tensor_shape().equals(Shape(["_", 4, 32, 32]))
    # nested input inherits + checks shape from its wired source
    sub_in = g.nodes[g.by_path["blk.input"]]
    assert sub_in.output_shape.tensor_shape().equals(Shape(["_", 8, 32, 32]))


def test_implicit_from_previous_layer():
    model = newslab.parse_model_dict(
        {
            "main_group": "m",
            "groups": {
                "m": [
                    {"name": "input", "kind": "Input", "shape": ["_", 3, 16, 16]},
                    {"kind": "ConvBn2D", "c": 4, "k": 3, "s": 2},
                    {"name": "out", "kind": "ConvBn2D", "c": 6, "k": 1},
                ]
            },
        }
    )
    g = Graph.from_model(model)
    out = g.nodes[g.by_path["out"]]
    assert out.output_shape.tensor_shape().equals(Shape(["_", 6, 8, 8]))


def test_cycle_detection():
    model = newslab.parse_model_dict(
        {
            "main_group": "m",
            "groups": {
                "m": [
                    {"name": "input", "kind": "Input", "shape": ["_", 4, 8, 8]},
                    {"name": "a", "kind": "ConvBn2D", "from": "b", "c": 4, "k": 1},
                    {"name": "b", "kind": "ConvBn2D", "from": "a", "c": 4, "k": 1},
                ]
            },
        }
    )
    with pytest.raises(ValueError, match="cycle"):
        Graph.from_model(model)


def test_unresolved_path_errors():
    model = newslab.parse_model_dict(
        {
            "main_group": "m",
            "groups": {
                "m": [
                    {"name": "input", "kind": "Input", "shape": ["_", 4, 8, 8]},
                    {"name": "a", "kind": "ConvBn2D", "from": "nope", "c": 4, "k": 1},
                ]
            },
        }
    )
    with pytest.raises(ValueError, match="cannot resolve"):
        Graph.from_model(model)


def test_detect_channel_mismatch_errors():
    model = newslab.parse_model_dict(
        {
            "main_group": "m",
            "groups": {
                "m": [
                    {"name": "input", "kind": "Input", "shape": ["_", 3, 16, 16]},
                    {"kind": "ConvBn2D", "c": 7, "k": 1},  # 7 != 1*(5+1)
                    {
                        "name": "det",
                        "kind": "Detect2D",
                        "classes": 1,
                        "anchors": [[0.5, 0.5]],
                    },
                ]
            },
        }
    )
    with pytest.raises(ValueError, match="channels"):
        Graph.from_model(model)


def test_info_table_and_dot():
    path = os.path.join(REPO, "cfg/model/yolov4-csp-custom-64x64-2021-08-21.json5")
    g = Graph.load_newslab_v1_json(path)
    table = g.info_table()
    assert "ConvBn2D" in table and "MergeDetect2D" in table
    dot = g.to_dot()
    assert dot.startswith("digraph") and "->" in dot
