"""Static params/FLOPs cost model (graph/cost.py) vs the real init pytree.

The analytic per-node parameter count must equal the number of scalars the
builder actually initializes for that node — checked per node, over darknet
cfgs covering conv/CSP/SPP/maxpool/route/shortcut, sequence layers
(rnn/gru/lstm/crnn/connected), and a NEWSLAB json5 model.
"""

import os

import jax
import pytest

from yolodl_tpu.config import darknet_cfg as dk
from yolodl_tpu.graph import Graph
from yolodl_tpu.graph.cost import graph_cost, node_cost
from yolodl_tpu.graph.from_darknet import graph_from_darknet
from yolodl_tpu.models.builder import GraphModel

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _leaf_count(tree) -> int:
    return sum(int(x.size) for x in jax.tree_util.tree_leaves(tree))


def _check_per_node(graph):
    gm = GraphModel(graph, spd_stem="off", fold_region="off")
    params, _ = gm.init(jax.random.PRNGKey(0))
    for key in graph.order:
        node = graph.nodes[key]
        analytic, _ = node_cost(graph, node)
        name = gm._pname[key]
        actual = _leaf_count(params.get(name, {}))
        assert analytic == actual, (
            f"{node.kind} {name}: analytic {analytic} != init {actual}"
        )
    total_p, _ = graph_cost(graph)
    assert total_p == _leaf_count(params)


@pytest.mark.parametrize("cfg_name", [
    "yolov4-tiny.cfg",          # conv/maxpool/route-groups/upsample
    "yolov4-csp.cfg",           # full CSP + SPP flagship
    "rnn.cfg",                  # [rnn] + connected
    "gru.cfg",                  # [gru]
    "lstm.train.cfg",           # [lstm]
    "crnn.train.cfg",           # [crnn]
    "darknet19.cfg",            # classifier: conv + avgpool + softmax
])
def test_params_match_init_darknet(cfg_name):
    d = dk.Darknet.load(os.path.join(REPO, "cfg/darknet", cfg_name))
    _check_per_node(graph_from_darknet(d))


def test_params_match_init_newslab():
    path = os.path.join(REPO, "cfg/model/yolov4-csp-custom-64x64-2021-08-21.json5")
    _check_per_node(Graph.load_newslab_v1_json(path))


def test_flops_scale_with_resolution():
    """Conv FLOPs are quadratic in input size; params are invariant."""
    base = open(os.path.join(REPO, "cfg/darknet/yolov4-tiny.cfg")).read()
    doubled = base.replace("width=416", "width=832").replace(
        "height=416", "height=832")
    g1 = graph_from_darknet(dk.Darknet.from_str(base))
    g2 = graph_from_darknet(dk.Darknet.from_str(doubled))
    p1, f1 = graph_cost(g1)
    p2, f2 = graph_cost(g2)
    assert p1 == p2
    assert f2 == pytest.approx(4 * f1, rel=0.01)


def test_tiny_flops_sanity():
    """yolov4-tiny-416 is a published ~6.9 BFLOPs model (darknet's own
    printout sums ~6.8 BF over the conv layers)."""
    g = graph_from_darknet(
        dk.Darknet.load(os.path.join(REPO, "cfg/darknet/yolov4-tiny.cfg")))
    _, f = graph_cost(g)
    assert 6.0e9 < f < 7.5e9


def test_info_table_totals_line():
    g = graph_from_darknet(
        dk.Darknet.load(os.path.join(REPO, "cfg/darknet/yolov4-tiny.cfg")))
    table = g.info_table()
    assert "total:" in table and "GFLOPs/sample" in table
    assert "params" in table.splitlines()[0]
