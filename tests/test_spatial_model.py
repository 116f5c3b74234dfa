"""Full-model spatially-sharded inference == unsharded (8-device CPU mesh).

parallel/spatial_model.py: height-sharded prefix with halo exchange +
all_gather at the cut.  The planner must find a non-trivial prefix on real
darknet graphs, and outputs must match the stock model exactly.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from yolodl_tpu.config import darknet_cfg as dk
from yolodl_tpu.graph.from_darknet import graph_from_darknet
from yolodl_tpu.models import YoloModel
from yolodl_tpu.parallel.spatial_model import (
    make_spatial_infer, plan_spatial_prefix,
)
from yolodl_tpu.parallel.spatial import SPACE_AXIS

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _mesh(n):
    from jax.sharding import Mesh

    return Mesh(np.asarray(jax.devices()[:n]), (SPACE_AXIS,))


def _build(cfg_rel, size_from=None, size_to=None):
    path = os.path.join(REPO, cfg_rel)
    text = open(path).read()
    if size_from:
        text = text.replace(f"width={size_from}", f"width={size_to}").replace(
            f"height={size_from}", f"height={size_to}")
    import tempfile

    f = tempfile.NamedTemporaryFile("w", suffix=".cfg", delete=False)
    f.write(text)
    f.close()
    darknet = dk.Darknet.load(f.name)
    model = YoloModel(graph_from_darknet(darknet))
    params, state = model.init(jax.random.PRNGKey(0))
    return model, params, state


@pytest.mark.parametrize("cfg_rel,size_from,size_to,n", [
    ("cfg/darknet/yolov4-tiny.cfg", "416", "256", 8),
    ("cfg/darknet/yolov4-csp.cfg", "512", "256", 4),
])
def test_sharded_matches_unsharded(cfg_rel, size_from, size_to, n):
    if jax.device_count() < n:
        pytest.skip("needs virtual device mesh")
    model, params, state = _build(cfg_rel, size_from, size_to)
    size = int(size_to)

    sharded, cut = plan_spatial_prefix(model, n)
    assert len(sharded) > 5, "planner found no meaningful prefix"
    assert cut

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.uniform(0, 1, (1, 3, size, size)), jnp.float32)

    ref, _ = model.apply(params, state, x, train=False)
    infer = make_spatial_infer(model, _mesh(n))
    out = infer(params, state, x)

    np.testing.assert_allclose(np.asarray(out.cycxhw),
                               np.asarray(ref.cycxhw), atol=2e-5)
    np.testing.assert_allclose(np.asarray(out.obj_logit),
                               np.asarray(ref.obj_logit), atol=2e-5)
    np.testing.assert_allclose(np.asarray(out.class_logit),
                               np.asarray(ref.class_logit), atol=2e-5)


def test_planner_covers_high_res_stages():
    """The memory-dominant high-resolution layers must be in the sharded
    prefix (that is the point of spatial sharding)."""
    model, _, _ = _build("cfg/darknet/yolov4-csp.cfg", "512", "256")
    sharded, _ = plan_spatial_prefix(model, 4)
    graph = model.graph
    hi_res = [k for k in graph.order
              if graph.nodes[k].output_shape.is_tensor
              and graph.nodes[k].output_shape.tensor_shape()[2].is_known
              and graph.nodes[k].output_shape.tensor_shape()[2].size >= 64]
    covered = sum(1 for k in hi_res if k in sharded)
    assert covered / len(hi_res) > 0.9, (covered, len(hi_res))
