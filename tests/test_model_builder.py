"""Model builder end-to-end: graph → init → jitted forward (milestone slice)."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from yolodl_tpu.graph import Graph
from yolodl_tpu.models import YoloModel

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
TOY = os.path.join(REPO, "cfg/model/yolov4-csp-custom-64x64-2021-08-21.json5")


@pytest.fixture(scope="module")
def toy_model():
    graph = Graph.load_newslab_v1_json(TOY)
    model = YoloModel(graph)
    params, state = model.init(jax.random.PRNGKey(0))
    return model, params, state


class TestToyModel:
    def test_init_structure(self, toy_model):
        model, params, state = toy_model
        assert model.num_classes == 1
        n_params = sum(x.size for x in jax.tree_util.tree_leaves(params))
        assert n_params > 10_000
        # every ConvBn node with bn enabled has running stats
        assert any("bn" in str(jax.tree_util.tree_structure(v)) or "bn" in v
                   for v in state.values() if isinstance(v, dict))

    def test_forward_eval(self, toy_model):
        model, params, state = toy_model
        x = jnp.zeros((2, 3, 64, 64), jnp.float32)
        out, new_state = model.apply(params, state, x, train=False)
        # single head: 64/stride... Detect head at (4,1) scale: H=W=16, A=1
        assert out.num_flats == out.infos[0].num_flats
        assert out.cycxhw.shape == (2, out.num_flats, 4)
        assert out.class_logit.shape == (2, out.num_flats, 1)
        # eval does not touch state
        assert new_state == state or jax.tree_util.tree_all(
            jax.tree_util.tree_map(lambda a, b: bool((a == b).all()), new_state, state)
        )

    def test_forward_train_updates_state(self, toy_model):
        model, params, state = toy_model
        x = jnp.asarray(np.random.default_rng(0).normal(size=(2, 3, 64, 64)), jnp.float32)
        _, new_state = model.apply(params, state, x, train=True)
        diffs = jax.tree_util.tree_map(
            lambda a, b: float(jnp.abs(a - b).max()), state, new_state
        )
        assert max(jax.tree_util.tree_leaves(diffs)) > 0.0

    def test_forward_jit_and_boxes_sane(self, toy_model):
        model, params, state = toy_model

        @jax.jit
        def fwd(p, s, x):
            return model.apply(p, s, x, train=False)[0]

        x = jnp.asarray(np.random.default_rng(1).normal(size=(1, 3, 64, 64)), jnp.float32)
        out = fwd(params, state, x)
        boxes = np.asarray(out.cycxhw)
        assert np.all(np.isfinite(boxes))
        # centers within the decode envelope, sizes non-negative
        assert boxes[..., :2].min() > -0.2 and boxes[..., :2].max() < 1.2
        assert boxes[..., 2:].min() >= 0.0

    def test_grad_flows_to_all_params(self, toy_model):
        model, params, state = toy_model
        x = jnp.asarray(np.random.default_rng(2).normal(size=(1, 3, 64, 64)), jnp.float32)

        def loss_fn(p):
            out, _ = model.apply(p, state, x, train=True)
            return jnp.sum(out.obj_logit**2) + jnp.sum(out.cycxhw**2)

        grads = jax.grad(loss_fn)(params)
        leaf_norms = [float(jnp.abs(g).sum()) for g in jax.tree_util.tree_leaves(grads)]
        assert all(np.isfinite(leaf_norms))
        nonzero = sum(1 for n in leaf_norms if n > 0)
        assert nonzero / len(leaf_norms) > 0.9

    def test_clamp_running_vars(self, toy_model):
        model, params, state = toy_model
        # poison a var then clamp: toy config sets var_min=0.001, var_max=1000
        poisoned = jax.tree_util.tree_map(lambda x: x, state)

        def poison(t):
            return jnp.full_like(t, 1e9)

        name = next(iter(poisoned))
        sub = poisoned[name]
        if "bn" in sub:
            poisoned[name] = {**sub, "bn": {**sub["bn"], "var": poison(sub["bn"]["var"])}}
        clamped = model.clamp_running_vars(poisoned)
        leaves = jax.tree_util.tree_leaves(clamped)
        assert max(float(x.max()) for x in leaves) <= 1e9
        sub_c = clamped[name]
        if "bn" in sub_c:
            assert float(sub_c["bn"]["var"].max()) <= 1000.0


def test_full_size_csp_model_builds():
    """The 449-line yolov4-csp test config builds and shape-checks (no forward:
    too heavy for unit tests on 1 CPU)."""
    path = os.path.join(REPO, "cfg/tests/yolov4-csp-with-bn-affine.json5")
    model = YoloModel(Graph.load_newslab_v1_json(path))
    params, state = model.init(jax.random.PRNGKey(0))
    n_params = sum(x.size for x in jax.tree_util.tree_leaves(params))
    assert n_params > 1_000_000
