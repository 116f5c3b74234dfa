"""Pipeline (stage) parallelism: planner + MPMD execution parity.

The graph is cut into contiguous stages living on separate devices
(parallel/pipeline.py); outputs must match the single-device model
exactly, and the GPipe microbatch train step must equal the
gradient-accumulation step value-for-value.
"""

import re

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.slow  # e2e/CLI tier: excluded from `pytest -m 'not slow'`

from yolodl_tpu.graph.from_darknet import load_darknet_graph
from yolodl_tpu.models import YoloModel
from yolodl_tpu.parallel.pipeline import PipelineModel, plan_stages


@pytest.fixture(scope="module")
def tiny_model(tmp_path_factory):
    # yolov4-tiny at 96² / 3 classes: real topology (routes with groups,
    # skip links, two heads) but small enough for CPU
    text = open("cfg/darknet/yolov4-tiny.cfg").read()
    text = re.sub(r"(?m)^width=\d+", "width=96", text)
    text = re.sub(r"(?m)^height=\d+", "height=96", text)
    text = text.replace("classes=80", "classes=3")
    text = text.replace("filters=255", "filters=24")
    p = tmp_path_factory.mktemp("pp") / "tiny96.cfg"
    p.write_text(text)
    model = YoloModel(load_darknet_graph(str(p)))
    params, state = model.init(jax.random.PRNGKey(0))
    return model, params, state


class TestPlanner:
    def test_stages_partition_the_graph(self, tiny_model):
        model, _, _ = tiny_model
        for n in (2, 3, 4):
            plans = plan_stages(model, n)
            assert len(plans) == n
            covered = [k for p in plans for k in p.keys]
            assert covered == list(model.graph.order)
            # boundary contract: a stage's in_keys are exactly the
            # previous cut's out_keys
            for s in range(1, n):
                assert plans[s].in_keys == plans[s - 1].out_keys
            # crossing values are plain tensors
            for p in plans[:-1]:
                for k in p.out_keys:
                    assert model.graph.nodes[k].output_shape.is_tensor

    def test_balanced_by_cost(self, tiny_model):
        model, _, _ = tiny_model
        plans = plan_stages(model, 3)
        total = sum(p.cost for p in plans)
        # no stage should hold almost everything
        assert max(p.cost for p in plans) < 0.75 * total

    def test_too_many_stages_rejected(self, tiny_model):
        model, _, _ = tiny_model
        with pytest.raises(ValueError, match="no .*-stage split"):
            plan_stages(model, 400)


SPD_STEM_CFG = """
[net]
width=64
height=64
channels=3

[convolutional]
batch_normalize=1
filters=16
size=3
stride=1
pad=1
activation=mish

[convolutional]
batch_normalize=1
filters=32
size=3
stride=2
pad=1
activation=mish

[convolutional]
batch_normalize=1
filters=32
size=3
stride=2
pad=1
activation=leaky

[convolutional]
size=1
stride=1
pad=1
filters=12
activation=linear

[yolo]
mask=0,1
anchors=10,14, 23,27
classes=1
num=2
"""


class TestForward:
    def test_spd_stem_stays_active_inside_stage_0(self, tmp_path):
        """A pipeline stage holding the whole space-to-depth stem trio
        keeps the rewrite (builder skips it only when the trio is split)."""
        p = tmp_path / "spd.cfg"
        p.write_text(SPD_STEM_CFG)
        model = YoloModel(load_darknet_graph(str(p)))
        assert model._spd_pair is not None, "cfg should trigger the rewrite"
        params, state = model.init(jax.random.PRNGKey(0))
        x = np.asarray(
            jax.random.uniform(jax.random.PRNGKey(4), (2, 3, 64, 64)),
            np.float32)
        ref, _ = model.apply(params, state, x)
        pp = PipelineModel(model, 2)
        assert set(model._spd_pair) <= set(pp.stages[0].keys)
        out, _ = pp.apply(pp.split_params(params), pp.split_state(state), x)
        np.testing.assert_allclose(
            np.asarray(out.cycxhw), np.asarray(ref.cycxhw), rtol=0,
            atol=1e-6)

    def test_matches_single_device(self, tiny_model):
        model, params, state = tiny_model
        x = np.asarray(
            jax.random.uniform(jax.random.PRNGKey(1), (2, 3, 96, 96)),
            np.float32)
        ref, _ = model.apply(params, state, x)

        for n in (2, 4):
            pp = PipelineModel(model, n)
            ps = pp.split_params(params)
            ss = pp.split_state(state)
            out, _ = pp.apply(ps, ss, x)
            np.testing.assert_allclose(
                np.asarray(out.cycxhw), np.asarray(ref.cycxhw),
                rtol=0, atol=2e-6)
            np.testing.assert_allclose(
                np.asarray(out.class_logit), np.asarray(ref.class_logit),
                rtol=0, atol=2e-5)

    def test_params_live_on_their_stage_device(self, tiny_model):
        model, params, state = tiny_model
        pp = PipelineModel(model, 3)
        ps = pp.split_params(params)
        for s, sub in enumerate(ps):
            leaves = jax.tree_util.tree_leaves(sub)
            assert leaves, f"stage {s} has no parameters"
            for leaf in leaves:
                assert leaf.devices() == {pp.devices[s]}
        # split/merge round-trips the standard layout
        merged = pp.merge_params(ps)
        assert set(merged) == set(params)
        for k in params:
            jax.tree_util.tree_map(
                lambda a, b: np.testing.assert_array_equal(
                    np.asarray(a), np.asarray(b)),
                params[k], merged[k])

    def test_gpipe_step_matches_accumulation_step(self, tiny_model):
        """The full pipelined optimizer step == make_train_step(accum=M)."""
        from yolodl_tpu.parallel.pipeline import PipelineTrainStep
        from yolodl_tpu.train.loop import (
            TrainConfig, TrainState, make_optimizer, make_train_step,
        )
        from tests.test_loss import pad_targets

        model, params, state = tiny_model
        # SGD for exact comparison: Adam's sqrt(v)+eps normalization
        # amplifies recompute-fusion float noise on near-zero grads (same
        # convention as the spatial-sharding train parity test)
        config = TrainConfig(optimizer="sgd", momentum=0.9)
        images = np.asarray(
            jax.random.uniform(jax.random.PRNGKey(3), (4, 3, 96, 96)),
            np.float32)
        boxes, classes, mask = pad_targets([
            [(0.5, 0.5, 0.3, 0.3, 0)],
            [(0.3, 0.6, 0.2, 0.4, 1)],
            [(0.7, 0.2, 0.25, 0.2, 2)],
            [(0.4, 0.4, 0.5, 0.5, 0)],
        ])

        optimizer = make_optimizer(config)
        # the reference step donates its buffers — give it copies so the
        # module-scoped fixture params stay alive for later tests
        params_ref = jax.tree_util.tree_map(jnp.array, params)
        state_ref = jax.tree_util.tree_map(jnp.array, state)
        ts = TrainState(params_ref, state_ref, optimizer.init(params_ref),
                        jnp.zeros((), jnp.int32), None)
        step = make_train_step(model, optimizer, config, accum=2)

        pp = PipelineModel(model, 3)
        pts = PipelineTrainStep(pp, config, n_micro=2)
        ps, ss = pp.split_params(params), pp.split_state(state)
        opts = pts.init_opt(ps)

        for it in range(2):  # two steps: optimizer state must thread too
            # pipeline first: the reference step donates (and deletes) its
            # input buffers, which stage 0 initially shares
            ps, ss, opts, metrics = pts(ps, ss, opts, images, boxes,
                                        classes, mask)
            ts, ref_metrics = step(ts, images, boxes, classes, mask)
            assert float(metrics["total_loss"]) == pytest.approx(
                float(ref_metrics["total_loss"]), abs=1e-5)
            assert int(metrics["num_matched"]) == int(
                ref_metrics["num_matched"])

        merged = pp.merge_params(ps)
        ref_params = jax.device_get(ts.params)
        for name in ref_params:
            jax.tree_util.tree_map(
                lambda a, b: np.testing.assert_allclose(
                    np.asarray(a), np.asarray(b), rtol=0, atol=3e-6),
                ref_params[name], merged[name])
        merged_state = pp.merge_state(ss)
        ref_state = jax.device_get(ts.state)
        for name in ref_state:
            jax.tree_util.tree_map(
                lambda a, b: np.testing.assert_allclose(
                    np.asarray(a), np.asarray(b), rtol=0, atol=1e-5),
                ref_state[name], merged_state[name])

    def test_pp_dp_composition(self, tiny_model):
        """dp>1: each stage owns a device GROUP; params replicate within
        the group, the microbatch shards over it via GSPMD.  Forward and
        the GPipe step match the single-device references exactly."""
        from yolodl_tpu.parallel.pipeline import PipelineTrainStep
        from yolodl_tpu.train.loop import (
            TrainConfig, TrainState, make_optimizer, make_train_step,
        )
        from tests.test_loss import pad_targets

        model, params, state = tiny_model
        pp = PipelineModel(model, 2, dp=2)
        assert [len(g) for g in pp.groups] == [2, 2]
        ps, ss = pp.split_params(params), pp.split_state(state)
        for s, sub in enumerate(ps):
            for leaf in jax.tree_util.tree_leaves(sub):
                assert leaf.devices() == set(pp.groups[s])

        x = np.asarray(
            jax.random.uniform(jax.random.PRNGKey(5), (4, 3, 96, 96)),
            np.float32)
        ref, _ = model.apply(params, state, x)
        out, _ = pp.apply(ps, ss, x)
        np.testing.assert_allclose(
            np.asarray(out.cycxhw), np.asarray(ref.cycxhw), rtol=0,
            atol=2e-6)

        config = TrainConfig(optimizer="sgd", momentum=0.9)
        boxes, classes, mask = pad_targets(
            [[(0.5, 0.5, 0.3, 0.3, 0)]] * 4)
        optimizer = make_optimizer(config)
        params_ref = jax.tree_util.tree_map(jnp.array, params)
        state_ref = jax.tree_util.tree_map(jnp.array, state)
        ts = TrainState(params_ref, state_ref, optimizer.init(params_ref),
                        jnp.zeros((), jnp.int32), None)
        step = make_train_step(model, optimizer, config, accum=2)

        pts = PipelineTrainStep(pp, config, n_micro=2)
        opts = pts.init_opt(ps)
        ps, ss, opts, metrics = pts(ps, ss, opts, x, boxes, classes, mask)
        ts, ref_metrics = step(ts, x, boxes, classes, mask)
        assert float(metrics["total_loss"]) == pytest.approx(
            float(ref_metrics["total_loss"]), abs=1e-5)
        merged = pp.merge_params(ps)
        ref_params = jax.device_get(ts.params)
        for name in ref_params:
            jax.tree_util.tree_map(
                lambda a, b: np.testing.assert_allclose(
                    np.asarray(a), np.asarray(b), rtol=0, atol=3e-6),
                ref_params[name], merged[name])

    def test_opt_state_split_merge_roundtrip(self, tiny_model):
        """The structural optax-state split: node-name-keyed dicts filter
        per stage, scalar leaves (Adam count) replicate; merge restores
        the exact single-device layout for both adam and sgd chains."""
        import optax

        from yolodl_tpu.train.loop import TrainConfig, make_optimizer

        model, params, state = tiny_model
        pp = PipelineModel(model, 3)
        for opt_name in ("adam", "sgd"):
            opt = make_optimizer(TrainConfig(optimizer=opt_name,
                                             clip_grad_value=1.0))
            full = opt.init(params)
            parts = pp.split_opt_state(full)
            # each stage's mu/nu/trace dicts hold only its node names
            names_by_stage = [set(n) for n in pp._names]
            for s, part in enumerate(parts):
                for leaf_dict in jax.tree_util.tree_leaves(
                        part, is_leaf=lambda x: isinstance(x, dict)
                        and x and set(x) <= pp._all_names()):
                    if isinstance(leaf_dict, dict):
                        assert set(leaf_dict) <= names_by_stage[s]
            merged = pp.merge_opt_state(parts)
            ref_flat, ref_tree = jax.tree_util.tree_flatten(
                jax.device_get(full))
            got_flat, got_tree = jax.tree_util.tree_flatten(merged)
            assert ref_tree == got_tree
            for a, b in zip(ref_flat, got_flat):
                np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_rejects_unsupported_knobs(self, tiny_model):
        from yolodl_tpu.parallel.pipeline import PipelineTrainStep
        from yolodl_tpu.train.loop import TrainConfig

        model, params, state = tiny_model
        pp = PipelineModel(model, 2)
        with pytest.raises(ValueError, match="clip_grad_norm"):
            PipelineTrainStep(pp, TrainConfig(clip_grad_norm=1.0), 2)
        with pytest.raises(ValueError, match="EMA"):
            PipelineTrainStep(pp, TrainConfig(use_ema=True), 2)

    def test_train_mode_threads_bn_state(self, tiny_model):
        model, params, state = tiny_model
        x = np.asarray(
            jax.random.uniform(jax.random.PRNGKey(2), (2, 3, 96, 96)),
            np.float32)
        _, ref_state = model.apply(params, state, x, train=True)

        pp = PipelineModel(model, 2)
        ps, ss = pp.split_params(params), pp.split_state(state)
        _, new_states = pp.apply(ps, ss, x, train=True)
        merged = pp.merge_state(new_states)
        ref_state = jax.device_get(ref_state)
        for name, sub in ref_state.items():
            got = merged[name]
            jax.tree_util.tree_map(
                lambda a, b: np.testing.assert_allclose(
                    np.asarray(a), np.asarray(b), rtol=0, atol=1e-6),
                sub, got)
