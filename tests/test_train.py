"""Training loop, LR schedule, checkpoint, EMA, and multi-device DP tests."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from yolodl_tpu.config import newslab
from yolodl_tpu.graph import Graph
from yolodl_tpu.models import YoloModel
from yolodl_tpu.parallel import make_dp_train_step, make_mesh, shard_batch
from yolodl_tpu.parallel.dp import replicate_state
from yolodl_tpu.train import (
    LrScheduleConfig,
    TrainConfig,
    load_checkpoint,
    load_recent_checkpoint,
    lr_at_step,
    make_schedule_fn,
    make_train_step,
    save_checkpoint,
    train_init,
)
from yolodl_tpu.train.checkpoint import find_recent_checkpoint


def tiny_model(size=32, classes=2, bn=True):
    """A minimal single-head model for train-step tests."""
    bn_cfg = {"enabled": bn}
    model_dict = {
        "main_group": "m",
        "groups": {
            "m": [
                {"name": "input", "kind": "Input", "shape": ["_", 3, size, size]},
                {"kind": "ConvBn2D", "c": 8, "k": 3, "s": 2, "bn": bn_cfg},
                {"kind": "ConvBn2D", "c": 16, "k": 3, "s": 2, "bn": bn_cfg},
                {"name": "head", "kind": "ConvBn2D", "c": (5 + classes) * 1, "k": 1,
                 "act": "linear", "bn": {"enabled": False}},
                {"name": "det", "kind": "Detect2D", "classes": classes,
                 "anchors": [[0.3, 0.3]]},
                {"name": "output", "kind": "MergeDetect2D", "from": ["det"]},
            ]
        },
    }
    return YoloModel(Graph.from_model(newslab.parse_model_dict(model_dict)))


def fake_batch(rng, batch=2, size=32, max_gt=4):
    images = jnp.asarray(rng.normal(size=(batch, 3, size, size)), jnp.float32)
    boxes = np.zeros((batch, max_gt, 4), np.float32)
    classes = np.zeros((batch, max_gt), np.int32)
    mask = np.zeros((batch, max_gt), bool)
    for b in range(batch):
        boxes[b, 0] = (0.5, 0.5, 0.3, 0.3)
        classes[b, 0] = b % 2
        mask[b, 0] = True
    return images, jnp.asarray(boxes), jnp.asarray(classes), jnp.asarray(mask)


class TestLrSchedule:
    def test_constant(self):
        cfg = LrScheduleConfig(kind="constant", lr=0.01)
        assert lr_at_step(cfg, 0) == 0.01
        assert float(make_schedule_fn(cfg)(jnp.int32(100))) == pytest.approx(0.01)

    def test_stepwise_parity(self):
        # mirrors lr_schedule.rs semantics incl. set_step binary search
        cfg = LrScheduleConfig(
            kind="stepwise", steps=((0, 0.1), (10, 0.01), (20, 0.001))
        )
        expect = {0: 0.1, 5: 0.1, 9: 0.1, 10: 0.01, 15: 0.01, 20: 0.001, 99: 0.001}
        fn = make_schedule_fn(cfg)
        for step, lr in expect.items():
            assert lr_at_step(cfg, step) == pytest.approx(lr), step
            assert float(fn(jnp.int32(step))) == pytest.approx(lr), step

    def test_stepwise_validation(self):
        with pytest.raises(ValueError, match="start from zero"):
            LrScheduleConfig(kind="stepwise", steps=((5, 0.1),))
        with pytest.raises(ValueError, match="monotonic"):
            LrScheduleConfig(kind="stepwise", steps=((0, 0.1), (0, 0.2)))

    def test_darknet_policy(self):
        cfg = LrScheduleConfig(
            kind="darknet", lr=0.1, burn_in=100, darknet_steps=(1000, 2000),
            darknet_scales=(0.1, 0.1),
        )
        assert lr_at_step(cfg, 0) == 0.0
        assert lr_at_step(cfg, 50) == pytest.approx(0.1 * 0.5**4)
        assert lr_at_step(cfg, 500) == pytest.approx(0.1)
        assert lr_at_step(cfg, 1500) == pytest.approx(0.01)
        assert lr_at_step(cfg, 2500) == pytest.approx(0.001, rel=1e-5)
        fn = make_schedule_fn(cfg)
        assert float(fn(jnp.int32(1500))) == pytest.approx(0.01, rel=1e-5)

    def test_parse_json_form(self):
        cfg = LrScheduleConfig.parse({"type": "StepWise", "steps": [[0, 0.1], [5, 0.01]]})
        assert cfg.kind == "stepwise" and cfg.steps == ((0, 0.1), (5, 0.01))

    def test_darknet_policy_family_matches_network_c(self):
        """Hand-computed values from get_current_rate
        (darknet-test/darknet/src/network.c:131-176) for every policy;
        host lr_at_step and the traceable schedule must both match."""
        import math

        lm = 1e-5
        cases = [
            (LrScheduleConfig(kind="darknet", lr=0.01, policy="poly",
                              max_batches=1000, burn_in=100),
             [(50, 0.01 * (50 / 100) ** 4),
              (500, 0.01 * 0.5 ** 4),
              (1000, 0.0)]),
            (LrScheduleConfig(kind="darknet", lr=0.1, policy="step",
                              step_size=100, step_scale=0.5),
             [(0, 0.1), (250, 0.1 * 0.5 ** 2)]),
            (LrScheduleConfig(kind="darknet", lr=0.1, policy="exp",
                              gamma=0.999),
             [(100, 0.1 * 0.999 ** 100)]),
            (LrScheduleConfig(kind="darknet", lr=0.1, policy="sig",
                              gamma=0.1, step_size=200),
             [(150, 0.1 / (1 + math.exp(0.1 * (150 - 200))))]),
            (LrScheduleConfig(kind="darknet", lr=0.1, policy="sgdr",
                              sgdr_cycle=100, sgdr_mult=2, lr_min=lm),
             [(0, lm + 0.5 * (0.1 - lm) * 2),          # cos(0)
              (100, lm),                                # cos(pi)
              # 2nd cycle: last=100, cycle=200 -> (250-100)*pi/200
              (250, lm + 0.5 * (0.1 - lm)
               * (1 + math.cos(150 * math.pi / 200)))]),
            (LrScheduleConfig(kind="darknet", lr=0.2, policy="constant"),
             [(123, 0.2)]),
        ]
        for cfg, points in cases:
            fn = make_schedule_fn(cfg)
            for step, want in points:
                assert lr_at_step(cfg, step) == pytest.approx(
                    want, rel=1e-6, abs=1e-12), (cfg.policy, step)
                assert float(fn(jnp.int32(step))) == pytest.approx(
                    want, rel=1e-4, abs=1e-9), (cfg.policy, step)

    def test_from_darknet_net(self):
        from yolodl_tpu.config import darknet_cfg as dk
        from yolodl_tpu.train.lr_schedule import lr_schedule_from_darknet

        text = """[net]
height=32
width=32
channels=3
learning_rate=0.002
burn_in=50
max_batches=4000
policy=poly
power=3
"""
        net = dk.Darknet.from_str(text + "\n[convolutional]\nfilters=1\nsize=1\n")
        cfg = lr_schedule_from_darknet(net.net)
        assert cfg.policy == "poly" and cfg.burn_in_power == 3.0
        assert lr_at_step(cfg, 2000) == pytest.approx(0.002 * 0.5 ** 3)
        # policy params survive the cfg round trip
        net2 = dk.Darknet.from_str(dk.to_cfg_string(net))
        assert net2.net.power == 3.0 and net2.net.policy == "poly"

        bad = dk.Darknet.from_str(text.replace("policy=poly", "policy=random")
                               + "\n[convolutional]\nfilters=1\nsize=1\n")
        with pytest.raises(ValueError, match="random"):
            lr_schedule_from_darknet(bad.net)


class TestTrainStep:
    def test_loss_decreases(self, rng):
        model = tiny_model()
        config = TrainConfig(lr=LrScheduleConfig(kind="constant", lr=5e-3))
        ts, opt = train_init(model, config, seed=0)
        step_fn = make_train_step(model, opt, config)
        batch = fake_batch(rng)

        first = None
        for i in range(12):
            ts, metrics = step_fn(ts, *batch)
            if first is None:
                first = float(metrics["total_loss"])
        last = float(metrics["total_loss"])
        assert int(ts.step) == 12
        assert np.isfinite(last)
        assert last < first, f"{last} !< {first}"

    def test_accum_matches_sequential_micro_batches(self, rng):
        """Gradient accumulation (accum=2) must equal averaging the two
        micro-batch gradients computed sequentially with BN state threaded
        through — darknet's batch/subdivisions semantics."""
        from yolodl_tpu.train.loop import make_batch_grads

        model = tiny_model()
        config = TrainConfig(lr=LrScheduleConfig(kind="constant", lr=5e-3))
        ts, _ = train_init(model, config, seed=0)
        images, boxes, classes, mask = fake_batch(rng, batch=4)

        one = jax.jit(make_batch_grads(model, config))
        acc = jax.jit(make_batch_grads(model, config, accum=2))

        g_acc, st_acc, m_acc = acc(ts.params, ts.state, images, boxes,
                                   classes, mask)
        g1, st1, m1 = one(ts.params, ts.state, images[:2], boxes[:2],
                          classes[:2], mask[:2])
        g2, st2, m2 = one(ts.params, st1, images[2:], boxes[2:],
                          classes[2:], mask[2:])

        expect = jax.tree_util.tree_map(lambda a, b: (a + b) / 2, g1, g2)
        for a, b in zip(jax.tree_util.tree_leaves(g_acc),
                        jax.tree_util.tree_leaves(expect)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=1e-6, rtol=1e-5)
        # BN running stats = the second sequential micro-batch's state
        for a, b in zip(jax.tree_util.tree_leaves(st_acc),
                        jax.tree_util.tree_leaves(st2)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=1e-6, rtol=1e-5)
        # losses are micro-batch means; num_matched sums over the batch
        np.testing.assert_allclose(
            float(m_acc["total_loss"]),
            (float(m1["total_loss"]) + float(m2["total_loss"])) / 2, rtol=1e-5)
        assert int(m_acc["num_matched"]) == \
            int(m1["num_matched"]) + int(m2["num_matched"])

    def test_accum_step_trains(self, rng):
        model = tiny_model()
        config = TrainConfig(lr=LrScheduleConfig(kind="constant", lr=5e-3))
        ts, opt = train_init(model, config, seed=0)
        step_fn = make_train_step(model, opt, config, accum=2)
        batch = fake_batch(rng, batch=4)
        first = None
        for _ in range(10):
            ts, metrics = step_fn(ts, *batch)
            if first is None:
                first = float(metrics["total_loss"])
        assert int(ts.step) == 10  # one optimizer step per logical batch
        assert float(metrics["total_loss"]) < first

    def test_accum_rejects_indivisible_batch(self, rng):
        model = tiny_model()
        config = TrainConfig()
        ts, opt = train_init(model, config)
        step_fn = make_train_step(model, opt, config, accum=3)
        with pytest.raises(ValueError, match="not divisible"):
            step_fn(ts, *fake_batch(rng, batch=4))

    def test_ema_tracks_params(self, rng):
        model = tiny_model()
        config = TrainConfig(use_ema=True, ema_decay=0.5,
                             lr=LrScheduleConfig(kind="constant", lr=1e-2))
        ts, opt = train_init(model, config)
        step_fn = make_train_step(model, opt, config)
        batch = fake_batch(rng)
        assert ts.ema_params is not None
        ts, _ = step_fn(ts, *batch)
        diff = jax.tree_util.tree_map(
            lambda e, p: float(jnp.abs(e - p).max()), ts.ema_params, ts.params
        )
        assert max(jax.tree_util.tree_leaves(diff)) > 0  # EMA lags params

    def test_grad_clipping_runs(self, rng):
        model = tiny_model()
        config = TrainConfig(clip_grad_norm=1.0)
        ts, opt = train_init(model, config)
        step_fn = make_train_step(model, opt, config)
        ts, metrics = step_fn(ts, *fake_batch(rng))
        assert np.isfinite(float(metrics["total_loss"]))


class TestCheckpoint:
    def test_roundtrip(self, rng, tmp_path):
        model = tiny_model()
        config = TrainConfig()
        ts, opt = train_init(model, config)
        path = save_checkpoint(
            str(tmp_path), step=7, loss=1.23456, params=ts.params,
            state=ts.state, opt_state=ts.opt_state,
        )
        assert os.path.basename(path).endswith("_000007_01.23456.ckpt")
        p2, s2, o2, meta = load_checkpoint(path, ts.params, ts.state, ts.opt_state)
        assert meta["step"] == 7
        for a, b in zip(jax.tree_util.tree_leaves(ts.params), jax.tree_util.tree_leaves(p2)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        assert o2 is not None

    def test_from_recent_picks_newest(self, tmp_path):
        model = tiny_model()
        ts, _ = train_init(model, TrainConfig())
        # forge two checkpoints with distinct timestamps
        a = save_checkpoint(str(tmp_path), 1, 9.0, ts.params, ts.state)
        newer = os.path.join(
            str(tmp_path), "2099-01-01-00-00-00_000002_08.00000.ckpt"
        )
        os.rename(a, newer)
        b = save_checkpoint(str(tmp_path), 3, 7.0, ts.params, ts.state)
        assert find_recent_checkpoint(str(tmp_path)) == newer

    def test_missing_dir_returns_none(self, tmp_path):
        model = tiny_model()
        ts, _ = train_init(model, TrainConfig())
        assert load_recent_checkpoint(
            str(tmp_path / "nope"), ts.params, ts.state
        ) is None

    def test_shape_mismatch_rejected(self, rng, tmp_path):
        model = tiny_model()
        ts, _ = train_init(model, TrainConfig())
        path = save_checkpoint(str(tmp_path), 1, 1.0, ts.params, ts.state)
        other = tiny_model(classes=1)  # head shape differs
        ts2, _ = train_init(other, TrainConfig())
        with pytest.raises((ValueError, KeyError)):
            load_checkpoint(path, ts2.params, ts2.state)


class TestDataParallel:
    def test_dp_step_matches_single_device(self, rng, devices8):
        """DP over 8 virtual devices must exactly track single-device for a
        BN-free model (with BN, per-shard batch statistics legitimately
        diverge from global-batch statistics — same as the reference)."""
        model = tiny_model(bn=False)
        config = TrainConfig(lr=LrScheduleConfig(kind="constant", lr=1e-3))
        ts, opt = train_init(model, config, seed=0)
        batch = fake_batch(rng, batch=8)

        single_fn = make_train_step(model, opt, config)
        ts_single = jax.tree_util.tree_map(jnp.copy, ts)
        ts_single, m_single = single_fn(ts_single, *batch)

        mesh = make_mesh(8)
        dp_fn = make_dp_train_step(model, opt, config, mesh)
        ts_dp = replicate_state(mesh, jax.tree_util.tree_map(jnp.copy, ts))
        sharded = shard_batch(mesh, batch)
        ts_dp, m_dp = dp_fn(ts_dp, *sharded)

        # loss metrics identical (same global batch, mean-reduced)
        np.testing.assert_allclose(
            float(m_single["objectness_loss"]), float(m_dp["objectness_loss"]), rtol=2e-4
        )
        # parameters stay in sync between the two paths
        for a, b in zip(
            jax.tree_util.tree_leaves(ts_single.params),
            jax.tree_util.tree_leaves(ts_dp.params),
        ):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-5)

    def test_dp_accum_matches_single_accum(self, rng, devices8):
        """DP composed with gradient accumulation (each shard split into 2
        sequential micro-batches) tracks the single-device accumulated step
        on a BN-free model."""
        model = tiny_model(bn=False)
        config = TrainConfig(lr=LrScheduleConfig(kind="constant", lr=1e-3))
        ts, opt = train_init(model, config, seed=0)
        batch = fake_batch(rng, batch=16)

        single_fn = make_train_step(model, opt, config, accum=2)
        ts_single = jax.tree_util.tree_map(jnp.copy, ts)
        ts_single, m_single = single_fn(ts_single, *batch)

        mesh = make_mesh(8)
        dp_fn = make_dp_train_step(model, opt, config, mesh, accum=2)
        ts_dp = replicate_state(mesh, jax.tree_util.tree_map(jnp.copy, ts))
        ts_dp, m_dp = dp_fn(ts_dp, *shard_batch(mesh, batch))

        np.testing.assert_allclose(
            float(m_single["total_loss"]), float(m_dp["total_loss"]), rtol=2e-4)
        # Rect4 matching assigns up to 3 cells per GT — just require the two
        # paths to count identically over the same global batch
        assert int(m_dp["num_matched"]) == int(m_single["num_matched"]) > 0
        for a, b in zip(jax.tree_util.tree_leaves(ts_single.params),
                        jax.tree_util.tree_leaves(ts_dp.params)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-5)

    def test_zero1_matches_dp(self, rng, devices8):
        """ZeRO-1 (reduce_scatter grads → shard-local Adam → all_gather
        params) must track plain DP: the elementwise optimizer on a slice
        equals the optimizer on the full vector."""
        from yolodl_tpu.parallel import (
            make_zero_train_step, place_zero_state, zero_init,
        )

        model = tiny_model(bn=False)
        config = TrainConfig(lr=LrScheduleConfig(kind="constant", lr=1e-3))
        batch = fake_batch(rng, batch=8)
        mesh = make_mesh(8)

        ts_dp, opt = train_init(model, config, seed=0)
        dp_fn = make_dp_train_step(model, opt, config, mesh)
        ts_dp = replicate_state(mesh, ts_dp)

        ts_z, opt_z = zero_init(model, config, mesh, seed=0)
        # optimizer state per shard: Adam mu/nu leaves are 1/8 of the params
        n_params = sum(int(np.size(l))
                       for l in jax.tree_util.tree_leaves(ts_z.params))
        vec_leaves = [l for l in jax.tree_util.tree_leaves(ts_z.opt_state)
                      if getattr(l, "ndim", 0)]
        assert all(l.shape[0] % 8 == 0 for l in vec_leaves)
        assert all(l.shape[0] >= n_params for l in vec_leaves)
        z_fn = make_zero_train_step(model, opt_z, config, mesh)
        ts_z = place_zero_state(mesh, ts_z)

        sharded = shard_batch(mesh, batch)
        for _ in range(3):
            ts_dp, m_dp = dp_fn(ts_dp, *sharded)
            ts_z, m_z = z_fn(ts_z, *sharded)

        np.testing.assert_allclose(
            float(m_dp["total_loss"]), float(m_z["total_loss"]), rtol=1e-5)
        for a, b in zip(jax.tree_util.tree_leaves(ts_dp.params),
                        jax.tree_util.tree_leaves(ts_z.params)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=1e-6)
        assert int(ts_z.step) == 3

    def test_zero1_rejects_global_norm_clip(self):
        from yolodl_tpu.parallel import zero_init

        model = tiny_model(bn=False)
        config = TrainConfig(clip_grad_norm=1.0)
        mesh = make_mesh(8)
        with pytest.raises(ValueError, match="global gradient norm"):
            zero_init(model, config, mesh)

    def test_dp_multiple_steps_stable(self, rng, devices8):
        model = tiny_model()
        config = TrainConfig()
        ts, opt = train_init(model, config)
        mesh = make_mesh(8)
        dp_fn = make_dp_train_step(model, opt, config, mesh)
        ts = replicate_state(mesh, ts)
        batch = shard_batch(mesh, fake_batch(rng, batch=8))
        for _ in range(3):
            ts, metrics = dp_fn(ts, *batch)
        assert np.isfinite(float(metrics["total_loss"]))
        assert int(ts.step) == 3


class TestCheckpointExtras:
    def test_ema_roundtrip(self, tmp_path):
        from yolodl_tpu.train.checkpoint import load_checkpoint, save_checkpoint

        model = tiny_model()
        ts, _ = train_init(model, TrainConfig(use_ema=True))
        path = save_checkpoint(str(tmp_path), 1, 1.0, ts.params, ts.state,
                               ts.opt_state, ema_params=ts.ema_params)
        _, _, _, meta = load_checkpoint(path, ts.params, ts.state, ts.opt_state)
        assert meta["has_ema"]
        for a, b in zip(jax.tree_util.tree_leaves(ts.ema_params),
                        jax.tree_util.tree_leaves(meta["ema"])):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_partial_load_skips_mismatches(self, tmp_path):
        from yolodl_tpu.train.checkpoint import load_checkpoint_partial, save_checkpoint

        donor = tiny_model(classes=2)
        ts, _ = train_init(donor, TrainConfig())
        path = save_checkpoint(str(tmp_path), 1, 1.0, ts.params, ts.state)

        target = tiny_model(classes=1)  # head shape differs
        ts2, _ = train_init(target, TrainConfig())
        params, state, meta, skipped = load_checkpoint_partial(
            path, ts2.params, ts2.state
        )
        assert any("head" in k for k in skipped)  # mismatched head kept fresh
        # backbone convs transferred
        name = next(n for n in params if n.startswith("node"))
        donor_leaf = np.asarray(jax.tree_util.tree_leaves(ts.params[name])[0])
        loaded_leaf = np.asarray(jax.tree_util.tree_leaves(params[name])[0])
        np.testing.assert_array_equal(donor_leaf, loaded_leaf)

    def test_async_checkpointer_roundtrip(self, tmp_path):
        from yolodl_tpu.train.checkpoint import (
            AsyncCheckpointer, find_recent_checkpoint, load_checkpoint,
        )

        model = tiny_model()
        ts, _ = train_init(model, TrainConfig())
        saver = AsyncCheckpointer()
        saver.save(str(tmp_path), 1, 2.0, ts.params, ts.state, ts.opt_state)
        saver.save(str(tmp_path), 2, 1.0, ts.params, ts.state, ts.opt_state)
        saver.flush()
        path = find_recent_checkpoint(str(tmp_path))
        assert path is not None and "_000002_" in path
        p2, _, o2, meta = load_checkpoint(path, ts.params, ts.state,
                                          ts.opt_state)
        assert meta["step"] == 2 and o2 is not None
        for a, b in zip(jax.tree_util.tree_leaves(ts.params),
                        jax.tree_util.tree_leaves(p2)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_async_checkpointer_surfaces_write_failure(self, tmp_path):
        """flush() re-raises a failed background write — the preemption path
        must not report success on a checkpoint that never hit disk."""
        import pytest

        from yolodl_tpu.train.checkpoint import AsyncCheckpointer

        model = tiny_model()
        ts, _ = train_init(model, TrainConfig())
        bad_dir = tmp_path / "file-not-dir"
        bad_dir.write_text("occupied")  # makedirs will fail
        saver = AsyncCheckpointer()
        saver.save(str(bad_dir), 1, 1.0, ts.params, ts.state)
        with pytest.raises(RuntimeError, match="checkpoint write failed"):
            saver.flush()
        # the checkpointer recovers: next save/flush works
        saver.save(str(tmp_path), 2, 1.0, ts.params, ts.state)
        saver.flush()


class TestSgdOptimizer:
    def test_sgd_trains(self, rng):
        model = tiny_model()
        config = TrainConfig(optimizer="sgd", momentum=0.9,
                             lr=LrScheduleConfig(kind="constant", lr=1e-2))
        ts, opt = train_init(model, config)
        step_fn = make_train_step(model, opt, config)
        batch = fake_batch(rng)
        first = None
        for _ in range(10):
            ts, metrics = step_fn(ts, *batch)
            if first is None:
                first = float(metrics["total_loss"])
        assert float(metrics["total_loss"]) < first

    def test_unknown_optimizer_rejected(self):
        from yolodl_tpu.train.loop import make_optimizer

        with pytest.raises(ValueError, match="unknown optimizer"):
            make_optimizer(TrainConfig(optimizer="nope"))


class TestDataParallelRealModel:
    @pytest.mark.slow
    def test_yolov4_tiny_dp_step_on_mesh(self, rng, devices8):
        """Full darknet yolov4-tiny graph (routes, groups, maxpools, two
        heads) trains one DP step over 8 virtual devices at 128px."""
        import os as _os

        from yolodl_tpu.config import darknet_cfg as dk
        from yolodl_tpu.graph.from_darknet import graph_from_darknet

        repo = _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__)))
        cfg_path = _os.path.join(repo, "cfg/darknet/yolov4-tiny.cfg")
        text = open(cfg_path).read().replace("width=416", "width=128").replace(
            "height=416", "height=128"
        )
        small = _os.path.join(str(devices8 and "/tmp"), "tiny128_dp.cfg")
        with open(small, "w") as f:
            f.write(text)

        model = YoloModel(graph_from_darknet(dk.Darknet.load(small)))
        config = TrainConfig()
        ts, opt = train_init(model, config, seed=0)
        mesh = make_mesh(8)
        dp_fn = make_dp_train_step(model, opt, config, mesh)
        ts = replicate_state(mesh, ts)

        batch = 8
        images = jnp.asarray(rng.normal(size=(batch, 3, 128, 128)), jnp.float32)
        boxes = np.zeros((batch, 4, 4), np.float32)
        boxes[:, 0] = (0.5, 0.5, 0.4, 0.4)
        classes = np.zeros((batch, 4), np.int32)
        mask = np.zeros((batch, 4), bool)
        mask[:, 0] = True
        sharded = shard_batch(mesh, (images, jnp.asarray(boxes),
                                     jnp.asarray(classes), jnp.asarray(mask)))
        for _ in range(2):
            ts, metrics = dp_fn(ts, *sharded)
        assert np.isfinite(float(metrics["total_loss"]))
        assert int(ts.step) == 2
        # params remain replicated and identical across devices
        leaf = jax.tree_util.tree_leaves(ts.params)[0]
        assert leaf.sharding.is_fully_replicated


class TestMultiStep:
    def test_scan_matches_sequential_steps(self, rng):
        """make_multi_step(k) must be bit-compatible with k sequential
        make_train_step calls (same params, opt state, step, metrics)."""
        from yolodl_tpu.train import make_multi_step

        model = tiny_model()
        images, boxes, classes, mask = fake_batch(rng)
        config = TrainConfig()
        k = 3

        ts_a, opt = train_init(model, config, seed=3)
        step = make_train_step(model, opt, config)
        for _ in range(k):
            ts_a, metrics_a = step(ts_a, images, boxes, classes, mask)

        ts_b, opt_b = train_init(model, config, seed=3)
        multi = make_multi_step(model, opt_b, config, k)
        stack = lambda x: jnp.broadcast_to(x, (k,) + x.shape)
        ts_b, metrics_b = multi(
            ts_b, stack(images), stack(boxes), stack(classes), stack(mask))

        assert int(ts_a.step) == int(ts_b.step) == k
        for a, b in zip(jax.tree_util.tree_leaves(ts_a.params),
                        jax.tree_util.tree_leaves(ts_b.params)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-6, atol=1e-7)
        # last scanned metric == last sequential metric
        np.testing.assert_allclose(
            float(metrics_b["total_loss"][-1]), float(metrics_a["total_loss"]),
            rtol=1e-6)


class TestClassifierStep:
    def test_ce_gradient_is_p_minus_y_on_logits(self):
        """The classifier step's CE-through-softmax must produce the darknet
        [softmax]+[cost] gradient, p − y, on the logits (softmax_layer.c
        backward is a pass-through; cost delta = truth − pred)."""
        from yolodl_tpu.config import newslab as ncfg
        from yolodl_tpu.graph.ir import _flatten
        from yolodl_tpu.models.builder import GraphModel
        from yolodl_tpu.shapes import Shape

        model_cfg = ncfg.Model(groups={"m": (
            ncfg.Input(name="input", shape=Shape(["_", 5, 1, 1])),
            ncfg.Linear(name="fc", from_="input", out=4, act="linear"),
            ncfg.Softmax(name="output", from_="fc"),
        )}, main_group="m")
        model = GraphModel(_flatten(model_cfg))
        params, state = model.init(jax.random.PRNGKey(0))

        x = jnp.asarray(np.random.default_rng(1).normal(size=(3, 5, 1, 1)),
                        jnp.float32)
        labels = jnp.asarray([0, 2, 3], jnp.int32)

        def ce(params):
            out, _ = model.apply(params, state, x, train=True)
            log_p = jnp.log(jnp.maximum(out, 1e-12))
            return -jnp.take_along_axis(log_p, labels[:, None], -1).mean()

        g = jax.grad(ce)(params)

        # numpy reference: logits = x @ w + b; dL/dlogits = (p - y)/B
        w = np.asarray(params["fc"]["w"])
        b = np.asarray(params["fc"]["b"])
        xf = np.asarray(x).reshape(3, -1)
        # NCHW→NHWC flatten order inside the model: (h, w, c) — for 1×1
        # spatial it's identical to the channel order
        logits = xf @ w + b
        p = np.exp(logits - logits.max(-1, keepdims=True))
        p /= p.sum(-1, keepdims=True)
        y = np.eye(4)[np.asarray(labels)]
        d_logits = (p - y) / 3.0
        expect_dw = xf.T @ d_logits
        np.testing.assert_allclose(np.asarray(g["fc"]["w"]), expect_dw,
                                   rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(np.asarray(g["fc"]["b"]),
                                   d_logits.sum(0), rtol=1e-5, atol=1e-6)


class TestDarknetLossImpl:
    """training.loss.impl=Darknet: the train step consumes raw head-conv
    outputs through the oracle-exact delta loss (TrainConfig.darknet_loss;
    round-4).  The delta math itself is darknet-C-pinned in
    test_parity_train_detection.py — here: the step wiring (convergence,
    value identity with the direct loss call, DP composition)."""

    # BN-free on purpose: the DP step computes BN batch statistics
    # per-shard (documented divergence, parallel/dp.py) — a BN-free model
    # makes the DP-vs-single comparison exact
    CFG = """[net]
width=64
height=64
channels=3
[convolutional]
filters=8
size=3
stride=4
pad=1
activation=leaky
[convolutional]
filters=24
size=1
activation=linear
[yolo]
mask=0,1,2
anchors=6,8, 10,14, 18,24
classes=3
num=3
iou_loss=ciou
iou_thresh=0.2
max_delta=5
ignore_thresh=0.6
"""

    def _setup(self):
        from yolodl_tpu.config import darknet_cfg as dk
        from yolodl_tpu.graph.from_darknet import graph_from_darknet
        from yolodl_tpu.loss.darknet_loss import head_params_from_darknet

        d = dk.Darknet.from_str(self.CFG)
        g = graph_from_darknet(d)
        model = YoloModel(g)
        heads = [l for l in d.layers if isinstance(l, dk.Yolo)]
        spec = (g.detect_head_input_keys(),
                tuple(head_params_from_darknet(l, 64, 64) for l in heads))
        rng = np.random.default_rng(0)
        imgs = jnp.asarray(rng.random((2, 3, 64, 64)), jnp.float32)
        gt = jnp.asarray([[[0.5, 0.5, 0.3, 0.3]], [[0.4, 0.6, 0.2, 0.2]]],
                         jnp.float32)
        gtc = jnp.zeros((2, 1), jnp.int32)
        gtm = jnp.ones((2, 1), bool)
        return model, spec, (imgs, gt, gtc, gtm)

    def test_step_trains_and_matches_direct_loss(self):
        from yolodl_tpu.loss.darknet_loss import darknet_detection_loss

        model, spec, batch = self._setup()
        cfg = TrainConfig(optimizer="sgd", momentum=0.9, darknet_loss=spec)
        ts, opt = train_init(model, cfg, seed=0)
        step = make_train_step(model, opt, cfg)
        imgs, gt, gtc, gtm = batch

        # step-0 metric == the direct loss value on the same params
        head_keys, head_params = spec
        outs, _ = model.apply(ts.params, ts.state, imgs, train=True,
                              data_format="NCHW", output_keys=head_keys)
        truth = jnp.stack([gt[..., 1], gt[..., 0], gt[..., 3], gt[..., 2],
                           gtc.astype(jnp.float32)], -1)
        direct = float(darknet_detection_loss(
            tuple(outs[k] for k in head_keys), truth, head_params))
        losses = []
        for _ in range(10):
            ts, m = step(ts, imgs, gt, gtc, gtm)
            losses.append(float(m["total_loss"]))
        assert losses[0] == pytest.approx(direct, rel=1e-6)
        assert losses[-1] < 0.25 * losses[0]  # actually training

    def test_dp_composition(self):
        """The darknet loss is per-image, so the DP step (psum'd grads)
        must match single-device on the same global batch."""
        model, spec, (imgs, gt, gtc, gtm) = self._setup()
        cfg = TrainConfig(optimizer="sgd", momentum=0.9, darknet_loss=spec)
        ts, opt = train_init(model, cfg, seed=0)
        single = make_train_step(model, opt, cfg)
        ts1, m1 = single(ts, imgs, gt, gtc, gtm)

        mesh = make_mesh(2)
        ts0, _ = train_init(model, cfg, seed=0)
        dp_step = make_dp_train_step(model, opt, cfg, mesh)
        tsr = replicate_state(mesh, ts0)
        batch = shard_batch(mesh, (imgs, gt, gtc, gtm))
        ts2, m2 = dp_step(tsr, *batch)
        # the non-MSE REPORTED cost is a ratio (iou_norm*tot/count + mag2)
        # and is not additive across shards — DP reports the mean of
        # per-shard ratios (close, not equal).  The GRADIENT is per-image
        # deltas, which pmean exactly: updated weights must match tightly.
        np.testing.assert_allclose(
            float(m1["total_loss"]), float(m2["total_loss"]), rtol=5e-3)
        w1 = np.asarray(ts1.params["layer0"]["w"])
        w2 = np.asarray(jax.device_get(ts2.params["layer0"]["w"]))
        np.testing.assert_allclose(w1, w2, atol=2e-6)

    def test_zero_composition(self, devices8):
        """ZeRO-1 × darknet loss: optimizer-state sharding is numerically
        the DP step (elementwise update on a slice == full vector), so
        updated weights must match single-device like test_dp_composition."""
        from yolodl_tpu.parallel import (make_zero_train_step,
                                         place_zero_state, zero_init)

        model, spec, (imgs, gt, gtc, gtm) = self._setup()
        cfg = TrainConfig(optimizer="sgd", momentum=0.9, darknet_loss=spec)
        ts, opt = train_init(model, cfg, seed=0)
        single = make_train_step(model, opt, cfg)
        ts1, _ = single(ts, imgs, gt, gtc, gtm)

        mesh = make_mesh(2)
        tsz, optz = zero_init(model, cfg, mesh, seed=0)
        z_step = make_zero_train_step(model, optz, cfg, mesh)
        ts2, _ = z_step(place_zero_state(mesh, tsz),
                        *shard_batch(mesh, (imgs, gt, gtc, gtm)))
        w1 = np.asarray(ts1.params["layer0"]["w"])
        w2 = np.asarray(jax.device_get(ts2.params["layer0"]["w"]))
        np.testing.assert_allclose(w1, w2, atol=2e-6)

    def test_tp_composition(self, devices8):
        """TP × darknet loss: the TP step is the single-device step under
        GSPMD (the loss is an ordinary jittable term on the channel-
        sharded head outputs — XLA all-gathers the small head tensors),
        so BOTH the reported cost and the updated weights must match
        single-device, unlike DP's per-shard cost ratio."""
        from yolodl_tpu.parallel import (make_tp_mesh, make_tp_train_step,
                                         place_tp_state, shard_batch_tp)

        model, spec, (imgs, gt, gtc, gtm) = self._setup()
        cfg = TrainConfig(optimizer="sgd", momentum=0.9, darknet_loss=spec)
        ts, opt = train_init(model, cfg, seed=0)
        single = make_train_step(model, opt, cfg)
        ts1, m1 = single(ts, imgs, gt, gtc, gtm)

        mesh = make_tp_mesh(2, 4)
        ts0, _ = train_init(model, cfg, seed=0)
        tp_step = make_tp_train_step(model, opt, cfg, mesh)
        ts2, m2 = tp_step(place_tp_state(mesh, ts0),
                          *shard_batch_tp(mesh, (imgs, gt, gtc, gtm)))
        np.testing.assert_allclose(
            float(m1["total_loss"]), float(m2["total_loss"]), rtol=1e-5)
        w1 = np.asarray(ts1.params["layer0"]["w"])
        w2 = np.asarray(jax.device_get(ts2.params["layer0"]["w"]))
        np.testing.assert_allclose(w1, w2, atol=2e-6)

    def test_metrics_variant_matches_loss_and_grads(self):
        """darknet_detection_loss_with_metrics: identical value AND
        gradient to the plain loss; per-term components sum to the
        total; telemetry stats land in sane ranges."""
        from yolodl_tpu.loss.darknet_loss import (
            darknet_detection_loss, darknet_detection_loss_with_metrics)

        model, spec, (imgs, gt, gtc, gtm) = self._setup()
        head_keys, head_params = spec
        ts, _ = train_init(
            model, TrainConfig(optimizer="sgd", darknet_loss=spec), seed=0)
        outs, _ = model.apply(ts.params, ts.state, imgs, train=True,
                              data_format="NCHW", output_keys=head_keys)
        raws = tuple(outs[k] for k in head_keys)
        truth = jnp.stack([gt[..., 1], gt[..., 0], gt[..., 3], gt[..., 2],
                           gtc.astype(jnp.float32)], -1)

        plain, g_plain = jax.value_and_grad(
            lambda r: darknet_detection_loss(r, truth, head_params))(raws)
        (withm, metrics), g_m = jax.value_and_grad(
            lambda r: darknet_detection_loss_with_metrics(
                r, truth, head_params), has_aux=True)(raws)
        assert float(plain) == pytest.approx(float(withm), rel=1e-6)
        for a, b in zip(g_plain, g_m):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

        # per-term components sum to the reported total (per-head costs
        # are normalized the same way: /(heads*batch))
        total_from_terms = (float(metrics["iou_loss"])
                            + float(metrics["objectness_loss"])
                            + float(metrics["classification_loss"]))
        assert total_from_terms == pytest.approx(float(withm), rel=1e-5)

        # darknet console stats: one truth per image → 2+ applications
        # (iou_thresh can add more); ratios in [0, 1]
        assert int(metrics["num_matched"]) >= 2
        for k in ("avg_iou", "avg_obj", "avg_cat", "recall50", "recall75",
                  "no_obj"):
            v = float(metrics[k])
            assert 0.0 <= v <= 1.0, (k, v)

    def test_metrics_in_train_step(self):
        """The CLI-visible step surfaces the per-term/telemetry keys
        (VERDICT r4 #3: the exact-loss trainer must not fly blind)."""
        model, spec, (imgs, gt, gtc, gtm) = self._setup()
        cfg = TrainConfig(optimizer="sgd", momentum=0.9, darknet_loss=spec)
        ts, opt = train_init(model, cfg, seed=0)
        step = make_train_step(model, opt, cfg)
        _, m = step(ts, imgs, gt, gtc, gtm)
        for k in ("total_loss", "iou_loss", "objectness_loss",
                  "classification_loss", "num_matched", "avg_iou",
                  "avg_obj", "avg_cat", "recall50", "recall75", "no_obj"):
            assert k in m, k
        assert float(m["iou_loss"]) + float(m["objectness_loss"]) + \
            float(m["classification_loss"]) == pytest.approx(
                float(m["total_loss"]), rel=1e-5)

    def test_metrics_through_grad_accumulation(self):
        """Gradient accumulation (lax.scan of micro-batches) aggregates
        the darknet telemetry: ratios mean over micro-batches,
        num_matched sums."""
        model, spec, (imgs, gt, gtc, gtm) = self._setup()
        cfg = TrainConfig(optimizer="sgd", momentum=0.9, darknet_loss=spec)
        ts, opt = train_init(model, cfg, seed=0)
        step = make_train_step(model, opt, cfg, accum=2)
        _, m = step(ts, imgs, gt, gtc, gtm)
        assert int(m["num_matched"]) >= 2  # summed over micro-batches
        for k in ("avg_iou", "no_obj", "recall50"):
            v = float(m[k])
            assert np.isfinite(v) and 0.0 <= v <= 1.0, (k, v)

    def test_gaussian_new_coords_rejected_at_cfg_resolution(self):
        """[Gaussian_yolo]+new_coords=1 must fail at head-params
        construction (cfg-resolution time) with a named, actionable
        error — not mid-training (VERDICT r4 missing #3)."""
        from yolodl_tpu.config import darknet_cfg as dk
        from yolodl_tpu.loss.darknet_loss import head_params_from_darknet

        layer = dk.Yolo(anchors=((6, 8), (10, 14)), mask=(0, 1),
                        classes=2, gaussian=True, new_coords=True)
        with pytest.raises(ValueError, match="new_coords"):
            head_params_from_darknet(layer, 64, 64)
