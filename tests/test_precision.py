"""training.precision (bf16 compute / f32 state) tests.

Beyond-reference capability: tch trains f32 only; here the forward/backward
conv path can run in bfloat16 (the TPU MXU's fast path — bench.py and the
real-TPU quality loops train this way) while parameters, optimizer state,
BN running stats and the loss math stay float32 (loss/yolo_loss.py upcasts
its inputs before any reduction).
"""

import json

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.slow  # e2e/CLI tier: excluded from `pytest -m 'not slow'`

from yolodl_tpu.config.app_config import (
    TrainAppConfig, compute_dtype_of, parse_precision)
from yolodl_tpu.train import TrainConfig, make_train_step, train_init

from test_train import fake_batch, tiny_model


class TestParsePrecision:
    def test_aliases(self):
        assert parse_precision("bf16", "x") == "bfloat16"
        assert parse_precision("BFloat16", "x") == "bfloat16"
        assert parse_precision("fp32", "x") == "float32"
        assert parse_precision("float32", "x") == "float32"

    def test_rejects_unknown(self):
        with pytest.raises(ValueError, match="training.precision"):
            parse_precision("float16", "x")

    def test_compute_dtype_of(self):
        # the single precision→dtype boundary every consumer routes
        # through: f32 (any alias) → None, bf16 (any alias) → "bfloat16",
        # junk → one clean ValueError (never an astype trace error)
        assert compute_dtype_of("float32") is None
        assert compute_dtype_of("fp32") is None
        assert compute_dtype_of("bfloat16") == "bfloat16"
        assert compute_dtype_of("bf16") == "bfloat16"
        with pytest.raises(ValueError, match="precision"):
            compute_dtype_of("int8")

    def test_app_config_roundtrip(self, tmp_path):
        cfg = {
            "version": "0.1.0",
            "model": {"kind": "NewslabV1", "cfg_file": "m.json5"},
            "dataset": {"kind": {
                "type": "Csv", "image_size": 32, "input_channels": 3,
                "image_dir": "d", "label_file": "l.csv",
                "classes_file": "c.txt"}},
            "logging": {"dir": "logs"},
            "training": {"batch_size": 2,
                         "device_config": {"type": "SingleDevice",
                                           "device": "tpu:0"},
                         "precision": "bfloat16"},
        }
        p = tmp_path / "train.json5"
        p.write_text(json.dumps(cfg))
        assert TrainAppConfig.load(p).precision == "bfloat16"
        cfg["training"].pop("precision")
        p.write_text(json.dumps(cfg))
        assert TrainAppConfig.load(p).precision == "float32"
        cfg["training"]["precision"] = "int8"
        p.write_text(json.dumps(cfg))
        with pytest.raises(ValueError, match="training.precision"):
            TrainAppConfig.load(p)


class TestBf16Step:
    def test_state_stays_f32_and_loss_tracks_f32(self, rng):
        model = tiny_model()
        batch = fake_batch(rng)

        cfg32 = TrainConfig(optimizer="sgd", momentum=0.0)
        ts32, opt32 = train_init(model, cfg32, seed=0)
        step32 = make_train_step(model, opt32, cfg32)
        ts32, m32 = step32(ts32, *batch)

        cfg16 = TrainConfig(optimizer="sgd", momentum=0.0,
                            compute_dtype="bfloat16")
        ts16, opt16 = train_init(model, cfg16, seed=0)
        step16 = make_train_step(model, opt16, cfg16)
        ts16, m16 = step16(ts16, *batch)

        # every param/BN-stat leaf stays f32 after a bf16 step
        for leaf in jax.tree_util.tree_leaves(ts16.params):
            assert leaf.dtype == jnp.float32
        for leaf in jax.tree_util.tree_leaves(ts16.state):
            assert leaf.dtype == jnp.float32

        l32 = float(m32["total_loss"])
        l16 = float(m16["total_loss"])
        assert np.isfinite(l16)
        # bf16 has ~3 decimal digits; the losses agree loosely, not exactly
        assert l16 == pytest.approx(l32, rel=0.05)

        # parameters actually moved (bf16 grads are non-zero)
        moved = jax.tree_util.tree_map(
            lambda a, b: float(jnp.max(jnp.abs(a - b))),
            ts16.params, train_init(model, cfg16, seed=0)[0].params)
        assert max(jax.tree_util.tree_leaves(moved)) > 0

    def test_forward_compute_is_bf16(self, rng):
        """The cast really reaches the conv path: activations come out bf16."""
        model = tiny_model()
        images = fake_batch(rng)[0].astype(jnp.bfloat16)
        params, state = model.init(jax.random.PRNGKey(0))
        pred, _ = model.apply(params, state, images, train=True)
        assert pred.cycxhw.dtype == jnp.bfloat16
