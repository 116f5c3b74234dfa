"""BN-folding export tests (models/fold.py, `yolo-tool fold-weights`).

The reference only folds BN on the live module tree (dark_batch_norm.rs
`denormalize`); the export path to a BN-free cfg+weights pair is ours.
Correctness bar: the folded model's decoded outputs match the original
to f32-rounding tolerance on a real detection net (yolov4-tiny).
"""

import os
import subprocess
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from yolodl_tpu.config import darknet_cfg as dk
from yolodl_tpu.graph.from_darknet import graph_from_darknet
from yolodl_tpu.models import YoloModel
from yolodl_tpu.models.fold import (
    fold_conv_bn_arrays,
    fold_darknet,
    fold_darknet_files,
)
from yolodl_tpu.models.weights import (
    load_darknet_weights,
    merge_into_model_tree,
    save_darknet_weights,
)
from yolodl_tpu.ops import fold_batch_norm

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_numpy_fold_matches_ops_fold_batch_norm():
    """fold_conv_bn_arrays is the file-path mirror of ops.fold_batch_norm —
    keep the two formulas in lockstep."""
    rng = np.random.default_rng(0)
    w = rng.normal(size=(3, 3, 8, 16)).astype(np.float32)
    scale = rng.uniform(0.5, 2.0, 16).astype(np.float32)
    bias = rng.normal(size=16).astype(np.float32)
    mean = rng.normal(size=16).astype(np.float32)
    var = rng.uniform(0.1, 3.0, 16).astype(np.float32)

    fw_np, fb_np = fold_conv_bn_arrays(w, scale, bias, mean, var)
    fw_ops, fb_ops = fold_batch_norm(
        {"scale": jnp.asarray(scale), "bias": jnp.asarray(bias)},
        {"mean": jnp.asarray(mean), "var": jnp.asarray(var)},
        jnp.asarray(w),
        None,
    )
    np.testing.assert_allclose(fw_np, np.asarray(fw_ops), rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(fb_np, np.asarray(fb_ops), rtol=1e-6, atol=1e-5)


def _randomized_bn_tree(params, state, seed=7):
    """Perturb BN affine + running stats so the fold is non-trivial
    (init leaves scale=1, mean=0, var=1 — a near-identity fold)."""
    rng = np.random.default_rng(seed)

    def perturb(tree, kinds):
        out = {}
        for k, v in tree.items():
            if isinstance(v, dict):
                out[k] = perturb(v, kinds)
            elif k in kinds:
                lo, hi = kinds[k]
                out[k] = jnp.asarray(
                    rng.uniform(lo, hi, np.shape(v)).astype(np.float32)
                )
            else:
                out[k] = v
        return out

    params = perturb(params, {"scale": (0.5, 1.5), "bias": (-0.3, 0.3)})
    state = perturb(state, {"mean": (-0.5, 0.5), "var": (0.3, 2.0)})
    return params, state


class TestFoldTiny:
    @pytest.fixture(scope="class")
    def tiny(self):
        d = dk.Darknet.load(os.path.join(REPO, "cfg/darknet/yolov4-tiny.cfg"))
        model = YoloModel(graph_from_darknet(d))
        params, state = model.init(jax.random.PRNGKey(0))
        params, state = _randomized_bn_tree(params, state)
        return d, model, params, state

    def test_folded_forward_matches(self, tiny, tmp_path):
        d, model, params, state = tiny
        folded_cfg, fp, fs = fold_darknet(d, params, state)

        # every plain conv lost its BN flag; params lost their bn subtree
        n_bn = sum(
            isinstance(l, dk.Convolutional) and l.batch_normalize
            for l in d.layers
        )
        assert n_bn > 10
        assert not any(
            isinstance(l, dk.Convolutional) and l.batch_normalize
            for l in folded_cfg.layers
        )
        assert not any("bn" in v for v in fp.values() if isinstance(v, dict))

        folded_model = YoloModel(graph_from_darknet(folded_cfg))
        ip, is_ = folded_model.init(jax.random.PRNGKey(1))
        fp2, fs2 = merge_into_model_tree(fp, fs, ip, is_)

        x = jax.random.uniform(jax.random.PRNGKey(2), (1, 3, 416, 416))
        ref, _ = model.apply(params, state, x, train=False)
        out, _ = folded_model.apply(fp2, fs2, x, train=False)
        for name in ("cycxhw", "obj_logit", "class_logit"):
            a = np.asarray(getattr(ref, name), np.float64)
            b = np.asarray(getattr(out, name), np.float64)
            rel = np.sqrt(np.mean((a - b) ** 2) / (np.mean(a**2) + 1e-12))
            assert rel < 1e-5, f"{name}: rel MSE {rel}"

    def test_file_level_fold_roundtrip(self, tiny, tmp_path):
        d, model, params, state = tiny
        src_w = tmp_path / "tiny.weights"
        save_darknet_weights(d, params, state, src_w, seen=77)
        src_c = tmp_path / "tiny.cfg"
        src_c.write_text(dk.to_cfg_string(d))

        out_c = tmp_path / "tiny-folded.cfg"
        out_w = tmp_path / "tiny-folded.weights"
        n_folded, n_kept = fold_darknet_files(src_c, src_w, out_c, out_w)
        assert n_folded > 10 and n_kept == 0

        d2 = dk.Darknet.load(out_c)
        lp, ls, seen = load_darknet_weights(d2, out_w)
        assert seen == 77
        folded_model = YoloModel(graph_from_darknet(d2))
        ip, is_ = folded_model.init(jax.random.PRNGKey(1))
        fp2, fs2 = merge_into_model_tree(lp, ls, ip, is_)

        x = jax.random.uniform(jax.random.PRNGKey(2), (1, 3, 416, 416))
        ref, _ = model.apply(params, state, x, train=False)
        out, _ = folded_model.apply(fp2, fs2, x, train=False)
        a = np.asarray(ref.cycxhw, np.float64)
        b = np.asarray(out.cycxhw, np.float64)
        rel = np.sqrt(np.mean((a - b) ** 2) / (np.mean(a**2) + 1e-12))
        assert rel < 1e-5


def test_shared_weight_convs_are_skipped():
    """share_index aliases must keep their BN — folding one side would
    corrupt the other."""
    text = """[net]
width=32
height=32
channels=3
batch=1

[convolutional]
filters=8
size=3
stride=1
pad=1
batch_normalize=1
activation=leaky

[convolutional]
filters=8
size=3
stride=1
pad=1
batch_normalize=1
activation=leaky
share_index=-1

[convolutional]
filters=6
size=1
stride=1
pad=1
activation=linear

[yolo]
mask=0
anchors=10,14
classes=1
num=1
"""
    d = dk.Darknet.from_str(text)
    model = YoloModel(graph_from_darknet(d))
    params, state = model.init(jax.random.PRNGKey(0))
    folded, fp, fs = fold_darknet(d, params, state)
    assert folded.layers[0].batch_normalize and folded.layers[1].batch_normalize
    assert fp == params and fs == state


SHIM = os.path.join(REPO, "parity", "dk_shim.so")


@pytest.mark.skipif(not os.path.exists(SHIM), reason="darknet oracle not built")
def test_darknet_c_loads_and_matches_folded_artifact(tmp_path):
    """The deployment claim, proven against the real consumer: darknet-C
    loads the folded cfg+weights pair and its per-layer feature maps match
    our folded model (pure conv parity — no BN left on either side)."""
    sys.path.insert(0, os.path.join(REPO, "parity"))
    from oracle import DarknetOracle

    d = dk.Darknet.load(os.path.join(REPO, "cfg/darknet/yolov4-tiny.cfg"))
    model = YoloModel(graph_from_darknet(d))
    params, state = model.init(jax.random.PRNGKey(3))
    params, state = _randomized_bn_tree(params, state, seed=11)

    src_c = tmp_path / "tiny.cfg"
    src_c.write_text(dk.to_cfg_string(d))
    src_w = tmp_path / "tiny.weights"
    save_darknet_weights(d, params, state, src_w)
    out_c = tmp_path / "tiny-folded.cfg"
    out_w = tmp_path / "tiny-folded.weights"
    fold_darknet_files(src_c, src_w, out_c, out_w)

    d2 = dk.Darknet.load(out_c)
    folded_model = YoloModel(graph_from_darknet(d2))
    lp, ls, _ = load_darknet_weights(d2, out_w)
    ip, is_ = folded_model.init(jax.random.PRNGKey(1))
    fp, fs = merge_into_model_tree(lp, ls, ip, is_)

    oracle = DarknetOracle(str(out_c), str(out_w))
    rng = np.random.default_rng(0)
    image = rng.uniform(0.0, 1.0, (3, 416, 416)).astype(np.float32)
    oracle.forward(image)
    _, _, ours = folded_model.apply(
        fp, fs, jnp.asarray(image[None]), train=False,
        return_intermediates=True,
    )

    comparable = {"convolutional", "maxpool", "upsample", "route", "shortcut"}
    compared = 0
    for i in range(oracle.num_layers):
        if oracle.layer_type(i) not in comparable:
            continue
        ref = oracle.layer_output(i)  # CHW
        mine = np.transpose(np.asarray(ours[f"layer{i}"][0]), (2, 0, 1))
        assert mine.shape == ref.shape
        mse = float(np.mean((mine - ref) ** 2) / (np.mean(ref**2) + 1e-12))
        assert mse < 1e-5, f"layer {i} ({oracle.layer_type(i)}): rel MSE {mse:.3e}"
        compared += 1
    assert compared > 20


def test_cli_fold_weights(tmp_path):
    d = dk.Darknet.load(os.path.join(REPO, "cfg/darknet/yolov4-tiny.cfg"))
    model = YoloModel(graph_from_darknet(d))
    params, state = model.init(jax.random.PRNGKey(0))
    src_c = tmp_path / "tiny.cfg"
    src_c.write_text(dk.to_cfg_string(d))
    src_w = tmp_path / "tiny.weights"
    save_darknet_weights(d, params, state, src_w)

    env = dict(os.environ)
    env.update(JAX_PLATFORMS="cpu", PALLAS_AXON_POOL_IPS="", PYTHONPATH=REPO)
    out = subprocess.run(
        [sys.executable, "-m", "yolodl_tpu.cli.tool_main", "fold-weights",
         str(src_c), str(src_w)],
        capture_output=True, text=True, env=env, timeout=300,
    )
    assert out.returncode == 0, out.stderr
    assert "folded" in out.stdout
    assert (tmp_path / "tiny-folded.cfg").exists()
    assert (tmp_path / "tiny-folded.weights").exists()
    # the folded pair loads cleanly (strict byte-count check inside)
    d2 = dk.Darknet.load(tmp_path / "tiny-folded.cfg")
    load_darknet_weights(d2, tmp_path / "tiny-folded.weights")
