"""Cross-implementation parity: JAX model vs AlexeyAB darknet C (CPU).

The reference's darknet-test harness (darknet-test/src/main.rs:112-195)
loads the same cfg+weights into the C library and the Rust model and
asserts per-layer MSE ≈ 0.  Same here, with one upgrade: weights are
*random* (written by our own .weights serializer), so no pretrained
download is needed — structural parity is what is being proven.

Requires parity/dk_shim.so (built by parity/build.sh); skipped otherwise.
"""

import os
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SHIM = os.path.join(REPO, "parity", "dk_shim.so")

pytestmark = pytest.mark.skipif(
    not os.path.exists(SHIM), reason="darknet oracle not built"
)

sys.path.insert(0, os.path.join(REPO, "parity"))

# compare these darknet layer kinds 1:1 against our node outputs
COMPARABLE = {"convolutional", "maxpool", "upsample", "route", "shortcut"}


@pytest.fixture(scope="module")
def tiny_pair(tmp_path_factory):
    """yolov4-tiny at 416: random weights → darknet net + our model."""
    import jax

    from oracle import DarknetOracle
    from yolodl_tpu.config import darknet_cfg as dk
    from yolodl_tpu.graph.from_darknet import graph_from_darknet
    from yolodl_tpu.models import YoloModel
    from yolodl_tpu.models.weights import save_darknet_weights

    cfg_path = os.path.join(REPO, "cfg/darknet/yolov4-tiny.cfg")
    darknet = dk.Darknet.load(cfg_path)
    model = YoloModel(graph_from_darknet(darknet))
    params, state = model.init(jax.random.PRNGKey(42))

    # moderate BN stats so eval-mode outputs aren't all ~0
    weights_path = str(tmp_path_factory.mktemp("w") / "tiny.weights")
    save_darknet_weights(darknet, params, state, weights_path)

    oracle = DarknetOracle(cfg_path, weights_path)
    return darknet, model, params, state, oracle


class TestYoloV4TinyParity:
    def test_per_layer_feature_maps(self, tiny_pair):
        import jax.numpy as jnp

        darknet, model, params, state, oracle = tiny_pair
        rng = np.random.default_rng(0)
        image = rng.uniform(0.0, 1.0, (3, 416, 416)).astype(np.float32)

        oracle.forward(image)
        _, _, ours = model.apply(
            params, state, jnp.asarray(image[None]), train=False,
            return_intermediates=True,
        )

        compared = 0
        for i in range(oracle.num_layers):
            kind = oracle.layer_type(i)
            if kind not in COMPARABLE:
                continue
            ref = oracle.layer_output(i)          # [c, h, w]
            mine = np.asarray(ours[f"layer{i}"][0])  # [h, w, c] NHWC
            mine_chw = np.transpose(mine, (2, 0, 1))
            assert mine_chw.shape == ref.shape, (i, kind, mine_chw.shape, ref.shape)
            denom = np.mean(ref**2) + 1e-12
            mse = float(np.mean((mine_chw - ref) ** 2) / denom)
            assert mse < 1e-5, f"layer {i} ({kind}): relative MSE {mse:.3e}"
            compared += 1
        assert compared >= 20  # yolov4-tiny has ~21 comparable layers

    def test_decoded_boxes_match_darknet(self, tiny_pair):
        """Our Detect2D decode vs darknet's get_network_boxes on the same
        logits (thresholded candidates must agree in box geometry)."""
        import jax.numpy as jnp

        darknet, model, params, state, oracle = tiny_pair
        rng = np.random.default_rng(1)
        image = rng.uniform(0.0, 1.0, (3, 416, 416)).astype(np.float32)

        oracle.forward(image)
        dk_dets = oracle.detections(416, 416, thresh=0.2)

        pred, _ = model.apply(params, state, jnp.asarray(image[None]), train=False)
        obj = np.asarray(pred.obj_prob()[0])
        conf = np.asarray(pred.confidence()[0])
        boxes = np.asarray(pred.cycxhw[0])

        # darknet emits candidates with objectness > thresh, iterating each
        # yolo layer's cells row-major then anchors (get_yolo_detections);
        # reconstruct the same order from our flat layout (anchor-major)
        ours_rows = []
        for info in pred.infos:
            fh, fw, a = info.feature_h, info.feature_w, info.num_anchors
            for cell in range(fh * fw):
                r, c = divmod(cell, fw)
                for n in range(a):
                    flat = info.flat_begin + (n * fh + r) * fw + c
                    if obj[flat] > 0.2:
                        cy, cx, bh, bw = boxes[flat]
                        ours_rows.append((cx, cy, bw, bh, obj[flat]))
        assert len(ours_rows) == len(dk_dets), (len(ours_rows), len(dk_dets))
        np.testing.assert_allclose(
            np.asarray(ours_rows), dk_dets[:, :5], atol=3e-3
        )


def test_csp_new_coords_parity(tmp_path):
    """yolov4-csp (new_coords=1, scaled decode) conv-layer parity at 256px."""
    import jax
    import jax.numpy as jnp

    from oracle import DarknetOracle
    from yolodl_tpu.config import darknet_cfg as dk
    from yolodl_tpu.graph.from_darknet import graph_from_darknet
    from yolodl_tpu.models import YoloModel
    from yolodl_tpu.models.weights import save_darknet_weights

    cfg_path = os.path.join(REPO, "cfg/darknet/yolov4-csp.cfg")
    # shrink input for CPU runtime: rewrite width/height
    text = open(cfg_path).read().replace("width=512", "width=256").replace(
        "height=512", "height=256"
    )
    small_cfg = tmp_path / "csp256.cfg"
    small_cfg.write_text(text)

    darknet = dk.Darknet.load(str(small_cfg))
    model = YoloModel(graph_from_darknet(darknet))
    params, state = model.init(jax.random.PRNGKey(7))
    weights_path = str(tmp_path / "csp.weights")
    save_darknet_weights(darknet, params, state, weights_path)

    oracle = DarknetOracle(str(small_cfg), weights_path)
    rng = np.random.default_rng(3)
    image = rng.uniform(0.0, 1.0, (3, 256, 256)).astype(np.float32)
    oracle.forward(image)
    _, _, ours = model.apply(
        params, state, jnp.asarray(image[None]), train=False,
        return_intermediates=True,
    )

    # new_coords=1: darknet's head conv applies logistic while our graph
    # keeps the head conv linear and σ's inside the decode (exactly once
    # end-to-end, from_darknet.py) — compare σ(ours) for those convs
    head_convs = {
        i for i in range(oracle.num_layers - 1)
        if oracle.layer_type(i) == "convolutional"
        and oracle.layer_type(i + 1) == "yolo"
    }
    assert len(head_convs) == 3
    checked = 0
    for i in range(oracle.num_layers):
        if oracle.layer_type(i) not in COMPARABLE:
            continue
        ref = oracle.layer_output(i)
        mine = np.transpose(np.asarray(ours[f"layer{i}"][0]), (2, 0, 1))
        if i in head_convs:
            mine = 1.0 / (1.0 + np.exp(-mine))
        denom = np.mean(ref**2) + 1e-12
        assert float(np.mean((mine - ref) ** 2) / denom) < 1e-5, i
        checked += 1
    assert checked > 80


def test_new_coords_decoded_boxes_match_darknet(tmp_path):
    """END-TO-END box decode parity for a new_coords=1 head with
    scale_x_y=1.05: σ must be applied exactly once (the conv's logistic is
    folded into the decode) and the xy scale honored — vs darknet's
    get_network_boxes (yolo_layer.c get_yolo_box new_coords branch)."""
    import jax
    import jax.numpy as jnp

    from oracle import DarknetOracle
    from yolodl_tpu.config import darknet_cfg as dk
    from yolodl_tpu.graph.from_darknet import graph_from_darknet
    from yolodl_tpu.models import YoloModel
    from yolodl_tpu.models.weights import save_darknet_weights

    cfg_text = """[net]
width=64
height=64
channels=3
batch=1

[convolutional]
batch_normalize=1
filters=16
size=3
stride=2
pad=1
activation=leaky

[convolutional]
batch_normalize=1
filters=32
size=3
stride=2
pad=1
activation=leaky

[convolutional]
filters=21
size=1
stride=1
pad=1
activation=logistic

[yolo]
mask=0,1,2
anchors=10,14, 23,27, 37,58
classes=2
num=3
new_coords=1
scale_x_y=1.05
"""
    cfg_path = tmp_path / "mini_nc.cfg"
    cfg_path.write_text(cfg_text)
    darknet = dk.Darknet.load(str(cfg_path))
    model = YoloModel(graph_from_darknet(darknet))
    params, state = model.init(jax.random.PRNGKey(3))
    wpath = str(tmp_path / "mini_nc.weights")
    save_darknet_weights(darknet, params, state, wpath)

    oracle = DarknetOracle(str(cfg_path), wpath)
    rng = np.random.default_rng(2)
    image = rng.uniform(0.0, 1.0, (3, 64, 64)).astype(np.float32)
    oracle.forward(image)
    dk_dets = oracle.detections(64, 64, thresh=0.3)

    pred, _ = model.apply(params, state, jnp.asarray(image[None]), train=False)
    obj = np.asarray(pred.obj_prob()[0])
    boxes = np.asarray(pred.cycxhw[0])

    ours_rows = []
    for info in pred.infos:
        fh, fw, a = info.feature_h, info.feature_w, info.num_anchors
        for cell in range(fh * fw):
            r, c = divmod(cell, fw)
            for n in range(a):
                flat = info.flat_begin + (n * fh + r) * fw + c
                if obj[flat] > 0.3:
                    cy, cx, bh, bw = boxes[flat]
                    ours_rows.append((cx, cy, bw, bh, obj[flat]))
    assert len(dk_dets) > 5, "threshold left too few candidates to compare"
    assert len(ours_rows) == len(dk_dets), (len(ours_rows), len(dk_dets))
    np.testing.assert_allclose(np.asarray(ours_rows), dk_dets[:, :5],
                               atol=3e-3)


def test_local_avgpool_parity(tmp_path):
    """[local_avgpool] divides by the in-bounds cell count per window
    (forward_local_avgpool_layer's counter), not size² — border windows
    under darknet's default padding=size−1 expose the difference."""
    import jax
    import jax.numpy as jnp

    from oracle import DarknetOracle
    from yolodl_tpu.config import darknet_cfg as dk
    from yolodl_tpu.graph.from_darknet import graph_from_darknet
    from yolodl_tpu.models import YoloModel
    from yolodl_tpu.models.weights import save_darknet_weights

    cfg_text = """[net]
width=32
height=32
channels=3
batch=1

[convolutional]
batch_normalize=1
filters=8
size=3
stride=1
pad=1
activation=leaky

[local_avgpool]
size=4
stride=2

[convolutional]
filters=18
size=1
stride=1
pad=1
activation=linear

[yolo]
mask=0,1,2
anchors=10,14, 23,27, 37,58
classes=1
num=3
"""
    cfg_path = tmp_path / "lap.cfg"
    cfg_path.write_text(cfg_text)
    darknet = dk.Darknet.load(str(cfg_path))
    model = YoloModel(graph_from_darknet(darknet))
    params, state = model.init(jax.random.PRNGKey(5))
    wpath = str(tmp_path / "lap.weights")
    save_darknet_weights(darknet, params, state, wpath)

    oracle = DarknetOracle(str(cfg_path), wpath)
    rng = np.random.default_rng(9)
    image = rng.uniform(0.0, 1.0, (3, 32, 32)).astype(np.float32)
    oracle.forward(image)
    _, _, ours = model.apply(
        params, state, jnp.asarray(image[None]), train=False,
        return_intermediates=True,
    )
    checked = 0
    for i in range(oracle.num_layers):
        if oracle.layer_type(i) not in (COMPARABLE | {"local_avgpool"}):
            continue
        ref = oracle.layer_output(i)
        mine = np.transpose(np.asarray(ours[f"layer{i}"][0]), (2, 0, 1))
        denom = np.mean(ref**2) + 1e-12
        assert float(np.mean((mine - ref) ** 2) / denom) < 1e-5, \
            (i, oracle.layer_type(i))
        checked += 1
    assert checked == 3


def test_yolov2_reorg_region_parity(tmp_path):
    """YOLOv2 (reorg + region head) per-layer parity vs darknet-C — validates
    the space-to-depth reorg channel order and the region decode path."""
    import jax
    import jax.numpy as jnp

    from oracle import DarknetOracle
    from yolodl_tpu.config import darknet_cfg as dk
    from yolodl_tpu.graph.from_darknet import graph_from_darknet
    from yolodl_tpu.models import YoloModel
    from yolodl_tpu.models.weights import save_darknet_weights

    cfg_path = os.path.join(REPO, "cfg/darknet/yolov2.cfg")
    text = open(cfg_path).read().replace("width=416", "width=320").replace(
        "height=416", "height=320"
    )
    small = tmp_path / "v2.cfg"
    small.write_text(text)

    darknet = dk.Darknet.load(str(small))
    model = YoloModel(graph_from_darknet(darknet))
    params, state = model.init(jax.random.PRNGKey(11))
    wpath = str(tmp_path / "v2.weights")
    save_darknet_weights(darknet, params, state, wpath)

    oracle = DarknetOracle(str(small), wpath)
    rng = np.random.default_rng(5)
    image = rng.uniform(0.0, 1.0, (3, 320, 320)).astype(np.float32)
    oracle.forward(image)
    _, _, ours = model.apply(
        params, state, jnp.asarray(image[None]), train=False,
        return_intermediates=True,
    )

    checked = 0
    comparable = COMPARABLE | {"reorg"}
    for i in range(oracle.num_layers):
        if oracle.layer_type(i) not in comparable:
            continue
        ref = oracle.layer_output(i)
        mine = np.transpose(np.asarray(ours[f"layer{i}"][0]), (2, 0, 1))
        assert mine.shape == ref.shape, (i, oracle.layer_type(i))
        denom = np.mean(ref**2) + 1e-12
        mse = float(np.mean((mine - ref) ** 2) / denom)
        assert mse < 1e-5, f"layer {i} ({oracle.layer_type(i)}): {mse:.3e}"
        checked += 1
    assert checked > 20


def test_yolov4_spp_parity(tmp_path):
    """Original YOLOv4 (SPP via maxpool routes, PAN neck, scale_x_y decode):
    per-layer parity at 320px."""
    import jax
    import jax.numpy as jnp

    from oracle import DarknetOracle
    from yolodl_tpu.config import darknet_cfg as dk
    from yolodl_tpu.graph.from_darknet import graph_from_darknet
    from yolodl_tpu.models import YoloModel
    from yolodl_tpu.models.weights import save_darknet_weights

    cfg_path = os.path.join(REPO, "cfg/darknet/yolov4.cfg")
    text = open(cfg_path).read().replace("width=608", "width=320").replace(
        "height=608", "height=320"
    )
    small = tmp_path / "v4.cfg"
    small.write_text(text)

    darknet = dk.Darknet.load(str(small))
    model = YoloModel(graph_from_darknet(darknet))
    params, state = model.init(jax.random.PRNGKey(3))
    wpath = str(tmp_path / "v4.weights")
    save_darknet_weights(darknet, params, state, wpath)

    oracle = DarknetOracle(str(small), wpath)
    rng = np.random.default_rng(9)
    image = rng.uniform(0.0, 1.0, (3, 320, 320)).astype(np.float32)
    oracle.forward(image)
    _, _, ours = model.apply(
        params, state, jnp.asarray(image[None]), train=False,
        return_intermediates=True,
    )

    checked = 0
    for i in range(oracle.num_layers):
        if oracle.layer_type(i) not in COMPARABLE:
            continue
        ref = oracle.layer_output(i)
        mine = np.transpose(np.asarray(ours[f"layer{i}"][0]), (2, 0, 1))
        assert mine.shape == ref.shape, (i, oracle.layer_type(i))
        denom = np.mean(ref**2) + 1e-12
        mse = float(np.mean((mine - ref) ** 2) / denom)
        assert mse < 1e-5, f"layer {i} ({oracle.layer_type(i)}): {mse:.3e}"
        checked += 1
    assert checked > 100


@pytest.mark.parametrize("cfg_name", ["rnn.cfg", "gru.cfg"])
def test_recurrent_parity(tmp_path, cfg_name):
    """[rnn]/[gru] sequence models vs darknet-C (T=1 at inference): the
    recurrent sub-layer algebra, connected-BN order, and the recurrent
    .weights block layout must all line up for the outputs to match."""
    import jax
    import jax.numpy as jnp

    from oracle import DarknetOracle
    from yolodl_tpu.config import darknet_cfg as dk
    from yolodl_tpu.graph.from_darknet import graph_from_darknet
    from yolodl_tpu.models.builder import GraphModel
    from yolodl_tpu.models.weights import save_darknet_weights

    cfg_path = os.path.join(REPO, "cfg/darknet", cfg_name)
    darknet = dk.Darknet.load(cfg_path)
    model = GraphModel(graph_from_darknet(darknet))
    params, state = model.init(jax.random.PRNGKey(13))
    wpath = str(tmp_path / "seq.weights")
    save_darknet_weights(darknet, params, state, wpath)

    oracle = DarknetOracle(cfg_path, wpath)
    rng = np.random.default_rng(17)
    x = rng.uniform(0.0, 1.0, (darknet.net.inputs,)).astype(np.float32)
    oracle.forward(x)
    _, _, ours = model.apply(
        params, state, jnp.asarray(x[None, :, None, None]), train=False,
        return_intermediates=True,
    )

    checked = 0
    for i in range(oracle.num_layers):
        kind = oracle.layer_type(i)
        if kind not in {"rnn", "gru", "connected", "softmax"}:
            continue
        ref = oracle.layer_output(i).reshape(-1)
        mine = np.asarray(ours[f"layer{i}"]).reshape(-1)
        assert mine.shape == ref.shape, (i, kind, mine.shape, ref.shape)
        denom = np.mean(ref**2) + 1e-12
        mse = float(np.mean((mine - ref) ** 2) / denom)
        assert mse < 1e-4, f"layer {i} ({kind}): relative MSE {mse:.3e}"
        checked += 1
    assert checked >= 4


def test_yolov1_connected_detection_parity(tmp_path):
    """t1.test.cfg (YOLOv1): conv→connected→[detection] chain vs darknet-C.
    Regression test for the connected-layer flatten order — darknet
    flattens conv maps (c,h,w); our Linear flattens NHWC, so the .weights
    IO permutes the in-dim (weights.py)."""
    import jax
    import jax.numpy as jnp

    from oracle import DarknetOracle
    from yolodl_tpu.config import darknet_cfg as dk
    from yolodl_tpu.graph.from_darknet import graph_from_darknet
    from yolodl_tpu.models.builder import GraphModel
    from yolodl_tpu.models.weights import save_darknet_weights

    cfg_path = os.path.join(REPO, "cfg/darknet/t1.test.cfg")
    darknet = dk.Darknet.load(cfg_path)
    model = GraphModel(graph_from_darknet(darknet))
    params, state = model.init(jax.random.PRNGKey(5))
    wpath = str(tmp_path / "t1.weights")
    save_darknet_weights(darknet, params, state, wpath)

    oracle = DarknetOracle(cfg_path, wpath)
    rng = np.random.default_rng(2)
    image = rng.uniform(0.0, 1.0, (3, 224, 224)).astype(np.float32)
    oracle.forward(image)
    _, _, ours = model.apply(
        params, state, jnp.asarray(image[None]), train=False,
        return_intermediates=True,
    )

    checked = 0
    for i in range(oracle.num_layers):
        kind = oracle.layer_type(i)
        if kind not in {"convolutional", "maxpool", "connected", "detection"}:
            continue
        ref = oracle.layer_output(i).reshape(-1)
        mine = np.asarray(ours[f"layer{i}"])
        if kind in ("convolutional", "maxpool"):
            mine = np.transpose(mine[0], (2, 0, 1))
        mse = float(np.mean((mine.reshape(-1) - ref) ** 2)
                    / (np.mean(ref**2) + 1e-12))
        assert mse < 1e-5, f"layer {i} ({kind}): relative MSE {mse:.3e}"
        checked += 1
    assert checked >= 15


SPATIAL_SEQ_CFG = """
[net]
batch=1
subdivisions=1
height=6
width=6
channels=3
time_steps=1

[convolutional]
filters=4
size=3
stride=1
pad=1
activation=leaky

[{kind}]
output=10
{extra}activation=tanh

[connected]
output=5
activation=linear

[softmax]
"""


@pytest.mark.parametrize("kind,extra", [
    ("rnn", "hidden=8\n"), ("gru", ""), ("lstm", ""),
])
def test_spatial_recurrent_parity(tmp_path, kind, extra):
    """A recurrent layer fed a SPATIAL conv map vs darknet-C: darknet
    flattens the (c,h,w) map, our cells flatten NHWC — the .weights IO
    must permute the in-dim of every input-facing gate (weights.py
    _chw_to_hwc_in_dim), exactly like the [connected] regression above."""
    import jax
    import jax.numpy as jnp

    from oracle import DarknetOracle
    from yolodl_tpu.config import darknet_cfg as dk
    from yolodl_tpu.graph.from_darknet import graph_from_darknet
    from yolodl_tpu.models.builder import GraphModel
    from yolodl_tpu.models.weights import save_darknet_weights

    cfg_path = str(tmp_path / f"spatial_{kind}.cfg")
    with open(cfg_path, "w") as f:
        f.write(SPATIAL_SEQ_CFG.format(kind=kind, extra=extra))
    darknet = dk.Darknet.load(cfg_path)
    model = GraphModel(graph_from_darknet(darknet))
    params, state = model.init(jax.random.PRNGKey(23))
    wpath = str(tmp_path / f"spatial_{kind}.weights")
    save_darknet_weights(darknet, params, state, wpath)

    oracle = DarknetOracle(cfg_path, wpath)
    rng = np.random.default_rng(29)
    image = rng.uniform(0.0, 1.0, (3, 6, 6)).astype(np.float32)
    oracle.forward(image)
    _, _, ours = model.apply(
        params, state, jnp.asarray(image[None]), train=False,
        return_intermediates=True,
    )

    checked = 0
    for i in range(oracle.num_layers):
        k = oracle.layer_type(i)
        if k not in {"convolutional", "rnn", "gru", "lstm", "connected",
                     "softmax"}:
            continue
        ref = oracle.layer_output(i).reshape(-1)
        mine = np.asarray(ours[f"layer{i}"])
        if k == "convolutional":
            mine = np.transpose(mine[0], (2, 0, 1))
        mse = float(np.mean((mine.reshape(-1) - ref) ** 2)
                    / (np.mean(ref**2) + 1e-12))
        assert mse < 1e-5, f"layer {i} ({k}): relative MSE {mse:.3e}"
        checked += 1
    assert checked >= 4


def test_conv_fed_detection_parity(tmp_path):
    """[detection] directly after a conv (no [connected] flatten) vs
    darknet-C: the detection layer consumes the CHW-flat activation, so
    the builder must transpose NHWC→NCHW before flattening — a bare NHWC
    reshape interleaves the class/conf/box blocks."""
    import jax
    import jax.numpy as jnp

    from oracle import DarknetOracle
    from yolodl_tpu.config import darknet_cfg as dk
    from yolodl_tpu.graph.from_darknet import graph_from_darknet
    from yolodl_tpu.models.builder import GraphModel
    from yolodl_tpu.models.weights import save_darknet_weights

    cfg_text = """
[net]
batch=1
subdivisions=1
height=4
width=4
channels=3

[convolutional]
filters=8
size=3
stride=1
pad=0
activation=leaky

[detection]
classes=3
coords=4
rescore=1
side=2
num=1
softmax=1
"""
    cfg_path = str(tmp_path / "convdet.cfg")
    with open(cfg_path, "w") as f:
        f.write(cfg_text)
    darknet = dk.Darknet.load(cfg_path)
    model = GraphModel(graph_from_darknet(darknet))
    params, state = model.init(jax.random.PRNGKey(31))
    wpath = str(tmp_path / "convdet.weights")
    save_darknet_weights(darknet, params, state, wpath)

    oracle = DarknetOracle(cfg_path, wpath)
    rng = np.random.default_rng(37)
    image = rng.uniform(0.0, 1.0, (3, 4, 4)).astype(np.float32)
    oracle.forward(image)
    _, _, ours = model.apply(
        params, state, jnp.asarray(image[None]), train=False,
        return_intermediates=True,
    )
    ref = oracle.layer_output(1).reshape(-1)  # the [detection] layer
    mine = np.asarray(ours["layer1"]).reshape(-1)
    assert mine.shape == ref.shape
    mse = float(np.mean((mine - ref) ** 2) / (np.mean(ref**2) + 1e-12))
    assert mse < 1e-6, f"[detection] relative MSE {mse:.3e}"
