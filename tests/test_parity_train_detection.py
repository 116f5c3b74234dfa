"""Detection-head TRAINING parity: darknet-C [yolo]/[gaussian_yolo] layers.

Extends the training oracle (test_parity_train.py, which covers [cost]-sse
nets) to real detection heads: the darknet-exact loss
(yolodl_tpu/loss/darknet_loss.py) must reproduce

  * the raw per-layer training delta buffer after one iteration
    (yolo_layer.c process_batch / gaussian_yolo_layer.c forward),
  * the reported cost at every step (|delta|^2, network.c
    get_network_cost),
  * every conv kernel/bias after 5 SGD steps,

with `ignore_thresh` ACTIVE (0.5 — unmatched cells overlapping a GT above
it contribute no objectness delta) and, for [gaussian_yolo], the Gaussian
box negative-log-likelihood training the per-coordinate sigmas
(delta_gaussian_yolo_box, gaussian_yolo_layer.c:171-344).

Requires parity/dk_shim.so (parity/build.sh); skipped otherwise.
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

from test_parity_train import (  # noqa: E402
    BATCH, NET_HEAD, darknet_sgd, real_image_batch)

# 3 classes, 3 anchors -> E=8, filters=24 ([yolo]) / E=12, filters=36
# ([gaussian_yolo]); feature map 16x16 after one stride-2 conv.
YOLO_BODY = """
[convolutional]
filters=16
size=3
stride=1
pad=1
activation=leaky

[convolutional]
filters=16
size=3
stride=2
pad=1
activation=leaky

[convolutional]
filters={filters}
size=1
stride=1
pad=1
activation={head_act}

[{section}]
mask=0,1,2
anchors=4,6, 8,10, 14,18
classes=3
num=3
max=8
ignore_thresh=0.5
{extra}
"""
REGION_BODY = """
[convolutional]
filters=16
size=3
stride=1
pad=1
activation=leaky

[convolutional]
filters=16
size=3
stride=2
pad=1
activation=leaky

[convolutional]
filters=24
size=1
stride=1
pad=1
activation=linear

[region]
anchors=1,1.5, 2,3, 4,5
classes=3
coords=4
num=3
softmax=1
max=8
{extra}
"""

# NOTE: iou_loss is NOT in the template — darknet's option list is
# first-occurrence-wins (duplicate keys print "Unused field"), while this
# repo's parser follows the reference serde_ini map semantics (last wins);
# a duplicated key would silently train different losses in the two
# implementations.  Cases that need a non-default iou_loss pass it via
# `extra`.


def build_detection_pair(tmp_path, section="yolo", extra="", head_act="linear",
                         seed=21, lr=0.001):
    import jax

    from oracle import DarknetOracle
    from yolodl_tpu.config import darknet_cfg as dk
    from yolodl_tpu.graph.from_darknet import graph_from_darknet
    from yolodl_tpu.loss.darknet_loss import head_params_from_darknet
    from yolodl_tpu.models.builder import GraphModel
    from yolodl_tpu.models.weights import save_darknet_weights

    if section.lower() == "region":
        from yolodl_tpu.loss.darknet_loss import region_params_from_darknet

        body = REGION_BODY.format(extra=extra)
    else:
        gaussian = section.lower() == "gaussian_yolo"
        filters = 3 * ((9 if gaussian else 5) + 3)
        body = YOLO_BODY.format(filters=filters, section=section, extra=extra,
                                head_act=head_act)
    cfg_path = tmp_path / "det_par.cfg"
    cfg_path.write_text(NET_HEAD.format(burn_in=0, lr=lr) + body)
    darknet = dk.Darknet.load(str(cfg_path))
    graph = graph_from_darknet(darknet)
    model = GraphModel(graph)
    params, state = model.init(jax.random.PRNGKey(seed))
    wpath = str(tmp_path / "det_par.weights")
    save_darknet_weights(darknet, params, state, wpath)
    oracle = DarknetOracle(str(cfg_path), wpath, train=True)

    if section.lower() == "region":
        region_cfg = [l for l in darknet.layers
                      if isinstance(l, dk.Region)][0]
        head_params = region_params_from_darknet(region_cfg)
    else:
        yolo_cfg = [l for l in darknet.layers
                    if isinstance(l, dk.Yolo)][0]
        head_params = head_params_from_darknet(yolo_cfg, 32, 32)
    head_key = graph.resolve_path("layer2")  # the head conv
    return model, params, state, oracle, head_params, head_key


def make_truth(rng, n_boxes=3, max_boxes=8, truth_size=5):
    """[BATCH, max_boxes*truth_size] darknet truth rows + [BATCH, T, 5]."""
    rows = np.zeros((BATCH, max_boxes, truth_size), np.float32)
    for b in range(BATCH):
        for t in range(n_boxes):
            w = rng.uniform(0.08, 0.45)
            h = rng.uniform(0.08, 0.45)
            x = rng.uniform(w / 2 + 0.01, 1 - w / 2 - 0.01)
            y = rng.uniform(h / 2 + 0.01, 1 - h / 2 - 0.01)
            rows[b, t, :5] = [x, y, w, h, float(rng.integers(0, 3))]
    return rows.reshape(BATCH, -1), rows[:, :, :5].copy()


def framework_loss_fn(model, state, head_key, head_params):
    import jax.numpy as jnp

    from yolodl_tpu.loss.darknet_loss import darknet_detection_loss

    def loss_fn(p, imgs, truth5):
        raw, _ = model.apply(p, state, imgs, train=True, data_format="NCHW",
                             output_key=head_key)
        return darknet_detection_loss((raw,), jnp.asarray(truth5), (head_params,))

    return loss_fn


def run_detection_steps(model, params, state, head_key, head_params,
                        images, truth5, n_steps, lr):
    import jax
    import optax

    loss_fn = framework_loss_fn(model, state, head_key, head_params)
    tx = darknet_sgd(params, lambda _: lr, momentum=0.9, decay=0.0005)
    opt_state = tx.init(params)
    grad_fn = jax.jit(jax.value_and_grad(
        lambda p: loss_fn(p, jax.numpy.asarray(images), truth5)))
    losses = []
    for _ in range(n_steps):
        loss, grads = grad_fn(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        losses.append(float(loss))
    return params, losses


def assert_trajectory(tmp_path, section, extra="", head_act="linear",
                      n_steps=5, lr=0.001):
    model, params, state, oracle, head_params, head_key = \
        build_detection_pair(tmp_path, section=section, extra=extra,
                             head_act=head_act, lr=lr)
    images = real_image_batch()
    rng = np.random.default_rng(7)
    yolo_idx = max(i for i in range(oracle.num_layers)
                   if oracle.layer_type(i) not in ("convolutional",))
    truths_len = oracle.layer_truths(yolo_idx)
    truth_size = truths_len // 8  # max=8 boxes
    truth_rows, truth5 = make_truth(rng, truth_size=truth_size)

    # --- step 1 with delta-level comparison -----------------------------
    import jax
    import jax.numpy as jnp

    from yolodl_tpu.loss.darknet_loss import (
        _head_cost_and_delta, reshape_head_raw)

    raw, _ = model.apply(params, state, jnp.asarray(images), train=True,
                         data_format="NCHW", output_key=head_key)
    cost, our_delta = _head_cost_and_delta(
        reshape_head_raw(raw, head_params), jnp.asarray(truth5), head_params)
    dk_loss0 = oracle.train(images, truth_rows)
    dk_delta = oracle.layer_delta(yolo_idx, BATCH)
    # ours [B,A,H,W,E] -> darknet CHW flat (channel = anchor*E + entry)
    ours_flat = np.asarray(
        jnp.transpose(our_delta, (0, 1, 4, 2, 3))).reshape(-1)
    scale = np.max(np.abs(dk_delta)) + 1e-9
    max_err = np.max(np.abs(ours_flat - dk_delta)) / scale
    assert max_err < 1e-4, f"delta rel err {max_err:.2e}"
    # reported loss = |delta|^2 / batch (train_network_waitkey, network.c)
    assert abs(dk_loss0 - float(cost) / BATCH) / (abs(dk_loss0) + 1e-9) < 2e-4

    # --- remaining steps: losses + weight trajectories ------------------
    dk_losses = [dk_loss0] + [oracle.train(images, truth_rows)
                              for _ in range(n_steps - 1)]
    params2, our_losses = run_detection_steps(
        model, params, state, head_key, head_params, images, truth5,
        n_steps, lr)
    for i, (dk_l, our_l) in enumerate(zip(dk_losses, our_losses)):
        assert abs(dk_l - our_l) / (abs(dk_l) + 1e-9) < 5e-4, (
            f"step {i}: darknet loss {dk_l} vs ours {our_l}")
    assert dk_losses[-1] < dk_losses[0]  # actually training

    checked = 0
    for i in range(oracle.num_layers):
        if oracle.layer_type(i) != "convolutional":
            continue
        dk_w = oracle.layer_weights(i)
        dk_b = oracle.layer_biases(i)
        ours = params2[f"layer{i}"]
        mine_w = np.transpose(np.asarray(ours["w"]), (3, 2, 0, 1)).reshape(-1)
        rel = np.max(np.abs(mine_w - dk_w)) / (np.max(np.abs(dk_w)) + 1e-9)
        assert rel < 1e-4, f"layer {i} kernel rel err {rel:.2e}"
        rel_b = np.max(np.abs(np.asarray(ours["b"]) - dk_b)) / (
            np.max(np.abs(dk_b)) + 1e-9)
        assert rel_b < 1e-4, f"layer {i} bias rel err {rel_b:.2e}"
        checked += 1
    assert checked == 3


V1_BODY = """
[convolutional]
filters=8
size=3
stride=2
pad=1
activation=leaky

[connected]
output=208
activation=linear

[detection]
classes=3
coords=4
side=4
num=2
softmax=0
{extra}
"""


class TestV1DetectionTrainingParity:
    """[detection] (YOLOv1, detection_layer.c): per-cell grid-truth MSE
    loss with best-box selection (IoU argmax, rmse fallback), sqrt wh,
    rescore, and the class/conf/coord scale family."""

    def _make_grid_truth(self, rng, side=4, classes=3):
        grid = np.zeros((BATCH, side * side, 1 + classes + 4), np.float32)
        for b in range(BATCH):
            for cell in rng.choice(side * side, size=3, replace=False):
                c = int(rng.integers(0, classes))
                grid[b, cell, 0] = 1.0
                grid[b, cell, 1 + c] = 1.0
                x, y = rng.uniform(0.1, 0.9, 2)
                w, h = rng.uniform(0.1, 0.4, 2)
                grid[b, cell, 1 + classes:] = [x * side, y * side, w, h]
        return grid

    def _assert_v1_trajectory(self, tmp_path, extra, n_steps=5, lr=0.001):
        import jax
        import jax.numpy as jnp

        from oracle import DarknetOracle
        from yolodl_tpu.config import darknet_cfg as dk
        from yolodl_tpu.graph.from_darknet import graph_from_darknet
        from yolodl_tpu.loss.darknet_loss import (
            _v1_head_deltas, darknet_v1_detection_loss, v1_params_from_darknet)
        from yolodl_tpu.models.builder import GraphModel
        from yolodl_tpu.models.weights import save_darknet_weights

        cfg_path = tmp_path / "v1_par.cfg"
        cfg_path.write_text(NET_HEAD.format(burn_in=0, lr=lr)
                            + V1_BODY.format(extra=extra))
        darknet = dk.Darknet.load(str(cfg_path))
        graph = graph_from_darknet(darknet)
        model = GraphModel(graph)
        params, state = model.init(jax.random.PRNGKey(21))
        wpath = str(tmp_path / "v1_par.weights")
        save_darknet_weights(darknet, params, state, wpath)
        oracle = DarknetOracle(str(cfg_path), wpath, train=True)

        det_cfg = [l for l in darknet.layers if isinstance(l, dk.Detection)][0]
        p = v1_params_from_darknet(det_cfg)
        head_key = graph.resolve_path("layer1")  # the connected layer

        rng = np.random.default_rng(5)
        grid = self._make_grid_truth(rng)
        images = real_image_batch()
        det_idx = max(i for i in range(oracle.num_layers)
                      if oracle.layer_type(i) == "detection")
        assert oracle.layer_truths(det_idx) == p.truth_cols

        def flat_raw(prms):
            raw, _ = model.apply(prms, state, jnp.asarray(images),
                                 train=True, data_format="NCHW",
                                 output_key=head_key)
            return raw.reshape(raw.shape[0], -1)

        # step-1 delta-level comparison
        delta = jax.vmap(lambda r, t: _v1_head_deltas(r, t, p))(
            flat_raw(params), jnp.asarray(grid))
        dk_loss0 = oracle.train(images, grid.reshape(BATCH, -1))
        dk_delta = oracle.layer_delta(det_idx, BATCH)
        scale = np.max(np.abs(dk_delta)) + 1e-9
        err = np.max(np.abs(np.asarray(delta).reshape(-1) - dk_delta)) / scale
        assert err < 1e-4, f"v1 delta rel err {err:.2e}"
        our_loss0 = float(jnp.sum(delta * delta)) / BATCH
        assert abs(dk_loss0 - our_loss0) / (abs(dk_loss0) + 1e-9) < 2e-4

        # 5-step weight trajectory
        import optax
        tx = darknet_sgd(params, lambda _: lr, momentum=0.9, decay=0.0005)
        opt_state = tx.init(params)
        grad_fn = jax.jit(jax.value_and_grad(
            lambda prms: darknet_v1_detection_loss(
                flat_raw(prms), jnp.asarray(grid), p)))
        losses = []
        prms = params
        for _ in range(n_steps):
            loss, grads = grad_fn(prms)
            updates, opt_state = tx.update(grads, opt_state, prms)
            prms = optax.apply_updates(prms, updates)
            losses.append(float(loss))
        dk_losses = [dk_loss0] + [oracle.train(images, grid.reshape(BATCH, -1))
                                  for _ in range(n_steps - 1)]
        for i, (a, b) in enumerate(zip(dk_losses, losses)):
            assert abs(a - b) / (abs(a) + 1e-9) < 5e-4, (i, a, b)
        dk_w = oracle.layer_weights(0)
        mine = np.transpose(np.asarray(prms["layer0"]["w"]),
                            (3, 2, 0, 1)).reshape(-1)
        rel = np.max(np.abs(mine - dk_w)) / (np.max(np.abs(dk_w)) + 1e-9)
        assert rel < 1e-4, f"conv kernel rel err {rel:.2e}"

    def test_v1_rescore_sqrt_matches_darknet(self, tmp_path):
        """The yolov1.cfg recipe: rescore + sqrt wh + coord_scale=5 +
        noobject_scale=.5."""
        self._assert_v1_trajectory(
            tmp_path,
            "rescore=1\nsqrt=1\ncoord_scale=5\nnoobject_scale=.5\n"
            "object_scale=1\nclass_scale=1")

    def test_v1_plain_matches_darknet(self, tmp_path):
        """Defaults (no rescore/sqrt): IoU-target off, raw wh."""
        self._assert_v1_trajectory(tmp_path, "class_scale=2")


class TestDetectionTrainingParity:
    def test_yolo_head_ignore_thresh_matches_darknet(self, tmp_path):
        """[yolo] MSE loss + ignore_thresh=0.5: deltas, losses, weights."""
        assert_trajectory(tmp_path, "yolo")

    def test_gaussian_yolo_nll_matches_darknet(self, tmp_path):
        """[gaussian_yolo]: the Gaussian NLL trains mu AND sigma entries
        exactly as darknet-C (uncertainty loss, uc_normalizer=1)."""
        # darknet's section spelling is [Gaussian_yolo] (parser.c:61);
        # lr tuned down — at 1e-3 the NLL sigma deltas grow the loss over
        # the first steps (identically in both implementations)
        assert_trajectory(tmp_path, "Gaussian_yolo", lr=0.0002)

    def test_yolo_new_coords_matches_darknet(self, tmp_path):
        """new_coords=1 (scaled decode family): the head conv's logistic
        is stripped into the loss; darknet applies sigma' via the conv
        activation backward — trajectories must still match."""
        assert_trajectory(
            tmp_path, "yolo",
            extra="new_coords=1\nscale_x_y=2.0",
            head_act="logistic")

    def test_yolo_scal_add_quirk_matches_darknet(self, tmp_path):
        """new_coords=0 with scale_x_y != 1: darknet's CPU forward lands
        scal_add on entries 4,5 (obj, class0) because the index was
        reassigned inside the else (yolo_layer.c:675-684).  Real
        yolov4-family cfgs carry scale_x_y=1.05-1.2 with new_coords=0 —
        pin the quirk against the oracle."""
        assert_trajectory(tmp_path, "yolo", extra="scale_x_y=1.1")

    def test_yolo_ciou_new_coords_matches_darknet(self, tmp_path):
        """iou_loss=ciou (the flagship family's loss): the analytic
        dx_box_iou gradient (box.c:258-476) under the new_coords decode,
        with max_delta=5 clipping active (yolo_layer.c:161-172)."""
        assert_trajectory(
            tmp_path, "yolo",
            extra="iou_loss=ciou\nnew_coords=1\nscale_x_y=2.0\nmax_delta=5",
            head_act="logistic")

    def test_yolo_iou_thresh_multi_anchor_matches_darknet(self, tmp_path):
        """The round-3 VERDICT 'done' case: iou_thresh=0.2 multi-anchor
        matching + delta averaging (yolo_layer.c:640-660), together with
        objectness_smooth and max_delta on a CIoU head — the exact option
        set of yolov4-csp.cfg's heads."""
        assert_trajectory(
            tmp_path, "yolo",
            extra=("iou_thresh=0.2\niou_loss=ciou\nobjectness_smooth=1\n"
                   "max_delta=5"))

    def test_yolo_giou_tight_max_delta_clips(self, tmp_path):
        """iou_loss=giou with a max_delta small enough that clip_value
        engages on real deltas — pins the clipping path itself, not just
        its presence."""
        assert_trajectory(
            tmp_path, "yolo", extra="iou_loss=giou\nmax_delta=0.02")

    def test_yolo_focal_and_label_smooth_match_darknet(self, tmp_path):
        """focal_loss=1 class deltas (alpha=0.5 grad form,
        delta_yolo_class:330-346) and label_smooth_eps on the
        objectness/class targets."""
        assert_trajectory(
            tmp_path, "yolo", extra="focal_loss=1\nlabel_smooth_eps=0.1")

    def test_yolo_counters_per_class_multipliers_match_darknet(self, tmp_path):
        """counters_per_class → classes_multipliers = max/count capped at
        max_delta (parser.c get_classes_multipliers:412-431), scaling box,
        objectness and truth-class deltas, on a DIoU head."""
        assert_trajectory(
            tmp_path, "yolo",
            extra=("counters_per_class=10,4,6\ncls_normalizer=0.5\n"
                   "iou_loss=diou\nmax_delta=2"))

    def test_yolo_truth_thresh_multi_positive_matches_darknet(self, tmp_path):
        """truth_thresh<1 (yolo_layer.c:493-519): cells whose best
        pred-IoU over the truths beats the threshold become positives at
        their own anchor BEFORE the per-truth pass — the last [yolo]
        training option, now implemented."""
        assert_trajectory(tmp_path, "yolo", extra="truth_thresh=0.3")

    def test_yolo_truth_thresh_smooth_ciou_matches_darknet(self, tmp_path):
        """truth_thresh<1 with objectness_smooth (iou^2 obj/class targets,
        yolo_layer.c:495-503) on a CIoU head."""
        assert_trajectory(
            tmp_path, "yolo",
            extra="truth_thresh=0.3\nobjectness_smooth=1\niou_loss=ciou")

    def test_region_v2_recipe_matches_darknet(self, tmp_path):
        """[region] (YOLOv2) with the standard yolov2.cfg option set:
        bias_match + rescore + object_scale=5 + thresh=.6 — per-cell
        noobject sigma-prime deltas, the seen<12800 prior-box regression
        at every cell (scale .01), per-truth best-anchor overwrites, and
        softmax class rows (region_layer.c:183-368)."""
        assert_trajectory(
            tmp_path, "region",
            extra=("bias_match=1\nrescore=1\nobject_scale=5\n"
                   "noobject_scale=1\nclass_scale=1\ncoord_scale=1\n"
                   "thresh=0.6\nabsolute=1"))

    def test_region_pred_wh_match_matches_darknet(self, tmp_path):
        """[region] without bias_match: the best-anchor search uses the
        DECODED pred wh at the truth's cell (region_layer.c:318-330),
        not the anchor shapes."""
        assert_trajectory(tmp_path, "region", extra="thresh=0.5")

    def test_gaussian_iou_thresh_matches_darknet(self, tmp_path):
        """[Gaussian_yolo] with iou_thresh<1 (the Gaussian_yolov3_BDD
        option set): the gaussian iou_thresh loop
        (gaussian_yolo_layer.c:589-614) + unconditional per-cell delta
        averaging, with a non-default uc_normalizer."""
        assert_trajectory(
            tmp_path, "Gaussian_yolo",
            extra="iou_thresh=0.213\nuc_normalizer=0.5", lr=0.0002)
