"""TRAINING-side oracle parity: darknet-C SGD steps vs this framework.

The forward parity suite (test_parity_darknet.py) proves inference matches;
this file extends the oracle to the backward pass, the philosophy of
darknet-test/src/main.rs:112-195 applied to training: load the same
cfg+weights into real darknet C and into the framework, train both on the
SAME fixed batch of real images with SGD (augmentation off), and compare

  * the reported loss value at every step,
  * every conv kernel and bias after K optimizer steps.

This verifies value-for-value: conv backward (incl. stride-2 and k1/k3),
leaky/mish activation gradients, maxpool backward, route/shortcut gradient
fan-in, and darknet's exact SGD update semantics
(convolutional_layer.c:1605-1623: wu += -decay*B*w; w += lr/B * wu;
wu *= momentum — weight decay on kernels only, never biases) plus the
burn-in LR policy (network.c get_current_rate).

Two deliberate scoping decisions, both pinned by tests/documented:

* BN layers are excluded: darknet's BN backward is NOT the exact gradient
  of its forward (normalize_delta_cpu divides by 1/(sqrt(var)+eps) while
  the forward normalizes by 1/sqrt(var+eps), and the forward variance is
  the 1/(N-1) estimator while the backward assumes 1/N) — an autodiff
  framework cannot and should not reproduce an inexact hand-rolled
  gradient.  The framework's BN follows the tch/libtorch semantics of the
  Rust reference (dark_batch_norm.rs), whose gradients ARE true gradients.

* The oracle nets are arranged so darknet's backward is exact: darknet's
  conv backward OVERWRITES the predecessor's delta buffer
  (col2im_cpu_ext zeroes data_im, col2im.c:65; the cudnn path passes
  beta=0, convolutional_kernels.cu:419,793), silently DROPPING any
  route/shortcut gradient contribution deposited there earlier in the
  backward sweep.  maxpool/route/shortcut backwards accumulate (+=), so
  topologies where multi-consumer layers are followed by a non-conv layer
  backprop exactly.  test_darknet_conv_backward_clobbers_skip_deltas pins
  the quirk itself: the framework keeps the true multi-path gradient (as
  libtorch autograd — the Rust reference's engine — does); darknet-C drops
  it.  Divergence documented in README.

Requires parity/dk_shim.so (parity/build.sh); skipped otherwise.
"""

import os
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SHIM = os.path.join(REPO, "parity", "dk_shim.so")
DK_DATA = "/root/reference/darknet-test/darknet/data"

pytestmark = pytest.mark.skipif(
    not os.path.exists(SHIM), reason="darknet oracle not built"
)

sys.path.insert(0, os.path.join(REPO, "parity"))

BATCH = 4

NET_HEAD = """[net]
width=32
height=32
channels=3
batch=4
subdivisions=1
momentum=0.9
decay=0.0005
learning_rate={lr}
policy=constant
burn_in={burn_in}
power=4
max_batches=100
"""

# Route fan-in net: L0 feeds maxpool L1 AND route L4 — both backwards
# accumulate, so darknet's backprop here is its exact gradient.
ROUTE_NET = """
[convolutional]
filters=8
size=3
stride=1
pad=1
activation=leaky

[maxpool]
size=3
stride=1

[convolutional]
filters=8
size=3
stride=1
pad=1
activation=mish

[maxpool]
size=3
stride=1

[route]
layers=-1,-4

[convolutional]
filters=12
size=3
stride=2
pad=1
activation=leaky

[convolutional]
filters=4
size=1
stride=1
pad=1
activation=linear

[cost]
type=sse
"""

# Shortcut fan-in net: L1 feeds maxpool L2 AND shortcut L4's from-path.
SHORTCUT_NET = """
[convolutional]
filters=8
size=3
stride=1
pad=1
activation=leaky

[convolutional]
filters=8
size=3
stride=1
pad=1
activation=mish

[maxpool]
size=3
stride=1

[convolutional]
filters=8
size=3
stride=1
pad=1
activation=leaky

[shortcut]
from=-3
activation=leaky

[convolutional]
filters=12
size=3
stride=2
pad=1
activation=leaky

[convolutional]
filters=4
size=1
stride=1
pad=1
activation=linear

[cost]
type=sse
"""

# ROUTE_NET with stopbackward on the mish conv (L2): darknet's backward
# loop breaks there (network.c:362), freezing L0/L1/L2 — including L0,
# whose output still escapes past the cut via route L4 (layers=-1,-4).
FREEZE_NET = ROUTE_NET.replace(
    "activation=mish", "activation=mish\nstopbackward=800")

# onlyforward on a route (the yolov4-tiny_contrastive.cfg idiom): L1's
# backward is skipped (network.c:363) so no gradient reaches L0 through
# it, but L0 still trains via route L3's direct reference.
ONLYFWD_NET = """
[convolutional]
filters=8
size=3
stride=1
pad=1
activation=leaky

[route]
layers=0
onlyforward=1

[convolutional]
filters=8
size=3
stride=1
pad=1
activation=mish

[route]
layers=0,2

[convolutional]
filters=12
size=3
stride=2
pad=1
activation=leaky

[convolutional]
filters=4
size=1
stride=1
pad=1
activation=linear

[cost]
type=sse
"""


def real_image_batch():
    """Four real photographs (darknet's own sample data) at 32x32 CHW f32."""
    from PIL import Image

    names = ["dog.jpg", "eagle.jpg", "giraffe.jpg", "horses.jpg"]
    imgs = []
    for n in names:
        im = Image.open(os.path.join(DK_DATA, n)).convert("RGB").resize((32, 32))
        imgs.append(np.transpose(np.asarray(im, np.float32) / 255.0, (2, 0, 1)))
    return np.stack(imgs)  # [4, 3, 32, 32]


def build_pair(tmp_path, body, burn_in=0, seed=21, lr=0.001):
    import jax

    from oracle import DarknetOracle
    from yolodl_tpu.config import darknet_cfg as dk
    from yolodl_tpu.graph.from_darknet import graph_from_darknet
    from yolodl_tpu.models.builder import GraphModel
    from yolodl_tpu.models.weights import save_darknet_weights

    cfg_path = tmp_path / "train_par.cfg"
    cfg_path.write_text(NET_HEAD.format(burn_in=burn_in, lr=lr) + body)
    darknet = dk.Darknet.load(str(cfg_path))
    model = GraphModel(graph_from_darknet(darknet))
    params, state = model.init(jax.random.PRNGKey(seed))
    wpath = str(tmp_path / "train_par.weights")
    save_darknet_weights(darknet, params, state, wpath)
    oracle = DarknetOracle(str(cfg_path), wpath, train=True)
    return darknet, model, params, state, oracle


def darknet_sgd(params, lr_fn, momentum, decay):
    """The exact darknet conv update as an optax chain: decay on kernels
    only (convolutional_layer.c:1612 applies it to l.weights, :1616-1621
    biases/scales get none), SGD momentum trace, schedule shifted +1
    because darknet's batch_num at the t-th update is t (network.c:
    *net.seen += batch happens before update_network)."""
    import jax
    import optax

    def kernels_only(tree):
        return jax.tree_util.tree_map_with_path(
            lambda path, _: any(
                getattr(p, "key", None) == "w" for p in path),
            tree,
        )

    return optax.chain(
        optax.add_decayed_weights(decay, mask=kernels_only),
        optax.sgd(learning_rate=lambda count: lr_fn(count + 1),
                  momentum=momentum),
    )


def run_framework_steps(model, params, state, images, truth, n_steps,
                        lr_fn, momentum=0.9, decay=0.0005):
    """K darknet-semantics SGD steps through the framework's model forward
    + jax.grad backward.  Loss = (1/B)·Σ_batch ½‖pred−truth‖², so that
    grad = G/B exactly as update_network's lr/B scaling expects."""
    import jax
    import jax.numpy as jnp
    import optax

    truth_j = jnp.asarray(truth)
    imgs_j = jnp.asarray(images)

    def loss_fn(p):
        out, _ = model.apply(p, state, imgs_j, train=True,
                             data_format="NCHW")
        pred = jnp.transpose(out, (0, 3, 1, 2)).reshape(BATCH, -1)
        return 0.5 * jnp.sum((pred - truth_j) ** 2) / BATCH

    tx = darknet_sgd(params, lr_fn, momentum, decay)
    opt_state = tx.init(params)
    grad_fn = jax.jit(jax.value_and_grad(loss_fn))
    losses = []
    for _ in range(n_steps):
        loss, grads = grad_fn(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        losses.append(float(loss))
    return params, losses


def out_size(oracle):
    last_conv = max(i for i in range(oracle.num_layers)
                    if oracle.layer_type(i) == "convolutional")
    return oracle.lib.dk_layer_outputs(oracle.net, last_conv)


def assert_losses_and_weights_match(oracle, model, params, state, n_steps,
                                    lr_fn, expect_convs, seed=4):
    images = real_image_batch()
    rng = np.random.default_rng(seed)
    truth = rng.normal(0.0, 0.5, (BATCH, out_size(oracle))).astype(np.float32)

    dk_losses = [oracle.train(images, truth) for _ in range(n_steps)]
    params2, our_losses = run_framework_steps(
        model, params, state, images, truth, n_steps, lr_fn=lr_fn)

    # darknet reports sum-of-squares / batch (l2_cpu squares the delta and
    # train_network divides by n*batch); our ½-scaled loss is half of it
    for i, (dk_l, our_l) in enumerate(zip(dk_losses, our_losses)):
        assert abs(dk_l - 2 * our_l) / (abs(dk_l) + 1e-9) < 2e-4, (
            f"step {i}: darknet loss {dk_l} vs ours {2 * our_l}")
    assert dk_losses[-1] < dk_losses[0] * 0.99  # actually training

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
    assert checked == expect_convs
    return dk_losses


class TestTrainingParity:
    def test_route_fanin_sgd_matches_darknet(self, tmp_path):
        """conv/leaky/mish/maxpool/route backward + 5 SGD(momentum, decay)
        updates: per-step losses and all conv kernels/biases match
        darknet-C value-for-value."""
        _, model, params, state, oracle = build_pair(tmp_path, ROUTE_NET)
        assert_losses_and_weights_match(
            oracle, model, params, state, n_steps=5,
            lr_fn=lambda step: 0.001, expect_convs=4)

    def test_shortcut_fanin_sgd_matches_darknet(self, tmp_path):
        """shortcut (residual add, leaky-activated) gradient fan-in + SGD."""
        _, model, params, state, oracle = build_pair(tmp_path, SHORTCUT_NET)
        assert_losses_and_weights_match(
            oracle, model, params, state, n_steps=5,
            lr_fn=lambda step: 0.001, expect_convs=5)

    def test_stopbackward_freeze_matches_darknet(self, tmp_path):
        """stopbackward mid-net: the flagged conv and every earlier layer
        stay frozen (darknet still weight-decays their kernels — the
        update loop runs unconditionally, convolutional_layer.c:1612),
        the suffix trains.  Per-step losses and ALL conv kernels/biases
        match darknet-C, pinning the loop-break subtlety: L0 feeds a
        route after the cut yet must not receive gradient."""
        _, model, params, state, oracle = build_pair(tmp_path, FREEZE_NET)
        dk_losses = assert_losses_and_weights_match(
            oracle, model, params, state, n_steps=5,
            lr_fn=lambda step: 0.001, expect_convs=4)
        assert len(dk_losses) == 5

    def test_onlyforward_partial_gradient_matches_darknet(self, tmp_path):
        """onlyforward on a route: L0's gradient arrives ONLY via the
        other consumer path — weight trajectories match darknet-C, so the
        partial gradient is exact, not merely zero/nonzero."""
        _, model, params, state, oracle = build_pair(tmp_path, ONLYFWD_NET)
        assert_losses_and_weights_match(
            oracle, model, params, state, n_steps=5,
            lr_fn=lambda step: 0.001, expect_convs=4)

    def test_burn_in_lr_policy_matches_darknet(self, tmp_path):
        """burn_in warm-up: lr(t) = base·(t/burn_in)^power with darknet's
        t = updates-so-far convention (network.c get_current_rate +
        get_current_batch), and end-to-end weight parity under it."""
        from yolodl_tpu.train.lr_schedule import LrScheduleConfig, lr_at_step

        _, model, params, state, oracle = build_pair(
            tmp_path, ROUTE_NET, burn_in=3)
        images = real_image_batch()
        rng = np.random.default_rng(5)
        truth = rng.normal(
            0.0, 0.5, (BATCH, out_size(oracle))).astype(np.float32)

        sched = LrScheduleConfig(kind="darknet", lr=0.001, burn_in=3,
                                 burn_in_power=4.0)
        n_steps = 5
        dk_rates = []
        for _ in range(n_steps):
            oracle.train(images, truth)
            dk_rates.append(oracle.current_rate())
        our_rates = [lr_at_step(sched, t) for t in range(1, n_steps + 1)]
        np.testing.assert_allclose(dk_rates, our_rates, rtol=1e-6)

        params2, _ = run_framework_steps(
            model, params, state, images, truth, n_steps,
            lr_fn=lambda step: lr_at_step(sched, int(step)))
        dk_w = oracle.layer_weights(0)
        mine_w = np.transpose(np.asarray(params2["layer0"]["w"]),
                              (3, 2, 0, 1)).reshape(-1)
        rel = np.max(np.abs(mine_w - dk_w)) / (np.max(np.abs(dk_w)) + 1e-9)
        assert rel < 1e-4, f"burn-in kernel rel err {rel:.2e}"


CLOBBER_NET = """
[convolutional]
filters=8
size=3
stride=1
pad=1
activation=leaky

[convolutional]
filters=8
size=3
stride=1
pad=1
activation=leaky

[route]
layers=-1,-2

[convolutional]
filters=4
size=1
stride=1
pad=1
activation=linear

[cost]
type=sse
"""


def test_darknet_conv_backward_clobbers_skip_deltas(tmp_path):
    """Pin the oracle quirk this suite works around: when a layer feeds
    both the next conv AND a later route, darknet's conv backward
    overwrites the shared delta buffer (col2im_cpu_ext zeroes data_im,
    col2im.c:65; cudnn path beta=0, convolutional_kernels.cu:419) and the
    route's gradient contribution is dropped.  Darknet's L0 update must
    therefore equal the conv-path-only gradient — NOT the true two-path
    gradient this framework (and libtorch autograd, the Rust reference's
    engine) computes.  Divergence documented in README."""
    import jax
    import jax.numpy as jnp

    import yolodl_tpu.ops.conv as C

    _, model, params, state, oracle = build_pair(
        tmp_path, CLOBBER_NET, seed=7, lr=0.01)
    images = real_image_batch()
    rng = np.random.default_rng(11)
    truth = rng.normal(0.0, 0.5, (BATCH, out_size(oracle))).astype(np.float32)

    w0 = oracle.layer_weights(0).copy()
    oracle.train(images, truth)
    # undo lr/B scaling: wu holds -(G + decay·B·w); dw = lr/B · wu
    dk_G = -(oracle.layer_weights(0) - w0) / 0.01 * BATCH

    imgs = jnp.asarray(images).transpose(0, 2, 3, 1)
    truth_j = jnp.asarray(truth)

    def loss(p, stop_route):
        act = lambda x: jnp.where(x > 0, x, 0.1 * x)
        h0 = act(C.conv2d_apply(imgs, p["layer0"]["w"], p["layer0"]["b"],
                                stride=1, padding=1))
        h0_rt = jax.lax.stop_gradient(h0) if stop_route else h0
        h1 = act(C.conv2d_apply(h0, p["layer1"]["w"], p["layer1"]["b"],
                                stride=1, padding=1))
        h2 = jnp.concatenate([h1, h0_rt], axis=-1)
        h3 = C.conv2d_apply(h2, p["layer3"]["w"], p["layer3"]["b"],
                            stride=1, padding=0)
        pred = jnp.transpose(h3, (0, 3, 1, 2)).reshape(BATCH, -1)
        return 0.5 * jnp.sum((pred - truth_j) ** 2)

    def l0_grad(stop_route):
        g = jax.grad(lambda p: loss(p, stop_route))(params)["layer0"]["w"]
        g = g + 0.0005 * BATCH * params["layer0"]["w"]  # darknet decay term
        return np.transpose(np.asarray(g), (3, 2, 0, 1)).reshape(-1)

    g_conv_only = l0_grad(stop_route=True)
    g_true = l0_grad(stop_route=False)

    rel_conv = np.max(np.abs(dk_G - g_conv_only)) / np.max(np.abs(dk_G))
    rel_true = np.max(np.abs(dk_G - g_true)) / np.max(np.abs(dk_G))
    assert rel_conv < 1e-4, (
        f"darknet L0 grad no longer matches the conv-only path "
        f"({rel_conv:.2e}) — did upstream fix the clobber?")
    assert rel_true > 0.1, "route path unexpectedly survived in darknet"
