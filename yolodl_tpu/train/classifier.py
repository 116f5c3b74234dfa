"""Classifier training: cross-entropy step for softmax/cost darknet nets.

Beyond-reference capability: the reference can neither build nor train
classification cfgs (its darknet path is ``todo!()``); darknet itself trains
them with [softmax] + [cost type=sse], whose combined backward delta is
``p − y`` on the logits (softmax_layer.c backward is a pass-through copy,
cost_layer.c delta = truth − pred) — i.e. exactly the cross-entropy-through-
softmax gradient.  Taking ``CE = −log(p[y])`` on our graph's softmax output
reproduces that gradient through the chain rule, so training dynamics match
darknet's.

Works with any classifier graph built by the darknet front-end
(darknet19/darknet53/alexnet/vgg/resnet/cifar... — everything whose output
is a [B, C] probability or logit tensor).
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
import optax

from ..models.builder import GraphModel
from .loop import TrainConfig, TrainState


def _pre_softmax_key(model: GraphModel):
    """Node key of the input to the graph's terminal [softmax], walking
    back through identity tails ([cost]/[contrastive] map to Identity);
    None when the graph does not end in a softmax."""
    from ..config import newslab as cfg

    graph = getattr(model, "graph", None)
    if graph is None:
        return None
    key = model.output_key
    for _ in range(len(graph.nodes)):
        node = graph.nodes[key]
        if isinstance(node.config, cfg.Identity):
            key = node.input_keys.single_key
            continue
        if isinstance(node.config, cfg.Softmax):
            return node.input_keys.single_key
        return None
    return None


def make_classifier_train_step(
    model: GraphModel,
    optimizer: optax.GradientTransformation,
    config: TrainConfig,
    output_is_prob: bool = True,
    data_format: str = "NCHW",
) -> Callable:
    """(TrainState, images, labels[int32 B]) → (TrainState, metrics).

    ``output_is_prob``: the graph ends in [softmax] (darknet classifiers) —
    CE uses log(p).  False = raw logits (graphs without a softmax sink).

    Stability: when the graph's output node IS a [softmax] (possibly behind
    identity-mapped [cost]/[contrastive] tails), CE is computed as
    ``log_softmax`` of the PRE-softmax node instead of ``log(p)`` of the
    probabilities.  Identical value, but the gradient is the logit-space
    ``p − y`` — darknet's own softmax+cost backward delta
    (cost_layer.c ``delta = truth − pred`` through softmax_layer.c's
    pass-through) — which never dies when the softmax saturates p[y] to an
    exact float32 zero (log(clamp(p)) has zero gradient there; caught by
    the go.test.cfg corpus train sweep, 14 relu convs → huge logits).
    """
    logits_key = _pre_softmax_key(model)

    def loss_fn(params, state, images, labels):
        if config.compute_dtype is not None:
            images = images.astype(config.compute_dtype)
        # output_key=None is exactly the default graph output
        out, new_state = model.apply(
            params, state, images, train=True, data_format=data_format,
            output_key=logits_key)
        out = out.reshape(out.shape[0], -1).astype(jnp.float32)
        if logits_key is None and output_is_prob:
            log_p = jnp.log(jnp.maximum(out, 1e-12))
        else:
            log_p = jax.nn.log_softmax(out, axis=-1)
        ce = -jnp.take_along_axis(log_p, labels[:, None], axis=-1).mean()
        # argmax of logits == argmax of the graph's softmax output
        acc = jnp.mean((jnp.argmax(out, -1) == labels).astype(jnp.float32))
        return ce, (new_state, acc)

    def step(ts: TrainState, images, labels):
        (ce, (new_state, acc)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(ts.params, ts.state, images, labels)
        updates, new_opt_state = optimizer.update(grads, ts.opt_state, ts.params)
        new_params = optax.apply_updates(ts.params, updates)
        new_state = model.clamp_running_vars(new_state)
        return (
            TrainState(new_params, new_state, new_opt_state, ts.step + 1,
                       ts.ema_params),
            {"loss": ce, "accuracy": acc},
        )

    return jax.jit(step, donate_argnums=(0,))
