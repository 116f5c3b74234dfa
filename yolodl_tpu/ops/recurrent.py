"""Darknet recurrent layers: [rnn], [gru], [lstm], [crnn].

The reference parses these cfg sections but cannot build them (its
darknet→model path is ``todo!()``; the sections land in darknet-config's
``Unimplemented`` bucket).  Implemented here from the darknet C semantics so
the sequence-model corpus cfgs (rnn.cfg, gru.cfg, lstm.train.cfg,
crnn.train.cfg, yolov3-tiny_occlusion_track.cfg) build and run:

- [rnn]  (rnn_layer.c forward_rnn_layer): three connected sub-layers;
  ``h_t = act_i(W_i x_t) + act_s(W_s h_{t-1}) (+ h_{t-1} if shortcut)``,
  ``y_t = act_o(W_o h_t)`` — note the activations apply per sub-layer
  *before* the sum, and the self activation is logistic/loggy when the
  cfg sets ``logistic=1/2`` (make_rnn_layer log argument).
- [gru]  (gru_layer.c forward_gru_layer): six LINEAR connected sub-layers;
  ``z = σ(iz(x)+sz(h))``, ``r = σ(ir(x)+sr(h))``,
  ``h̃ = σ(ih(x) + sh(r·h))`` (darknet uses logistic, not tanh — the TANH
  branch is compiled out), ``y = z·h + (1−z)·h̃`` (weighted_sum_cpu).
- [lstm] (lstm_layer.c forward_lstm_layer): eight LINEAR connected
  sub-layers; standard LSTM with σ gates and tanh candidate/cell.
- [crnn] (crnn_layer.c forward_crnn_layer): the [rnn] recurrence with
  convolutional sub-layers (darknet conv→BN→act order).

Time layout matches darknet: the leading batch axis is ``T*B`` time-major
(step i reads ``input + i*inputs*batch``), with ``T = net.time_steps`` and
the initial state zero.  TPU-native mapping: one ``lax.scan`` over T whose
body is pure dense/conv ops — with T=1 (every inference cfg) the scan
disappears and the whole layer is three fused matmuls.

Connected sub-layers follow darknet connected_layer.c order:
``y = act(BN(x·Wᵀ)·γ + b)`` — BN (when enabled) scales *before* the bias is
added, unlike conv layers where β replaces the bias.
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp

from .. import activations
from . import initializers
from .norm import batch_norm_apply, batch_norm_init

Array = jax.Array
Params = Dict[str, Any]
State = Dict[str, Any]


# ---------------------------------------------------------------------------
# darknet connected sub-layer (used by rnn/gru/lstm)


def dense_init(key: jax.Array, in_f: int, out_f: int, bn: bool) -> Tuple[Params, State]:
    kw, kb = jax.random.split(key)
    params: Params = {
        "w": initializers.linear_weight(kw, in_f, out_f),
        "b": initializers.conv_bias(kb, out_f, in_f),
    }
    state: State = {}
    if bn:
        bn_p, bn_s = batch_norm_init(out_f, affine=True)
        # darknet connected BN has scales only; bias comes from l.biases
        params["bn"] = {"scale": bn_p["scale"]}
        state["bn"] = bn_s
    return params, state


def dense_apply(
    params: Params, state: State, x: Array, act: str, train: bool
) -> Tuple[Array, State]:
    """darknet forward_connected_layer: gemm → BN (scale only) → +bias → act."""
    y = x @ params["w"].astype(x.dtype)
    new_state = state
    if "bn" in params:
        y, bn_s = batch_norm_apply(params["bn"], state["bn"], y, train)
        new_state = {**state, "bn": bn_s}
    y = y + params["b"].astype(y.dtype)
    return activations.apply(act, y), new_state


# ---------------------------------------------------------------------------
# time-major helpers


def _split_time(x: Array, time_steps: int) -> Array:
    n = x.shape[0]
    if n % time_steps != 0:
        raise ValueError(
            f"batch {n} is not divisible by time_steps {time_steps}"
        )
    return x.reshape((time_steps, n // time_steps) + x.shape[1:])


def _merge_time(y: Array) -> Array:
    return y.reshape((y.shape[0] * y.shape[1],) + y.shape[2:])


# ---------------------------------------------------------------------------
# [rnn]


def rnn_init(key: jax.Array, in_f: int, hidden: int, out_f: int, bn: bool):
    ki, ks, ko = jax.random.split(key, 3)
    p_i, s_i = dense_init(ki, in_f, hidden, bn)
    p_s, s_s = dense_init(ks, hidden, hidden, bn)
    p_o, s_o = dense_init(ko, hidden, out_f, bn)
    params = {"input": p_i, "self": p_s, "output": p_o}
    state = {k: v for k, v in
             (("input", s_i), ("self", s_s), ("output", s_o)) if v}
    return params, state


def rnn_apply(
    params: Params,
    state: State,
    x: Array,
    *,
    hidden: int,
    act: str,
    self_act: str,
    shortcut: bool,
    time_steps: int,
    train: bool,
) -> Tuple[Array, State]:
    x = x.reshape(x.shape[0], -1)
    xs = _split_time(x, time_steps)
    b = xs.shape[1]
    h0 = jnp.zeros((b, hidden), x.dtype)
    sub_states = {k: state.get(k, {}) for k in ("input", "self", "output")}

    def step(carry, x_t):
        h, ss = carry
        in_out, s_i = dense_apply(params["input"], ss["input"], x_t, act, train)
        self_out, s_s = dense_apply(params["self"], ss["self"], h, self_act, train)
        h_new = in_out + self_out
        if shortcut:
            h_new = h_new + h
        y, s_o = dense_apply(params["output"], ss["output"], h_new, act, train)
        return (h_new, {"input": s_i, "self": s_s, "output": s_o}), y

    (_, final_ss), ys = jax.lax.scan(step, (h0, sub_states), xs)
    new_state = {k: v for k, v in final_ss.items() if v}
    return _merge_time(ys), new_state


# ---------------------------------------------------------------------------
# [gru]

_GRU_SUBS = ("iz", "ir", "ih", "sz", "sr", "sh")


def gru_init(key: jax.Array, in_f: int, out_f: int, bn: bool):
    keys = jax.random.split(key, 6)
    params: Params = {}
    state: State = {}
    for name, k in zip(_GRU_SUBS, keys):
        f_in = in_f if name.startswith("i") else out_f
        p, s = dense_init(k, f_in, out_f, bn)
        params[name] = p
        if s:
            state[name] = s
    return params, state


def gru_apply(
    params: Params,
    state: State,
    x: Array,
    *,
    out_f: int,
    time_steps: int,
    train: bool,
) -> Tuple[Array, State]:
    x = x.reshape(x.shape[0], -1)
    xs = _split_time(x, time_steps)
    b = xs.shape[1]
    h0 = jnp.zeros((b, out_f), x.dtype)
    sub_states = {k: state.get(k, {}) for k in _GRU_SUBS}

    def step(carry, x_t):
        h, ss = carry
        outs = {}
        new_ss = {}
        for name in ("iz", "ir", "ih"):
            outs[name], new_ss[name] = dense_apply(
                params[name], ss[name], x_t, "linear", train)
        for name in ("sz", "sr"):
            outs[name], new_ss[name] = dense_apply(
                params[name], ss[name], h, "linear", train)
        z = jax.nn.sigmoid(outs["iz"] + outs["sz"])
        r = jax.nn.sigmoid(outs["ir"] + outs["sr"])
        sh_out, new_ss["sh"] = dense_apply(
            params["sh"], ss["sh"], r * h, "linear", train)
        # darknet compiles with LOGISTIC candidate (USET undefined)
        h_cand = jax.nn.sigmoid(outs["ih"] + sh_out)
        h_new = z * h + (1.0 - z) * h_cand  # weighted_sum_cpu(state, h̃, z)
        return (h_new, new_ss), h_new

    (_, final_ss), ys = jax.lax.scan(step, (h0, sub_states), xs)
    new_state = {k: v for k, v in final_ss.items() if v}
    return _merge_time(ys), new_state


# ---------------------------------------------------------------------------
# [lstm]

_LSTM_SUBS = ("wf", "wi", "wg", "wo", "uf", "ui", "ug", "uo")


def lstm_init(key: jax.Array, in_f: int, out_f: int, bn: bool):
    keys = jax.random.split(key, 8)
    params: Params = {}
    state: State = {}
    for name, k in zip(_LSTM_SUBS, keys):
        # w* read the hidden state, u* read the input (lstm_layer.c:44-86)
        f_in = out_f if name.startswith("w") else in_f
        p, s = dense_init(k, f_in, out_f, bn)
        params[name] = p
        if s:
            state[name] = s
    return params, state


def lstm_apply(
    params: Params,
    state: State,
    x: Array,
    *,
    out_f: int,
    time_steps: int,
    train: bool,
) -> Tuple[Array, State]:
    x = x.reshape(x.shape[0], -1)
    xs = _split_time(x, time_steps)
    b = xs.shape[1]
    h0 = jnp.zeros((b, out_f), x.dtype)
    c0 = jnp.zeros((b, out_f), x.dtype)
    sub_states = {k: state.get(k, {}) for k in _LSTM_SUBS}

    def step(carry, x_t):
        h, c, ss = carry
        outs = {}
        new_ss = {}
        for name in _LSTM_SUBS:
            src = h if name.startswith("w") else x_t
            outs[name], new_ss[name] = dense_apply(
                params[name], ss[name], src, "linear", train)
        f = jax.nn.sigmoid(outs["wf"] + outs["uf"])
        i = jax.nn.sigmoid(outs["wi"] + outs["ui"])
        g = jnp.tanh(outs["wg"] + outs["ug"])
        o = jax.nn.sigmoid(outs["wo"] + outs["uo"])
        c_new = f * c + i * g
        h_new = o * jnp.tanh(c_new)
        return (h_new, c_new, new_ss), h_new

    (_, _, final_ss), ys = jax.lax.scan(step, (h0, c0, sub_states), xs)
    new_state = {k: v for k, v in final_ss.items() if v}
    return _merge_time(ys), new_state


# ---------------------------------------------------------------------------
# [crnn]


def crnn_apply(
    params: Params,
    state: State,
    x: Array,
    *,
    sub_cfgs,
    hidden: int,
    shortcut: bool,
    time_steps: int,
    train: bool,
) -> Tuple[Array, State]:
    """[crnn]: the rnn recurrence with conv sub-layers (NHWC).

    ``sub_cfgs`` is a dict of ConvBn2D configs {"input", "self", "output"}
    built by the graph front-end (darknet conv→BN→act order).
    """
    from . import conv as conv_ops

    if x.ndim == 2:  # after a connected layer: darknet treats it as 1×1×c
        x = x[:, None, None, :]
    xs = _split_time(x, time_steps)
    t, b, h_dim, w_dim, _ = xs.shape
    h0 = jnp.zeros((b, h_dim, w_dim, hidden), x.dtype)
    sub_states = {k: state.get(k, {}) for k in ("input", "self", "output")}

    def step(carry, x_t):
        h, ss = carry
        in_out, s_i = conv_ops.conv_bn_apply(
            params["input"], ss["input"], x_t, sub_cfgs["input"], train)
        self_out, s_s = conv_ops.conv_bn_apply(
            params["self"], ss["self"], h, sub_cfgs["self"], train)
        h_new = in_out + self_out
        if shortcut:
            h_new = h_new + h
        y, s_o = conv_ops.conv_bn_apply(
            params["output"], ss["output"], h_new, sub_cfgs["output"], train)
        return (h_new, {"input": s_i, "self": s_s, "output": s_o}), y

    (_, final_ss), ys = jax.lax.scan(step, (h0, sub_states), xs)
    new_state = {k: v for k, v in final_ss.items() if v}
    return _merge_time(ys), new_state
