"""Pipeline (stage) parallelism: the graph split across devices.

The reference has no pipeline parallelism (SURVEY §2.8 — its only axes are
batch DP and the CPU data pipeline).  This module adds the third classic
parallelism family to DP (dp.py) and tensor parallelism (tp.py): the model
graph is cut into contiguous stages, each stage's parameters AND optimizer
state live on their own device, and microbatches stream through the stages
GPipe-style.  It is how a model whose parameters + optimizer state exceed
one chip's HBM trains at all.

TPU-native design notes:

- A CNN detector's stages are **heterogeneous** (shapes and ops differ per
  stage), so the single-program SPMD trick used for uniform transformer
  stacks (stacked per-stage params + ``lax.switch`` + ``ppermute``) does
  not apply.  Instead each stage is its own jitted XLA program pinned to
  its device by operand placement (MPMD).  JAX dispatch is asynchronous,
  so enqueueing the (stage, microbatch) grid in topological order yields
  the classic pipeline wavefront on the devices without explicit
  scheduling: op (s, m) depends only on (s-1, m) activations and (s, m-1)
  BN state.
- The planner cuts the topologically-ordered node list where the set of
  live tensors crossing the cut is small (skip links permitting), then
  places the cuts to balance a per-node FLOP estimate (dominant = conv
  cost) across stages via dynamic programming.
- The backward pass recomputes each stage's forward inside its VJP
  (GPipe-with-rematerialization): only the stage **boundary** activations
  are kept per in-flight microbatch, never the interior — activation
  memory per device is ~1/S of the single-device step's.
- Microbatch semantics match gradient accumulation exactly (darknet
  batch/subdivisions — train/loop.py make_batch_grads): BN state threads
  through microbatches sequentially per stage, gradients are averaged
  over the full logical batch, one optimizer update per step.  The parity
  test asserts the pipeline step equals the accumulation step
  value-for-value.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import optax

from ..config import newslab as cfg

Array = jax.Array


# ----------------------------------------------------------------------
# planning


def _node_cost(model, key: int) -> float:
    """Rough per-node FLOP estimate for stage balancing (conv-dominated)."""
    node = model.graph.nodes[key]
    layer = node.config
    out = node.output_shape
    if not out.is_tensor:
        return 0.0
    dims = out.tensor_shape()
    known = [d.size for d in dims if d.is_known]
    elems = 1.0
    for v in known:
        elems *= v
    if len(dims) == 4 and all(d.is_known for d in list(dims)[1:]):
        c_out, h, w = dims[1].size, dims[2].size, dims[3].size
        in_c = model._in_c.get(key, c_out)
        if isinstance(layer, (cfg.ConvBn2D, cfg.Conv2D)):
            g = getattr(layer, "g", 1) or 1
            return 2.0 * h * w * c_out * in_c * layer.k * layer.k / g
        if isinstance(layer, cfg.DarkCsp2D):
            r = getattr(layer, "repeat", 1) or 1
            return h * w * c_out * c_out * (1.5 + 2.5 * r)
        if isinstance(layer, cfg.SppCsp2D):
            return 8.0 * h * w * c_out * c_out
        if isinstance(layer, cfg.DeconvBn2D):
            return 2.0 * h * w * c_out * in_c * layer.k * layer.k
    return elems  # elementwise-ish


@dataclasses.dataclass(frozen=True)
class StagePlan:
    keys: Tuple[int, ...]      # node keys executed by this stage
    in_keys: Tuple[int, ...]   # boundary tensors consumed (earlier stages)
    out_keys: Tuple[int, ...]  # boundary tensors produced/passed downstream
    cost: float                # planner FLOP estimate


def plan_stages(model, n_stages: int, max_cross: int = 4) -> List[StagePlan]:
    """Cut the topo order into ``n_stages`` contiguous, balanced stages.

    A cut position is feasible when every live value crossing it is a
    plain tensor (no Detect2D/MergeDetect2D structures) and at most
    ``max_cross`` tensors cross (skip links ride along as pass-through
    boundary tensors).  Among feasible cuts, dynamic programming picks
    the placement minimizing the maximum per-stage FLOP estimate.
    """
    graph = model.graph
    order = list(graph.order)
    n = len(order)
    if n_stages < 1:
        raise ValueError(f"n_stages must be >= 1, got {n_stages}")
    pos = {k: i for i, k in enumerate(order)}
    # last position each node's output is consumed at
    last_use = {k: pos[k] for k in order}
    for k in order:
        for src in graph.nodes[k].input_keys.iter_keys():
            last_use[src] = max(last_use[src], pos[k])

    def crossing(i: int) -> List[int]:
        return [k for k in order[:i] if last_use[k] >= i]

    feasible = []
    for i in range(1, n):
        cross = crossing(i)
        if len(cross) > max_cross:
            continue
        if all(graph.nodes[k].output_shape.is_tensor for k in cross):
            feasible.append(i)
    costs = [_node_cost(model, k) for k in order]
    prefix = [0.0]
    for c in costs:
        prefix.append(prefix[-1] + c)

    # DP over cut positions: best[s][p] = minimal max-stage-cost splitting
    # order[:p] into s stages, p ∈ {feasible cuts} ∪ {n}
    points = feasible + [n]
    best: List[Dict[int, Tuple[float, Optional[int]]]] = [
        {} for _ in range(n_stages + 1)
    ]
    best[0][0] = (0.0, None)
    for s in range(1, n_stages + 1):
        ends = points if s < n_stages else [n]
        for p in ends:
            cand = None
            for q, (v, _) in best[s - 1].items():
                if q >= p:
                    continue
                seg = prefix[p] - prefix[q]
                m = max(v, seg)
                if cand is None or m < cand[0]:
                    cand = (m, q)
            if cand is not None:
                best[s][p] = cand
    if n not in best[n_stages]:
        raise ValueError(
            f"graph admits no {n_stages}-stage split with <= {max_cross} "
            f"crossing tensors ({len(feasible)} feasible cut points)")
    cuts = []
    p = n
    for s in range(n_stages, 0, -1):
        _, q = best[s][p]
        cuts.append(p)
        p = q
    bounds = [0] + list(reversed(cuts))  # [0, c1, ..., n]

    plans = []
    for s in range(n_stages):
        a, b = bounds[s], bounds[s + 1]
        keys = tuple(order[a:b])
        in_keys = tuple(crossing(a)) if a else ()
        out_keys = tuple(crossing(b)) if b < n else ()
        plans.append(StagePlan(keys, in_keys, out_keys,
                               prefix[b] - prefix[a]))
    return plans


# ----------------------------------------------------------------------
# model


class PipelineModel:
    """A GraphModel executed as ``n_stages`` device-pinned programs.

    Parameters/BN-state/optimizer state are SPLIT by stage: device group
    ``s`` only ever holds stage ``s``'s slices.  ``split_params`` /
    ``merge_params`` convert to and from the single-device layout, so
    checkpoints stay in the standard format.

    ``dp > 1`` composes pipeline with data parallelism: each stage owns a
    GROUP of ``dp`` devices forming a 1-D data mesh; the stage's params
    replicate within the group and the (micro)batch axis shards over it
    via GSPMD — XLA inserts the within-group gradient all-reduce itself,
    and semantics stay the single-device step's by construction.
    """

    def __init__(self, model, n_stages: int,
                 devices: Optional[Sequence] = None, max_cross: int = 4,
                 dp: int = 1):
        import numpy as np
        from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

        if dp < 1:
            raise ValueError(f"dp must be >= 1, got {dp}")
        self.model = model
        self.stages = plan_stages(model, n_stages, max_cross)
        need = n_stages * dp
        if devices is None:
            devices = jax.devices()[:need]
        if len(devices) < need:
            raise ValueError(
                f"{n_stages} stages x dp={dp} need {need} devices, have "
                f"{len(devices)}")
        self.groups = [list(devices[s * dp:(s + 1) * dp])
                       for s in range(n_stages)]
        # first device of each group — display/compat handle
        self.devices = [g[0] for g in self.groups]
        self.dp = dp
        self.n_stages = n_stages
        self.meshes = [Mesh(np.asarray(g), ("data",)) for g in self.groups]
        self._repl = [NamedSharding(m, P()) for m in self.meshes]
        self._batch = [NamedSharding(m, P("data")) for m in self.meshes]
        self._names = [
            tuple(model._pname[k] for k in p.keys) for p in self.stages
        ]
        self._fwd: Dict[Tuple[int, bool], Callable] = {}

    # -- parameter layout ------------------------------------------------

    def _all_names(self) -> set:
        return {n for names in self._names for n in names}

    def split_opt_state(self, opt_state, place: bool = True) -> List:
        """Full-layout optax state → per-stage states.

        Works structurally: any dict keyed by node names inside the optax
        state (Adam's mu/nu, SGD's trace, ...) filters to the stage's
        nodes; scalar leaves (e.g. the Adam step count) replicate to every
        stage — each stage then advances its own copy identically, so the
        merged state stays exactly the single-device layout and
        **checkpoints are format-compatible across pipeline and plain
        runs**.
        """
        all_names = self._all_names()

        def is_pd(x):
            return isinstance(x, dict) and (not x or set(x) <= all_names)

        out = []
        for s, names in enumerate(self._names):
            keep = set(names)
            sub = jax.tree_util.tree_map(
                lambda d: ({k: v for k, v in d.items() if k in keep}
                           if is_pd(d) else d),
                opt_state, is_leaf=is_pd)
            if place:
                sub = jax.device_put(sub, self._repl[s])
            out.append(sub)
        return out

    def merge_opt_state(self, opt_states: Sequence):
        """Per-stage optax states → the single-device layout."""
        all_names = self._all_names()

        def is_pd(x):
            return isinstance(x, dict) and (not x or set(x) <= all_names)

        opt_states = [jax.device_get(o) for o in opt_states]
        return jax.tree_util.tree_map(
            lambda *ds: ({k: v for d in ds for k, v in d.items()}
                         if is_pd(ds[0]) else ds[0]),
            *opt_states, is_leaf=is_pd)

    def split_params(self, params, place: bool = True) -> List[Dict]:
        """Single-device params → per-stage dicts (placed on stage devices)."""
        out = []
        for s, names in enumerate(self._names):
            sub = {n: params[n] for n in names if n in params}
            if place:
                sub = jax.device_put(sub, self._repl[s])
            out.append(sub)
        return out

    # BN state has the same node-name keying
    split_state = split_params

    def merge_params(self, params_stages: Sequence[Dict]) -> Dict:
        """Per-stage dicts → the single-device layout (host-gathered)."""
        merged = {}
        for sub in params_stages:
            merged.update(jax.device_get(sub))
        return merged

    merge_state = merge_params

    # -- forward -----------------------------------------------------------

    def _stage_fn(self, s: int, train: bool) -> Callable:
        key = (s, train)
        if key in self._fwd:
            return self._fwd[key]
        plan = self.stages[s]
        subset = frozenset(plan.keys)
        last = s == self.n_stages - 1

        def fn(params, state, inputs, x):
            overrides = dict(zip(plan.in_keys, inputs)) or None
            out, new_state = self.model.apply(
                params, state, x, train=train, data_format="NHWC",
                node_overrides=overrides, node_subset=subset,
                output_keys=None if last else plan.out_keys,
            )
            if not last:
                out = tuple(out[k] for k in plan.out_keys)
            return out, new_state

        self._fwd[key] = jax.jit(fn)
        return self._fwd[key]

    def apply(self, params_stages, state_stages, x, train: bool = False,
              data_format: str = "NCHW"):
        """Forward through all stages → (graph output, new per-stage states).

        Stage hand-offs are explicit ICI device-to-device transfers of the
        boundary tensors only.
        """
        if data_format == "NCHW":
            x = jnp.transpose(x, (0, 2, 3, 1))
        if x.shape[0] % self.dp:
            raise ValueError(
                f"batch {x.shape[0]} not divisible by dp={self.dp}")
        x = jax.device_put(x, self._batch[0])
        carry: Tuple = ()
        new_states = []
        out = None
        for s in range(self.n_stages):
            fn = self._stage_fn(s, train)
            carry = tuple(jax.device_put(t, self._batch[s]) for t in carry)
            out, ns = fn(params_stages[s], state_stages[s], carry,
                         x if s == 0 else None)
            new_states.append(ns)
            if s < self.n_stages - 1:
                carry = out
        return out, new_states


class PipelineTrainState:
    """TrainState-shaped view over per-stage pipeline structures.

    The training loop (cli/train_main.py) reads ``.params`` / ``.state`` /
    ``.opt_state`` only at checkpoint/eval boundaries; these properties
    merge the per-stage slices back to the standard single-device layout
    on access, so checkpoints stay format-compatible (FromRecent resume
    works across pipeline and non-pipeline runs) without paying a gather
    on every step.
    """

    ema_params = None

    def __init__(self, pp: PipelineModel, ps, ss, opts, step):
        self._pp = pp
        self.ps, self.ss, self.opts = ps, ss, opts
        self.step = step
        # memoized merges: a checkpoint save reads all three properties
        # (and eval/inference boundaries re-read params/state) — gather
        # from the stage devices once per training step, not per access
        self._merged: Dict[str, Any] = {}

    @classmethod
    def from_train_state(cls, pp: PipelineModel, ts) -> "PipelineTrainState":
        return cls(pp, pp.split_params(ts.params), pp.split_state(ts.state),
                   pp.split_opt_state(ts.opt_state), ts.step)

    def _memo(self, key: str, fn):
        if key not in self._merged:
            self._merged[key] = fn()
        return self._merged[key]

    @property
    def params(self):
        return self._memo("params", lambda: self._pp.merge_params(self.ps))

    @property
    def state(self):
        return self._memo("state", lambda: self._pp.merge_state(self.ss))

    @property
    def opt_state(self):
        return self._memo(
            "opt", lambda: self._pp.merge_opt_state(self.opts))


# ----------------------------------------------------------------------
# GPipe training


class PipelineTrainStep:
    """GPipe microbatch training over a :class:`PipelineModel`.

    One call = one optimizer step on a logical batch: the batch splits
    into ``n_micro`` microbatches that stream through the stages (forward
    wavefront, then reverse wavefront of recompute-VJPs), per-stage
    gradients are averaged over the microbatches, and each stage updates
    its own parameters/optimizer state on its own device.  Semantics
    equal ``make_batch_grads(accum=n_micro)`` (darknet batch/subdivisions)
    — asserted by tests/test_pipeline.py.

    ``clip_grad_norm`` needs the cross-stage global norm and is rejected;
    value clipping and weight decay are per-leaf and compose fine.
    """

    def __init__(self, pp: PipelineModel, config, n_micro: int):
        from ..loss import yolo_loss
        from ..train.loop import make_optimizer

        if config.clip_grad_norm is not None:
            raise ValueError(
                "clip_grad_norm requires a cross-stage global norm and is "
                "not supported under pipeline parallelism")
        if config.use_ema:
            raise ValueError("EMA is not supported under pipeline "
                             "parallelism yet")
        if n_micro < 1:
            raise ValueError(f"n_micro must be >= 1, got {n_micro}")
        self.pp = pp
        self.config = config
        self.n_micro = n_micro
        self.optimizer = make_optimizer(config)
        S = pp.n_stages

        # last stage: forward + loss, differentiated w.r.t. (params, inputs)
        last_plan = pp.stages[S - 1]
        last_subset = frozenset(last_plan.keys)

        def last_loss(params, state, inputs, x, boxes, classes, mask):
            from ..train.loop import collect_step_metrics

            overrides = dict(zip(last_plan.in_keys, inputs)) or None
            pred, new_state = pp.model.apply(
                params, state, x, train=True, data_format="NHWC",
                node_overrides=overrides, node_subset=last_subset)
            out, aux = yolo_loss(pred, boxes, classes, mask, config.loss)
            # same telemetry as the single-device/DP step (benchmark
            # accuracy, debug stats, objectness sample — per config flags)
            metrics = collect_step_metrics(config, out, aux, pred)
            return out.total_loss, (new_state, metrics)

        self._last_vag = jax.jit(
            jax.value_and_grad(last_loss, argnums=(0, 2), has_aux=True))

        # earlier stages: VJP with the forward recomputed inside (GPipe
        # rematerialization — only boundary tensors persist per microbatch)
        def make_bwd(s):
            plan = pp.stages[s]
            subset = frozenset(plan.keys)

            def bwd(params, state, inputs, x, gy):
                def f(p, ins):
                    overrides = dict(zip(plan.in_keys, ins)) or None
                    out, _ = pp.model.apply(
                        p, state, x, train=True, data_format="NHWC",
                        node_overrides=overrides, node_subset=subset,
                        output_keys=plan.out_keys)
                    return tuple(out[k] for k in plan.out_keys)

                _, vjp = jax.vjp(f, params, inputs)
                return vjp(gy)

            return jax.jit(bwd)

        self._bwd = [make_bwd(s) for s in range(S - 1)]
        self._opt_up = [
            jax.jit(self._make_opt_update(pp._repl[s])) for s in range(S)
        ]
        # one fused add program per stage per microbatch (eager per-leaf
        # jnp.add would dispatch a program per parameter leaf)
        self._acc = [
            jax.jit(lambda a, b: jax.tree_util.tree_map(jnp.add, a, b))
            for _ in range(S)
        ]
        self._clamp = [jax.jit(pp.model.clamp_running_vars) for _ in range(S)]

    def _make_opt_update(self, repl):
        n = self.n_micro
        optimizer = self.optimizer
        want_maxima = self.config.log_weights_and_grads

        def up(grads, opt_state, params):
            # pin grads replicated within the stage's group (dp > 1): the
            # bwd program's inferred output sharding isn't contractual
            grads = jax.tree_util.tree_map(
                lambda g: jax.lax.with_sharding_constraint(g / n, repl),
                grads)
            updates, new_opt = optimizer.update(grads, opt_state, params)
            new_params = optax.apply_updates(params, updates)
            maxima = {}
            if want_maxima:
                from ..train.loop import param_maxima

                maxima = param_maxima(new_params, grads)
            return new_params, new_opt, maxima

        return up

    def init_opt(self, params_stages) -> List:
        return [self.optimizer.init(p) for p in params_stages]

    def step_fn(self) -> Callable:
        """(PipelineTrainState, images, boxes, classes, mask) →
        (PipelineTrainState, metrics) — the train-CLI step interface."""

        def fn(pts, images, gt_boxes, gt_classes, gt_mask):
            ps, ss, opts, metrics = self(
                pts.ps, pts.ss, pts.opts, images, gt_boxes, gt_classes,
                gt_mask)
            return (PipelineTrainState(self.pp, ps, ss, opts, pts.step + 1),
                    metrics)

        return fn

    def __call__(self, params_stages, state_stages, opt_states,
                 images, gt_boxes, gt_classes, gt_mask,
                 data_format: str = "NCHW"):
        """One pipelined optimizer step.

        Returns (new params_stages, new state_stages, new opt_states,
        metrics).  ``images`` is the full logical batch; it must divide by
        ``n_micro``.
        """
        pp, S, M = self.pp, self.pp.n_stages, self.n_micro
        if data_format == "NCHW":
            images = jnp.transpose(images, (0, 2, 3, 1))
        if self.config.compute_dtype is not None:
            images = images.astype(self.config.compute_dtype)
        batch = images.shape[0]
        if batch % M:
            raise ValueError(
                f"batch size {batch} not divisible by n_micro {M}")
        mb = batch // M
        if mb % pp.dp:
            raise ValueError(
                f"microbatch size {mb} not divisible by the per-stage "
                f"data-parallel degree dp={pp.dp}")
        micro = lambda t, m: t[m * mb:(m + 1) * mb]

        cur_state = list(state_stages)
        grads: List[Any] = [None] * S

        def add(s, a, b):
            return b if a is None else self._acc[s](a, b)

        # phase 1: forward wavefront; the last stage folds in loss + VJP
        xs: List[Array] = []
        bounds: List[List[Tuple]] = [[None] * M for _ in range(S)]
        states_in: List[List[Any]] = [[None] * M for _ in range(S)]
        gys: List[Tuple] = [None] * M
        metrics_per_m: List[Dict] = []
        for m in range(M):
            x_m = jax.device_put(micro(images, m), pp._batch[0])
            xs.append(x_m)
            carry: Tuple = ()
            for s in range(S - 1):
                states_in[s][m] = cur_state[s]
                bounds[s][m] = carry
                out, ns = pp._stage_fn(s, True)(
                    params_stages[s], cur_state[s], carry,
                    x_m if s == 0 else None)
                cur_state[s] = ns
                carry = tuple(jax.device_put(t, pp._batch[s + 1])
                              for t in out)
            targets = tuple(
                jax.device_put(micro(t, m), pp._batch[S - 1])
                for t in (gt_boxes, gt_classes, gt_mask))
            (_, (ns, metrics)), (gp, gin) = self._last_vag(
                params_stages[S - 1], cur_state[S - 1], carry,
                x_m if S == 1 else None, *targets)
            cur_state[S - 1] = ns
            grads[S - 1] = add(S - 1, grads[S - 1], gp)
            gys[m] = gin
            metrics_per_m.append(metrics)

        # phase 2: reverse wavefront of recompute-VJPs
        for m in range(M):
            gy = gys[m]
            for s in range(S - 2, -1, -1):
                gy = tuple(jax.device_put(t, pp._batch[s]) for t in gy)
                gp, gin = self._bwd[s](
                    params_stages[s], states_in[s][m], bounds[s][m],
                    xs[m] if s == 0 else None, gy)
                grads[s] = add(s, grads[s], gp)
                gy = gin

        # per-stage optimizer update + BN clamp, each on its own device
        new_params, new_opt = [], []
        maxima: Dict[str, Array] = {}
        for s in range(S):
            p, o, mx = self._opt_up[s](grads[s], opt_states[s],
                                       params_stages[s])
            new_params.append(p)
            new_opt.append(o)
            maxima.update(mx)
            cur_state[s] = self._clamp[s](cur_state[s])

        metrics = {
            k: (sum(mm[k] for mm in metrics_per_m)
                if k == "num_matched"
                else mm0 if k == "obj_sample"  # first microbatch's sample
                else sum(mm[k] for mm in metrics_per_m) / M)
            for k, mm0 in metrics_per_m[0].items()
        }
        metrics.update(maxima)
        return new_params, cur_state, new_opt, metrics
