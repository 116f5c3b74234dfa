"""Graph IR → jittable functional model.

Equivalent capability to ``yolo-dl/src/model.rs`` (YoloModel::from_graph /
forward_t): instantiates every IR node as parameters + a compute step and
runs them in topological order.

The key TPU design difference from the reference: the reference interprets
the graph at runtime, dispatching per node through a Module enum
(model.rs:359-410).  Here the graph is **compiled once into a single traced
function** — the Python loop over nodes runs only at trace time, so XLA sees
one flat computation and can fuse across layer boundaries.  Channel counts
and head grids come from the IR's static shape inference.

Layout: activations NHWC on device (channels on the TPU lane axis); the
public ``apply`` accepts NCHW (reference parity) or NHWC.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from ..config import newslab as cfg
from ..graph import Graph
from ..graph.ir import MERGE_DETECT_2D
from ..ops import blocks, conv, detect, simple

Array = jax.Array
Params = Dict[str, Any]
State = Dict[str, Any]


class GraphModel:
    """Any graph compiled to a jittable functional model (generic sink —
    classifier cfgs build too, exceeding the reference whose non-detection
    path is todo!())."""

    def __init__(self, graph: Graph, spd_stem: str = "auto",
                 fold_region: str = "off", remat: str = "off"):
        """``spd_stem``: "auto" (and its alias "stem") enables the
        space-to-depth stem rewrite (ops/spd_stem.py) when the graph
        starts with the eligible darknet conv(k3,s1)→conv(k3,s2) pair;
        "deep" additionally packs the stage-1 residual pair (a measured
        net LOSS on v5e — see the _spd_res comment below — kept opt-in);
        "off" disables both.
        ``fold_region``: "on" executes eligible low-channel subgraphs in
        W-folded layout (ops/fold_region.py).  Off by default: measured
        end-to-end on the v5e chip it loses ~1 ms unscanned / ~6 ms scanned
        because XLA's layout assignment already lane-packs the spatial dim
        for low-channel convs and the fold boundaries force layout copies
        (see ops/fold_region.py docstring for the full measurement).
        ``remat``: "blocks" wraps every ConvBn/DeconvBn/DarkCsp/SppCsp
        node in ``jax.checkpoint`` — the backward pass recomputes
        intra-node activations (pre-act conv outputs, CSP inner convs)
        from the node inputs instead of storing them, trading ~⅓ extra
        forward FLOPs for the dominant share of activation HBM.  The TPU
        memory lever for large inputs/batches; composes with gradient
        accumulation (which shrinks the batch axis instead)."""
        if remat not in ("off", "blocks"):
            raise ValueError(f"remat must be off|blocks, got {remat!r}")
        from ..ops import spd_stem as _spd_ops

        if remat == "blocks":
            self._conv_bn_apply = jax.checkpoint(
                conv.conv_bn_apply, static_argnums=(3, 4))
            self._deconv_bn_apply = jax.checkpoint(
                conv.deconv_bn_apply, static_argnums=(3, 4))
            self._dark_csp_apply = jax.checkpoint(
                blocks.dark_csp_apply, static_argnums=(3, 4, 5))
            self._spp_csp_apply = jax.checkpoint(
                blocks.spp_csp_apply, static_argnums=(3, 4, 5))
            # the spd-stem fast path replaces the first two convs — at full
            # input resolution those hold the LARGEST activations, so the
            # rewrite must be remat'd too (the fold_region path is not:
            # both knobs are opt-in and fold is a measured net loss)
            self._spd_stem_apply = jax.checkpoint(
                _spd_ops.spd_stem_apply, static_argnums=(2, 5, 7))
        else:
            self._conv_bn_apply = conv.conv_bn_apply
            self._deconv_bn_apply = conv.deconv_bn_apply
            self._dark_csp_apply = blocks.dark_csp_apply
            self._spp_csp_apply = blocks.spp_csp_apply
            self._spd_stem_apply = _spd_ops.spd_stem_apply
        self.graph = graph
        self.output_key = graph.output_node().key

        # param name per node: readable path when available
        self._pname: Dict[int, str] = {}
        for key, node in graph.nodes.items():
            self._pname[key] = node.path if node.path is not None else f"node{key}"

        # darknet stopbackward/onlyforward (network.c:362-363, set by
        # graph_from_darknet): these nodes' outputs are wrapped in
        # lax.stop_gradient, so their params get exactly-zero gradients and
        # nothing flows upstream through them — XLA then prunes the frozen
        # prefix's backward entirely (frozen-backbone fine-tuning).  BN
        # running stats still update in the training forward, as darknet's
        # forward does for frozen layers.
        sg_paths = getattr(graph, "stop_gradient_paths", frozenset()) or frozenset()
        self._sg_keys: set = {
            key for key, name in self._pname.items() if name in sg_paths
        }

        # space-to-depth stem eligibility: Input → conv0 → conv1 where conv0
        # has no other consumer (ops/spd_stem.py)
        self._spd_pair = None
        if spd_stem != "off" and len(graph.order) >= 3:
            from ..ops import spd_stem as spd

            k_in, k0, k1 = graph.order[0], graph.order[1], graph.order[2]
            n_in, n0, n1 = graph.nodes[k_in], graph.nodes[k0], graph.nodes[k1]
            consumers_of_k0 = [
                n.key for n in graph.nodes.values()
                if k0 in n.input_keys.iter_keys()
            ]
            if (
                isinstance(n_in.config, cfg.Input)
                and n0.input_keys.kind == "single"
                and n0.input_keys.single_key == k_in
                and n1.input_keys.kind == "single"
                and n1.input_keys.single_key == k0
                and consumers_of_k0 == [k1]
                and spd.stem_is_eligible(n0.config, n1.config)
                # the fused stem applies one stop_gradient at its output —
                # only valid when the two convs share freeze status
                and (k0 in self._sg_keys) == (k1 in self._sg_keys)
            ):
                self._spd_pair = (k_in, k0, k1)

        # extended SPD region: the stage-1 residual pair after the stem
        # (conv 1×1 s1 → conv 3×3 s1 → shortcut back to the stem output)
        # executed in the packed 2×2→channel domain (ops/spd_stem.py
        # spd_res_block_apply).  OPT-IN via spd_stem="deep": measured
        # end-to-end on the v5e chip (2026-08-20, yolov4-csp 608 b16) it
        # LOSES — train 163.6 → 149.8 img/s, inference 462 → 418 img/s —
        # even though the isolated packed 1×1 wins 5× (exp_lowchannel E1):
        # the 4× block-diagonal FLOPs, the in-program pack/unpack layout
        # ops, and the traced weight-scatter VJP eat the lane-utilization
        # gain once XLA fuses the surrounding program.  Kept exact +
        # tested; "auto" = stem only (the measured best).
        self._spd_res = None
        if (self._spd_pair is not None and spd_stem == "deep"
                and len(graph.order) >= 6):
            from ..ops import spd_stem as spd

            _, k0, k1 = self._spd_pair
            n1 = graph.nodes[k1]
            k2, k3, k4 = graph.order[3], graph.order[4], graph.order[5]
            n2, n3, n4 = graph.nodes[k2], graph.nodes[k3], graph.nodes[k4]

            def consumers(k):
                return {n.key for n in graph.nodes.values()
                        if k in n.input_keys.iter_keys()}

            if (
                n2.input_keys.kind == "single"
                and n2.input_keys.single_key == k1
                and n3.input_keys.kind == "single"
                and n3.input_keys.single_key == k2
                and isinstance(n4.config, cfg.DarknetShortcut)
                and set(n4.input_keys.iter_keys()) == {k3, k1}
                and len(list(n4.input_keys.iter_keys())) == 2
                and n4.config.weights_type == "none"
                and consumers(k1) == {k2, k4}
                and consumers(k2) == {k3}
                and consumers(k3) == {k4}
                and spd.res_block_is_eligible(n2.config, n3.config)
                and n3.config.c == n1.config.c  # shortcut operands equal c
                # one stop_gradient at the region output freezes all three
                and len({k in self._sg_keys for k in (k2, k3, k4)}) == 1
            ):
                self._spd_res = (k2, k3, k4)
        if remat == "blocks":
            self._spd_res_apply = jax.checkpoint(
                _spd_ops.spd_res_block_apply, static_argnums=(2, 5, 6, 8))
        else:
            self._spd_res_apply = _spd_ops.spd_res_block_apply

        # input channel count per node (from predecessor's inferred shape)
        self._in_c: Dict[int, int] = {}
        self._fold_keys: set = set()
        self._in_features: Dict[int, int] = {}  # flattened size (Linear)
        for key, node in graph.nodes.items():
            ik = node.input_keys
            if ik.kind == "single":
                src_shape = graph.nodes[ik.single_key].output_shape
                if src_shape.is_tensor:
                    shape = src_shape.tensor_shape()
                    c = shape[1]
                    if c.is_known:
                        self._in_c[key] = c.size  # NCHW logical shape: C at axis 1
                    if all(d.is_known for d in shape[1:]):
                        feat = 1
                        for d in shape[1:]:
                            feat *= d.size
                        self._in_features[key] = feat

        if fold_region != "off":
            self._fold_keys = self._detect_fold_region()

    def _detect_fold_region(self) -> set:
        """Nodes to execute W-folded (ops/fold_region.py): low-channel
        shape-preserving convs, plus the elementwise sum/shortcut nodes
        between them so fold/unfold reshapes happen only at region edges."""
        from ..ops import fold_region as fr

        region: set = set()
        for key in self.graph.order:
            node = self.graph.nodes[key]
            layer = node.config
            ikeys = list(node.input_keys.iter_keys())
            if isinstance(layer, cfg.ConvBn2D):
                in_c = self._in_c.get(key)
                if (len(ikeys) == 1 and in_c is not None
                        and fr.conv_is_foldable(layer, in_c)):
                    region.add(key)
            elif isinstance(layer, (cfg.Sum2D, cfg.DarknetShortcut)):
                if not ikeys or not any(k in region for k in ikeys):
                    continue
                if (isinstance(layer, cfg.DarknetShortcut)
                        and layer.weights_type != "none"):
                    continue
                # all inputs must have equal, fully-known tensor shapes
                # (folded channel order breaks min-channel-prefix adds)
                shapes = set()
                ok = True
                for k2 in ikeys:
                    s = self.graph.nodes[k2].output_shape
                    if not s.is_tensor:
                        ok = False
                        break
                    dims = s.tensor_shape()
                    if not all(d.is_known for d in dims[1:]):
                        ok = False
                        break
                    shapes.add(tuple(d.size for d in dims[1:]))
                if ok and len(shapes) == 1:
                    region.add(key)
        return region

    # ------------------------------------------------------------------

    def init(self, key: Array) -> Tuple[Params, State]:
        """Initialize parameters and BN state for every parameterized node."""
        params: Params = {}
        state: State = {}
        nodes = [self.graph.nodes[k] for k in self.graph.order]
        param_nodes = [
            n for n in nodes
            if isinstance(n.config, (cfg.ConvBn2D, cfg.Conv2D, cfg.DeconvBn2D,
                                     cfg.DarkCsp2D, cfg.SppCsp2D, cfg.Linear,
                                     cfg.DarknetRnn, cfg.DarknetGru,
                                     cfg.DarknetLstm, cfg.DarknetCrnn))
        ]
        keys = jax.random.split(key, max(len(param_nodes), 1))
        for node, k in zip(param_nodes, keys):
            name = self._pname[node.key]
            layer = node.config
            in_c = self._in_c[node.key]
            if isinstance(layer, cfg.ConvBn2D):
                p, s = conv.conv_bn_init(k, layer, in_c)
            elif isinstance(layer, cfg.Conv2D):
                as_convbn = cfg.ConvBn2D(
                    c=layer.c, k=layer.k, s=layer.s, p=layer.p, d=layer.d,
                    g=layer.g, bias=layer.bias, act="linear",
                    bn=cfg.BatchNormConfig(enabled=False),
                )
                p, s = conv.conv_bn_init(k, as_convbn, in_c)
            elif isinstance(layer, cfg.DeconvBn2D):
                p, s = conv.deconv_bn_init(k, layer, in_c)
            elif isinstance(layer, cfg.DarkCsp2D):
                p, s = blocks.dark_csp_init(k, layer, in_c)
            elif isinstance(layer, cfg.SppCsp2D):
                p, s = blocks.spp_csp_init(k, layer, in_c)
            elif isinstance(layer, cfg.Linear):
                from ..ops import recurrent
                p, s = recurrent.dense_init(
                    k, self._in_features[node.key], layer.out,
                    layer.bn.enabled)
            elif isinstance(layer, cfg.DarknetRnn):
                from ..ops import recurrent
                p, s = recurrent.rnn_init(
                    k, self._in_features[node.key], layer.hidden, layer.out,
                    layer.bn)
            elif isinstance(layer, cfg.DarknetGru):
                from ..ops import recurrent
                p, s = recurrent.gru_init(
                    k, self._in_features[node.key], layer.out, layer.bn)
            elif isinstance(layer, cfg.DarknetLstm):
                from ..ops import recurrent
                p, s = recurrent.lstm_init(
                    k, self._in_features[node.key], layer.out, layer.bn)
            elif isinstance(layer, cfg.DarknetCrnn):
                p, s = {}, {}
                for sub_idx, (sub_name, sub_cfg) in enumerate(
                        self._crnn_sub_cfgs(layer).items()):
                    sub_in = self._in_c[node.key] if sub_name == "input" \
                        else layer.hidden
                    sp, ss = conv.conv_bn_init(
                        jax.random.fold_in(k, sub_idx), sub_cfg, sub_in)
                    p[sub_name] = sp
                    if ss:
                        s[sub_name] = ss
            else:  # pragma: no cover
                continue
            params[name] = p
            if s:
                state[name] = s
        return params, state

    # ------------------------------------------------------------------

    @staticmethod
    def _crnn_sub_cfgs(layer: "cfg.DarknetCrnn") -> Dict[str, cfg.ConvBn2D]:
        """The three conv sub-layer geometries of a [crnn] node
        (crnn_layer.c:54-64: input c→hidden, self hidden→hidden,
        output hidden→out, all sharing size/pad/act/BN, darknet order)."""
        def sub(out_c: int) -> cfg.ConvBn2D:
            return cfg.ConvBn2D(
                c=out_c, k=layer.k, s=1, p=layer.p, d=layer.d, g=layer.g,
                bias=not layer.bn, act=layer.act,
                bn=cfg.BatchNormConfig(enabled=layer.bn), order="bn_act",
            )
        return {"input": sub(layer.hidden), "self": sub(layer.hidden),
                "output": sub(layer.out)}

    def apply(
        self,
        params: Params,
        state: State,
        x: Array,
        train: bool = False,
        data_format: str = "NCHW",
        return_intermediates: bool = False,
        rng: Optional[Array] = None,
        node_overrides: Optional[Dict[int, Array]] = None,
        output_key: Optional[int] = None,
        node_subset: Optional[Any] = None,
        output_keys: Optional[Any] = None,
    ) -> Tuple[Any, State]:
        """Forward pass → (MergedDetection, new_state).

        ``data_format`` describes ``x``; compute is NHWC internally.
        With ``return_intermediates`` the result is
        (MergedDetection, new_state, {node_name: NHWC activation}) — the
        hook the darknet parity harness uses for per-layer MSE checks
        (darknet-test/src/main.rs:112-195 role).
        ``output_key`` returns a specific node's output instead of the
        graph output (unused nodes downstream are dead code under jit) —
        e.g. the pre-softmax logits for numerically-stable CE training.
        ``node_subset`` executes ONLY the listed node keys (a contiguous
        pipeline stage, parallel/pipeline.py) — their inputs must be in
        the subset or supplied via ``node_overrides``; ``x`` may then be
        None when the Input node is not in the subset.  ``output_keys``
        returns ``({key: output}, new_state)`` for several nodes at once
        (a stage's boundary tensors).
        """
        if x is not None:
            if data_format == "NCHW":
                x = jnp.transpose(x, (0, 2, 3, 1))
            elif data_format != "NHWC":
                raise ValueError(f"unknown data_format {data_format!r}")
        if node_subset is not None:
            node_subset = set(node_subset)

        outputs: Dict[int, Any] = {}
        new_state: State = dict(state)
        if node_overrides:
            # precomputed node outputs (NHWC), e.g. a spatially-sharded
            # prefix computed under shard_map (parallel/spatial_model.py);
            # those nodes are skipped below
            outputs.update(node_overrides)

        # space-to-depth stem fast path (exact rewrite; skipped when
        # intermediates are requested, e.g. by the parity harness).  A
        # pipeline stage (node_subset) keeps the rewrite when it holds the
        # whole stem trio and receives the raw image.
        spd_skip = set()
        if (
            self._spd_pair is not None
            and not return_intermediates
            and not node_overrides
            and (node_subset is None
                 or set(self._spd_pair) <= node_subset)
            and x is not None
            and x.shape[1] % 2 == 0
            and x.shape[2] % 2 == 0
        ):
            k_in, k0, k1 = self._spd_pair
            n0, n1 = self.graph.nodes[k0], self.graph.nodes[k1]
            name0, name1 = self._pname[k0], self._pname[k1]
            out1, s0, s1 = self._spd_stem_apply(
                params[name0], state.get(name0, {}), n0.config,
                params[name1], state.get(name1, {}), n1.config,
                x, train,
            )
            if s0:
                new_state[name0] = s0
            if s1:
                new_state[name1] = s1
            outputs[k_in] = x
            # frozen stem (darknet stopbackward prefix): one stop_gradient
            # at the fused output freezes both convs (k0's only consumer
            # is k1 by eligibility; __init__ keeps the pair only when the
            # two convs share freeze status)
            outputs[k1] = (jax.lax.stop_gradient(out1)
                           if k1 in self._sg_keys else out1)
            spd_skip = {k_in, k0, k1}

            # extended SPD region: the stage-1 residual pair stays in the
            # packed domain (one pack at out1, one unpack at the shortcut)
            if (
                self._spd_res is not None
                and (node_subset is None
                     or set(self._spd_res) <= node_subset)
                and out1.shape[1] % 2 == 0
                and out1.shape[2] % 2 == 0
            ):
                k2, k3, k4 = self._spd_res
                n2, n3 = self.graph.nodes[k2], self.graph.nodes[k3]
                n4 = self.graph.nodes[k4]
                name2, name3 = self._pname[k2], self._pname[k3]
                out4, s2, s3 = self._spd_res_apply(
                    params[name2], state.get(name2, {}), n2.config,
                    params[name3], state.get(name3, {}), n3.config,
                    n4.config.act, out1, train,
                )
                if s2:
                    new_state[name2] = s2
                if s3:
                    new_state[name3] = s3
                outputs[k4] = (jax.lax.stop_gradient(out4)
                               if k4 in self._sg_keys else out4)
                spd_skip |= {k2, k3, k4}

        # W-folded execution of low-channel regions (exact rewrite;
        # ops/fold_region.py).  ``folded`` caches packed forms so reshapes
        # occur only at region edges; unfolded outputs are still recorded
        # for every region node — XLA dead-code-eliminates unused ones.
        folded: Dict[int, Any] = {}
        fold_active = (bool(self._fold_keys) and not return_intermediates
                       and node_subset is None)
        if fold_active:
            from ..ops import fold_region as fr

        def folded_input(k: int) -> Optional[Array]:
            if k in folded:
                return folded[k]
            t = outputs[k]
            if not isinstance(t, jax.Array) or t.ndim != 4 \
                    or t.shape[2] % fr.FOLD != 0:
                return None
            folded[k] = fr.fold_w(t)
            return folded[k]

        for key in self.graph.order:
            if key in spd_skip:
                continue
            if node_overrides and key in node_overrides:
                continue
            if node_subset is not None and key not in node_subset:
                continue
            node = self.graph.nodes[key]
            layer = node.config
            name = self._pname[key]
            ik = node.input_keys

            def single() -> Any:
                return outputs[ik.single_key]

            if fold_active and key in self._fold_keys:
                if isinstance(layer, cfg.ConvBn2D):
                    xf = folded_input(ik.single_key)
                    if xf is not None:
                        out_f, s = fr.fold_conv_bn_apply(
                            params[name], state.get(name, {}), xf, layer,
                            train)
                        if s:
                            new_state[name] = s
                        if key in self._sg_keys:
                            out_f = jax.lax.stop_gradient(out_f)
                        folded[key] = out_f
                        outputs[key] = fr.unfold_w(out_f)
                        continue
                else:  # Sum2D / DarknetShortcut with equal input shapes
                    ins_f = [folded_input(k2) for k2 in ik.iter_keys()]
                    if all(t is not None for t in ins_f):
                        out_f = ins_f[0]
                        for other in ins_f[1:]:
                            out_f = out_f + other
                        if isinstance(layer, cfg.DarknetShortcut):
                            from .. import activations
                            out_f = activations.apply(layer.act, out_f)
                        if key in self._sg_keys:
                            out_f = jax.lax.stop_gradient(out_f)
                        folded[key] = out_f
                        outputs[key] = fr.unfold_w(out_f)
                        continue
                # fall through: input width not divisible → canonical path

            if isinstance(layer, cfg.Input):
                if ik.kind == "placeholder":
                    if x is None:
                        raise ValueError(
                            "x is required when the Input node executes")
                    expect_c = layer.shape[1]
                    if expect_c.is_known and x.shape[-1] != expect_c.size:
                        raise ValueError(
                            f"input channels {x.shape[-1]} != declared {expect_c.size}"
                        )
                    outputs[key] = x
                else:
                    outputs[key] = single()
            elif isinstance(layer, cfg.ConvBn2D):
                out, s = self._conv_bn_apply(
                    params[name], state.get(name, {}), single(), layer, train
                )
                if s:
                    new_state[name] = s
                outputs[key] = out
            elif isinstance(layer, cfg.Conv2D):
                out = conv.conv2d_apply(
                    single(), params[name]["w"], params[name].get("b"),
                    stride=layer.s, padding=layer.padding,
                    dilation=layer.d, groups=layer.g,
                )
                outputs[key] = out
            elif isinstance(layer, cfg.DeconvBn2D):
                out, s = self._deconv_bn_apply(
                    params[name], state.get(name, {}), single(), layer, train
                )
                if s:
                    new_state[name] = s
                outputs[key] = out
            elif isinstance(layer, cfg.DarkCsp2D):
                out, s = self._dark_csp_apply(
                    params[name], state.get(name, {}), single(), layer,
                    self._in_c[key], train,
                )
                if s:
                    new_state[name] = s
                outputs[key] = out
            elif isinstance(layer, cfg.SppCsp2D):
                out, s = self._spp_csp_apply(
                    params[name], state.get(name, {}), single(), layer,
                    self._in_c[key], train,
                )
                if s:
                    new_state[name] = s
                outputs[key] = out
            elif isinstance(layer, cfg.UpSample2D):
                if layer.stride is not None and layer.reverse:
                    outputs[key] = simple.downsample2d(single(), layer.stride)
                else:
                    outputs[key] = simple.upsample2d(single(), layer.scale)
            elif isinstance(layer, cfg.MaxPool):
                outputs[key] = simple.max_pool2d(
                    single(), layer.size, layer.stride_y, layer.stride_x,
                    layer.padding, layer.total_padding, layer.pool_kind,
                )
            elif isinstance(layer, cfg.DynamicPad2D):
                outputs[key] = simple.dynamic_pad2d(
                    single(), layer.t, layer.b, layer.l, layer.r, layer.pad_kind
                )
            elif isinstance(layer, cfg.Sum2D):
                outputs[key] = simple.sum2d([outputs[k] for k in ik.iter_keys()])
            elif isinstance(layer, cfg.Concat2D):
                outputs[key] = simple.concat2d([outputs[k] for k in ik.iter_keys()])
            elif isinstance(layer, cfg.Detect2D):
                outputs[key] = detect.detect_decode(
                    single(), layer.anchors, layer.classes,
                    order=layer.channel_order, variant=layer.variant,
                    scale_xy=layer.scale_xy, entry_layout=layer.entry_layout,
                    gaussian=layer.gaussian,
                    class_activation=layer.class_activation,
                )
            elif isinstance(layer, cfg.DarknetRoute):
                ins = [outputs[k] for k in ik.iter_keys()]
                n = layer.num_groups
                if n > 1:
                    sliced = []
                    for t in ins:
                        gc = t.shape[-1] // n
                        sliced.append(t[..., layer.group_id * gc:(layer.group_id + 1) * gc])
                    ins = sliced
                outputs[key] = ins[0] if len(ins) == 1 else simple.concat2d(ins)
            elif isinstance(layer, cfg.DarknetShortcut):
                from .. import activations
                ins = [outputs[k] for k in ik.iter_keys()]
                out = ins[0]
                oh, ow = out.shape[1], out.shape[2]
                for other in ins[1:]:
                    # darknet shortcut_cpu: stride-sample larger maps,
                    # nearest-repeat smaller ones
                    fh, fw = other.shape[1], other.shape[2]
                    if fh > oh:
                        other = other[:, :: fh // oh, :: fw // ow, :]
                    elif fh < oh:
                        other = jnp.repeat(
                            jnp.repeat(other, oh // fh, axis=1), ow // fw, axis=2
                        )
                    c = min(out.shape[-1], other.shape[-1])
                    out = out.at[..., :c].add(other[..., :c]) if c < out.shape[-1] \
                        else out + other[..., :c]
                outputs[key] = activations.apply(layer.act, out)
            elif isinstance(layer, cfg.DarknetSam):
                ins = [outputs[k] for k in ik.iter_keys()]
                outputs[key] = ins[0] * ins[1]
            elif isinstance(layer, cfg.DarknetScaleChannels):
                scale, target = (outputs[k] for k in ik.iter_keys())
                # scale is [b,1,1,c] (SE) or [b,h,w,1] (scale_wh); broadcast
                outputs[key] = scale * target
            elif isinstance(layer, cfg.Reorg2D):
                from ..ops.spd_stem import space_to_depth

                st = layer.stride
                h2 = single()
                if layer.old and not layer.reverse:
                    # REORG_OLD: reinterpret the NCHW buffer as
                    # [c/s^2, h*s, w*s], space-to-depth, reinterpret back as
                    # [c*s^2, h/s, w/s] (blas.c reorg_cpu with input dims)
                    b_, hh, ww, cc = h2.shape
                    nchw = jnp.transpose(h2, (0, 3, 1, 2))
                    view = nchw.reshape(b_, cc // (st * st), hh * st, ww * st)
                    view = jnp.transpose(view, (0, 2, 3, 1))        # NHWC
                    shuffled = space_to_depth(view, st)             # [b,h,w,c]
                    out_nchw = jnp.transpose(shuffled, (0, 3, 1, 2))
                    out_nchw = out_nchw.reshape(
                        b_, cc * st * st, hh // st, ww // st
                    )
                    outputs[key] = jnp.transpose(out_nchw, (0, 2, 3, 1))
                elif layer.reverse:
                    b_, hh, ww, cc = h2.shape
                    h2 = h2.reshape(b_, hh, ww, st, st, cc // (st * st))
                    h2 = jnp.transpose(h2, (0, 1, 3, 2, 4, 5))
                    outputs[key] = h2.reshape(b_, hh * st, ww * st, cc // (st * st))
                else:
                    outputs[key] = space_to_depth(h2, st)
            elif isinstance(layer, cfg.MergeDetect2D):
                outputs[key] = detect.merge_detections(
                    [outputs[k] for k in ik.iter_keys()]
                )
            elif isinstance(layer, cfg.Linear):
                from ..ops import recurrent
                h = single()
                out, s = recurrent.dense_apply(
                    params[name], state.get(name, {}),
                    h.reshape(h.shape[0], -1), layer.act, train,
                )
                if s:
                    new_state[name] = s
                outputs[key] = out
            elif isinstance(layer, cfg.DarknetRnn):
                from ..ops import recurrent
                out, s = recurrent.rnn_apply(
                    params[name], state.get(name, {}), single(),
                    hidden=layer.hidden, act=layer.act,
                    self_act=layer.self_act, shortcut=layer.shortcut,
                    time_steps=layer.time_steps, train=train,
                )
                if s:
                    new_state[name] = s
                outputs[key] = out
            elif isinstance(layer, cfg.DarknetGru):
                from ..ops import recurrent
                out, s = recurrent.gru_apply(
                    params[name], state.get(name, {}), single(),
                    out_f=layer.out, time_steps=layer.time_steps, train=train,
                )
                if s:
                    new_state[name] = s
                outputs[key] = out
            elif isinstance(layer, cfg.DarknetLstm):
                from ..ops import recurrent
                out, s = recurrent.lstm_apply(
                    params[name], state.get(name, {}), single(),
                    out_f=layer.out, time_steps=layer.time_steps, train=train,
                )
                if s:
                    new_state[name] = s
                outputs[key] = out
            elif isinstance(layer, cfg.DarknetCrnn):
                from ..ops import recurrent
                out, s = recurrent.crnn_apply(
                    params[name], state.get(name, {}), single(),
                    sub_cfgs=self._crnn_sub_cfgs(layer), hidden=layer.hidden,
                    shortcut=layer.shortcut, time_steps=layer.time_steps,
                    train=train,
                )
                if s:
                    new_state[name] = s
                outputs[key] = out
            elif isinstance(layer, cfg.GlobalAvgPool2D):
                # NHWC → [b, 1, 1, c] (darknet avgpool keeps a 1×1 map)
                outputs[key] = jnp.mean(single(), axis=(1, 2), keepdims=True)
            elif isinstance(layer, cfg.Identity):
                outputs[key] = single()
            elif isinstance(layer, cfg.Dropout):
                h = single()
                if train and rng is not None:
                    keep = 1.0 - layer.probability
                    node_rng = jax.random.fold_in(rng, key)
                    mask = jax.random.bernoulli(node_rng, keep, h.shape)
                    h = jnp.where(mask, h / keep, 0.0)
                outputs[key] = h
            elif isinstance(layer, cfg.Softmax):
                outputs[key] = jax.nn.softmax(single(), axis=-1)
            elif isinstance(layer, cfg.Yolov1Detection):
                h = single()
                if h.ndim == 4:
                    # conv-fed: darknet's [detection] consumes the CHW-flat
                    # activation (detection_layer.c indexes class/conf/box
                    # blocks in that order) — a bare NHWC reshape would
                    # interleave the blocks
                    h = jnp.transpose(h, (0, 3, 1, 2))
                h = h.reshape(h.shape[0], -1)
                if layer.softmax:
                    # per-cell softmax over the leading S²·C class block
                    # (detection_layer.c:9-17); confidences/boxes untouched
                    n_cls = layer.side * layer.side * layer.classes
                    cls = jax.nn.softmax(
                        h[:, :n_cls].reshape(h.shape[0], -1, layer.classes),
                        axis=-1,
                    ).reshape(h.shape[0], n_cls)
                    h = jnp.concatenate([cls, h[:, n_cls:]], axis=-1)
                outputs[key] = h
            else:
                raise NotImplementedError(f"forward for {layer.kind}")

            if key in self._sg_keys:
                # darknet stopbackward/onlyforward: zero gradient for this
                # node's params and nothing upstream through it
                outputs[key] = jax.tree_util.tree_map(
                    jax.lax.stop_gradient, outputs[key])

        if output_keys is not None:
            return {k: outputs[k] for k in output_keys}, new_state
        out_key = self.output_key if output_key is None else output_key
        if return_intermediates:
            named = {
                self._pname[k]: v
                for k, v in outputs.items()
                if isinstance(v, jax.Array)
            }
            return outputs[out_key], new_state, named
        return outputs[out_key], new_state

    # ------------------------------------------------------------------

    def clamp_running_vars(self, state: State) -> State:
        """Apply per-node var_min/var_max clamps (model.rs:412-422 →
        dark_batch_norm.rs:148-172). Call after each optimizer step."""
        from ..ops.norm import clamp_running_var

        new_state = dict(state)
        for key in self.graph.order:
            node = self.graph.nodes[key]
            layer = node.config
            name = self._pname[key]
            if name not in state:
                continue
            bn_cfg = getattr(layer, "bn", None)
            # recurrent layers ([rnn]/[gru]/[lstm]/[crnn]) carry bn as a
            # plain bool (no clamp knobs, like darknet) — nothing to clamp
            if bn_cfg is None or not hasattr(bn_cfg, "var_min"):
                continue
            if bn_cfg.var_min is None and bn_cfg.var_max is None:
                continue
            node_state = state[name]
            if isinstance(layer, (cfg.ConvBn2D, cfg.DeconvBn2D)):
                if "bn" in node_state:
                    new_state[name] = {
                        **node_state,
                        "bn": clamp_running_var(node_state["bn"], bn_cfg.var_min, bn_cfg.var_max),
                    }
            else:  # composite blocks: clamp every sub-conv's bn
                sub = dict(node_state)
                for sub_name, sub_state in node_state.items():
                    if isinstance(sub_state, dict) and "bn" in sub_state:
                        sub[sub_name] = {
                            **sub_state,
                            "bn": clamp_running_var(sub_state["bn"], bn_cfg.var_min, bn_cfg.var_max),
                        }
                new_state[name] = sub
        return new_state


class YoloModel(GraphModel):
    """A detection model: validates the MergeDetect2D sink and uniform class
    count (model.rs:330-353)."""

    def __init__(self, graph: Graph, spd_stem: str = "auto",
                 fold_region: str = "off", remat: str = "off"):
        super().__init__(graph, spd_stem, fold_region, remat)
        out = graph.nodes[self.output_key]
        if out.output_shape.kind != MERGE_DETECT_2D:
            raise ValueError(
                "model output must be a MergeDetect2D node (model.rs:330-353)"
            )
        det_nodes = [
            n for n in graph.nodes.values() if isinstance(n.config, cfg.Detect2D)
        ]
        if not det_nodes:
            raise ValueError("model has no Detect2D heads")
        classes = {n.config.classes for n in det_nodes}
        if len(classes) != 1:
            raise ValueError(f"Detect2D heads disagree on num_classes: {classes}")
        self.num_classes: int = classes.pop()
        self.anchors = tuple(n.config.anchors for n in det_nodes)
