"""Vectorized YOLOv5-style target↔anchor matcher.

Equivalent capability to ``yolo-dl/src/loss/pred_target_matching.rs``
(CyCxHWMatcher): per GT × per head, snap to the center cell plus neighbor
cells whose center fraction passes 0.5 (Rect2: top/left only; Rect4: all
four — :87-118), filter anchors by h/w ratio ≤ anchor_scale_thresh (:139-150),
and dedupe cell collisions keeping the nearest-center GT (:180-217).

The reference runs this as a scalar Rust loop on the CPU **per step**, then
uploads the result — a host↔device sync inside the loss (SURVEY §3.1 hot
loop).  This version is a fixed-shape device computation:

- ground truth is padded to ``max_gt`` boxes per image with a validity mask,
- all (gt × neighbor × anchor) candidates are materialized as a static
  [B, C] lattice (C = max_gt · 5 · Σ anchors) with masks,
- the nearest-center dedupe is a two-pass scatter-min over flat cell ids —
  deterministic (ties break to the lowest candidate index, unlike the
  reference's HashMap iteration order).

Everything is jit/vmap/grad-compatible; no dynamic shapes.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from ..ops.detect import MergedDetection

Array = jax.Array

SNAP_THRESH = 0.5  # pred_target_matching.rs:56


import typing


@dataclasses.dataclass(frozen=True)
class MatcherConfig:
    """Defaults: Rect4, thresh 4.0 (CyCxHWMatcherInit, :17-24)."""

    match_grid: str = "rect4"  # "rect2" | "rect4"
    anchor_scale_thresh: float = 4.0
    # darknet [yolo] iou_thresh adoption (yolo_layer.c:640-656): when a
    # head's threshold is < 1, every anchor whose wh-only shape-IoU vs the
    # GT exceeds it ALSO matches at the GT's center cell, bypassing the
    # v5 ratio gate — the production-form analogue of darknet's
    # multi-anchor matching (grafted onto the v5 matcher, so neighbor-cell
    # snaps still apply to the ratio-gated candidates).  None = off; a
    # scalar applies to every head; a tuple is per-head in merge order.
    shape_iou_thresh: typing.Union[None, float, tuple] = None

    def __post_init__(self):
        if self.anchor_scale_thresh < 1.0:
            raise ValueError("anchor_scale_thresh must be >= 1")
        if self.match_grid not in ("rect2", "rect4"):
            raise ValueError(f"unknown match_grid {self.match_grid!r}")


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class MatchingOutput:
    """Fixed-shape matching lattice (MatchingOutput parity, :271-284)."""

    flat: Array      # [B, C] int32 — flat cell index into the merged axis
    gt_cycxhw: Array  # [B, C, 4] matched target box (ratio units)
    gt_class: Array  # [B, C] int32
    valid: Array     # [B, C] bool

    def tree_flatten(self):
        return (self.flat, self.gt_cycxhw, self.gt_class, self.valid), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)

    def num_matched(self) -> Array:
        return jnp.sum(self.valid.astype(jnp.int32))

    def gather_pred(self, prediction: MergedDetection):
        """Gather predicted boxes/logits at the matched cells
        (index_by_flats parity, merged_dense_detection.rs:280).

        Implemented as vmapped row gathers — XLA lowers ``x[idx]`` on the
        leading axis to contiguous-row gathers, which are an order of
        magnitude faster on TPU than the per-element general gather that
        ``take_along_axis`` with a broadcast index produces.
        """

        def per_image(cycxhw, obj, cls, flat):
            return cycxhw[flat], obj[flat], cls[flat]

        return jax.vmap(per_image)(
            prediction.cycxhw, prediction.obj_logit, prediction.class_logit, self.flat
        )


def match_targets(
    prediction: MergedDetection,
    gt_cycxhw: Array,  # [B, M, 4] ratio units
    gt_class: Array,   # [B, M] int
    gt_mask: Array,    # [B, M] bool
    config: MatcherConfig = MatcherConfig(),
) -> MatchingOutput:
    infos = prediction.infos
    b, m, _ = gt_cycxhw.shape
    n = prediction.num_flats
    rect4 = config.match_grid == "rect4"
    thresh = config.anchor_scale_thresh

    cy, cx = gt_cycxhw[..., 0], gt_cycxhw[..., 1]
    th, tw = gt_cycxhw[..., 2], gt_cycxhw[..., 3]
    # zero-sized boxes are skipped (pred_target_matching.rs:64-69)
    size_ok = (th > 0.0) & (tw > 0.0)
    base_ok = gt_mask & size_ok  # [B, M]

    flats, valids, dists = [], [], []
    block_widths = []  # candidate-block width per info (5, or 6 w/ shape gate)
    for k, info in enumerate(infos):
        fh, fw = info.feature_h, info.feature_w
        a = info.num_anchors
        thr_k = config.shape_iou_thresh
        if isinstance(thr_k, tuple):
            if len(thr_k) != len(infos):
                raise ValueError(
                    f"per-head shape_iou_thresh has {len(thr_k)} entries "
                    f"for {len(infos)} detect heads")
            thr_k = thr_k[k]
        use_shape = thr_k is not None and float(thr_k) < 1.0

        gy = cy * fh
        gx = cx * fw
        row = jnp.floor(gy)
        col = jnp.floor(gx)
        fy = gy - row
        fx = gx - col

        # neighbor offsets: center, top, left, bottom, right (:101-112)
        off_r = jnp.asarray([0, -1, 0, 1, 0], jnp.float32)
        off_c = jnp.asarray([0, 0, -1, 0, 1], jnp.float32)
        ones = jnp.ones_like(fy, dtype=bool)
        cond = jnp.stack(
            [
                ones,
                fy < SNAP_THRESH,
                fx < SNAP_THRESH,
                (fy > 1.0 - SNAP_THRESH) if rect4 else jnp.zeros_like(ones),
                (fx > 1.0 - SNAP_THRESH) if rect4 else jnp.zeros_like(ones),
            ],
            axis=-1,
        )  # [B, M, 5]

        r2 = row[..., None] + off_r  # [B, M, 5]
        c2 = col[..., None] + off_c
        in_bounds = (r2 >= 0) & (r2 < fh) & (c2 >= 0) & (c2 < fw)

        # anchor size gate (:139-150)
        ah = jnp.asarray([x for x, _ in info.anchors], jnp.float32)
        aw = jnp.asarray([x for _, x in info.anchors], jnp.float32)
        rh = th[..., None] / ah  # [B, M, A]
        rw = tw[..., None] / aw
        ratio = jnp.maximum(
            jnp.maximum(rh, 1.0 / jnp.maximum(rh, 1e-16)),
            jnp.maximum(rw, 1.0 / jnp.maximum(rw, 1e-16)),
        )
        anchor_ok = ratio <= thresh  # [B, M, A]

        valid = (
            base_ok[..., None, None]
            & (cond & in_bounds)[..., :, None]
            & anchor_ok[..., None, :]
        )  # [B, M, 5, A]

        r2i = jnp.clip(r2, 0, fh - 1).astype(jnp.int32)
        c2i = jnp.clip(c2, 0, fw - 1).astype(jnp.int32)
        anchor_idx = jnp.arange(a, dtype=jnp.int32)
        flat = (
            info.flat_begin
            + (anchor_idx[None, None, None, :] * fh + r2i[..., None]) * fw
            + c2i[..., None]
        )  # [B, M, 5, A]

        # nearest-center distance for dedupe (:195-205)
        pcy = (r2 + 0.5) / fh
        pcx = (c2 + 0.5) / fw
        dist = (cy[..., None] - pcy) ** 2 + (cx[..., None] - pcx) ** 2  # [B, M, 5]
        dist = jnp.broadcast_to(dist[..., None], flat.shape)

        if use_shape:
            # darknet iou_thresh adoption: anchors passing the wh-only
            # shape-IoU gate match at the CENTER cell, ratio gate bypassed
            inter = jnp.minimum(tw[..., None], aw) * jnp.minimum(th[..., None], ah)
            union = tw[..., None] * th[..., None] + aw * ah - inter
            shape_iou = jnp.where(
                (inter == 0) | (union == 0), 0.0,
                inter / jnp.where(union == 0, 1.0, union))  # [B, M, A]
            extra_valid = (
                base_ok[..., None, None]
                & in_bounds[..., 0:1, None]          # center-cell bounds
                & (shape_iou > float(thr_k))[..., None, :]
            )  # [B, M, 1, A]
            valid = jnp.concatenate([valid, extra_valid], axis=2)
            flat = jnp.concatenate([flat, flat[..., 0:1, :]], axis=2)
            dist = jnp.concatenate([dist, dist[..., 0:1, :]], axis=2)

        block_widths.append(valid.shape[2])
        flats.append(flat.reshape(b, -1))
        valids.append(valid.reshape(b, -1))
        dists.append(dist.reshape(b, -1))

    flat = jnp.concatenate(flats, axis=1)    # [B, C]
    valid = jnp.concatenate(valids, axis=1)  # [B, C]
    dist = jnp.concatenate(dists, axis=1)    # [B, C]
    c_total = flat.shape[1]

    # gt index per candidate (layer blocks each expand [M, width, A])
    gt_idx_parts = [
        jnp.broadcast_to(
            jnp.arange(m, dtype=jnp.int32)[None, :, None, None],
            (b, m, width, info.num_anchors),
        ).reshape(b, -1)
        for info, width in zip(infos, block_widths)
    ]
    gt_idx = jnp.concatenate(gt_idx_parts, axis=1)  # [B, C]

    # dedupe: keep the nearest-center candidate per cell (:180-217),
    # deterministic tie-break on candidate order
    inf = jnp.asarray(jnp.inf, dist.dtype)

    def per_image(flat_i, valid_i, dist_i):
        masked = jnp.where(valid_i, dist_i, inf)
        best = jnp.full((n,), jnp.inf, dist.dtype).at[flat_i].min(masked)
        is_best = valid_i & (masked <= best[flat_i])
        order = jnp.arange(c_total, dtype=jnp.int32)
        first = jnp.full((n,), c_total, jnp.int32).at[flat_i].min(
            jnp.where(is_best, order, c_total)
        )
        return is_best & (order == first[flat_i])

    final_valid = jax.vmap(per_image)(flat, valid, dist)

    boxes = jnp.take_along_axis(gt_cycxhw, gt_idx[..., None], axis=1)
    classes = jnp.take_along_axis(gt_class.astype(jnp.int32), gt_idx, axis=1)

    return MatchingOutput(
        flat=flat.astype(jnp.int32),
        gt_cycxhw=boxes,
        gt_class=classes,
        valid=final_valid,
    )
