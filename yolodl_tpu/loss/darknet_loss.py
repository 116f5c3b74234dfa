"""darknet-exact [yolo]/[gaussian_yolo] training loss (delta semantics).

The production loss (:mod:`.yolo_loss`) follows the Rust reference's
NEWSLAB formulation (loss_.rs).  This module reproduces **AlexeyAB
darknet-C's** yolo-layer training semantics value-for-value so training
trajectories can be pinned against the darknet oracle — including
`ignore_thresh`, the Gaussian box negative-log-likelihood, and darknet's
deliberate "delta on the activated output, backward without sigma-prime"
convention:

- forward activation of the raw head conv output
  (yolo_layer.c:670-684 / gaussian_yolo_layer.c:417-440): logistic on
  x,y + obj + classes (yolo, new_coords=0) or on the mu/sigma entries
  (gaussian); ``scal_add`` applies scale_x_y.  The CPU path's quirk of
  applying scal_add at the post-else index (entries 4,5 = obj,class0
  when new_coords=0) is reproduced faithfully — it is a no-op at the
  default scale_x_y=1.
- per-cell pass (yolo_layer.c process_batch:410-493 /
  gaussian_yolo_layer.c:453-530): objectness delta obj_norm*(0-sigma)
  everywhere, zeroed where best_match_iou > ignore_thresh (best match
  requires any class prob > 0.25, compare_yolo_class:357-368).
- per-truth pass (yolo_layer.c:494-566 / gaussian_yolo_layer.c:531-585):
  best anchor over ALL `num` anchors by centered-IoU of anchor shape vs
  truth wh; box delta accumulates (+=), objectness delta overwrites,
  class delta via delta_yolo_class's first-branch-overwrite semantics.
  Sequential truth order is preserved (lax.scan) so same-cell rewrites
  match darknet exactly.
- box deltas: MSE mode (iou_loss=mse, the parser default,
  parser.c parse_yolo) — delta = scale*(t - out)*iou_normalizer on the
  activated x,y and raw w,h (delta_yolo_box:174-293); Gaussian NLL mode
  (delta_gaussian_yolo_box:171-344): per-coordinate Gaussian
  negative-log-likelihood deltas for mu AND sigma with sigma_const=0.3,
  eps=1e-9, uc_normalizer on the sigma deltas, fix_nan_inf.
- gaussian delta averaging over classes_in_one_box
  (averages_gaussian_yolo_deltas:346-367; the yolo variant only runs
  when iou_thresh < 1, yolo_layer.c:645-660).
- reported cost = |delta|^2 (mag_array squared, yolo_layer.c:866-871);
  the network cost is the mean over detection layers
  (network.c get_network_cost:324-336).
- backward = the raw delta copied to the previous layer
  (backward_yolo_layer / backward_gaussian_yolo_layer: a single axpy,
  NO activation gradient) — reproduced here with a custom_vjp whose
  cotangent is -delta/B.  For new_coords=1 heads the logistic lives in
  the head conv itself, so its sigma-prime IS applied (by the conv's
  activation backward in darknet; by multiplying the delta here, since
  our graph strips that conv's logistic into the decode).

Unsupported (would raise): truth_thresh < 1, iou_thresh < 1,
objectness_smooth, focal_loss, label_smooth_eps, counters_per_class —
no cfg in the 83-cfg corpus uses any of them (all carry truth_thresh=1).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

Array = jax.Array

SIGMA_CONST = 0.3  # gaussian_yolo_layer.c:186
EPSI = 1e-9        # gaussian_yolo_layer.c:187


@dataclasses.dataclass(frozen=True)
class DarknetHeadParams:
    """Static per-[yolo]-layer loss parameters (parser.c parse_yolo)."""

    anchors: Tuple[Tuple[float, float], ...]  # all `num` biases, (w, h) px
    mask: Tuple[int, ...]
    classes: int
    net_w: int
    net_h: int
    ignore_thresh: float = 0.5
    truth_thresh: float = 1.0
    iou_normalizer: float = 0.75
    obj_normalizer: float = 1.0
    cls_normalizer: float = 1.0
    uc_normalizer: float = 1.0
    scale_x_y: float = 1.0
    new_coords: bool = False
    gaussian: bool = False
    iou_thresh: float = 1.0

    def __post_init__(self):
        if self.truth_thresh < 1.0:
            raise NotImplementedError("truth_thresh < 1 unsupported")
        if self.iou_thresh < 1.0:
            raise NotImplementedError("iou_thresh < 1 unsupported")
        if self.gaussian and self.new_coords:
            raise NotImplementedError("gaussian + new_coords")

    @property
    def num_anchors(self) -> int:
        return len(self.mask)

    @property
    def entries(self) -> int:
        return (9 if self.gaussian else 5) + self.classes


def _iou_xywh(ax, ay, aw, ah, bx, by, bw, bh):
    """darknet box_iou (box.c): 0 when I or U is 0."""
    iw = jnp.minimum(ax + aw / 2, bx + bw / 2) - jnp.maximum(ax - aw / 2, bx - bw / 2)
    ih = jnp.minimum(ay + ah / 2, by + bh / 2) - jnp.maximum(ay - ah / 2, by - bh / 2)
    inter = jnp.where((iw < 0) | (ih < 0), 0.0, iw * ih)
    union = aw * ah + bw * bh - inter
    return jnp.where((inter == 0) | (union == 0), 0.0, inter / jnp.where(union == 0, 1.0, union))


def _activate(raw: Array, p: DarknetHeadParams) -> Array:
    """raw [b,A,H,W,E] -> darknet's l.output (activated) buffer."""
    e = raw.shape[-1]
    s, add = p.scale_x_y, -0.5 * (p.scale_x_y - 1.0)
    sig = jax.nn.sigmoid
    cols = [raw[..., k] for k in range(e)]
    if p.gaussian:
        # mu_x, sig_x, mu_y, sig_y: logistic; scal_add on mu only
        # (gaussian_yolo_layer.c:421-430); sig_w(5), sig_h(7), obj+cls: logistic
        cols[0] = sig(cols[0]) * s + add
        cols[1] = sig(cols[1])
        cols[2] = sig(cols[2]) * s + add
        cols[3] = sig(cols[3])
        cols[5] = sig(cols[5])
        cols[7] = sig(cols[7])
        for k in range(8, e):
            cols[k] = sig(cols[k])
    elif p.new_coords:
        # conv already applied logistic (stripped into this loss by the
        # caller); scal_add on x,y (yolo_layer.c:675-682, if-branch)
        cols = [sig(c) for c in cols]
        cols[0] = cols[0] * s + add
        cols[1] = cols[1] * s + add
    else:
        # logistic on x,y,obj,classes; the CPU path's scal_add lands on
        # entries 4,5 (obj, class0) — the index was reassigned inside the
        # else (yolo_layer.c:677-682).  Identity at scale_x_y=1.
        cols[0] = sig(cols[0])
        cols[1] = sig(cols[1])
        for k in range(4, e):
            cols[k] = sig(cols[k])
        cols[4] = cols[4] * s + add
        if e > 5:
            cols[5] = cols[5] * s + add
    return jnp.stack(cols, axis=-1)


def _pred_boxes(out: Array, p: DarknetHeadParams) -> Tuple[Array, ...]:
    """Decoded boxes for every cell, [A,H,W] each (get_yolo_box /
    get_gaussian_yolo_box), in image-ratio units."""
    a, fh, fw, _ = out.shape
    rows = jax.lax.broadcasted_iota(jnp.float32, (a, fh, fw), 1)
    cols = jax.lax.broadcasted_iota(jnp.float32, (a, fh, fw), 2)
    aw = jnp.asarray([p.anchors[m][0] for m in p.mask], jnp.float32).reshape(a, 1, 1)
    ah = jnp.asarray([p.anchors[m][1] for m in p.mask], jnp.float32).reshape(a, 1, 1)
    if p.gaussian:
        ex, ey, ew, eh = out[..., 0], out[..., 2], out[..., 4], out[..., 6]
    else:
        ex, ey, ew, eh = out[..., 0], out[..., 1], out[..., 2], out[..., 3]
    bx = (cols + ex) / fw
    by = (rows + ey) / fh
    if p.new_coords:
        bw = ew * ew * 4.0 * aw / p.net_w
        bh = eh * eh * 4.0 * ah / p.net_h
    else:
        bw = jnp.exp(ew) * aw / p.net_w
        bh = jnp.exp(eh) * ah / p.net_h
    return bx, by, bw, bh


def _fix_nan_inf(v: Array) -> Array:
    return jnp.where(jnp.isfinite(v), v, 0.0)


def _head_deltas(raw: Array, truth: Array, p: DarknetHeadParams) -> Array:
    """One image: raw [A,H,W,E], truth [T,5] -> delta [A,H,W,E]."""
    a, fh, fw, e = raw.shape
    t_count = truth.shape[0]
    out = _activate(raw, p)
    obj_e = 8 if p.gaussian else 4
    cls_e = obj_e + 1

    tx, ty = truth[:, 0], truth[:, 1]
    tw, th = truth[:, 2], truth[:, 3]
    tcls = truth[:, 4].astype(jnp.int32)
    # `if(!truth.x) break` + class-range `continue` (yolo_layer.c:430-438)
    reached = jnp.cumprod((tx != 0.0).astype(jnp.int32)) == 1
    tvalid = reached & (tcls >= 0) & (tcls < p.classes)

    # ---- per-cell pass -------------------------------------------------
    bx, by, bw, bh = _pred_boxes(out, p)
    ious = _iou_xywh(
        bx[..., None], by[..., None], bw[..., None], bh[..., None],
        tx, ty, tw, th,
    )  # [A,H,W,T]
    ious = jnp.where(tvalid, ious, 0.0)
    class_match = jnp.any(out[..., cls_e:] > 0.25, axis=-1)  # [A,H,W]
    best_match_iou = jnp.where(class_match, jnp.max(ious, axis=-1), 0.0)

    sobj = out[..., obj_e]
    obj_delta = p.obj_normalizer * (0.0 - sobj)
    obj_delta = jnp.where(best_match_iou > p.ignore_thresh, 0.0, obj_delta)

    # ---- per-truth pass (sequential; order matters) --------------------
    n_total = len(p.anchors)
    anchors_w = jnp.asarray([w for w, _ in p.anchors], jnp.float32)
    anchors_h = jnp.asarray([h for _, h in p.anchors], jnp.float32)
    mask_pos = np.full(n_total, -1, np.int32)
    for k, m in enumerate(p.mask):
        mask_pos[m] = k
    mask_pos = jnp.asarray(mask_pos)

    nbox = 8 if p.gaussian else 4
    box_delta0 = jnp.zeros((a, fh, fw, nbox), jnp.float32)
    cls_delta0 = jnp.zeros((a, fh, fw, p.classes), jnp.float32)

    def step(carry, t):
        obj_d, cls_d, box_d = carry
        v = tvalid[t]
        x, y, w, h, c = tx[t], ty[t], tw[t], th[t], tcls[t]
        i = jnp.clip(jnp.floor(x * fw).astype(jnp.int32), 0, fw - 1)
        j = jnp.clip(jnp.floor(y * fh).astype(jnp.int32), 0, fh - 1)
        # best anchor over ALL `num` anchors, centered IoU
        pw, ph = anchors_w / p.net_w, anchors_h / p.net_h
        inter = jnp.minimum(pw, w) * jnp.minimum(ph, h)
        union = pw * ph + w * h - inter
        an_iou = jnp.where((inter == 0) | (union == 0), 0.0,
                           inter / jnp.where(union == 0, 1.0, union))
        best_n = jnp.argmax(an_iou)
        mn = mask_pos[best_n]
        sel = v & (mn >= 0)
        # out-of-range anchor index drops every scatter below
        mn_idx = jnp.where(sel, mn, a)

        cell = out[mn % a, j, i]  # [E] activated entries at the cell
        aw_b, ah_b = anchors_w[best_n], anchors_h[best_n]
        scale = (2.0 - w * h) * p.iou_normalizer

        if p.gaussian:
            # targets in grid/log units (delta_gaussian_yolo_box:195-199)
            t0 = x * fw - i.astype(jnp.float32)
            t2 = y * fh - j.astype(jnp.float32)
            t4 = jnp.log(w * p.net_w / aw_b)
            t6 = jnp.log(h * p.net_h / ah_b)
            mu = jnp.stack([cell[0], cell[2], cell[4], cell[6]])
            sg = jnp.stack([cell[1], cell[3], cell[5], cell[7]])
            d = jnp.stack([t0, t2, t4, t6]) - mu
            in_exp = d / sg
            in_exp2 = in_exp * in_exp
            nd = jnp.exp(-0.5 * in_exp2) / (jnp.sqrt(2.0 * jnp.pi) * (sg + SIGMA_CONST))
            temp = 0.5 * nd / (nd + EPSI) * (2.0 - w * h)
            d_mu = temp * in_exp / sg * p.iou_normalizer
            d_sg = temp * (in_exp2 / sg - 1.0 / (sg + SIGMA_CONST)) * p.uc_normalizer
            d_mu = _fix_nan_inf(d_mu)
            d_sg = _fix_nan_inf(d_sg)
            add = jnp.stack([d_mu[0], d_sg[0], d_mu[1], d_sg[1],
                             d_mu[2], d_sg[2], d_mu[3], d_sg[3]])
        else:
            t0 = x * fw - i.astype(jnp.float32)
            t1 = y * fh - j.astype(jnp.float32)
            if p.new_coords:
                t2 = jnp.sqrt(w * p.net_w / (4.0 * aw_b))
                t3 = jnp.sqrt(h * p.net_h / (4.0 * ah_b))
            else:
                t2 = jnp.log(w * p.net_w / aw_b)
                t3 = jnp.log(h * p.net_h / ah_b)
            add = scale * (jnp.stack([t0, t1, t2, t3]) - cell[:4])

        box_d = box_d.at[mn_idx, j, i].add(
            jnp.where(sel, add, 0.0), mode="drop")
        obj_d = obj_d.at[mn_idx, j, i].set(
            p.obj_normalizer * (1.0 - cell[obj_e]), mode="drop")

        # delta_yolo_class / delta_gaussian_yolo_class overwrite semantics
        probe_idx = 0 if p.gaussian else c  # gaussian probes class 0 (c:374)
        row = cls_d[mn % a, j, i]
        cell_cls = cell[cls_e:]
        onehot = jax.nn.one_hot(c, p.classes)
        fresh = onehot - cell_cls  # cls_normalizer only with classes_multipliers
        keep = row.at[c].set(1.0 - cell_cls[c])
        new_row = jnp.where(row[probe_idx] != 0.0, keep, fresh)
        cls_d = cls_d.at[mn_idx, j, i].set(
            jnp.where(sel, new_row, cls_d[mn % a, j, i]), mode="drop")
        return (obj_d, cls_d, box_d), None

    (obj_delta, cls_delta, box_delta), _ = jax.lax.scan(
        step, (obj_delta, cls_delta0, box_delta0), jnp.arange(t_count))

    if p.gaussian:
        # averages_gaussian_yolo_deltas: always runs
        n_in_box = jnp.sum((cls_delta > 0.0).astype(jnp.float32), axis=-1)
        box_delta = jnp.where(
            (n_in_box > 0)[..., None], box_delta / jnp.maximum(n_in_box, 1.0)[..., None],
            box_delta)
    # yolo: averages only when iou_thresh < 1 (unsupported -> never)

    delta = jnp.concatenate(
        [box_delta, obj_delta[..., None], cls_delta], axis=-1)
    return delta


def _head_cost_and_delta(raw: Array, truth: Array, p: DarknetHeadParams):
    """Batch: raw [B,A,H,W,E], truth [B,T,5] -> (cost, delta[B,A,H,W,E]).

    cost = |delta|^2 summed over the whole batch (mag_array squared), the
    value darknet stores in l.cost."""
    delta = jax.vmap(lambda r, t: _head_deltas(r, t, p))(raw, truth)
    return jnp.sum(delta * delta), delta


def reshape_head_raw(conv_out: Array, p: DarknetHeadParams) -> Array:
    """NHWC conv output [B,H,W,A*E] -> [B,A,H,W,E] (darknet entry_index
    layout: channel = anchor*E + entry)."""
    b, fh, fw, c = conv_out.shape
    a, e = p.num_anchors, p.entries
    if c != a * e:
        raise ValueError(f"head channels {c} != anchors*entries {a * e}")
    x = conv_out.reshape(b, fh, fw, a, e)
    return jnp.transpose(x, (0, 3, 1, 2, 4))


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def darknet_detection_loss(raws, truth, params_list):
    """Value = darknet's REPORTED training loss for one iteration:
    mean-over-heads |delta|^2 / batch (get_network_cost averaged over
    cost layers, then train_network_waitkey's sum/(n*batch),
    network.c:324-336 + :65).  Gradient wrt each raw head output =
    -delta/batch (backward_yolo_layer's axpy, scaled for the framework's
    darknet_sgd lr/B convention)."""
    cost = 0.0
    for raw, p in zip(raws, params_list):
        c, _ = _head_cost_and_delta(reshape_head_raw(raw, p), truth, p)
        cost = cost + c
    return cost / (len(raws) * raws[0].shape[0])


def _fwd(raws, truth, params_list):
    cost = 0.0
    deltas = []
    for raw, p in zip(raws, params_list):
        c, d = _head_cost_and_delta(reshape_head_raw(raw, p), truth, p)
        cost = cost + c
        deltas.append(d)
    batch = raws[0].shape[0]
    return cost / (len(raws) * batch), (deltas, raws, batch)


def _bwd(params_list, res, g):
    deltas, raws, batch = res
    grads = []
    for d, raw, p in zip(deltas, raws, params_list):
        # backward_yolo_layer: the delta itself, no activation gradient —
        # except new_coords=1 where the logistic belonged to the head conv
        # (we consumed the pre-sigma output), so sigma' applies to every
        # entry exactly as darknet's conv-activation backward does.
        b, a, fh, fw, e = d.shape
        if p.new_coords:
            braw = reshape_head_raw(raw, p)
            s = jax.nn.sigmoid(braw)
            d = d * s * (1.0 - s)
        # [B,A,H,W,E] -> NHWC [B,H,W,A*E]
        dd = jnp.transpose(d, (0, 2, 3, 1, 4)).reshape(b, fh, fw, a * e)
        grads.append(-dd * g / batch)
    return (tuple(grads), None)


darknet_detection_loss.defvjp(_fwd, _bwd)


def head_params_from_darknet(layer, net_w: int, net_h: int) -> DarknetHeadParams:
    """Build params from a parsed darknet [yolo]/[gaussian_yolo] layer
    (config.darknet_cfg.Yolo)."""
    if getattr(layer, "iou_loss", "mse") != "mse":
        raise NotImplementedError(
            "darknet-exact loss implements iou_loss=mse (the parser "
            "default); use the production loss for GIoU/CIoU training")
    mask = tuple(int(m) for m in layer.mask) or tuple(range(len(layer.anchors)))
    return DarknetHeadParams(
        anchors=tuple((float(w), float(h)) for w, h in layer.anchors),
        mask=mask,
        classes=int(layer.classes),
        net_w=net_w, net_h=net_h,
        ignore_thresh=float(layer.ignore_thresh),
        truth_thresh=float(layer.truth_thresh),
        iou_normalizer=float(getattr(layer, "iou_normalizer", 0.75)),
        obj_normalizer=float(getattr(layer, "obj_normalizer", 1.0)),
        cls_normalizer=float(getattr(layer, "cls_normalizer", 1.0)),
        uc_normalizer=float(getattr(layer, "uc_normalizer", 1.0)),
        scale_x_y=float(layer.scale_x_y),
        new_coords=bool(layer.new_coords),
        gaussian=bool(getattr(layer, "gaussian", False)),
    )
