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
  activated x,y and raw w,h (delta_yolo_box:174-293); IoU-family modes
  (iou|giou|diou|ciou): the analytic dx_box_iou gradient (box.c:258-476)
  with darknet's literal chain-rule shortcut dw*=exp(raw_w) for
  new_coords=0, fix_nan_inf, and ``max_delta`` clipping (yolo_layer.c:
  161-172; MSE mode never clips — matching the C).  Gaussian NLL mode
  (delta_gaussian_yolo_box:171-344): per-coordinate Gaussian
  negative-log-likelihood deltas for mu AND sigma with sigma_const=0.3,
  eps=1e-9, uc_normalizer on the sigma deltas, fix_nan_inf; gaussian
  iou_loss != mse replaces the mu deltas with dx_box_iou while the sigma
  deltas stay NLL-driven, and max_delta clips all 8.
- ``iou_thresh < 1`` multi-anchor matching (yolo_layer.c:640-656,
  gaussian_yolo_layer.c:589-614): per truth, every OTHER masked anchor
  whose shape-IoU (of kind ``iou_thresh_kind``, box_iou_kind) vs the
  wh-only truth exceeds iou_thresh receives the same box/obj/class
  deltas as the best anchor; box deltas accumulate (+=).
- ``objectness_smooth`` (yolo_layer.c:457-462,578-584): the ignore
  branch keeps max(obj_norm*(best_match_iou - sigma), negative delta)
  instead of zeroing; the per-truth positive delta only lands when the
  cell's obj delta is exactly 0.  Gaussian flavor (gaussian_yolo_layer.c
  :495-505): ignore branch writes obj_norm*(best_match_iou^2 - sigma)
  plus a class delta at the best-matching truth's class.
- delta averaging over classes_in_one_box (averages_yolo_deltas:
  yolo-flavor runs when iou_thresh < 1 at cells with a nonzero obj delta
  only, yolo_layer.c:645-660; gaussian flavor always, every cell).
- ``focal_loss`` class deltas (delta_yolo_class:330-346, alpha=0.5) and
  ``label_smooth_eps`` smoothing; ``counters_per_class`` →
  classes_multipliers = max_count/count capped at max_delta
  (parser.c get_classes_multipliers:412-431), scaling box/obj deltas and
  the truth-class delta (×cls_normalizer).
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

- ``truth_thresh < 1`` (yolo_layer.c:493-519): the per-cell
  multi-positive branch — cells whose best pred-IoU over the truths
  beats the threshold get positive obj/class deltas and an accumulated
  box delta toward their best truth at the cell's own anchor, before
  the per-truth pass runs.

Unsupported (would raise): yolo_point != center.
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
    iou_loss: str = "mse"  # mse|iou|giou|diou|ciou (IOU_LOSS, box.c)
    iou_thresh: float = 1.0
    iou_thresh_kind: str = "iou"  # box_iou_kind for the extra-anchor gate
    objectness_smooth: bool = False
    max_delta: Optional[float] = None  # None = FLT_MAX (no clipping)
    focal_loss: bool = False
    label_smooth_eps: float = 0.0
    # max_count/count per class, capped at max_delta (get_classes_multipliers)
    classes_multipliers: Optional[Tuple[float, ...]] = None

    def __post_init__(self):
        if self.gaussian and self.new_coords:
            # The reference PARSER accepts the pair (darknet-config/src/
            # gaussian_yolo.rs:15-33) but gaussian_yolo_layer.c has no
            # new_coords path — there is no oracle semantics to match and
            # no corpus cfg combines them.  head_params_from_darknet
            # raises this at cfg-resolution time with the layer named.
            raise ValueError(
                "[Gaussian_yolo] with new_coords=1 is unsupported: "
                "darknet's gaussian_yolo_layer.c has no new_coords "
                "branch, so the darknet-exact loss has no oracle "
                "semantics to reproduce")
        if self.iou_loss not in ("mse", "iou", "giou", "diou", "ciou"):
            raise ValueError(f"unknown iou_loss {self.iou_loss!r}")
        if self.iou_thresh_kind not in ("iou", "giou", "diou", "ciou"):
            raise ValueError(f"unknown iou_thresh_kind {self.iou_thresh_kind!r}")
        if self.classes_multipliers is not None and \
                len(self.classes_multipliers) != self.classes:
            raise ValueError("classes_multipliers length != classes")

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
    """raw [b,A,H,W,E] -> darknet's l.output (activated) buffer.

    Fully elementwise (per-entry select + affine with [E]-broadcast
    masks) so XLA fuses it into the surrounding program: the original
    per-column ``jnp.stack`` lowered to E-piece concatenates of
    [..., 1] slices on TPU — 2-4 ms each at flagship head sizes, the
    single largest non-conv cost of the darknet-loss step (round-5
    trace).  Per-entry semantics are unchanged:

    - gaussian (gaussian_yolo_layer.c:421-430): logistic on mu_x(0),
      sig_x(1), mu_y(2), sig_y(3), sig_w(5), sig_h(7), obj+cls(8..);
      mu_w(4)/mu_h(6) raw; scal_add on mu_x/mu_y only.
    - new_coords=1 (yolo_layer.c:675-682 if-branch): logistic on every
      entry (the conv's logistic is stripped into this loss by the
      caller); scal_add on x(0), y(1).
    - new_coords=0: logistic on x, y, obj, classes; w(2)/h(3) raw; the
      CPU path's scal_add lands on entries 4 and 5 (obj, class0) — the
      index was reassigned inside the else (yolo_layer.c:677-682).
      Identity at scale_x_y=1."""
    e = raw.shape[-1]
    s, add = p.scale_x_y, -0.5 * (p.scale_x_y - 1.0)
    apply_sig = np.ones((e,), bool)
    mul = np.ones((e,), np.float32)
    off = np.zeros((e,), np.float32)
    if p.gaussian:
        apply_sig[4] = apply_sig[6] = False
        mul[0] = mul[2] = s
        off[0] = off[2] = add
    elif p.new_coords:
        mul[0] = mul[1] = s
        off[0] = off[1] = add
    else:
        apply_sig[2] = apply_sig[3] = False
        mul[4] = s
        off[4] = add
        if e > 5:
            mul[5] = s
            off[5] = add
    out = jnp.where(jnp.asarray(apply_sig), jax.nn.sigmoid(raw), raw)
    # x*1.0+0.0 is an IEEE identity: untouched entries are bit-exact
    return out * jnp.asarray(mul) + jnp.asarray(off)


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


def _clip_value(v: Array, max_val: Optional[float]) -> Array:
    """clip_value (yolo_layer.c:161-172); None = FLT_MAX = no clipping."""
    if max_val is None:
        return v
    return jnp.clip(v, -max_val, max_val)


def _shape_iou_kind(pw, ph, tw, th, kind: str):
    """box_iou_kind on wh-only boxes centered at the origin (the
    truth_shift comparison of the iou_thresh loop, yolo_layer.c:643-647;
    box.c:151-256).  Scalar jnp math; `kind` is static."""
    inter = jnp.minimum(pw, tw) * jnp.minimum(ph, th)
    union = pw * ph + tw * th - inter
    iou = jnp.where((inter == 0) | (union == 0), 0.0,
                    inter / jnp.where(union == 0, 1.0, union))
    if kind == "iou":
        return iou
    if kind == "giou":
        c = jnp.maximum(pw, tw) * jnp.maximum(ph, th)
        u = union
        return jnp.where(c == 0, iou,
                         iou - (c - u) / jnp.where(c == 0, 1.0, c))
    # centers coincide → d = 0, so the diou penalty (d/c)^0.6 is 0 and the
    # ciou distance term is 0; only ciou's aspect-ratio term survives
    if kind == "diou":
        return iou
    if kind == "ciou":
        ar_loss = 4.0 / (np.pi ** 2) * jnp.square(
            jnp.arctan(tw / th) - jnp.arctan(pw / ph))
        alpha = ar_loss / (1.0 - iou + ar_loss + 0.000001)
        c = jnp.square(jnp.maximum(pw, tw)) + jnp.square(jnp.maximum(ph, th))
        return jnp.where(c == 0, iou, iou - alpha * ar_loss)
    raise ValueError(kind)


def _dx_box_iou(px, py, pw, ph, tx, ty, tw, th, kind: str):
    """dx_box_iou (box.c:258-476), literal scalar translation: gradient of
    the IoU-family score wrt the predicted box (x, y, w, h), with the
    original's sequential corner-swap and Iw<=0 overrides.  Returns
    (dx, dy, dw, dh) — the C maps dt/db/dl/dr onto those names."""
    pred_top, pred_bot = py - ph / 2, py + ph / 2
    pred_left, pred_right = px - pw / 2, px + pw / 2
    pred_t = jnp.minimum(pred_top, pred_bot)
    pred_b = jnp.maximum(pred_top, pred_bot)
    pred_l = jnp.minimum(pred_left, pred_right)
    pred_r = jnp.maximum(pred_left, pred_right)
    tt, tb = ty - th / 2, ty + th / 2
    tl, tr = tx - tw / 2, tx + tw / 2

    X = (pred_b - pred_t) * (pred_r - pred_l)
    Ih = jnp.minimum(pred_b, tb) - jnp.maximum(pred_t, tt)
    Iw = jnp.minimum(pred_r, tr) - jnp.maximum(pred_l, tl)
    I = Iw * Ih
    Xhat = (tb - tt) * (tr - tl)
    U = X + Xhat - I
    S = jnp.square(px - tx) + jnp.square(py - ty)
    giou_Cw = jnp.maximum(pred_r, tr) - jnp.minimum(pred_l, tl)
    giou_Ch = jnp.maximum(pred_b, tb) - jnp.minimum(pred_t, tt)
    giou_C = giou_Cw * giou_Ch

    dX_wrt_t = -(pred_r - pred_l)
    dX_wrt_b = pred_r - pred_l
    dX_wrt_l = -(pred_b - pred_t)
    dX_wrt_r = pred_b - pred_t
    dI_wrt_t = jnp.where(pred_t > tt, -Iw, 0.0)
    dI_wrt_b = jnp.where(pred_b < tb, Iw, 0.0)
    dI_wrt_l = jnp.where(pred_l > tl, -Ih, 0.0)
    dI_wrt_r = jnp.where(pred_r < tr, Ih, 0.0)
    dU_wrt_t = dX_wrt_t - dI_wrt_t
    dU_wrt_b = dX_wrt_b - dI_wrt_b
    dU_wrt_l = dX_wrt_l - dI_wrt_l
    dU_wrt_r = dX_wrt_r - dI_wrt_r
    dC_wrt_t = jnp.where(pred_t < tt, -giou_Cw, 0.0)
    dC_wrt_b = jnp.where(pred_b > tb, giou_Cw, 0.0)
    dC_wrt_l = jnp.where(pred_l < tl, -giou_Ch, 0.0)
    dC_wrt_r = jnp.where(pred_r > tr, giou_Ch, 0.0)

    u_pos = U > 0
    usq = jnp.where(u_pos, U * U, 1.0)
    p_dt = jnp.where(u_pos, ((U * dI_wrt_t) - (I * dU_wrt_t)) / usq, 0.0)
    p_db = jnp.where(u_pos, ((U * dI_wrt_b) - (I * dU_wrt_b)) / usq, 0.0)
    p_dl = jnp.where(u_pos, ((U * dI_wrt_l) - (I * dU_wrt_l)) / usq, 0.0)
    p_dr = jnp.where(u_pos, ((U * dI_wrt_r) - (I * dU_wrt_r)) / usq, 0.0)
    # sequential corner swap exactly as written (box.c:341-344): the
    # second assignment reads the already-updated p_dt/p_dl
    tb_ok = pred_top < pred_bot
    lr_ok = pred_left < pred_right
    p_dt = jnp.where(tb_ok, p_dt, p_db)
    p_db = jnp.where(tb_ok, p_db, p_dt)
    p_dl = jnp.where(lr_ok, p_dl, p_dr)
    p_dr = jnp.where(lr_ok, p_dr, p_dl)

    if kind == "giou":
        # unguarded giou_C*giou_C division exactly as the C: a zero C makes
        # inf/nan that the caller's fix_nan_inf zeroes, same as darknet
        csq = giou_C * giou_C
        g_dt = ((giou_C * dU_wrt_t) - (U * dC_wrt_t)) / csq
        g_db = ((giou_C * dU_wrt_b) - (U * dC_wrt_b)) / csq
        g_dl = ((giou_C * dU_wrt_l) - (U * dC_wrt_l)) / csq
        g_dr = ((giou_C * dU_wrt_r) - (U * dC_wrt_r)) / csq
        p_dt = jnp.where(giou_C > 0, p_dt + g_dt, p_dt)
        p_db = jnp.where(giou_C > 0, p_db + g_db, p_db)
        p_dl = jnp.where(giou_C > 0, p_dl + g_dl, p_dl)
        p_dr = jnp.where(giou_C > 0, p_dr + g_dr, p_dr)
        no_i = (Iw <= 0) | (Ih <= 0)
        p_dt = jnp.where(no_i, g_dt, p_dt)
        p_db = jnp.where(no_i, g_db, p_db)
        p_dl = jnp.where(no_i, g_dl, p_dl)
        p_dr = jnp.where(no_i, g_dr, p_dr)

    # DIoU/CIoU enclosing-diagonal terms (box.c:357-449)
    Ct = jnp.minimum(py - ph / 2, ty - th / 2)
    Cb = jnp.maximum(py + ph / 2, ty + th / 2)
    Cl = jnp.minimum(px - pw / 2, tx - tw / 2)
    Cr = jnp.maximum(px + pw / 2, tx + tw / 2)
    Cw = Cr - Cl
    Ch = Cb - Ct
    C = Cw * Cw + Ch * Ch

    dCt_dy = jnp.where(pred_t < tt, 1.0, 0.0)
    dCt_dh = jnp.where(pred_t < tt, -0.5, 0.0)
    dCb_dy = jnp.where(pred_b > tb, 1.0, 0.0)
    dCb_dh = jnp.where(pred_b > tb, 0.5, 0.0)
    dCl_dx = jnp.where(pred_l < tl, 1.0, 0.0)
    dCl_dw = jnp.where(pred_l < tl, -0.5, 0.0)
    dCr_dx = jnp.where(pred_r > tr, 1.0, 0.0)
    dCr_dw = jnp.where(pred_r > tr, 0.5, 0.0)
    dCw_dx = dCr_dx - dCl_dx
    dCw_dw = dCr_dw - dCl_dw
    dCh_dy = dCb_dy - dCt_dy
    dCh_dh = dCb_dh - dCt_dh

    p_dx = p_dl + p_dr
    p_dy = p_dt + p_db
    p_dw = p_dr - p_dl
    p_dh = p_db - p_dt

    if kind in ("diou", "ciou"):
        csq = C * C  # unguarded, like the C (fix_nan_inf downstream)
        d_dx = (2 * (tx - px) * C - (2 * Cw * dCw_dx) * S) / csq
        d_dy = (2 * (ty - py) * C - (2 * Ch * dCh_dy) * S) / csq
        d_dw = (2 * Cw * dCw_dw) * S / csq
        d_dh = (2 * Ch * dCh_dh) * S / csq
        if kind == "ciou":
            ar_gt = tw / th
            ar_pred = pw / ph
            d_atan = jnp.arctan(ar_gt) - jnp.arctan(ar_pred)
            ar_loss = 4.0 / (np.pi ** 2) * d_atan * d_atan
            alpha = ar_loss / (1.0 - I / U + ar_loss + 0.000001)
            ar_dw = 8.0 / (np.pi ** 2) * d_atan * ph
            ar_dh = -8.0 / (np.pi ** 2) * d_atan * pw
            d_dw = d_dw + alpha * ar_dw
            d_dh = d_dh + alpha * ar_dh
        p_dx = jnp.where(C > 0, p_dx + d_dx, p_dx)
        p_dy = jnp.where(C > 0, p_dy + d_dy, p_dy)
        p_dw = jnp.where(C > 0, p_dw + d_dw, p_dw)
        p_dh = jnp.where(C > 0, p_dh + d_dh, p_dh)
        no_i = (Iw <= 0) | (Ih <= 0)
        p_dx = jnp.where(no_i, d_dx, p_dx)
        p_dy = jnp.where(no_i, d_dy, p_dy)
        p_dw = jnp.where(no_i, d_dw, p_dw)
        p_dh = jnp.where(no_i, d_dh, p_dh)

    return p_dx, p_dy, p_dw, p_dh


def _box_delta_terms(cell, x, y, w, h, i, j, fw, fh, aw_b, ah_b,
                     iou_norm, p: DarknetHeadParams) -> Array:
    """delta_yolo_box / delta_gaussian_yolo_box for one (cell, truth)
    pair: the [nbox] addition to the accumulated box delta.  `iou_norm`
    already carries the class multiplier (l.iou_normalizer *
    class_multiplier at every call site)."""
    scale = 2.0 - w * h
    fi, fj = i.astype(jnp.float32), j.astype(jnp.float32)
    if p.gaussian:
        # NLL sigma deltas always; mu deltas replaced by dx_box_iou when
        # iou_loss != mse (delta_gaussian_yolo_box:215-303)
        t0 = x * fw - fi
        t2 = y * fh - fj
        t4 = jnp.log(w * p.net_w / aw_b)
        t6 = jnp.log(h * p.net_h / ah_b)
        mu = jnp.stack([cell[0], cell[2], cell[4], cell[6]])
        sg = jnp.stack([cell[1], cell[3], cell[5], cell[7]])
        d = jnp.stack([t0, t2, t4, t6]) - mu
        in_exp = d / sg
        in_exp2 = in_exp * in_exp
        nd = jnp.exp(-0.5 * in_exp2) / (jnp.sqrt(2.0 * jnp.pi) * (sg + SIGMA_CONST))
        temp = 0.5 * nd / (nd + EPSI) * scale
        d_sg = temp * (in_exp2 / sg - 1.0 / (sg + SIGMA_CONST)) * p.uc_normalizer
        if p.iou_loss == "mse":
            d_mu = temp * in_exp / sg * iou_norm
        else:
            px = (fi + cell[0]) / fw
            py = (fj + cell[2]) / fh
            pw = jnp.exp(cell[4]) * aw_b / p.net_w
            ph = jnp.exp(cell[6]) * ah_b / p.net_h
            pw = jnp.where(pw == 0, 1.0, pw)
            ph = jnp.where(ph == 0, 1.0, ph)
            dx, dy, dw, dh = _dx_box_iou(px, py, pw, ph, x, y, w, h,
                                         p.iou_loss)
            dw = dw * jnp.exp(cell[4])
            dh = dh * jnp.exp(cell[6])
            d_mu = jnp.stack([dx, dy, dw, dh]) * iou_norm
        d_mu = _clip_value(_fix_nan_inf(d_mu), p.max_delta)
        d_sg = _clip_value(_fix_nan_inf(d_sg), p.max_delta)
        return jnp.stack([d_mu[0], d_sg[0], d_mu[1], d_sg[1],
                          d_mu[2], d_sg[2], d_mu[3], d_sg[3]])

    if p.iou_loss == "mse":
        t0 = x * fw - fi
        t1 = y * fh - fj
        if p.new_coords:
            t2 = jnp.sqrt(w * p.net_w / (4.0 * aw_b))
            t3 = jnp.sqrt(h * p.net_h / (4.0 * ah_b))
        else:
            t2 = jnp.log(w * p.net_w / aw_b)
            t3 = jnp.log(h * p.net_h / ah_b)
        # MSE mode: scale applies, max_delta does NOT (delta_yolo_box's
        # clip lives only in the IoU branch, yolo_layer.c:193-293)
        return scale * (jnp.stack([t0, t1, t2, t3]) - cell[:4]) * iou_norm

    # IoU-family branch (delta_yolo_box:216-285): decode the pred box at
    # the cell, analytic gradient, darknet's literal exp chain factor
    px = (fi + cell[0]) / fw
    py = (fj + cell[1]) / fh
    if p.new_coords:
        pw = cell[2] * cell[2] * 4.0 * aw_b / p.net_w
        ph = cell[3] * cell[3] * 4.0 * ah_b / p.net_h
    else:
        pw = jnp.exp(cell[2]) * aw_b / p.net_w
        ph = jnp.exp(cell[3]) * ah_b / p.net_h
    pw = jnp.where(pw == 0, 1.0, pw)
    ph = jnp.where(ph == 0, 1.0, ph)
    dx, dy, dw, dh = _dx_box_iou(px, py, pw, ph, x, y, w, h, p.iou_loss)
    if not p.new_coords:
        dw = dw * jnp.exp(cell[2])
        dh = dh * jnp.exp(cell[3])
    dv = jnp.stack([dx, dy, dw, dh]) * iou_norm
    return _clip_value(_fix_nan_inf(dv), p.max_delta)


def _class_delta_row(row, cell_cls, c, cls_mult_c, p: DarknetHeadParams):
    """delta_yolo_class / delta_gaussian_yolo_class for one cell: the new
    class-delta row given the current `row`.  `cls_mult_c` is the truth
    class's multiplier (1.0 when counters_per_class is absent)."""
    eps = p.label_smooth_eps
    have_mult = p.classes_multipliers is not None
    probe_idx = 0 if p.gaussian else c  # gaussian probes delta[index] (c:373)
    y_true_c = 1.0 * (1.0 - eps) + 0.5 * eps if eps else 1.0
    # first branch: only the truth-class entry is rewritten
    keep_val = y_true_c - cell_cls[c]
    if not p.gaussian:
        keep_val = jnp.where(jnp.isfinite(keep_val), keep_val, row[c])
    if have_mult:
        keep_val = keep_val * cls_mult_c
    keep = row.at[c].set(keep_val)
    if p.focal_loss and not p.gaussian:
        # focal branch (delta_yolo_class:330-346): alpha=0.5, no smoothing,
        # no class multipliers
        pt = cell_cls[c] + 1e-15
        grad = -(1.0 - pt) * (2.0 * pt * jnp.log(pt) + pt - 1.0)
        onehot = jax.nn.one_hot(c, p.classes)
        fresh = (onehot - cell_cls) * (0.5 * grad)
    else:
        onehot = jax.nn.one_hot(c, p.classes)
        y_true = onehot * (1.0 - eps) + 0.5 * eps if eps else onehot
        fresh = y_true - cell_cls
        if have_mult:
            fresh = fresh.at[c].multiply(cls_mult_c * p.cls_normalizer)
    return jnp.where(row[probe_idx] != 0.0, keep, fresh)


def _head_deltas(raw: Array, truth: Array, p: DarknetHeadParams,
                 stats: bool = False):
    """One image: raw [A,H,W,E], truth [T,5] -> (delta [A,H,W,E],
    tot_iou_loss, count) — plus, when ``stats`` is set, a 6-tuple of
    darknet's console-telemetry accumulators.

    The two scalars feed the non-MSE reported cost only (yolo_layer.c
    show_details branch, :901-916): per delta_yolo_box application,
    tot_iou_loss accumulates 1 - IoU (1 - GIoU for iou_loss=giou) of the
    decoded pred box vs the truth, and count the number of applications —
    darknet's avg_iou_loss = iou_normalizer * tot/count.

    ``stats=True`` additionally accumulates, per per-truth delta
    application (darknet's printed "Avg IOU, Class, Obj, No Obj, .5R,
    .75R" line, yolo_layer.c:560-575 tot_iou/avg_cat/avg_obj/recall/
    recall75 and the every-cell avg_anyobj): (tot_iou, recall50,
    recall75, obj_sum, cat_sum, sobj_sum).  The stats path adds a small
    [K]-vmapped decode per scan step; the default path is op-for-op
    unchanged (the 16-case oracle parity battery runs stats=False)."""
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

    cls_mults = (jnp.asarray(p.classes_multipliers, jnp.float32)
                 if p.classes_multipliers is not None else None)

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
    ignored = best_match_iou > p.ignore_thresh
    cls_delta0 = jnp.zeros((a, fh, fw, p.classes), jnp.float32)
    if p.objectness_smooth:
        if p.gaussian:
            # gaussian_yolo_layer.c:495-505: iou^2 target + class delta at
            # the best-matching truth's class (full-row overwrite — the
            # class deltas are all zero at this point)
            iou_mult = best_match_iou * best_match_iou
            smooth_val = p.obj_normalizer * (iou_mult - sobj)
            obj_delta = jnp.where(ignored, smooth_val, obj_delta)
            best_match_t = jnp.argmax(ious, axis=-1)  # [A,H,W]
            bm_cls = tcls[best_match_t]
            onehot = jax.nn.one_hot(bm_cls, p.classes)
            eps = p.label_smooth_eps
            y_true = onehot * (1.0 - eps) + 0.5 * eps if eps else onehot
            fresh = y_true - out[..., cls_e:]
            if cls_mults is not None:
                mult_row = jnp.where(
                    jnp.arange(p.classes) == bm_cls[..., None],
                    cls_mults[bm_cls][..., None] * p.cls_normalizer, 1.0)
                fresh = fresh * mult_row
            cls_delta0 = jnp.where(ignored[..., None], fresh, cls_delta0)
        else:
            # yolo_layer.c:457-462: keep max(smooth positive, negative)
            smooth_val = p.obj_normalizer * (best_match_iou - sobj)
            obj_delta = jnp.where(
                ignored, jnp.maximum(smooth_val, obj_delta), obj_delta)
    else:
        obj_delta = jnp.where(ignored, 0.0, obj_delta)

    anchors_w = jnp.asarray([w for w, _ in p.anchors], jnp.float32)
    anchors_h = jnp.asarray([h for _, h in p.anchors], jnp.float32)
    n_total = len(p.anchors)
    mask_pos_np = np.full(n_total, -1, np.int32)
    for k, m in enumerate(p.mask):
        mask_pos_np[m] = k
    mask_pos = jnp.asarray(mask_pos_np)

    nbox = 8 if p.gaussian else 4
    box_delta0 = jnp.zeros((a, fh, fw, nbox), jnp.float32)

    if p.truth_thresh < 1.0:
        # per-cell multi-positive branch (yolo_layer.c:493-519,
        # gaussian_yolo_layer.c:517-527): every cell whose best pred-IoU
        # over the truths (NOT class-gated) beats truth_thresh receives
        # positive obj/class deltas and an accumulated box delta toward
        # its best truth, using the cell's OWN anchor (l.mask[n]).  Runs
        # before the per-truth pass, exactly as darknet's loop order.
        best_iou_all = jnp.max(ious, axis=-1)        # [A,H,W]
        best_t_all = jnp.argmax(ious, axis=-1)
        tt_mask = best_iou_all > p.truth_thresh
        bt_cls = tcls[best_t_all]                    # [A,H,W]
        iou_mult = best_iou_all * best_iou_all
        if p.objectness_smooth:
            obj_tt = p.obj_normalizer * (iou_mult - sobj)
        else:
            obj_tt = p.obj_normalizer * (1.0 - sobj)
        obj_delta = jnp.where(tt_mask, obj_tt, obj_delta)

        n_cells = a * fh * fw
        flat_rows = cls_delta0.reshape(n_cells, p.classes)
        flat_cls = out[..., cls_e:].reshape(n_cells, p.classes)
        flat_c = bt_cls.reshape(n_cells)
        flat_mult = (cls_mults[flat_c] if cls_mults is not None
                     else jnp.ones((n_cells,), jnp.float32))
        new_rows = jax.vmap(
            lambda r, cc, c_, m_: _class_delta_row(r, cc, c_, m_, p))(
            flat_rows, flat_cls, flat_c, flat_mult)
        if p.objectness_smooth:
            # l.delta[class] = class_mult * (iou_mult - output[class])
            # overwrite on the truth class (yolo_layer.c:503)
            cur = jnp.take_along_axis(flat_cls, flat_c[:, None], 1)[:, 0]
            upd = flat_mult * (iou_mult.reshape(n_cells) - cur)
            new_rows = jax.vmap(lambda r, c_, v_: r.at[c_].set(v_))(
                new_rows, flat_c, upd)
        cls_delta0 = jnp.where(
            tt_mask.reshape(n_cells, 1), new_rows, flat_rows
        ).reshape(a, fh, fw, p.classes)

        # box delta toward the best truth at the cell's own anchor
        mask_abs = jnp.asarray(list(p.mask), jnp.int32)  # slot -> abs index
        slot = jax.lax.broadcasted_iota(jnp.int32, (a, fh, fw), 0)
        rows_f = jax.lax.broadcasted_iota(jnp.int32, (a, fh, fw), 1)
        cols_f = jax.lax.broadcasted_iota(jnp.int32, (a, fh, fw), 2)
        abs_n = mask_abs[slot]
        bt = best_t_all
        add = jax.vmap(
            lambda cell, x_, y_, w_, h_, i_, j_, awb, ahb, inorm:
            _box_delta_terms(cell, x_, y_, w_, h_, i_, j_, fw, fh,
                             awb, ahb, inorm, p))(
            out.reshape(n_cells, e),
            tx[bt].reshape(n_cells), ty[bt].reshape(n_cells),
            tw[bt].reshape(n_cells), th[bt].reshape(n_cells),
            cols_f.reshape(n_cells), rows_f.reshape(n_cells),
            anchors_w[abs_n].reshape(n_cells),
            anchors_h[abs_n].reshape(n_cells),
            (p.iou_normalizer * flat_mult))
        box_delta0 = box_delta0 + jnp.where(
            tt_mask.reshape(a, fh, fw, 1), add.reshape(a, fh, fw, nbox), 0.0)

    # ---- per-truth pass (sequential; order matters) --------------------

    def step(carry, t):
        v = tvalid[t]
        x, y, w, h, c = tx[t], ty[t], tw[t], th[t], tcls[t]
        i = jnp.clip(jnp.floor(x * fw).astype(jnp.int32), 0, fw - 1)
        j = jnp.clip(jnp.floor(y * fh).astype(jnp.int32), 0, fh - 1)
        cls_mult_c = cls_mults[c] if cls_mults is not None else jnp.float32(1.0)
        iou_norm = p.iou_normalizer * cls_mult_c
        # best anchor over ALL `num` anchors, centered IoU
        pw, ph = anchors_w / p.net_w, anchors_h / p.net_h
        inter = jnp.minimum(pw, w) * jnp.minimum(ph, h)
        union = pw * ph + w * h - inter
        an_iou = jnp.where((inter == 0) | (union == 0), 0.0,
                           inter / jnp.where(union == 0, 1.0, union))
        best_n = jnp.argmax(an_iou)

        # Candidate anchors this truth writes: the best anchor
        # (yolo_layer.c:543-599) plus, when iou_thresh < 1, every other
        # MASKED anchor whose shape-IoU (iou_thresh_kind) vs the wh-only
        # truth beats the threshold (:601-656).  Distinct anchor slots →
        # distinct cells, so the per-candidate writes are disjoint and one
        # BATCHED application equals darknet's sequential loop exactly
        # (4x fewer sequential gather/scatter segments per truth).
        if p.iou_thresh < 1.0:
            slots_abs = np.asarray(
                [n for n in range(n_total) if mask_pos_np[n] >= 0], np.int32)
            cand_abs = jnp.asarray(slots_abs)                     # [K]
            shape_ious = _shape_iou_kind(
                anchors_w[cand_abs] / p.net_w, anchors_h[cand_abs] / p.net_h,
                w, h, p.iou_thresh_kind)
            sels0 = (cand_abs == best_n) | (shape_ious > p.iou_thresh)
        else:
            cand_abs = best_n[None]                               # [1]
            sels0 = jnp.ones((1,), bool)

        obj_d, cls_d, box_d, tot_l, cnt = carry[:5]
        mns = mask_pos[cand_abs]                                  # [K]
        sels = v & (mns >= 0) & sels0
        idxs = jnp.where(sels, mns, a)  # out-of-range drops scatters
        cells = out[mns % a, j, i]                                # [K, E]
        aw_c = anchors_w[cand_abs]
        ah_c = anchors_h[cand_abs]
        adds = jax.vmap(lambda cell, awb, ahb: _box_delta_terms(
            cell, x, y, w, h, i, j, fw, fh, awb, ahb, iou_norm, p))(
            cells, aw_c, ah_c)                                    # [K, nbox]
        box_d = box_d.at[idxs, j, i].add(
            jnp.where(sels[:, None], adds, 0.0), mode="drop")

        need_iou = stats or (not p.gaussian and p.iou_loss != "mse")
        if need_iou:
            # reported-cost accumulators (delta_yolo_box's all_ious,
            # computed on the UNfixed pred box, box.c/yolo_layer.c)
            def iou_for(cell, awb, ahb):
                if p.gaussian:
                    ex, ey, ew, eh = cell[0], cell[2], cell[4], cell[6]
                else:
                    ex, ey, ew, eh = cell[0], cell[1], cell[2], cell[3]
                px = (i.astype(jnp.float32) + ex) / fw
                py = (j.astype(jnp.float32) + ey) / fh
                if p.new_coords:
                    pbw = ew * ew * 4.0 * awb / p.net_w
                    pbh = eh * eh * 4.0 * ahb / p.net_h
                else:
                    pbw = jnp.exp(ew) * awb / p.net_w
                    pbh = jnp.exp(eh) * ahb / p.net_h
                iou_v = _iou_xywh(px, py, pbw, pbh, x, y, w, h)
                if p.iou_loss == "giou" and not p.gaussian:
                    c_area = (jnp.maximum(px + pbw / 2, x + w / 2)
                              - jnp.minimum(px - pbw / 2, x - w / 2)) * (
                        jnp.maximum(py + pbh / 2, y + h / 2)
                        - jnp.minimum(py - pbh / 2, y - h / 2))
                    inter = jnp.minimum(px + pbw / 2, x + w / 2) \
                        - jnp.maximum(px - pbw / 2, x - w / 2)
                    inter_h = jnp.minimum(py + pbh / 2, y + h / 2) \
                        - jnp.maximum(py - pbh / 2, y - h / 2)
                    inter_a = jnp.where((inter < 0) | (inter_h < 0), 0.0,
                                        inter * inter_h)
                    u_area = pbw * pbh + w * h - inter_a
                    loss_iou = jnp.where(
                        c_area == 0, iou_v,
                        iou_v - (c_area - u_area)
                        / jnp.where(c_area == 0, 1.0, c_area))
                else:
                    loss_iou = iou_v
                return loss_iou, iou_v

            iou_vs, iou_plain = jax.vmap(iou_for)(cells, aw_c, ah_c)  # [K]
            if not p.gaussian and p.iou_loss != "mse":
                tot_l = tot_l + jnp.sum(jnp.where(sels, 1.0 - iou_vs, 0.0))
            cnt = cnt + jnp.sum(sels.astype(jnp.float32))
        if stats:
            tot_i, r50, r75, obj_s, cat_s = carry[5:]
            tot_i = tot_i + jnp.sum(jnp.where(sels, iou_plain, 0.0))
            r50 = r50 + jnp.sum((sels & (iou_plain > 0.5)).astype(jnp.float32))
            r75 = r75 + jnp.sum((sels & (iou_plain > 0.75)).astype(jnp.float32))
            obj_s = obj_s + jnp.sum(jnp.where(sels, cells[:, obj_e], 0.0))
            cat_row = jnp.take(cells[:, cls_e:], c, axis=1)
            cat_s = cat_s + jnp.sum(jnp.where(sels, cat_row, 0.0))
            tail = (tot_i, r50, r75, obj_s, cat_s)
        else:
            tail = ()

        pos_obj = cls_mult_c * p.obj_normalizer * (1.0 - cells[:, obj_e])
        cur_obj = obj_d[mns % a, j, i]
        if p.objectness_smooth and not p.gaussian:
            # only land the positive delta on a zeroed cell (:578-584)
            new_obj = jnp.where(cur_obj == 0.0, pos_obj, cur_obj)
        else:
            new_obj = pos_obj
        obj_d = obj_d.at[idxs, j, i].set(
            jnp.where(sels, new_obj, cur_obj), mode="drop")
        rows = cls_d[mns % a, j, i]                               # [K, C]
        new_rows = jax.vmap(
            lambda r, cc: _class_delta_row(r, cc, c, cls_mult_c, p))(
            rows, cells[:, cls_e:])
        cls_d = cls_d.at[idxs, j, i].set(
            jnp.where(sels[:, None], new_rows, rows), mode="drop")
        return (obj_d, cls_d, box_d, tot_l, cnt) + tail, None

    # scan unroll measured a wash (unroll=8: 107.8 vs 107.4 ms flagship
    # step, 2026-08-21) — the residual cost is the serialized dependent
    # gather/scatter chain, not loop overhead; keep the plain scan
    z = jnp.float32(0.0)
    init = (obj_delta, cls_delta0, box_delta0, z, z)
    if stats:
        init = init + (z, z, z, z, z)
    final, _ = jax.lax.scan(step, init, jnp.arange(t_count))
    obj_delta, cls_delta, box_delta, tot_iou_loss, count = final[:5]

    if p.gaussian:
        # averages_gaussian_yolo_deltas: every cell, unconditionally
        n_in_box = jnp.sum((cls_delta > 0.0).astype(jnp.float32), axis=-1)
        box_delta = jnp.where(
            (n_in_box > 0)[..., None], box_delta / jnp.maximum(n_in_box, 1.0)[..., None],
            box_delta)
    elif p.iou_thresh < 1.0:
        # averages_yolo_deltas: only cells with a nonzero obj delta
        # (yolo_layer.c:645-660)
        n_in_box = jnp.sum((cls_delta > 0.0).astype(jnp.float32), axis=-1)
        div = (obj_delta != 0.0) & (n_in_box > 0)
        box_delta = jnp.where(
            div[..., None], box_delta / jnp.maximum(n_in_box, 1.0)[..., None],
            box_delta)

    delta = jnp.concatenate(
        [box_delta, obj_delta[..., None], cls_delta], axis=-1)
    if stats:
        # avg_anyobj accumulates the activated objectness at EVERY cell
        # (yolo_layer.c:448); the rest came out of the per-truth scan
        return delta, tot_iou_loss, count, final[5:] + (jnp.sum(sobj),)
    return delta, tot_iou_loss, count


def _head_cost_and_delta(raw: Array, truth: Array, p: DarknetHeadParams):
    """Batch: raw [B,A,H,W,E], truth [B,T,5] -> (cost, delta[B,A,H,W,E]).

    For iou_loss=mse and gaussian heads, cost = |delta|^2 summed over the
    whole batch (mag_array squared), the value darknet stores in l.cost
    (yolo_layer.c:893, gaussian_yolo_layer.c:685).  For IoU-family [yolo]
    heads darknet's default show_details path reports instead
    (yolo_layer.c:901-916):

        cost = iou_normalizer * tot_iou_loss/count
             + obj_normalizer * |delta with box entries zeroed|^2

    where tot_iou_loss sums 1-GIoU (giou) / 1-IoU (iou|diou|ciou) over
    every delta_yolo_box application and count counts them.

    [region] heads (RegionHeadParams) always report mag^2
    (region_layer.c:363)."""
    if isinstance(p, RegionHeadParams):
        delta = jax.vmap(lambda r, t: _region_head_deltas(r, t, p))(raw, truth)
        return jnp.sum(delta * delta), delta
    delta, tot, cnt = jax.vmap(lambda r, t: _head_deltas(r, t, p))(raw, truth)
    if p.gaussian or p.iou_loss == "mse":
        return jnp.sum(delta * delta), delta
    nonbox = delta.at[..., :4].set(0.0)
    class_cost = p.obj_normalizer * jnp.sum(nonbox * nonbox)
    cnt_total = jnp.sum(cnt)
    avg_iou_loss = jnp.where(
        cnt_total > 0,
        p.iou_normalizer * jnp.sum(tot) / jnp.maximum(cnt_total, 1.0), 0.0)
    return avg_iou_loss + class_cost, delta


def _head_cost_delta_stats(raw: Array, truth: Array, p: DarknetHeadParams):
    """Like :func:`_head_cost_and_delta` (identical cost and delta), but
    additionally returns per-term cost components and darknet's console
    telemetry accumulators.  The components are defined so they SUM to
    the head's reported cost exactly:

    - mse / gaussian heads (cost = |delta|², yolo_layer.c:893): box/obj/
      cls = the squared magnitude of the matching delta slice;
    - IoU-family heads (show_details cost, :901-916): box = the
      avg-IoU-loss term, obj/cls = obj_normalizer × slice magnitude²
      (together they are the ``|nonbox|²`` term).

    Region/V1 heads never reach here (the CLI darknet impl requires
    [yolo]/[gaussian_yolo] heads)."""
    if isinstance(p, RegionHeadParams):
        raise TypeError("stats path supports [yolo]/[gaussian_yolo] only")
    delta, tot, cnt, st = jax.vmap(
        lambda r, t: _head_deltas(r, t, p, stats=True))(raw, truth)
    nbox = 8 if p.gaussian else 4
    box_sq = jnp.sum(delta[..., :nbox] ** 2)
    obj_sq = jnp.sum(delta[..., nbox] ** 2)
    cls_sq = jnp.sum(delta[..., nbox + 1:] ** 2)
    cnt_total = jnp.sum(cnt)
    if p.gaussian or p.iou_loss == "mse":
        terms = (box_sq, obj_sq, cls_sq)
    else:
        avg_iou_loss = jnp.where(
            cnt_total > 0,
            p.iou_normalizer * jnp.sum(tot) / jnp.maximum(cnt_total, 1.0),
            0.0)
        terms = (avg_iou_loss, p.obj_normalizer * obj_sq,
                 p.obj_normalizer * cls_sq)
    cost = terms[0] + terms[1] + terms[2]
    tot_iou, r50, r75, obj_s, cat_s, sobj_s = (jnp.sum(v) for v in st)
    n_cells = float(np.prod(delta.shape[:-1]))  # B*A*H*W
    stats = {
        "count": cnt_total, "tot_iou": tot_iou, "recall50": r50,
        "recall75": r75, "obj_sum": obj_s, "cat_sum": cat_s,
        "sobj_sum": sobj_s, "n_cells": jnp.float32(n_cells),
    }
    return cost, delta, terms, stats


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def darknet_detection_loss_with_metrics(raws, truth, params_list):
    """:func:`darknet_detection_loss` plus a per-step telemetry dict —
    the same value and gradient, with per-term loss components
    (iou/objectness/classification, normalized like the total: summed
    over heads / (heads·batch)) and darknet's printed training stats
    (yolo_layer.c:560-575 taxonomy): ``avg_iou``/``avg_obj``/``avg_cat``
    = mean over the per-truth delta applications, ``recall50/75`` their
    IoU>.5/.75 fractions, ``no_obj`` the mean activated objectness over
    all cells, ``num_matched`` the application count.  The metrics carry
    no gradient."""
    return _loss_metrics_fwd(raws, truth, params_list)[0]


def _collect_metrics(all_terms, all_stats, n_heads, batch):
    denom = float(n_heads * batch)
    box_t = sum(t[0] for t in all_terms) / denom
    obj_t = sum(t[1] for t in all_terms) / denom
    cls_t = sum(t[2] for t in all_terms) / denom
    count = sum(s["count"] for s in all_stats)
    safe = jnp.maximum(count, 1.0)
    cells = sum(s["n_cells"] for s in all_stats)
    return {
        "iou_loss": box_t,
        "objectness_loss": obj_t,
        "classification_loss": cls_t,
        "num_matched": count.astype(jnp.int32),
        "avg_iou": sum(s["tot_iou"] for s in all_stats) / safe,
        "avg_obj": sum(s["obj_sum"] for s in all_stats) / safe,
        "avg_cat": sum(s["cat_sum"] for s in all_stats) / safe,
        "recall50": sum(s["recall50"] for s in all_stats) / safe,
        "recall75": sum(s["recall75"] for s in all_stats) / safe,
        "no_obj": sum(s["sobj_sum"] for s in all_stats) / cells,
    }


def _loss_metrics_fwd(raws, truth, params_list):
    if len(raws) != len(params_list):
        raise ValueError(
            f"{len(raws)} head outputs for {len(params_list)} param sets")
    cost = 0.0
    deltas, all_terms, all_stats = [], [], []
    for raw, p in zip(raws, params_list):
        c, d, terms, stats = _head_cost_delta_stats(
            reshape_head_raw(raw, p), truth, p)
        cost = cost + c
        deltas.append(d)
        all_terms.append(terms)
        all_stats.append(stats)
    batch = raws[0].shape[0]
    metrics = _collect_metrics(all_terms, all_stats, len(raws), batch)
    return ((cost / (len(raws) * batch), metrics), (deltas, raws, batch))


def _loss_metrics_bwd(params_list, res, g):
    g_cost = g[0]  # the metrics dict carries no gradient
    return _bwd(params_list, res, g_cost)


darknet_detection_loss_with_metrics.defvjp(_loss_metrics_fwd, _loss_metrics_bwd)


@dataclasses.dataclass(frozen=True)
class RegionHeadParams:
    """Static per-[region]-layer loss parameters (parser.c
    parse_region:667-702; region_layer.c training semantics).  Anchors
    are in GRID units (DOABS=1, region_layer.c:12)."""

    anchors: Tuple[Tuple[float, float], ...]  # all `num` biases, grid units
    classes: int
    thresh: float = 0.5
    object_scale: float = 1.0
    noobject_scale: float = 1.0
    class_scale: float = 1.0
    coord_scale: float = 1.0
    bias_match: bool = False
    rescore: bool = False
    classfix: int = 0
    focal_loss: bool = False
    softmax: bool = True
    # net.seen < 12800 (region_layer.c:288-296): early-training prior-box
    # regression toward the anchor at EVERY cell, scale 0.01.  Static here
    # — 5-step parity runs stay far below 12800 images seen.
    seen_lt_12800: bool = True

    @property
    def num_anchors(self) -> int:
        return len(self.anchors)

    @property
    def entries(self) -> int:
        return 5 + self.classes


def _region_class_row(probs, c, scale, p: RegionHeadParams):
    """delta_region_class (region_layer.c:117-163, no softmax_tree):
    full-row overwrite scale*(onehot - probs), focal variant alpha=0.5."""
    onehot = jax.nn.one_hot(c, p.classes)
    if p.focal_loss:
        pt = probs[c] + 1e-15
        grad = -(1.0 - pt) * (2.0 * pt * jnp.log(pt) + pt - 1.0)
        return scale * (onehot - probs) * (0.5 * grad)
    return scale * (onehot - probs)


def _region_box_delta(cell, x, y, w, h, i, j, fw, fh, aw, ah, scale):
    """delta_region_box (region_layer.c:96-115, DOABS): targets in
    grid/log units; x,y deltas carry sigma-prime (the logistic lives in
    the loss here, unlike the v3 yolo layer); w,h raw diffs.  Returns
    ([4] delta, iou of the decoded pred vs truth)."""
    sx = jax.nn.sigmoid(cell[0])
    sy = jax.nn.sigmoid(cell[1])
    px = (i + sx) / fw
    py = (j + sy) / fh
    pw = jnp.exp(cell[2]) * aw / fw
    ph = jnp.exp(cell[3]) * ah / fh
    iou = _iou_xywh(px, py, pw, ph, x, y, w, h)
    tx = x * fw - i
    ty = y * fh - j
    tw_t = jnp.log(w * fw / aw)
    th_t = jnp.log(h * fh / ah)
    d = jnp.stack([
        scale * (tx - sx) * sx * (1.0 - sx),
        scale * (ty - sy) * sy * (1.0 - sy),
        scale * (tw_t - cell[2]),
        scale * (th_t - cell[3]),
    ])
    return d, iou


def _region_head_deltas(raw: Array, truth: Array, p: RegionHeadParams):
    """One image: raw [A,H,W,E], truth [T,5] -> delta [A,H,W,E]
    (forward_region_layer's training pass, region_layer.c:183-368)."""
    a, fh, fw, e = raw.shape
    t_count = truth.shape[0]
    fhf, fwf = float(fh), float(fw)

    sobj = jax.nn.sigmoid(raw[..., 4])
    probs = (jax.nn.softmax(raw[..., 5:], axis=-1) if p.softmax
             else raw[..., 5:])

    tx, ty = truth[:, 0], truth[:, 1]
    tw, th = truth[:, 2], truth[:, 3]
    tcls = truth[:, 4].astype(jnp.int32)
    # class-range `continue` precedes the `!truth.x` break
    # (region_layer.c:262-266)
    reached = jnp.cumprod((tx != 0.0).astype(jnp.int32)) == 1
    tvalid = reached & (tcls < p.classes)

    anchors_w = jnp.asarray([w for w, _ in p.anchors], jnp.float32)
    anchors_h = jnp.asarray([h for _, h in p.anchors], jnp.float32)

    # decoded pred boxes for every cell
    rows = jax.lax.broadcasted_iota(jnp.float32, (a, fh, fw), 1)
    cols = jax.lax.broadcasted_iota(jnp.float32, (a, fh, fw), 2)
    aw3 = anchors_w.reshape(a, 1, 1)
    ah3 = anchors_h.reshape(a, 1, 1)
    bx = (cols + jax.nn.sigmoid(raw[..., 0])) / fwf
    by = (rows + jax.nn.sigmoid(raw[..., 1])) / fhf
    bw = jnp.exp(raw[..., 2]) * aw3 / fwf
    bh = jnp.exp(raw[..., 3]) * ah3 / fhf

    ious = _iou_xywh(bx[..., None], by[..., None], bw[..., None],
                     bh[..., None], tx, ty, tw, th)  # [A,H,W,T]
    ious = jnp.where(tvalid, ious, 0.0)
    best_iou = jnp.max(ious, axis=-1)
    best_cls = tcls[jnp.argmax(ious, axis=-1)]

    # ---- per-cell pass (region_layer.c:255-297) ------------------------
    obj_delta = p.noobject_scale * (0.0 - sobj) * sobj * (1.0 - sobj)
    cls_delta = jnp.zeros((a, fh, fw, p.classes), jnp.float32)
    if p.classfix == -1:
        obj_delta = p.noobject_scale * (best_iou - sobj) * sobj * (1.0 - sobj)
    else:
        over = best_iou > p.thresh
        obj_delta = jnp.where(over, 0.0, obj_delta)
        if p.classfix > 0:
            scale = p.class_scale * (sobj if p.classfix == 2 else 1.0)
            n_cells = a * fh * fw
            rows_c = jax.vmap(
                lambda pr, c_, s_: _region_class_row(pr, c_, s_, p))(
                probs.reshape(n_cells, p.classes),
                best_cls.reshape(n_cells),
                jnp.broadcast_to(scale, (a, fh, fw)).reshape(n_cells))
            cls_delta = jnp.where(
                over.reshape(n_cells, 1), rows_c,
                cls_delta.reshape(n_cells, p.classes)
            ).reshape(a, fh, fw, p.classes)

    box_delta = jnp.zeros((a, fh, fw, 4), jnp.float32)
    if p.seen_lt_12800:
        # prior-box regression toward the cell's anchor, scale .01
        n_cells = a * fh * fw
        prior, _ = jax.vmap(
            lambda cell, x_, y_, w_, h_, i_, j_, aw_, ah_:
            _region_box_delta(cell, x_, y_, w_, h_, i_, j_, fwf, fhf,
                              aw_, ah_, 0.01))(
            raw.reshape(n_cells, e),
            ((cols + 0.5) / fwf).reshape(n_cells),
            ((rows + 0.5) / fhf).reshape(n_cells),
            jnp.broadcast_to(aw3 / fwf, (a, fh, fw)).reshape(n_cells),
            jnp.broadcast_to(ah3 / fhf, (a, fh, fw)).reshape(n_cells),
            cols.reshape(n_cells), rows.reshape(n_cells),
            jnp.broadcast_to(aw3, (a, fh, fw)).reshape(n_cells),
            jnp.broadcast_to(ah3, (a, fh, fw)).reshape(n_cells))
        box_delta = prior.reshape(a, fh, fw, 4)

    # ---- per-truth pass (sequential overwrites, :300-360) --------------
    def step(carry, t):
        obj_d, cls_d, box_d = carry
        v = tvalid[t]
        x, y, w, h, c = tx[t], ty[t], tw[t], th[t], tcls[t]
        i = jnp.clip(jnp.floor(x * fwf).astype(jnp.int32), 0, fw - 1)
        j = jnp.clip(jnp.floor(y * fhf).astype(jnp.int32), 0, fh - 1)
        if p.bias_match:
            pw_n = anchors_w / fwf
            ph_n = anchors_h / fhf
        else:
            # decoded pred wh at this cell per anchor
            pw_n = jnp.exp(raw[:, j, i, 2]) * anchors_w / fwf
            ph_n = jnp.exp(raw[:, j, i, 3]) * anchors_h / fhf
        inter = jnp.minimum(pw_n, w) * jnp.minimum(ph_n, h)
        union = pw_n * ph_n + w * h - inter
        an_iou = jnp.where((inter == 0) | (union == 0), 0.0,
                           inter / jnp.where(union == 0, 1.0, union))
        best_n = jnp.argmax(an_iou)
        idx = jnp.where(v, best_n, a)  # out-of-range drops scatters

        cell = raw[best_n, j, i]
        add, iou = _region_box_delta(
            cell, x, y, w, h, i.astype(jnp.float32), j.astype(jnp.float32),
            fwf, fhf, anchors_w[best_n], anchors_h[best_n], p.coord_scale)
        box_d = box_d.at[idx, j, i].set(
            jnp.where(v, add, box_d[best_n % a, j, i]), mode="drop")

        so = sobj[best_n % a, j, i]
        target = iou if p.rescore else 1.0
        pos = p.object_scale * (target - so) * so * (1.0 - so)
        obj_d = obj_d.at[idx, j, i].set(
            jnp.where(v, pos, obj_d[best_n % a, j, i]), mode="drop")

        row = _region_class_row(probs[best_n % a, j, i], c,
                                jnp.float32(p.class_scale), p)
        cls_d = cls_d.at[idx, j, i].set(
            jnp.where(v, row, cls_d[best_n % a, j, i]), mode="drop")
        return (obj_d, cls_d, box_d), None

    (obj_delta, cls_delta, box_delta), _ = jax.lax.scan(
        step, (obj_delta, cls_delta, box_delta), jnp.arange(t_count))

    return jnp.concatenate(
        [box_delta, obj_delta[..., None], cls_delta], axis=-1)


@dataclasses.dataclass(frozen=True)
class V1DetectionParams:
    """Static per-[detection]-layer (YOLOv1) loss parameters
    (detection_layer.c; parser.c parse_detection).  The layer input is a
    FLAT vector per image: [side²·classes probs][side²·num confidences]
    [side²·num·coords boxes]; truth is the v1 grid layout
    [side², 1 + classes + 4] (is_obj, one-hot, x·side, y·side, w, h)."""

    side: int
    num: int
    classes: int
    coords: int = 4
    softmax: bool = False
    sqrt: bool = False
    rescore: bool = False
    object_scale: float = 1.0
    noobject_scale: float = 1.0
    class_scale: float = 1.0
    coord_scale: float = 1.0

    def __post_init__(self):
        if self.coords != 4:
            raise NotImplementedError("[detection] coords != 4 unsupported")

    @property
    def inputs(self) -> int:
        loc = self.side * self.side
        return loc * (self.classes + self.num * (1 + self.coords))

    @property
    def truth_cols(self) -> int:
        return self.side * self.side * (1 + self.classes + 4)


def _v1_head_deltas(raw: Array, truth: Array, p: V1DetectionParams) -> Array:
    """One image: raw [inputs], truth [side², 1+C+4] -> delta [inputs]
    (forward_detection_layer's training pass, detection_layer.c:45-180).
    Pure per-cell math — fully vectorized, no sequential dependence."""
    loc = p.side * p.side
    n, C = p.num, p.classes
    cls_out = raw[: loc * C].reshape(loc, C)
    if p.softmax:
        cls_out = jax.nn.softmax(cls_out, axis=-1)
    conf = raw[loc * C: loc * (C + n)].reshape(loc, n)
    boxes = raw[loc * (C + n):].reshape(loc, n, 4)

    is_obj = truth[:, 0] != 0.0                    # [loc]
    t_cls = truth[:, 1: 1 + C]                     # [loc, C]
    tb = truth[:, 1 + C: 1 + C + 4]                # [loc, 4] (x·side, y·side, w, h)

    # every confidence starts as a noobject negative
    conf_delta = p.noobject_scale * (0.0 - conf)
    # class deltas at object cells (MSE on the softmaxed probs — darknet
    # copies the delta straight back, treating softmax as identity)
    cls_delta = jnp.where(is_obj[:, None],
                          p.class_scale * (t_cls - cls_out), 0.0)

    # best box per object cell: IoU argmax, rmse argmin fallback when every
    # IoU is zero (detection_layer.c:105-121)
    side = float(p.side)
    ox = boxes[..., 0] / side
    oy = boxes[..., 1] / side
    ow = boxes[..., 2] ** 2 if p.sqrt else boxes[..., 2]
    oh = boxes[..., 3] ** 2 if p.sqrt else boxes[..., 3]
    tx = tb[:, 0] / side
    ty = tb[:, 1] / side
    tw_, th_ = tb[:, 2], tb[:, 3]
    ious = _iou_xywh(ox, oy, ow, oh,
                     tx[:, None], ty[:, None], tw_[:, None], th_[:, None])
    rmse = jnp.sqrt(
        (ox - tx[:, None]) ** 2 + (oy - ty[:, None]) ** 2
        + (ow - tw_[:, None]) ** 2 + (oh - th_[:, None]) ** 2)
    any_iou = jnp.any(ious > 0.0, axis=-1)
    best = jnp.where(any_iou, jnp.argmax(ious, axis=-1),
                     jnp.argmin(rmse, axis=-1))    # [loc]

    cells = jnp.arange(loc)
    best_iou = ious[cells, best]
    best_conf = conf[cells, best]
    target = best_iou if p.rescore else 1.0
    pos_conf = p.object_scale * (target - best_conf)
    conf_delta = jnp.where(
        (jnp.arange(n) == best[:, None]) & is_obj[:, None],
        pos_conf[:, None], conf_delta)

    best_box = boxes[cells, best]                  # [loc, 4] raw
    t_coord = tb
    if p.sqrt:
        t_coord = t_coord.at[:, 2:].set(jnp.sqrt(tb[:, 2:]))
    box_row = p.coord_scale * (t_coord - best_box)
    box_delta = jnp.where(
        ((jnp.arange(n) == best[:, None]) & is_obj[:, None])[..., None],
        box_row[:, None, :], 0.0)                  # [loc, n, 4]

    return jnp.concatenate([
        cls_delta.reshape(-1), conf_delta.reshape(-1), box_delta.reshape(-1)])


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def darknet_v1_detection_loss(raw, truth_grid, p):
    """[detection] (YOLOv1) training loss: value = |delta|²/batch
    (detection_layer.c:213 mag² + network.c loss convention); gradient
    wrt the flat layer input = -delta/batch (backward_detection_layer's
    axpy).  ``raw``: [B, inputs]; ``truth_grid``: [B, side², 1+C+4]."""
    delta = jax.vmap(lambda r, t: _v1_head_deltas(r, t, p))(raw, truth_grid)
    return jnp.sum(delta * delta) / raw.shape[0]


def _v1_fwd(raw, truth_grid, p):
    delta = jax.vmap(lambda r, t: _v1_head_deltas(r, t, p))(raw, truth_grid)
    return jnp.sum(delta * delta) / raw.shape[0], (delta, raw.shape[0])


def _v1_bwd(p, res, g):
    delta, batch = res
    return (-delta * g / batch, None)


darknet_v1_detection_loss.defvjp(_v1_fwd, _v1_bwd)


def v1_params_from_darknet(layer) -> V1DetectionParams:
    """Build params from a parsed darknet [detection] layer
    (config.darknet_cfg.Detection)."""
    if getattr(layer, "forced", False) or getattr(layer, "random", 0.0):
        raise NotImplementedError(
            "[detection] forced/random branches unsupported (the random "
            "branch draws rand()%n per truth — irreproducible)")
    return V1DetectionParams(
        side=int(layer.side), num=int(layer.num), classes=int(layer.classes),
        coords=int(layer.coords), softmax=bool(layer.softmax),
        sqrt=bool(layer.sqrt), rescore=bool(layer.rescore),
        object_scale=float(layer.object_scale),
        noobject_scale=float(layer.noobject_scale),
        class_scale=float(layer.class_scale),
        coord_scale=float(layer.coord_scale),
    )


def region_params_from_darknet(layer) -> RegionHeadParams:
    """Build params from a parsed darknet [region] layer
    (config.darknet_cfg.Region)."""
    if getattr(layer, "coords", 4) != 4:
        raise NotImplementedError("[region] coords != 4 unsupported")
    anchors = tuple((float(w), float(h)) for w, h in layer.anchors)
    if not anchors:
        anchors = tuple((0.5, 0.5) for _ in range(int(layer.num)))
    return RegionHeadParams(
        anchors=anchors,
        classes=int(layer.classes),
        thresh=float(layer.thresh),
        object_scale=float(layer.object_scale),
        noobject_scale=float(layer.noobject_scale),
        class_scale=float(layer.class_scale),
        coord_scale=float(layer.coord_scale),
        bias_match=bool(layer.bias_match),
        rescore=bool(layer.rescore),
        classfix=int(layer.classfix),
        focal_loss=bool(layer.focal_loss),
        softmax=bool(layer.softmax),
    )


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
    if len(raws) != len(params_list):
        raise ValueError(
            f"{len(raws)} head outputs for {len(params_list)} param sets")
    cost = 0.0
    for raw, p in zip(raws, params_list):
        c, _ = _head_cost_and_delta(reshape_head_raw(raw, p), truth, p)
        cost = cost + c
    return cost / (len(raws) * raws[0].shape[0])


def _fwd(raws, truth, params_list):
    if len(raws) != len(params_list):
        raise ValueError(
            f"{len(raws)} head outputs for {len(params_list)} param sets")
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
        if getattr(p, "new_coords", False):
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
    (config.darknet_cfg.Yolo).  Mirrors parser.c parse_yolo /
    parse_gaussian_yolo, including get_classes_multipliers (:412-431) and
    the l.total anchor truncation (Yolo.total_anchors).

    Raises ValueError at cfg-resolution time (not mid-training) for
    option combinations with no darknet oracle semantics."""
    if getattr(layer, "gaussian", False) and getattr(layer, "new_coords", 0):
        raise ValueError(
            "[Gaussian_yolo] layer sets new_coords=1 — unsupported "
            "combination (darknet's gaussian_yolo_layer.c has no "
            "new_coords branch; no reference cfg combines them)")
    if getattr(layer, "yolo_point", "center") != "center":
        raise NotImplementedError("yolo_point != center unsupported")
    anchors = tuple((float(w), float(h))
                    for w, h in getattr(layer, "total_anchors", layer.anchors))
    mask = tuple(int(m) for m in layer.mask) or tuple(range(len(anchors)))
    max_delta = getattr(layer, "max_delta", None)
    counters = tuple(getattr(layer, "counters_per_class", ()) or ())
    multipliers = None
    if counters:
        if len(counters) != int(layer.classes):
            raise ValueError(
                f"counters_per_class has {len(counters)} entries for "
                f"{layer.classes} classes")
        cap = max_delta if max_delta is not None else float("inf")
        mx = float(max(counters))
        multipliers = tuple(min(mx / c, cap) for c in counters)
    return DarknetHeadParams(
        anchors=anchors,
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
        iou_loss=str(getattr(layer, "iou_loss", "mse")),
        iou_thresh=float(getattr(layer, "iou_thresh", 1.0)),
        iou_thresh_kind=str(getattr(layer, "iou_thresh_kind", "iou")),
        objectness_smooth=bool(getattr(layer, "objectness_smooth", False)),
        max_delta=float(max_delta) if max_delta is not None else None,
        focal_loss=bool(getattr(layer, "focal_loss", False)),
        label_smooth_eps=float(getattr(layer, "label_smooth_eps", 0.0)),
        classes_multipliers=multipliers,
    )
