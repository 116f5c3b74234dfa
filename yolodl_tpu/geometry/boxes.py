"""Differentiable box algebra on arrays.

Equivalent capability to the reference's ``bbox`` crate (scalar box math,
``bbox/src/{cycxhw,tlbr,rect}.rs``) and the tensorized IoU family in
``tch-goodies/src/compound_tensor/{cycxhw,tlbr}.rs:67-177``.

Unlike the reference, which maintains one-column-per-field "compound tensors"
(``[N,1]`` each for cy/cx/h/w), boxes here are plain arrays whose **last axis
has size 4** — either ``[..., (cy, cx, h, w)]`` or ``[..., (t, l, b, r)]``.
This keeps every op a fused elementwise XLA computation and works under vmap.

All functions accept broadcastable leading dimensions and are differentiable
(CIoU's aspect-ratio coefficient uses ``stop_gradient``, matching the
reference's ``tch::no_grad`` at cycxhw.rs:118).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

Array = jax.Array

# Matches tch-goodies/src/utils.rs:5.
EPSILON = 1e-16


def cycxhw_to_tlbr(boxes: Array) -> Array:
    """[..., (cy,cx,h,w)] → [..., (t,l,b,r)]."""
    cy, cx, h, w = jnp.split(boxes, 4, axis=-1)
    return jnp.concatenate([cy - h / 2, cx - w / 2, cy + h / 2, cx + w / 2], axis=-1)


def tlbr_to_cycxhw(boxes: Array) -> Array:
    """[..., (t,l,b,r)] → [..., (cy,cx,h,w)]."""
    t, l, b, r = jnp.split(boxes, 4, axis=-1)
    return jnp.concatenate([(t + b) / 2, (l + r) / 2, b - t, r - l], axis=-1)


def area(cycxhw: Array) -> Array:
    """Box area, shape [...]."""
    return cycxhw[..., 2] * cycxhw[..., 3]


def intersect_area(tlbr_a: Array, tlbr_b: Array) -> Array:
    """Intersection area of two TLBR boxes (tlbr.rs:81-106)."""
    max_t = jnp.maximum(tlbr_a[..., 0], tlbr_b[..., 0])
    max_l = jnp.maximum(tlbr_a[..., 1], tlbr_b[..., 1])
    min_b = jnp.minimum(tlbr_a[..., 2], tlbr_b[..., 2])
    min_r = jnp.minimum(tlbr_a[..., 3], tlbr_b[..., 3])
    inner_h = jnp.maximum(min_b - max_t, 0.0)
    inner_w = jnp.maximum(min_r - max_l, 0.0)
    return inner_h * inner_w


def closure_tlbr(tlbr_a: Array, tlbr_b: Array) -> Array:
    """Smallest TLBR box enclosing both (tlbr.rs:109-134)."""
    return jnp.stack(
        [
            jnp.minimum(tlbr_a[..., 0], tlbr_b[..., 0]),
            jnp.minimum(tlbr_a[..., 1], tlbr_b[..., 1]),
            jnp.maximum(tlbr_a[..., 2], tlbr_b[..., 2]),
            jnp.maximum(tlbr_a[..., 3], tlbr_b[..., 3]),
        ],
        axis=-1,
    )


def _iou_parts(a_cycxhw: Array, b_cycxhw: Array):
    ta = cycxhw_to_tlbr(a_cycxhw)
    tb = cycxhw_to_tlbr(b_cycxhw)
    inter = intersect_area(ta, tb)
    union = area(a_cycxhw) + area(b_cycxhw) - inter + EPSILON
    return ta, tb, inter, union


def iou(a: Array, b: Array) -> Array:
    """Elementwise IoU of CyCxHW boxes (cycxhw.rs:67-73)."""
    _, _, inter, union = _iou_parts(a, b)
    return inter / union


def giou(a: Array, b: Array) -> Array:
    """Generalized IoU (cycxhw.rs:75-83)."""
    ta, tb, inter, union = _iou_parts(a, b)
    closure = closure_tlbr(ta, tb)
    closure_area = (closure[..., 2] - closure[..., 0]) * (closure[..., 3] - closure[..., 1])
    return inter / union - (closure_area - union) / (closure_area + EPSILON)


def _center_terms(a: Array, b: Array):
    ta = cycxhw_to_tlbr(a)
    tb = cycxhw_to_tlbr(b)
    closure = closure_tlbr(ta, tb)
    closure_h = closure[..., 2] - closure[..., 0]
    closure_w = closure[..., 3] - closure[..., 1]
    diagonal_sq = closure_h**2 + closure_w**2 + EPSILON
    center_dist_sq = (a[..., 0] - b[..., 0]) ** 2 + (a[..., 1] - b[..., 1]) ** 2
    return diagonal_sq, center_dist_sq


def diou(a: Array, b: Array) -> Array:
    """Distance-IoU (cycxhw.rs:86-99)."""
    diagonal_sq, center_dist_sq = _center_terms(a, b)
    return iou(a, b) - center_dist_sq / diagonal_sq


def ciou(a: Array, b: Array) -> Array:
    """Complete-IoU with the no-grad aspect-ratio coefficient (cycxhw.rs:102-121)."""
    iou_score = iou(a, b)
    diagonal_sq, center_dist_sq = _center_terms(a, b)
    pred_angle = jnp.arctan2(a[..., 2], a[..., 3])
    target_angle = jnp.arctan2(b[..., 2], b[..., 3])
    shape_loss = (pred_angle - target_angle) ** 2 * 4.0 / (jnp.pi**2)
    shape_coef = jax.lax.stop_gradient(shape_loss / (1.0 - iou_score + shape_loss + EPSILON))
    return iou_score - center_dist_sq / diagonal_sq + shape_coef * shape_loss


def hausdorff_distance(a: Array, b: Array) -> Array:
    """Hausdorff distance between CyCxHW boxes (tlbr.rs:137-177)."""
    ta = cycxhw_to_tlbr(a)
    tb = cycxhw_to_tlbr(b)
    dt = tb[..., 0] - ta[..., 0]
    dl = tb[..., 1] - ta[..., 1]
    db = ta[..., 2] - tb[..., 2]
    dr = ta[..., 3] - tb[..., 3]

    dt_l = jnp.maximum(dt, 0.0)
    dl_l = jnp.maximum(dl, 0.0)
    db_l = jnp.maximum(db, 0.0)
    dr_l = jnp.maximum(dr, 0.0)

    dt_r = jnp.maximum(-dt, 0.0)
    dl_r = jnp.maximum(-dl, 0.0)
    db_r = jnp.maximum(-db, 0.0)
    dr_r = jnp.maximum(-dr, 0.0)

    sq = jnp.maximum(dt_l**2 + dl_l**2, dt_l**2 + dr_l**2)
    sq = jnp.maximum(sq, db_l**2 + dl_l**2)
    sq = jnp.maximum(sq, db_l**2 + dr_l**2)
    sq = jnp.maximum(sq, dt_r**2 + dl_r**2)
    sq = jnp.maximum(sq, dt_r**2 + dr_r**2)
    sq = jnp.maximum(sq, db_r**2 + dl_r**2)
    sq = jnp.maximum(sq, db_r**2 + dr_r**2)
    return jnp.sqrt(sq)


def box_iou_pairwise(tlbr_a: Array, tlbr_b: Array) -> Array:
    """Full IoU matrix between two TLBR box sets: [N,4] × [M,4] → [N,M].

    The building block for NMS (replaces the reference's external CUDA kernel
    ``tch-nms``, yolo-dl/src/loss/nms.rs:142-148).
    """
    a = tlbr_a[:, None, :]
    b = tlbr_b[None, :, :]
    inter = intersect_area(a, b)
    area_a = (tlbr_a[:, 2] - tlbr_a[:, 0]) * (tlbr_a[:, 3] - tlbr_a[:, 1])
    area_b = (tlbr_b[:, 2] - tlbr_b[:, 0]) * (tlbr_b[:, 3] - tlbr_b[:, 1])
    union = area_a[:, None] + area_b[None, :] - inter + EPSILON
    return inter / union


IOU_KINDS = {
    "iou": iou,
    "giou": giou,
    "diou": diou,
    "ciou": ciou,
}


def iou_score(kind: str, a: Array, b: Array) -> Array:
    """Dispatch over the IoU family by name (BoxMetric in loss config)."""
    try:
        return IOU_KINDS[kind.lower()](a, b)
    except KeyError:
        raise KeyError(f"unknown IoU kind {kind!r}; expected one of {sorted(IOU_KINDS)}")
