"""Per-step quality telemetry.

Equivalent capability to ``yolo-dl/src/loss/benchmark.rs:33-101``
(YoloBenchmark): objectness accuracy / recall / precision against the
matcher output at a confidence threshold, plus classification accuracy on
matched cells.  Device-side, fixed shape, mask-aware.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from ..ops.detect import MergedDetection
from .matcher import MatchingOutput

Array = jax.Array


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class BenchmarkOutput:
    obj_accuracy: Array
    obj_recall: Array
    obj_precision: Array
    class_accuracy: Array

    def tree_flatten(self):
        return (self.obj_accuracy, self.obj_recall, self.obj_precision,
                self.class_accuracy), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)


def yolo_benchmark(
    prediction: MergedDetection,
    matching: MatchingOutput,
    confidence_threshold: float = 0.5,
) -> BenchmarkOutput:
    obj_prob = prediction.obj_prob()                         # [B, N]
    all_pos_mask = obj_prob >= confidence_threshold
    all_count = obj_prob.size
    all_pos = jnp.sum(all_pos_mask)

    pred_boxes, pred_obj, pred_class = matching.gather_pred(prediction)
    matched_prob = jax.nn.sigmoid(pred_obj)                  # [B, C]
    valid = matching.valid
    matched_count = jnp.sum(valid)
    matched_pos = jnp.sum(valid & (matched_prob >= confidence_threshold))
    matched_neg = matched_count - matched_pos

    all_neg = all_count - all_pos
    unmatched_neg = all_neg - matched_neg

    accuracy = (matched_pos + unmatched_neg) / all_count
    recall = jnp.where(matched_count > 0, matched_pos / jnp.maximum(matched_count, 1), 1.0)
    precision = jnp.where(all_pos > 0, matched_pos / jnp.maximum(all_pos, 1), 1.0)

    # classification accuracy on matched cells whose confidence passes the
    # threshold for any class (benchmark.rs:79-95); class probabilities use
    # the head's declared activation so the gate agrees with what
    # NMS/inference compute (MergedDetection.class_prob)
    if prediction.infos and prediction.infos[0].class_act == "softmax":
        class_prob = jax.nn.softmax(pred_class, axis=-1)
    else:
        class_prob = jax.nn.sigmoid(pred_class)
    conf = matched_prob[..., None] * class_prob
    conf_ok = jnp.any(conf >= confidence_threshold, axis=-1)
    pred_label = jnp.argmax(pred_class, axis=-1)
    correct = valid & conf_ok & (pred_label == matching.gt_class)
    class_accuracy = jnp.where(
        matched_count > 0, jnp.sum(correct) / jnp.maximum(matched_count, 1), 1.0
    )

    return BenchmarkOutput(
        obj_accuracy=accuracy,
        obj_recall=recall,
        obj_precision=precision,
        class_accuracy=class_accuracy,
    )
