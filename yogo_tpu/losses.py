"""YOGO detection loss as a pure jittable function.

Re-design of the reference 3-term loss (reference: yogo/yogo_loss.py:38-129)
for TPU/XLA: instead of boolean-mask gathers producing dynamic shapes, every
term is computed over the full (B, Sy, Sx) grid and weighted by the object
mask - identical values and gradients, static shapes throughout.

Terms (each summed over the batch then divided by batch size):
  1. iou_weight * CIoU(clamp(pred_xyxy, 0, 1), label_xyxy) on object cells,
     skipping degenerate zero-width/height predicted boxes,
  2. classify_weight * masked cross-entropy with label smoothing,
  3. MSE(objectness, mask) weighted mask*(1-no_obj_weight) + no_obj_weight.

Note the reference never passes classify_weight to its loss constructor
(reference: yogo/train.py:206-211 vs config at train.py:619) so it is always
1.0 there; we plumb it properly but default to 1.0.
"""

from __future__ import annotations

from functools import partial
from typing import Dict, Tuple

import jax
import jax.numpy as jnp

from yogo_tpu.ops.boxes import box_cxcywh_to_xyxy, complete_box_iou_loss

Array = jax.Array


def smoothed_cross_entropy(
    logits: Array, targets: Array, label_smoothing: float
) -> Array:
    """Per-element CE with label smoothing, matching torch.nn.CrossEntropyLoss
    (reduction='none'): target distribution (1-eps)*onehot + eps/C."""
    log_probs = jax.nn.log_softmax(logits, axis=-1)
    # one-hot contraction, NOT take_along_axis: XLA lowers the per-cell
    # class gather to an HBM-bound gather op (measured 7.5 ms/step at bs=64
    # = 10% of the whole train step, tools/profile_device.py round 4); the
    # iota-compare/select formulation fuses into the surrounding
    # elementwise work for ~free. Same values, same gradient.
    one_hot = jax.nn.one_hot(targets, logits.shape[-1], dtype=log_probs.dtype)
    nll = -jnp.sum(log_probs * one_hot, axis=-1)
    if label_smoothing == 0.0:
        return nll
    uniform = -jnp.mean(log_probs, axis=-1)
    return (1.0 - label_smoothing) * nll + label_smoothing * uniform


@partial(
    jax.jit,
    static_argnames=(
        "no_obj_weight",
        "iou_weight",
        "classify_weight",
        "label_smoothing",
    ),
)
def yogo_loss(
    preds: Array,
    labels: Array,
    no_obj_weight: float = 0.5,
    iou_weight: float = 5.0,
    classify_weight: float = 1.0,
    label_smoothing: float = 0.01,
    image_mask: Array | None = None,
) -> Tuple[Array, Dict[str, Array]]:
    """preds: (B, 5+C, Sy, Sx) decoded predictions (class logits);
    labels: (B, 6, Sy, Sx) [mask, x1, y1, x2, y2, class];
    image_mask: optional (B,) 0/1 validity for padded batches - padded
    images contribute nothing and normalization uses the real-image count.
    Returns (total_loss, components dict of f32 scalars)."""
    preds = preds.astype(jnp.float32)
    labels = labels.astype(jnp.float32)

    if image_mask is None:
        batch_size = jnp.float32(preds.shape[0])
        img_w = jnp.ones((preds.shape[0], 1, 1), jnp.float32)
    else:
        image_mask = image_mask.astype(jnp.float32)
        batch_size = jnp.maximum(jnp.sum(image_mask), 1.0)
        img_w = image_mask[:, None, None]

    mask = labels[:, 0] * img_w  # (B, Sy, Sx)

    # ---- IoU term: full grid, masked ------------------------------------
    pred_boxes = jnp.moveaxis(preds[:, :4], 1, -1)  # (B, Sy, Sx, 4) cxcywh
    pred_xyxy = box_cxcywh_to_xyxy(pred_boxes)
    # degenerate (zero w or h) predicted boxes are excluded
    # (reference: yogo/yogo_loss.py:84-90)
    nondegenerate = (pred_xyxy[..., 0] != pred_xyxy[..., 2]) & (
        pred_xyxy[..., 1] != pred_xyxy[..., 3]
    )
    iou_mask = mask * nondegenerate.astype(jnp.float32)

    label_xyxy = jnp.moveaxis(labels[:, 1:5], 1, -1)  # (B, Sy, Sx, 4)
    # feed safe boxes into CIoU where masked so no NaN can leak via 0 * nan
    safe_target = jnp.where(
        iou_mask[..., None] > 0, label_xyxy, jnp.array([0.0, 0.0, 1.0, 1.0])
    )
    ciou = complete_box_iou_loss(jnp.clip(pred_xyxy, 0.0, 1.0), safe_target)
    iou_loss = iou_weight * jnp.sum(ciou * iou_mask) / batch_size

    # ---- classification term --------------------------------------------
    logits = jnp.moveaxis(preds[:, 5:], 1, -1)  # (B, Sy, Sx, C)
    targets = labels[:, 5].astype(jnp.int32)
    ce = smoothed_cross_entropy(logits, targets, label_smoothing)
    classification_loss = classify_weight * jnp.sum(mask * ce) / batch_size

    # ---- objectness term --------------------------------------------------
    sq_err = (preds[:, 4] - labels[:, 0]) ** 2
    obj_weights = (labels[:, 0] * (1.0 - no_obj_weight) + no_obj_weight) * img_w
    objectness_loss = jnp.sum(sq_err * obj_weights) / batch_size

    total = objectness_loss + iou_loss + classification_loss
    return total, {
        "iou_loss": iou_loss,
        "objectness_loss": objectness_loss,
        "classification_loss": classification_loss,
    }
