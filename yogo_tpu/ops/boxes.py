"""Pure-jnp bounding-box geometry.

TPU-native replacement for the torchvision box ops the reference delegates to
(reference: yogo/yogo_loss.py:78-105, yogo/utils/prediction_formatting.py:74-86,
yogo/data/blobgen.py:201). Everything here is shape-polymorphic over leading
dims, jit/vmap-friendly, and uses only static shapes.

Semantics match torchvision:
  - ``box_convert`` cxcywh<->xyxy
  - ``box_iou``: pairwise IoU, intersection / (a1 + a2 - inter)
  - ``complete_box_iou_loss``: CIoU = 1 - IoU + d^2/c^2 + alpha * v with
    eps=1e-7 and alpha treated as a constant w.r.t. gradients.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

Array = jax.Array

_EPS = 1e-7


def box_cxcywh_to_xyxy(boxes: Array) -> Array:
    """(..., 4) [cx, cy, w, h] -> [x1, y1, x2, y2]."""
    cx, cy, w, h = jnp.split(boxes, 4, axis=-1)
    return jnp.concatenate(
        [cx - 0.5 * w, cy - 0.5 * h, cx + 0.5 * w, cy + 0.5 * h], axis=-1
    )


def box_xyxy_to_cxcywh(boxes: Array) -> Array:
    """(..., 4) [x1, y1, x2, y2] -> [cx, cy, w, h]."""
    x1, y1, x2, y2 = jnp.split(boxes, 4, axis=-1)
    return jnp.concatenate(
        [(x1 + x2) / 2, (y1 + y2) / 2, x2 - x1, y2 - y1], axis=-1
    )


def box_area(boxes: Array) -> Array:
    """(..., 4) xyxy -> (...) area."""
    return (boxes[..., 2] - boxes[..., 0]) * (boxes[..., 3] - boxes[..., 1])


def box_iou(boxes1: Array, boxes2: Array) -> Array:
    """Pairwise IoU between (N, 4) and (M, 4) xyxy boxes -> (N, M)."""
    area1 = box_area(boxes1)  # (N,)
    area2 = box_area(boxes2)  # (M,)
    lt = jnp.maximum(boxes1[:, None, :2], boxes2[None, :, :2])  # (N, M, 2)
    rb = jnp.minimum(boxes1[:, None, 2:], boxes2[None, :, 2:])  # (N, M, 2)
    wh = jnp.clip(rb - lt, 0)
    inter = wh[..., 0] * wh[..., 1]
    union = area1[:, None] + area2[None, :] - inter
    return inter / union


def elementwise_box_iou(boxes1: Array, boxes2: Array, eps: float = _EPS) -> Array:
    """Elementwise IoU between two broadcastable (..., 4) xyxy box arrays."""
    area1 = box_area(boxes1)
    area2 = box_area(boxes2)
    lt = jnp.maximum(boxes1[..., :2], boxes2[..., :2])
    rb = jnp.minimum(boxes1[..., 2:], boxes2[..., 2:])
    wh = jnp.clip(rb - lt, 0)
    inter = wh[..., 0] * wh[..., 1]
    union = area1 + area2 - inter
    return inter / (union + eps)


def complete_box_iou_loss(
    pred: Array, target: Array, eps: float = _EPS
) -> Array:
    """Elementwise CIoU loss between (..., 4) xyxy boxes (reduction='none').

    Matches torchvision.ops.complete_box_iou_loss as used by the reference
    loss (reference: yogo/yogo_loss.py:92-105):
        loss = 1 - IoU + center_dist^2 / diag^2 + alpha * v
        v = (4 / pi^2) (atan(wg/hg) - atan(w/h))^2
        alpha = stop_grad(v / (1 - IoU + v + eps))

    All divisions are eps-guarded so masked-out (zero) boxes produce finite
    values and zero gradients once multiplied by a mask.

    DOCUMENTED DIVERGENCE on boxes degenerate along one axis (h == 0 or
    w == 0, unreachable from the decoded-prediction loss path where
    centers are strictly inside (0, 1)): torchvision evaluates
    atan(w/0) = pi/2 (and NaN for 0/0), while this guard substitutes
    h = 1 so the value AND gradient stay finite - e.g. a fully-degenerate
    [1,1,1,1] pred gives NaN in torchvision but a finite loss here. The
    guarded form is deliberate: masked label slots are all-zero boxes,
    and a NaN from them would poison the whole gradient through 0 * NaN.
    """
    iou = elementwise_box_iou(pred, target, eps=eps)

    x1, y1, x2, y2 = (pred[..., i] for i in range(4))
    x1g, y1g, x2g, y2g = (target[..., i] for i in range(4))

    # smallest enclosing box diagonal
    xc1 = jnp.minimum(x1, x1g)
    yc1 = jnp.minimum(y1, y1g)
    xc2 = jnp.maximum(x2, x2g)
    yc2 = jnp.maximum(y2, y2g)
    diag_sq = (xc2 - xc1) ** 2 + (yc2 - yc1) ** 2 + eps

    center_sq = ((x1 + x2 - x1g - x2g) ** 2 + (y1 + y2 - y1g - y2g) ** 2) / 4
    diou = 1.0 - iou + center_sq / diag_sq

    w_pred = x2 - x1
    h_pred = y2 - y1
    w_gt = x2g - x1g
    h_gt = y2g - y1g

    # aspect-ratio consistency term; guard 0/0 for degenerate (masked) boxes
    safe_h_pred = jnp.where(h_pred == 0, 1.0, h_pred)
    safe_h_gt = jnp.where(h_gt == 0, 1.0, h_gt)
    v = (4.0 / (jnp.pi**2)) * (
        jnp.arctan(w_gt / safe_h_gt) - jnp.arctan(w_pred / safe_h_pred)
    ) ** 2
    alpha = jax.lax.stop_gradient(v / (1.0 - iou + v + eps))
    return diou + alpha * v


def encode_label_grid(labels: Array, Sx: int, Sy: int) -> Array:
    """Scatter (N, 5) [class, x1, y1, x2, y2] labels into a (6, Sy, Sx) grid.

    TPU-native version of the reference label encoder (reference:
    yogo/data/yogo_dataset.py:24-46). Row layout: [mask, x1, y1, x2, y2, cls].
    A box is assigned to the cell containing its center:
    i = (x1+x2)*Sx//2, j = (y1+y2)*Sy//2. NOTE: when two boxes land in the
    same cell, XLA scatter order is unspecified - use the host encoder
    (yogo_tpu.ops.grid.encode_label_grid_np) when the reference's
    deterministic last-write-wins ordering matters.

    ``labels`` may be padded with rows whose class is < 0; those are dropped.
    Boxes whose center falls outside [0, 1) are also dropped: the reference
    raises IndexError on them, and an unguarded scatter would silently wrap
    them into a cell on the opposite edge of the grid.
    """
    labels = jnp.asarray(labels, jnp.float32)
    n = labels.shape[0]
    out = jnp.zeros((6, Sy, Sx), jnp.float32)
    if n == 0:
        return out
    ii = jnp.floor((labels[:, 1] + labels[:, 3]) * Sx / 2).astype(jnp.int32)
    jj = jnp.floor((labels[:, 2] + labels[:, 4]) * Sy / 2).astype(jnp.int32)
    valid = (
        (labels[:, 0] >= 0)
        & (ii >= 0)
        & (ii < Sx)
        & (jj >= 0)
        & (jj < Sy)
    )
    rows = jnp.concatenate(
        [
            jnp.ones((n, 1), jnp.float32),
            labels[:, 1:5],
            labels[:, 0:1],
        ],
        axis=1,
    )  # (N, 6)
    # route invalid (padding) rows out of bounds; mode="drop" discards them
    idx = jnp.where(valid, jj * Sx + ii, Sy * Sx)
    flat = out.reshape(6, Sy * Sx).T
    flat = flat.at[idx].set(rows, mode="drop")
    return flat.T.reshape(6, Sy, Sx)
