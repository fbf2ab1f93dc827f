"""Windowed (grid-local) NMS + class counting: selection-free postprocess.

STATUS: EXPERIMENTAL - exact and capacity-free, but measured SLOWER than
the shipped top-K+NMS path on the v5e harness (19.5 vs 7.2 ms/batch-512 at
radius 4; docs/perf-notes.md "Windowed NMS"), because XLA materializes each
shifted-plane pad/slice instead of reusing VMEM tiles with halos: the cost
is a flat ~0.4 ms per stencil offset-pair, matching the no-reuse HBM
roofline. A Pallas halo-reuse kernel would remove the traffic but the
stencil is then VPU-compute-bound at ~1.3-3 ms/batch-512 - borderline
against the 2.05 ms postprocess budget - so the kernel is not worth
building (full floor analysis in docs/perf-notes.md). Kept with full
tests like ops/pallas_stem.py: correct, honest about being off the hot
path, and the capacity-free semantics remain useful as an oracle.

The fused count path (`yogo infer --count`, reference: yogo/infer.py:60-124)
needs only the per-class histogram of NMS survivors - not their boxes. The
standard device path (ops/postprocess.py) still pays for a global top-K
selection (approx_max_k, ~3.1 ms at bs=512) plus a (K, K) pairwise NMS
(~2.4 ms at K=256) because greedy NMS is formulated over a compacted
candidate list.

This module reformulates greedy NMS *in grid layout*: every prediction's box
center lies inside its own grid cell (the YOLO9000 direct-location decode,
models/yogo.py: cx = (sigmoid + col)/Sx), so two boxes can only overlap -
let alone exceed an IoU threshold - if their cells are near each other.
Suppression is then a stencil: each cell is compared against a fixed window
of neighbor offsets via shifted (zero-padded) plane reads, and the same
fixed-point iteration as ops/nms.py resolves the greedy cascade. No top-K,
no gathers, no (K, K) matrix, and no capacity limit: ALL passing cells
participate, like the reference's dynamically-shaped host path.

Exactness guarantee (the "premise"):
  For boxes i, j with IoU > t:  inter > t * union >= t * max(a_i, a_j),
  and overlap_y <= min(h_i, h_j), so
    overlap_x >= inter / overlap_y > t * max(a_i, a_j) / min(h_i, h_j)
               >= t * max(w_i, w_j)
  (apply max(a_i,a_j) >= a_k with k the *other* box than the min-height one:
  a_k = w_k * h_k and h_k >= min(h_i, h_j)).  Since the boxes overlap,
  |cx_i - cx_j| <= (w_i + w_j)/2 - overlap_x < max(w)*(1 - t) <= Wmax*(1-t).
  Centers sit inside their cells, so the column distance obeys
  |col_i - col_j| < Wmax*(1-t)*Sx + 1.  Hence a window radius
    rx >= Wmax * (1 - t) * Sx        (same for ry with Hmax, Sy)
  sees EVERY suppressing pair, and the windowed fixed point equals global
  greedy NMS exactly - including the (score desc, original-cell-index asc)
  tie order of ops/nms.py, which maps to a compile-time direction constant
  per offset (a +offset neighbor always has the larger cell index).

  Conversely a given radius certifies boxes up to Wmax = rx / ((1-t)*Sx),
  Hmax = ry / ((1-t)*Sy).  At the defaults (rx=ry=4, t=0.5, 97x129 grid)
  that is 64x64 px on a 772x1032 image - ~1.5x the production anchor box.
  `windowed_count` returns an `exceeded` flag = any passing box beyond
  (Wmax, Hmax); a production caller would rerun flagged batches through
  the exact global path (ops/postprocess.py) so end-to-end semantics stay
  exact for arbitrary inputs. No caller is wired today - the module is
  off the hot path (slower than top-K+NMS on this harness, see STATUS);
  only tests/test_window_nms.py and tools/perf_window_nms.py use it.
"""

from __future__ import annotations

from functools import partial
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp

Array = jax.Array

# matches ops/nms.py: extents clipped so f32 area/inter products can't
# overflow to inf on diverged checkpoints (1e19^2 < f32 max)
_EXT_LIM = 1e19

DEFAULT_RADIUS = 4


def premise_extents(
    ry: int, rx: int, sy: int, sx: int, iou_thresh: float
) -> Tuple[float, float]:
    """Largest (Hmax, Wmax) normalized box extents for which a (ry, rx)
    window provably sees every pair with IoU > iou_thresh."""
    return ry / ((1.0 - iou_thresh) * sy), rx / ((1.0 - iou_thresh) * sx)


def _shift(a: Array, dy: int, dx: int, fill) -> Array:
    """out[..., y, x] = a[..., y+dy, x+dx], `fill` outside the grid."""
    sy, sx = a.shape[-2], a.shape[-1]
    pad = [(0, 0)] * (a.ndim - 2) + [
        (max(0, -dy), max(0, dy)),
        (max(0, -dx), max(0, dx)),
    ]
    ap = jnp.pad(a, pad, constant_values=fill)
    ys, xs = max(0, dy), max(0, dx)
    return ap[..., ys : ys + sy, xs : xs + sx]


def _half_offsets(ry: int, rx: int) -> List[Tuple[int, int]]:
    """Offsets with positive row-major direction: the (dy, dx) neighbor of
    any cell has a strictly larger original cell index. Each unordered cell
    pair within the full (2ry+1, 2rx+1) window appears exactly once."""
    return [
        (dy, dx)
        for dy in range(0, ry + 1)
        for dx in range(-rx, rx + 1)
        if not (dy == 0 and dx <= 0)
    ]


@partial(
    jax.jit,
    static_argnames=(
        "obj_thresh",
        "iou_thresh",
        "min_class_confidence_threshold",
        "ry",
        "rx",
    ),
)
def windowed_count(
    preds: Array,
    obj_thresh: float = 0.5,
    iou_thresh: float = 0.5,
    min_class_confidence_threshold: float = 0.0,
    ry: int = DEFAULT_RADIUS,
    rx: int = DEFAULT_RADIUS,
    image_mask: Optional[Array] = None,
) -> Dict[str, Array]:
    """Selection-free fused count: (B, 5+C, Sy, Sx) -> per-class survivor
    histogram, exact greedy-NMS semantics whenever `exceeded` is False.

    Returns {"counts": (C,) int32, "exceeded": () bool, "keep": (B, Sy, Sx)}.
    `exceeded` True means some passing box was larger than the window's
    certified (Hmax, Wmax) - the result MAY then differ from global NMS and
    the caller should rerun the batch through the exact path.
    """
    b, d, sy, sx = preds.shape
    f = preds.astype(jnp.float32)
    cx, cy, w, h = f[:, 0], f[:, 1], f[:, 2], f[:, 3]
    obj = f[:, 4]
    class_probs = f[:, 5:]  # (B, C, Sy, Sx)

    passing = obj > obj_thresh
    if image_mask is not None:
        passing = passing & image_mask.astype(bool)[:, None, None]

    x1, y1 = cx - w / 2, cy - h / 2
    x2, y2 = cx + w / 2, cy + h / 2
    ew = jnp.clip(x2 - x1, 0, _EXT_LIM)
    eh = jnp.clip(y2 - y1, 0, _EXT_LIM)
    area = ew * eh
    # score and NaN ordering exactly as ops/nms.py:nms_fixed
    score = class_probs.max(axis=1) * obj
    score = jnp.where(jnp.isnan(score), -jnp.inf, score)

    hmax, wmax = premise_extents(ry, rx, sy, sx, iou_thresh)
    exceeded = jnp.any(passing & ((ew > wmax) | (eh > hmax)))

    if iou_thresh > 0:
        offsets = _half_offsets(ry, rx)
        incoming = []  # [p]: neighbor at +offset suppresses this cell
        outgoing = []  # [p]: this cell suppresses neighbor at +offset
        for dy, dx in offsets:
            nx1 = _shift(x1, dy, dx, 0.0)
            ny1 = _shift(y1, dy, dx, 0.0)
            nx2 = _shift(x2, dy, dx, 0.0)
            ny2 = _shift(y2, dy, dx, 0.0)
            narea = _shift(area, dy, dx, 0.0)
            npass = _shift(passing, dy, dx, False)
            nscore = _shift(score, dy, dx, -jnp.inf)
            iw = jnp.clip(jnp.minimum(x2, nx2) - jnp.maximum(x1, nx1), 0, _EXT_LIM)
            ih = jnp.clip(jnp.minimum(y2, ny2) - jnp.maximum(y1, ny1), 0, _EXT_LIM)
            inter = iw * ih
            iou = inter / (area + narea - inter)
            ov = (iou > iou_thresh) & passing & npass
            n_first = nscore > score  # ties: lower cell index = this cell
            incoming.append(ov & n_first)
            outgoing.append(ov & ~n_first)
        inc = jnp.stack(incoming)  # (P, B, Sy, Sx)
        out = jnp.stack(outgoing)

        def suppressed_by_kept(keep: Array) -> Array:
            supp = jnp.zeros_like(keep)
            for p, (dy, dx) in enumerate(offsets):
                supp = supp | (inc[p] & _shift(keep, dy, dx, False))
                supp = supp | _shift(out[p] & keep, -dy, -dx, False)
            return supp

        # same fixed-point recurrence as ops/nms.py:_greedy_keep_from_
        # suppression: keep <- passing & no kept neighbor suppresses me;
        # unique fixed point = sequential greedy NMS
        def cond(state):
            keep, prev, it = state
            return jnp.logical_and(jnp.any(keep != prev), it < sy * sx)

        def body(state):
            keep, _, it = state
            return passing & ~suppressed_by_kept(keep), keep, it + 1

        first = passing & ~suppressed_by_kept(passing)
        keep, _, _ = jax.lax.while_loop(
            cond, body, (first, passing, jnp.int32(0))
        )
    else:
        keep = passing

    if min_class_confidence_threshold > 0:
        keep = keep & (class_probs.max(axis=1) > min_class_confidence_threshold)

    cls = jnp.argmax(class_probs, axis=1)  # (B, Sy, Sx)
    onehot = jax.nn.one_hot(cls, d - 5, dtype=jnp.int32, axis=-1)
    counts = jnp.sum(onehot * keep[..., None].astype(jnp.int32), axis=(0, 1, 2))
    return {"counts": counts, "exceeded": exceeded, "keep": keep}
