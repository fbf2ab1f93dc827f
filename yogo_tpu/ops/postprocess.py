"""Prediction formatting / postprocessing.

Two complementary paths replacing the reference's per-image host loops
(reference: yogo/utils/prediction_formatting.py:23-156, yogo/infer.py:39-124):

  * host path (`format_preds`): exact reference semantics with dynamic
    shapes, used for small-scale eval, drawing, and txt/npy export parity.
  * device path (`format_preds_batched`, `count_class_predictions`): fully
    jitted, fixed-capacity (padded top-K) versions of filter->NMS->count that
    run batched on TPU with no host sync - the infer hot loop.

Thresholds follow the reference exactly: objectness strictly > obj_thresh,
NMS at iou_thresh with score = max(class_probs) * objectness (0 disables),
then max(class_probs) strictly > min_class_confidence_threshold (0 disables).
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import Dict, List, Literal, Optional

import jax
import jax.numpy as jnp
import numpy as np

from yogo_tpu.ops.grid import WH_CLAMP, cell_offsets
from yogo_tpu.ops.nms import batched_nms, nms_numpy

Array = jax.Array

BoxFormat = Literal["xyxy", "cxcywh"]
VALID_BOX_FORMATS = ("xyxy", "cxcywh")

# default fixed capacity for the device path; ~6x the realistic max object
# count per 772x1032 brightfield image, far above obj>0.5 survivors in practice
DEFAULT_MAX_DETECTIONS = 1024

# capacity used by the fused `yogo infer --count` hot path (and bench.py's
# e2e metric, which must measure the same program): ~1.5x the realistic max
# object density (~170/image; a trained model passes ~1.5x its object count
# at obj>0.5 - measured capacity note in docs/perf-notes.md round 3). K
# drives both the top-K sort cost and the (B, K, K) NMS matrices, so the
# eval path keeps the roomier DEFAULT_MAX_DETECTIONS while the
# throughput-critical count path uses this
INFER_COUNT_MAX_DETECTIONS = 256


# NOTE (round-3 negative result, docs/perf-notes.md): an exact group-max
# pruned two-stage top-k (sort N/8 group maxes, gather the top groups'
# members, top-k the candidates) is provably equivalent but measured
# 2.3-12x SLOWER than lax.top_k on v5e - the scattered candidate gather
# costs ~8 ns/element, dwarfing the sort it saves. TPU postprocess is
# gather-bound, not sort-bound; don't re-attempt XLA-level top-k pruning.


def _cxcywh_to_xyxy_np(b: np.ndarray) -> np.ndarray:
    out = np.empty_like(b)
    out[:, 0] = b[:, 0] - b[:, 2] / 2
    out[:, 1] = b[:, 1] - b[:, 3] / 2
    out[:, 2] = b[:, 0] + b[:, 2] / 2
    out[:, 3] = b[:, 1] + b[:, 3] / 2
    return out


def format_preds(
    pred: np.ndarray,
    obj_thresh: float = 0.5,
    iou_thresh: float = 0.5,
    box_format: BoxFormat = "cxcywh",
    min_class_confidence_threshold: float = 0.0,
) -> np.ndarray:
    """Host-side exact formatter: (5+C, Sy, Sx) -> (N, 5+C).

    Reference-equivalent pipeline (reference:
    yogo/utils/prediction_formatting.py:23-93): objectness filter, optional
    box conversion, NMS on xyxy boxes with score max(class)*objectness,
    class-confidence filter. Returns boxes in `box_format`.
    """
    pred = np.asarray(pred)
    if pred.ndim != 3:
        raise ValueError(
            "argument to format_preds should be unbatched - expected shape "
            f"(pred_dim, Sy, Sx), got {pred.shape}"
        )
    if box_format not in VALID_BOX_FORMATS:
        raise ValueError(
            f"invalid box format {box_format}; valid formats: {VALID_BOX_FORMATS}"
        )

    pred_dim = pred.shape[0]
    flat = pred.reshape(pred_dim, -1).T  # (Sy*Sx, pred_dim)

    keep = flat[:, 4] > obj_thresh
    preds = flat[keep].astype(np.float32, copy=True)

    if box_format == "xyxy":
        preds[:, :4] = _cxcywh_to_xyxy_np(preds[:, :4])
        nms_boxes = preds[:, :4]
    else:
        nms_boxes = _cxcywh_to_xyxy_np(preds[:, :4])

    if iou_thresh > 0 and len(preds):
        scores = preds[:, 5:].max(axis=1) * preds[:, 4]
        keep_idx = nms_numpy(nms_boxes, scores, iou_thresh)
        preds = preds[keep_idx]

    if min_class_confidence_threshold > 0 and len(preds):
        preds = preds[preds[:, 5:].max(axis=1) > min_class_confidence_threshold]

    return preds


@partial(
    jax.jit,
    static_argnames=(
        "obj_thresh",
        "iou_thresh",
        "min_class_confidence_threshold",
        "max_detections",
    ),
)
def format_preds_batched(
    preds: Array,
    obj_thresh: float = 0.5,
    iou_thresh: float = 0.5,
    min_class_confidence_threshold: float = 0.0,
    max_detections: int = DEFAULT_MAX_DETECTIONS,
    image_mask: Optional[Array] = None,
) -> Dict[str, Array]:
    """Device-side batched formatter: (B, 5+C, Sy, Sx) -> padded detections.

    image_mask: optional (B,) bool marking real (non-padding) images, so a
    ragged final batch can stay at the compiled batch shape instead of being
    sliced (slicing changes the shape and costs a recompile per tail size).

    Returns dict of fixed-shape arrays:
        boxes_cxcywh (B, K, 4), boxes_xyxy (B, K, 4), objectness (B, K),
        class_probs (B, K, C), valid (B, K) bool, in descending-objectness
        order per image.

    Capacity note: K = min(max_detections, cells). If more than K cells pass
    the objectness threshold the lowest-objectness survivors are dropped (the
    reference keeps all; with obj_thresh 0.5 real images yield far fewer).
    """
    b, pred_dim, sy, sx = preds.shape
    cells = sy * sx
    # max_detections=0 is accepted (uint flag contract) and means "keep
    # nothing": compute at capacity 1 and mask everything out, since the
    # selection op requires k >= 1
    k = max(1, min(max_detections, cells))
    flat = preds.reshape(b, pred_dim, cells).transpose(0, 2, 1)  # (B, cells, D)

    obj = flat[..., 4]
    passing = obj > obj_thresh
    if image_mask is not None:
        passing = passing & image_mask.astype(bool)[:, None]
    # top-K by objectness, masked entries sink to the bottom.
    # approx_max_k(recall_target=1.0) is EXACT here - the XLA bin-count
    # formula returns reduction_output_size == the full input at
    # (N=12513, k<=1024, recall 1.0), i.e. the PartialReduce pass is an
    # identity and aggregate_to_topk runs a true top-k - while its sorting
    # machinery (arXiv:2206.14286) measures 1.9x faster than lax.top_k on
    # v5e (3.11 vs 5.77 ms at (512, 12513) k=256; docs/perf-notes.md).
    # Only tie ORDER among equal keys may differ from lax.top_k.
    sort_key = jnp.where(passing, obj, -1.0)
    top_val, top_idx = jax.lax.approx_max_k(sort_key, k, recall_target=1.0)
    valid = top_val > 0  # -1 markers are invalid; obj itself is > 0 by sigmoid
    valid = valid & (top_val > obj_thresh)
    if max_detections == 0:
        valid = jnp.zeros_like(valid)

    sel = jnp.take_along_axis(flat, top_idx[..., None], axis=1)  # (B, K, D)
    boxes_cxcywh = sel[..., :4]
    cx, cy, w, h = (boxes_cxcywh[..., i] for i in range(4))
    boxes_xyxy = jnp.stack(
        [cx - w / 2, cy - h / 2, cx + w / 2, cy + h / 2], axis=-1
    )
    objectness = sel[..., 4]
    class_probs = sel[..., 5:]

    if iou_thresh > 0:
        scores = class_probs.max(axis=-1) * objectness
        # tie-break equal scores by ORIGINAL cell index, like the host
        # path's stable sort over cell-ordered preds - this makes the
        # result independent of the order approx_max_k returns ties in
        keep = batched_nms(
            boxes_xyxy, scores, valid, iou_thresh, tiebreak=top_idx
        )
        valid = valid & keep

    if min_class_confidence_threshold > 0:
        valid = valid & (
            class_probs.max(axis=-1) > min_class_confidence_threshold
        )

    return {
        "boxes_cxcywh": boxes_cxcywh,
        "boxes_xyxy": boxes_xyxy,
        "objectness": objectness,
        "class_probs": class_probs,
        "valid": valid,
    }


@partial(
    jax.jit,
    static_argnames=(
        "anchor_w",
        "anchor_h",
        "width_multiplier",
        "height_multiplier",
        "obj_thresh",
        "iou_thresh",
        "min_class_confidence_threshold",
        "max_detections",
    ),
)
def format_preds_batched_raw(
    raw: Array,
    anchor_w: float,
    anchor_h: float,
    width_multiplier: float = 1.0,
    height_multiplier: float = 1.0,
    obj_thresh: float = 0.5,
    iou_thresh: float = 0.5,
    min_class_confidence_threshold: float = 0.0,
    max_detections: int = DEFAULT_MAX_DETECTIONS,
    image_mask: Optional[Array] = None,
) -> Dict[str, Array]:
    """Selection-first batched formatter over the UNDECODED head output:
    (B, Sy, Sx, 5+C) NHWC raw (model.apply(..., decode=False)) -> the same
    padded-detections dict as `format_preds_batched`.

    Identical results, restructured for TPU: the decoded path materializes
    sigmoid/exp/concat over every grid cell and then gathers f32 payload
    rows (per-op device profile: 2.7 ms concat + 2.3 ms decode divs +
    2.7 ms f32 gather per 512-image batch at 772x1032); here selection
    runs directly on the objectness plane, the gather moves half the
    bytes (compute-dtype raw rows), and the YOLO9000 decode
    (reference: yogo/model.py:277-313) runs on K survivors only.

    Exactness vs the decoded path: decode_predictions upcasts the same
    compute-dtype raw values to f32 before sigmoid/exp, so survivor-decode
    here is the same f32 math on the same inputs; selection keys
    (sigmoid of the f32-upcast objectness) are identical too. Cell
    offsets are computed as i/Sx on device, which XLA rewrites to
    reciprocal-multiply (--xla_allow_excess_precision): box centers can
    differ from the decoded path's table constants by 1 ulp (~6e-8).
    That cannot move an integer count or a validity decision except on
    exact floating-point ties, and is invisible at every test tolerance
    (tests/test_postprocess.py pins full-pipeline equality at 2e-6) -
    while gathering the constant tables instead measurably costs ~1.8
    ms/batch-512 on v5e (the gather-bound postprocess story again).
    The candidate-fetch paths (select_top_candidates_raw), whose rows
    feed BIT-compared host artifacts, do pay for the table gather.
    """
    b, sy, sx, pred_dim = raw.shape
    cells = sy * sx
    k = max(1, min(max_detections, cells))
    flat = raw.reshape(b, cells, pred_dim)

    obj = jax.nn.sigmoid(flat[..., 4].astype(jnp.float32))
    passing = obj > obj_thresh
    if image_mask is not None:
        passing = passing & image_mask.astype(bool)[:, None]
    sort_key = jnp.where(passing, obj, -1.0)
    # approx_max_k(recall_target=1.0) is EXACT here (see
    # format_preds_batched's note); ties are re-ordered but re-broken by
    # original cell index in the NMS below
    top_val, top_idx = jax.lax.approx_max_k(sort_key, k, recall_target=1.0)
    valid = (top_val > 0) & (top_val > obj_thresh)
    if max_detections == 0:
        valid = jnp.zeros_like(valid)

    sel = jnp.take_along_axis(flat, top_idx[..., None], axis=1)
    sel = sel.astype(jnp.float32)  # (B, K, D) - decode math is f32

    # YOLO9000 survivor decode; arithmetic offsets (1-ulp caveat above)
    cxs = (top_idx % sx).astype(jnp.float32) / sx
    cys = (top_idx // sx).astype(jnp.float32) / sy
    cx = jax.nn.sigmoid(sel[..., 0]) * (1.0 / sx) + cxs
    cy = jax.nn.sigmoid(sel[..., 1]) * (1.0 / sy) + cys
    w = anchor_w * jnp.exp(jnp.minimum(sel[..., 2], WH_CLAMP)) * width_multiplier
    h = anchor_h * jnp.exp(jnp.minimum(sel[..., 3], WH_CLAMP)) * height_multiplier
    objectness = jax.nn.sigmoid(sel[..., 4])
    class_probs = jax.nn.softmax(sel[..., 5:], axis=-1)

    boxes_cxcywh = jnp.stack([cx, cy, w, h], axis=-1)
    boxes_xyxy = jnp.stack(
        [cx - w / 2, cy - h / 2, cx + w / 2, cy + h / 2], axis=-1
    )

    if iou_thresh > 0:
        scores = class_probs.max(axis=-1) * objectness
        keep = batched_nms(
            boxes_xyxy, scores, valid, iou_thresh, tiebreak=top_idx
        )
        valid = valid & keep

    if min_class_confidence_threshold > 0:
        valid = valid & (
            class_probs.max(axis=-1) > min_class_confidence_threshold
        )

    return {
        "boxes_cxcywh": boxes_cxcywh,
        "boxes_xyxy": boxes_xyxy,
        "objectness": objectness,
        "class_probs": class_probs,
        "valid": valid,
    }


@partial(
    jax.jit,
    static_argnames=(
        "anchor_w",
        "anchor_h",
        "width_multiplier",
        "height_multiplier",
        "obj_thresh",
        "iou_thresh",
        "min_class_confidence_threshold",
        "max_detections",
    ),
)
def count_class_predictions_raw(
    raw: Array,
    anchor_w: float,
    anchor_h: float,
    width_multiplier: float = 1.0,
    height_multiplier: float = 1.0,
    obj_thresh: float = 0.5,
    iou_thresh: float = 0.5,
    min_class_confidence_threshold: float = 0.0,
    max_detections: int = DEFAULT_MAX_DETECTIONS,
    image_mask: Optional[Array] = None,
) -> Array:
    """`count_class_predictions` over the undecoded NHWC head output -
    the `yogo infer --count` hot path (selection-first; see
    format_preds_batched_raw). (B, Sy, Sx, 5+C) -> (C,) int32 counts,
    identical to the decoded path's counts."""
    f = format_preds_batched_raw(
        raw,
        anchor_w,
        anchor_h,
        width_multiplier=width_multiplier,
        height_multiplier=height_multiplier,
        obj_thresh=obj_thresh,
        iou_thresh=iou_thresh,
        min_class_confidence_threshold=min_class_confidence_threshold,
        max_detections=max_detections,
        image_mask=image_mask,
    )
    num_classes = f["class_probs"].shape[-1]
    cls = jnp.argmax(f["class_probs"], axis=-1)  # (B, K)
    onehot = jax.nn.one_hot(cls, num_classes, dtype=jnp.int32)
    return jnp.sum(onehot * f["valid"][..., None].astype(jnp.int32), axis=(0, 1))


@partial(
    jax.jit,
    static_argnames=(
        "obj_thresh",
        "iou_thresh",
        "min_class_confidence_threshold",
        "max_detections",
    ),
)
def count_class_predictions(
    preds: Array,
    obj_thresh: float = 0.5,
    iou_thresh: float = 0.5,
    min_class_confidence_threshold: float = 0.0,
    max_detections: int = DEFAULT_MAX_DETECTIONS,
    image_mask: Optional[Array] = None,
) -> Array:
    """Fused on-device class counting (replaces the reference's per-image host
    loop, reference: yogo/infer.py:60-124): filter -> NMS -> argmax ->
    per-class histogram. (B, 5+C, Sy, Sx) -> (C,) int32 counts.
    `image_mask` excludes padding images without changing the batch shape.

    (A round-3 'lean' variant with per-channel gathers and bf16 sort keys
    was measured 1.8x SLOWER than this formatter path at bs=512 on v5e -
    TPU take_along_axis strongly prefers one big payload gather, and top_k
    upcasts bf16 keys anyway; see docs/perf-notes.md.)
    """
    f = format_preds_batched(
        preds,
        obj_thresh=obj_thresh,
        iou_thresh=iou_thresh,
        min_class_confidence_threshold=min_class_confidence_threshold,
        max_detections=max_detections,
        image_mask=image_mask,
    )
    num_classes = f["class_probs"].shape[-1]
    cls = jnp.argmax(f["class_probs"], axis=-1)  # (B, K)
    onehot = jax.nn.one_hot(cls, num_classes, dtype=jnp.int32)
    return jnp.sum(onehot * f["valid"][..., None].astype(jnp.int32), axis=(0, 1))


def select_top_candidates(out: Array, k: int):
    """Device-side candidate selection for host-formatting consumers
    (serve responses, `yogo infer --save-npy/--save-preds/--draw-boxes`):
    (B, 5+C, Sy, Sx) decoded predictions -> top-k cells by objectness as
    (rows (B, K, 5+C) f32, flat cell indices (B, K)).

    Fetching these instead of the full tensor cuts D2H ~25x (~25 KB vs
    ~600 KB per 772x1032 image at K=512) while staying PROVABLY exact:
    cells outside the top-K have objectness <= the K-th candidate's value
    (`rows[:, -1, 4]`), so whenever that value <= the consumer's
    obj_thresh the candidate set contains every passing cell.
    approx_max_k(recall_target=1.0) is EXACT (identity partial reduce,
    true top-k aggregation) and measured 1.9x faster than lax.top_k on
    v5e (docs/perf-notes.md round 3). Tie ORDER may differ from
    lax.top_k, but the K-th VALUE (the completeness proof) and the
    selected SET don't, and scatter_candidates restores original cell
    order, preserving NMS tie-breaks."""
    flat = out.reshape(out.shape[0], out.shape[1], -1)  # (B, D, S)
    _, idx = jax.lax.approx_max_k(
        flat[:, 4, :].astype(jnp.float32), k, recall_target=1.0
    )
    rows = jnp.take_along_axis(flat, idx[:, None, :], axis=2)
    return rows.transpose(0, 2, 1), idx


@partial(
    jax.jit,
    static_argnames=(
        "k",
        "anchor_w",
        "anchor_h",
        "width_multiplier",
        "height_multiplier",
    ),
)
def select_top_candidates_raw(
    raw: Array,
    k: int,
    anchor_w: float,
    anchor_h: float,
    width_multiplier: float = 1.0,
    height_multiplier: float = 1.0,
):
    """`select_top_candidates` over the UNDECODED NHWC head output
    (model.apply(..., decode=False)): selection on the objectness plane,
    gather of compute-dtype raw rows (half the D2H-prep bytes of the f32
    decoded gather), then the YOLO9000 inference decode (sigmoid/exp +
    class softmax) on the K survivors only - the full-grid decode
    disappears from the serving program, and the retained full-tensor
    handle (serve's fallback source) is the bf16 raw, half the HBM of
    the decoded f32 (see format_preds_batched_raw for the exactness
    argument; same (rows, idx) contract and completeness proof via
    rows[:, -1, 4])."""
    b, sy, sx, pred_dim = raw.shape
    flat = raw.reshape(b, sy * sx, pred_dim)
    obj = jax.nn.sigmoid(flat[..., 4].astype(jnp.float32))
    _, idx = jax.lax.approx_max_k(obj, k, recall_target=1.0)
    sel = jnp.take_along_axis(flat, idx[..., None], axis=1).astype(jnp.float32)
    # offsets gathered from the shared constant tables (NOT i/Sx on
    # device - 1 ulp off, see format_preds_batched_raw)
    cxs_t, cys_t = cell_offsets(sx, sy)
    cxs = jnp.asarray(cxs_t.reshape(-1))[idx]
    cys = jnp.asarray(cys_t.reshape(-1))[idx]
    cx = jax.nn.sigmoid(sel[..., 0]) * (1.0 / sx) + cxs
    cy = jax.nn.sigmoid(sel[..., 1]) * (1.0 / sy) + cys
    w = anchor_w * jnp.exp(jnp.minimum(sel[..., 2], WH_CLAMP)) * width_multiplier
    h = anchor_h * jnp.exp(jnp.minimum(sel[..., 3], WH_CLAMP)) * height_multiplier
    o = jax.nn.sigmoid(sel[..., 4])
    probs = jax.nn.softmax(sel[..., 5:], axis=-1)
    rows = jnp.concatenate(
        [jnp.stack([cx, cy, w, h, o], axis=-1), probs], axis=-1
    )
    return rows, idx


@partial(
    jax.jit,
    static_argnames=(
        "anchor_w",
        "anchor_h",
        "width_multiplier",
        "height_multiplier",
    ),
)
def decode_raw_slice(
    raw: Array,
    slot: Array,
    anchor_w: float,
    anchor_h: float,
    width_multiplier: float = 1.0,
    height_multiplier: float = 1.0,
) -> Array:
    """One image's decoded (5+C, Sy, Sx) inference grid from the batched
    NHWC raw handle - the candidate paths' full-fetch FALLBACK (rare:
    only when a request's threshold undercuts the K-th candidate).
    `slot` is traced so one executable serves every batch index."""
    one = jax.lax.dynamic_index_in_dim(raw, slot, axis=0, keepdims=False)
    one = one.astype(jnp.float32)
    sy, sx, _ = one.shape
    cxs_t, cys_t = cell_offsets(sx, sy)
    cxs = jnp.asarray(cxs_t)
    cys = jnp.asarray(cys_t)
    cx = jax.nn.sigmoid(one[..., 0]) * (1.0 / sx) + cxs
    cy = jax.nn.sigmoid(one[..., 1]) * (1.0 / sy) + cys
    w = anchor_w * jnp.exp(jnp.minimum(one[..., 2], WH_CLAMP)) * width_multiplier
    h = anchor_h * jnp.exp(jnp.minimum(one[..., 3], WH_CLAMP)) * height_multiplier
    o = jax.nn.sigmoid(one[..., 4])
    probs = jax.nn.softmax(one[..., 5:], axis=-1)
    out = jnp.concatenate(
        [jnp.stack([cx, cy, w, h, o], axis=-1), probs], axis=-1
    )
    return jnp.transpose(out, (2, 0, 1))


def scatter_candidates(
    cand_rows: np.ndarray, cand_idx: np.ndarray, pred_dim: int,
    sy: int, sx: int,
) -> np.ndarray:
    """Top-K candidate rows + flat cell indices -> a (pred_dim, Sy, Sx)
    grid equivalent to the full tensor for any objectness threshold the
    candidate set is complete for: non-candidate cells become zero rows
    (objectness 0), which the host formatter filters exactly like the
    sub-threshold cells they stand in for, and candidates land at their
    original flat positions so cell-order-dependent NMS tie-breaks are
    preserved (exactness fuzz: tests/test_serve.py)."""
    flat = np.zeros((sy * sx, pred_dim), np.float32)
    flat[np.asarray(cand_idx)] = cand_rows
    return flat.T.reshape(pred_dim, sy, sx)


def count_cells_for_formatted_preds(
    formatted_class_predictions: np.ndarray,
    min_confidence_threshold: Optional[float] = None,
) -> np.ndarray:
    """Host per-class counter over (N, C) class-prob rows (reference:
    yogo/infer.py:90-124): argmax, filter max prob strictly > threshold,
    histogram."""
    p = np.asarray(formatted_class_predictions)
    if p.ndim != 2:
        raise ValueError(
            "expected formatted_class_predictions of shape (N, num_classes); "
            f"got {p.shape}"
        )
    if min_confidence_threshold is not None and not (
        0 <= min_confidence_threshold <= 1
    ):
        raise ValueError(
            "min_confidence_threshold should be between 0 and 1; "
            f"is {min_confidence_threshold}"
        )
    thresh = min_confidence_threshold or 0.0
    n_classes = p.shape[1]
    if len(p) == 0:
        return np.zeros(n_classes, np.int64)
    values = p.max(axis=1)
    indices = p.argmax(axis=1)
    kept = indices[values > thresh]
    return np.bincount(kept, minlength=n_classes).astype(np.int64)


@dataclass
class PredictionLabelMatch:
    """Matched detections vs labels for one or more images (reference:
    yogo/utils/prediction_formatting.py:165-251). Three cases:
      1. a one-to-one match between predictions and labels (`preds`/`labels`),
      2. predictions that are actually background (`extra_predictions`),
      3. labels that were missed (`missed_labels`).

    preds: (N, 5+C) formatted predictions [x1 y1 x2 y2 obj *class_probs];
    labels: (N, 6) label rows [mask x1 y1 x2 y2 class]; missed_labels (K, 6);
    extra_predictions (M, 5+C). The latter two are None when empty.
    """

    preds: np.ndarray
    labels: np.ndarray
    missed_labels: Optional[np.ndarray]
    extra_predictions: Optional[np.ndarray]

    @staticmethod
    def concat(
        preds_and_labels: List["PredictionLabelMatch"],
    ) -> "PredictionLabelMatch":
        missed = [
            p.missed_labels
            for p in preds_and_labels
            if p.missed_labels is not None
        ]
        extra = [
            p.extra_predictions
            for p in preds_and_labels
            if p.extra_predictions is not None
        ]
        return PredictionLabelMatch(
            preds=np.concatenate([p.preds for p in preds_and_labels], axis=0),
            labels=np.concatenate([p.labels for p in preds_and_labels], axis=0),
            missed_labels=np.concatenate(missed, axis=0) if missed else None,
            extra_predictions=np.concatenate(extra, axis=0) if extra else None,
        )

    def convert_background_errors(self, num_classes: int) -> "PredictionLabelMatch":
        """Fold missed/extra into a synthetic ``background`` class, assumed to
        be the LAST of `num_classes` (reference:
        yogo/utils/prediction_formatting.py:206-251). `num_classes` must count
        the background class, i.e. num_classes == C + 1 where C is the number
        of class-prob columns in `preds` (the reference's row shapes only
        agree under that contract).

          missed label  -> pred [box, obj 1, onehot(background)], label as-is
          extra pred    -> pred [row, 0 background prob], label [1, box, bg]

        Matched `preds` gain a zero background-probability column.
        """
        c = self.preds.shape[1] - 5
        if num_classes != c + 1:
            raise ValueError(
                f"num_classes ({num_classes}) must include the background "
                f"class: expected {c + 1} for predictions with {c} class "
                "probabilities"
            )
        bg = num_classes - 1
        new_preds, new_labels = [], []

        missed = self.missed_labels if self.missed_labels is not None else []
        extra = (
            self.extra_predictions if self.extra_predictions is not None else []
        )
        for ml in np.asarray(missed, np.float32).reshape(-1, 6):
            onehot = np.zeros(num_classes, np.float32)
            onehot[bg] = 1.0
            new_preds.append(np.concatenate([ml[1:5], [1.0], onehot]))
            new_labels.append(ml)
        for ep in np.asarray(extra, np.float32).reshape(-1, 5 + c):
            new_preds.append(np.concatenate([ep, [0.0]]))
            new_labels.append(
                np.concatenate([[1.0], ep[:4], [float(bg)]])
            )

        preds_bg = np.concatenate(
            [self.preds, np.zeros((len(self.preds), 1), self.preds.dtype)],
            axis=1,
        )
        if not new_preds:
            return PredictionLabelMatch(
                preds=preds_bg,
                labels=self.labels,
                missed_labels=None,
                extra_predictions=None,
            )
        return PredictionLabelMatch(
            preds=np.concatenate([preds_bg, np.stack(new_preds)], axis=0),
            labels=np.concatenate(
                [self.labels, np.stack(new_labels)], axis=0
            ),
            missed_labels=None,
            extra_predictions=None,
        )


def match_preds_and_labels(
    formatted_preds: np.ndarray, formatted_labels: np.ndarray
) -> PredictionLabelMatch:
    """Hungarian-match formatted predictions against formatted labels for one
    image (cost = 1 - pairwise IoU; reference:
    yogo/utils/prediction_formatting.py:297-330).

    formatted_preds: (M, 5+C) [x1 y1 x2 y2 obj *probs] (xyxy);
    formatted_labels: (N, 6) [mask x1 y1 x2 y2 class].
    """
    from yogo_tpu.metrics.matching import linear_sum_assignment

    formatted_preds = np.atleast_2d(np.asarray(formatted_preds, np.float32))
    formatted_labels = np.asarray(formatted_labels, np.float32).reshape(-1, 6)
    m, n = len(formatted_preds), len(formatted_labels)

    if m and n:
        iou = _pairwise_iou_xyxy(
            formatted_labels[:, 1:5], formatted_preds[:, :4]
        )
    else:
        iou = np.zeros((n, m), np.float32)
    rows, cols = linear_sum_assignment(1.0 - iou)

    matched_preds = formatted_preds[cols]
    matched_labels = formatted_labels[rows]
    extra_idx = np.setdiff1d(np.arange(m), cols, assume_unique=True)
    missed_idx = np.setdiff1d(np.arange(n), rows, assume_unique=True)
    extra = formatted_preds[extra_idx]
    missed = formatted_labels[missed_idx]
    return PredictionLabelMatch(
        preds=matched_preds,
        labels=matched_labels,
        missed_labels=missed if len(missed) else None,
        extra_predictions=extra if len(extra) else None,
    )


def format_preds_and_labels_v2(
    pred: np.ndarray,
    label: np.ndarray,
    objectness_thresh: float = 0.5,
    min_class_confidence_threshold: float = 0.0,
) -> PredictionLabelMatch:
    """Filter+format one image's raw prediction grid, then Hungarian-match it
    against the label grid (reference:
    yogo/utils/prediction_formatting.py:254-330).

    pred: (5+C, Sy, Sx) decoded predictions; label: (6, Sy, Sx) grid.
    """
    pred = np.squeeze(np.asarray(pred))
    label = np.squeeze(np.asarray(label))
    if pred.ndim != 3:
        raise ValueError(
            "argument to format_pred should be unbatched result - "
            f"shape should be (pred_shape, Sy, Sx), got {pred.shape}"
        )
    formatted_preds = format_preds(
        pred,
        obj_thresh=objectness_thresh,
        iou_thresh=0.5,
        box_format="xyxy",
        min_class_confidence_threshold=min_class_confidence_threshold,
    )
    label_shape = label.shape[0]
    flat = label.reshape(label_shape, -1).T
    formatted_labels = flat[flat[:, 0].astype(bool)]
    return match_preds_and_labels(formatted_preds, formatted_labels)


def format_preds_and_labels(
    pred: np.ndarray,
    label: np.ndarray,
    use_IoU: bool = True,
    objectness_thresh: float = 0.5,
    min_class_confidence_threshold: float = 0.0,
):
    """DEPRECATED: use format_preds_and_labels_v2. Reference-parity port of
    the old matching (reference: yogo/utils/prediction_formatting.py:333-424):
    per labeled cell, pick the argmax-IoU prediction among threshold
    survivors (with replacement - one prediction can serve many labels), or
    fall back to naive same-cell matching.

    Returns (preds (N, 5+C) xyxy, labels (N, 6))."""
    import warnings

    warnings.warn("use format_preds_and_labels_v2 instead", DeprecationWarning)
    pred = np.squeeze(np.asarray(pred, np.float32))
    label = np.squeeze(np.asarray(label, np.float32))
    if pred.ndim != 3:
        raise ValueError(
            "argument to format_pred should be unbatched result - "
            f"shape should be (pred_shape, Sy, Sx), got {pred.shape}"
        )
    if not 0 <= objectness_thresh < 1:
        raise ValueError(
            "must have 0 <= objectness_thresh < 1; got "
            f"objectness_thresh={objectness_thresh}"
        )
    flat_preds = pred.reshape(pred.shape[0], -1).T.copy()
    flat_labels = label.reshape(label.shape[0], -1).T
    pred_mask = (flat_preds[:, 4] > objectness_thresh) & (
        flat_preds[:, 5:].max(axis=1) > min_class_confidence_threshold
    )
    labels_mask = flat_labels[:, 0].astype(bool)
    labels_with_objects = flat_labels[labels_mask]

    if use_IoU and pred_mask.sum() >= len(labels_with_objects):
        preds_with_objects = flat_preds[pred_mask].copy()
        preds_with_objects[:, :4] = _cxcywh_to_xyxy_np(
            preds_with_objects[:, :4]
        )
        iou = _pairwise_iou_xyxy(
            labels_with_objects[:, 1:5], preds_with_objects[:, :4]
        )
        if iou.shape[1] > 0:
            idx = iou.argmax(axis=1)
        else:
            idx = np.empty(0, np.int64)
        final_preds = preds_with_objects[idx]
    else:
        final_preds = flat_preds[labels_mask].copy()
        final_preds[:, :4] = _cxcywh_to_xyxy_np(final_preds[:, :4])
    return final_preds, labels_with_objects


def _pairwise_iou_xyxy(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    # f64: diverged checkpoints emit exp-huge extents whose f32 area
    # products overflow to inf -> NaN IoUs -> NaN Hungarian costs (same
    # rationale as nms_numpy and the device NMS extent clip)
    a = np.asarray(a, np.float64)
    b = np.asarray(b, np.float64)
    area_a = (a[:, 2] - a[:, 0]) * (a[:, 3] - a[:, 1])
    area_b = (b[:, 2] - b[:, 0]) * (b[:, 3] - b[:, 1])
    lt = np.maximum(a[:, None, :2], b[None, :, :2])
    rb = np.minimum(a[:, None, 2:], b[None, :, 2:])
    wh = np.clip(rb - lt, 0, None)
    inter = wh[..., 0] * wh[..., 1]
    union = area_a[:, None] + area_b[None, :] - inter
    with np.errstate(invalid="ignore", divide="ignore"):
        return np.where(union > 0, inter / union, 0.0)


def elementwise_iou_xyxy(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Row-for-row IoU of already-matched box pairs: (K,4),(K,4) -> (K,).
    O(K), unlike taking the diagonal of the full pairwise matrix.
    f64 for the same overflow reason as _pairwise_iou_xyxy."""
    a = np.asarray(a, np.float64)
    b = np.asarray(b, np.float64)
    lt = np.maximum(a[:, :2], b[:, :2])
    rb = np.minimum(a[:, 2:], b[:, 2:])
    wh = np.clip(rb - lt, 0, None)
    inter = wh[:, 0] * wh[:, 1]
    area_a = (a[:, 2] - a[:, 0]) * (a[:, 3] - a[:, 1])
    area_b = (b[:, 2] - b[:, 0]) * (b[:, 3] - b[:, 1])
    union = area_a + area_b - inter
    with np.errstate(invalid="ignore", divide="ignore"):
        return np.where(union > 0, inter / union, 0.0)


def format_to_numpy(
    img_id: int,
    prediction_tensor: np.ndarray,
    img_h: int,
    img_w: int,
    np_dtype=np.float32,
) -> np.ndarray:
    """Scope .npy export schema (reference:
    yogo/utils/prediction_formatting.py:96-156): (8+C, N) rows =
    [img_id, tlx*w, tly*h, brx*w, bry*h, objectness, argmax label,
    peak prob, *class probs]."""
    filtered = format_preds(prediction_tensor, box_format="xyxy").T  # (5+C, N)
    n = filtered.shape[1]

    img_ids = np.full(n, img_id, dtype=np_dtype)
    tlx = filtered[0] * img_w
    tly = filtered[1] * img_h
    brx = filtered[2] * img_w
    bry = filtered[3] * img_h
    objectness = filtered[4].astype(np_dtype)
    all_confs = filtered[5:].astype(np_dtype)
    pred_labels = np.argmax(all_confs, axis=0).astype(np.uint8)
    pred_probs = all_confs[pred_labels, np.arange(n)]

    return np.vstack(
        (
            img_ids,
            tlx.astype(np_dtype),
            tly.astype(np_dtype),
            brx.astype(np_dtype),
            bry.astype(np_dtype),
            objectness,
            pred_labels.astype(np_dtype),
            pred_probs.astype(np_dtype),
            all_confs,
        )
    )
