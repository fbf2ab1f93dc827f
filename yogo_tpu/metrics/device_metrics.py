"""Device-accumulated evaluation metrics (fast eval path).

The host `Metrics` engine (metrics.py) formats predictions on device but
matches and accumulates per image in numpy - measured at 2.4-2.9 s/batch-64
on worst-case dense predictions (docs/perf-notes.md "Eval-path throughput"),
the same host wall the reference has (its per-image format_preds + scipy
loop, reference: yogo/metrics.py:112-157). This module keeps the WHOLE
per-batch update on device as one jitted program - formatting, matching, and
every accumulator - so eval throughput tracks the forward pass and the only
host transfer is the O(100 KB) state fetch at compute().

TPU-native design:
  - detections: the shared fixed-capacity batched formatter (top-K by
    objectness + NMS, ops/postprocess.py),
  - labels: fixed-capacity top-K extraction of grid cells with mask == 1,
  - matching: greedy global-max IoU assignment (lax.while_loop of masked
    argmaxes), then arbitrary-but-deterministic pairing of the zero-IoU
    remainder so the matched cardinality is min(M, N) exactly like the
    host's Hungarian assignment (scipy semantics). Greedy differs from
    Hungarian only when overlapping detections compete for overlapping
    labels (see tests/test_device_metrics.py for a constructed divergence);
    for NMS-filtered detections of a trained model the IoU matrix is a
    near-partial-permutation and the two agree,
  - confusion / ROC / ECE / missed / extra: exact integer scatter-adds.
    ROC state is a per-class histogram over "number of thresholds <= p"
    (searchsorted on the ascending threshold grid), from which the host
    compute() rebuilds the same tp/fp/fn/tn the host engine counts,
  - mAP: per-(class, IoU-threshold) TP/FP histograms over score bins
    (`map_score_bins`, default 4096) - torchmetrics' binned mode. compute()
    walks bins in descending score, which equals the host's per-detection
    sort when scores fall in distinct bins; ties inside one bin aggregate
    jointly (a documented, bounded divergence: score quantization is
    1/4096).

The compute() output is the same 10-tuple as Metrics.compute().
"""

from __future__ import annotations

import warnings
from functools import partial
from typing import Dict, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from yogo_tpu.metrics.mean_ap import IOU_THRESHOLDS, MeanAveragePrecision
from yogo_tpu.metrics.metrics import (
    NUM_ECE_BINS,
    NUM_ROC_THRESHOLDS,
    finish_metrics,
)
from yogo_tpu.ops.boxes import box_iou
from yogo_tpu.ops.postprocess import format_preds_batched

Array = jax.Array

DEFAULT_MAP_SCORE_BINS = 4096
# matching IoU is computed in f32 on device; clip coordinates so the area
# products of insane (untrained-net) boxes can't overflow to inf/nan. Sane
# normalized boxes are untouched.
_COORD_CLIP = 1e3


# --------------------------------------------------------------- matching
def _greedy_match_one(
    iou: Array, det_valid: Array, gt_valid: Array
) -> Tuple[Array, Array]:
    """Greedy max-IoU assignment for one image.

    iou: (K, G) pairwise IoU; det_valid (K,), gt_valid (G,) bools.
    Returns (partner (K,) int32 with -1 = unmatched, gt_matched (G,) bool).
    Cardinality is min(#valid dets, #valid gts): positive-IoU pairs are
    taken greedily (global max first, first-index tiebreak), then the
    zero-IoU remainder is paired in index order, mirroring scipy's
    rectangular linear_sum_assignment which always returns min(M, N) pairs
    (the zero-IoU pairing is arbitrary there too - any completion has equal
    cost).
    """
    k, g = iou.shape
    iou_w = jnp.where(det_valid[:, None] & gt_valid[None, :], iou, 0.0)
    partner0 = jnp.full((k,), -1, jnp.int32)
    taken0 = jnp.zeros((g,), bool)
    max_iters = min(k, g)

    def cond(carry):
        iou_w, _, _, i = carry
        return (i < max_iters) & (iou_w.max() > 0.0)

    def body(carry):
        iou_w, partner, taken, i = carry
        flat = jnp.argmax(iou_w)  # first occurrence on ties: deterministic
        r = flat // g
        c = flat % g
        partner = partner.at[r].set(c.astype(jnp.int32))
        taken = taken.at[c].set(True)
        iou_w = iou_w.at[r, :].set(-1.0)
        iou_w = iou_w.at[:, c].set(-1.0)
        return iou_w, partner, taken, i + 1

    _, partner, taken, _ = jax.lax.while_loop(
        cond, body, (iou_w, partner0, taken0, jnp.int32(0))
    )

    # zero-IoU remainder: pair leftover dets/gts in index order
    left_det = det_valid & (partner < 0)
    left_gt = gt_valid & ~taken
    det_rank = jnp.cumsum(left_det.astype(jnp.int32)) - 1  # (K,)
    gt_rank = jnp.cumsum(left_gt.astype(jnp.int32)) - 1  # (G,)
    n_left_det = left_det.sum()
    n_left_gt = left_gt.sum()
    # leftover gts first (in index order), then the rest
    gt_order = jnp.argsort(
        jnp.where(left_gt, jnp.arange(g), g + jnp.arange(g))
    ).astype(jnp.int32)
    phase2 = jnp.where(
        left_det & (det_rank < n_left_gt),
        gt_order[jnp.clip(det_rank, 0, g - 1)],
        -1,
    )
    partner = jnp.where(partner >= 0, partner, phase2)
    gt_matched = taken | (left_gt & (gt_rank < n_left_det))
    return partner, gt_matched


# ----------------------------------------------------------------- update
def _update_batch(
    state: Dict[str, Array],
    preds: Array,  # (B, 5+C, Sy, Sx) decoded inference-mode predictions
    labels: Array,  # (B, 6, Sy, Sx)
    image_mask: Array,  # (B,) f32/bool: real (non-padding) images
    *,
    num_classes: int,
    include_background: bool,
    include_mAP: bool,
    obj_thresh: float,
    iou_thresh: float,
    min_class_confidence_threshold: float,
    max_detections: int,
    max_labels: int,
    map_score_bins: int,
) -> Dict[str, Array]:
    b, pred_dim, sy, sx = preds.shape
    cells = sy * sx
    nc = num_classes
    ncb = nc + 1 if include_background else nc
    k = max(1, min(max_detections, cells))
    g = max(1, min(max_labels, cells))
    real = image_mask.astype(bool)

    dets = format_preds_batched(
        preds,
        obj_thresh=obj_thresh,
        iou_thresh=iou_thresh,
        min_class_confidence_threshold=min_class_confidence_threshold,
        max_detections=max_detections,
        image_mask=image_mask,
    )
    det_boxes = dets["boxes_xyxy"].astype(jnp.float32)  # (B, K, 4)
    det_obj = dets["objectness"].astype(jnp.float32)  # (B, K)
    det_probs = dets["class_probs"].astype(jnp.float32)  # (B, K, C)
    det_valid = dets["valid"] & real[:, None]  # (B, K)

    # ---- fixed-capacity GT extraction: top-G cells by mask, index order
    flat = labels.reshape(b, 6, cells).transpose(0, 2, 1)  # (B, cells, 6)
    gmask = flat[..., 0] > 0.5
    # distinct keys: mask dominates, lower cell index wins among equals
    # (arange/cells steps ~8e-5 >> f32 eps at 2.0, so keys never collide)
    key = gmask.astype(jnp.float32) * 2.0 - jnp.arange(cells) / cells
    _, gt_idx = jax.lax.top_k(key, g)  # (B, G)
    gt_rows = jnp.take_along_axis(flat, gt_idx[..., None], axis=1)  # (B,G,6)
    gt_valid = (gt_rows[..., 0] > 0.5) & real[:, None]
    gt_boxes = gt_rows[..., 1:5].astype(jnp.float32)
    gt_cls = jnp.clip(gt_rows[..., 5].astype(jnp.int32), 0, nc - 1)
    n_true = gmask.sum(axis=1)
    gt_overflow = (real & (n_true > g)).sum()
    n_passing = ((preds[:, 4].reshape(b, cells) > obj_thresh).sum(axis=1))
    det_overflow = (real & (n_passing > k)).sum()

    # ---- pairwise IoU, f32, inf/nan-guarded for insane boxes
    db = jnp.clip(det_boxes, -_COORD_CLIP, _COORD_CLIP)
    gb = jnp.clip(gt_boxes, -_COORD_CLIP, _COORD_CLIP)
    iou = jax.vmap(box_iou)(db, gb)  # (B, K, G)
    iou = jnp.where(jnp.isfinite(iou), iou, 0.0)

    partner, gt_matched = jax.vmap(_greedy_match_one)(
        iou, det_valid, gt_valid
    )  # (B, K) int32, (B, G) bool
    matched = partner >= 0
    safe_partner = jnp.clip(partner, 0, g - 1)
    pair_iou = jnp.take_along_axis(iou, safe_partner[:, :, None], axis=2)[
        ..., 0
    ]  # (B, K)
    pair_gt_cls = jnp.take_along_axis(gt_cls, safe_partner, axis=1)  # (B, K)
    missed = gt_valid & ~gt_matched  # (B, G)

    bg = nc  # background index when included

    # ---- classification rows (reference conversion semantics:
    # yogo/utils/prediction_formatting.py:206-251):
    #   matched det:  probs = [class_probs, 0], target = gt class
    #   extra det:    probs = [class_probs, 0], target = background
    #   missed label: probs = onehot(background), target = gt class
    # with include_background=False only matched rows are accumulated.
    if include_background:
        det_rows_w = det_valid
        det_target = jnp.where(matched, pair_gt_cls, bg)
        det_rows_p = jnp.concatenate(
            [det_probs, jnp.zeros((b, k, 1), jnp.float32)], axis=-1
        )
        miss_rows_w = missed
        miss_target = gt_cls
        miss_rows_p = jnp.broadcast_to(
            jax.nn.one_hot(bg, ncb, dtype=jnp.float32), (b, g, ncb)
        )
        rows_p = jnp.concatenate(
            [det_rows_p.reshape(-1, ncb), miss_rows_p.reshape(-1, ncb)]
        )
        rows_t = jnp.concatenate(
            [det_target.reshape(-1), miss_target.reshape(-1)]
        )
        rows_w = jnp.concatenate(
            [det_rows_w.reshape(-1), miss_rows_w.reshape(-1)]
        ).astype(jnp.int32)
    else:
        rows_p = det_probs.reshape(-1, nc)
        rows_t = pair_gt_cls.reshape(-1)
        rows_w = (det_valid & matched).reshape(-1).astype(jnp.int32)

    pred_idx = jnp.argmax(rows_p, axis=-1)

    new = dict(state)
    new["confusion"] = state["confusion"].at[rows_t, pred_idx].add(rows_w)

    # ---- ROC histograms: cnt = #{thresholds <= p} per (row, class)
    thr = jnp.linspace(0.0, 1.0, NUM_ROC_THRESHOLDS, dtype=jnp.float32)
    cnt = jnp.searchsorted(thr, rows_p, side="right")  # (R, ncb)
    pos = jax.nn.one_hot(rows_t, ncb, dtype=jnp.int32) * rows_w[:, None]
    neg = (1 - jax.nn.one_hot(rows_t, ncb, dtype=jnp.int32)) * rows_w[:, None]
    cidx = jnp.broadcast_to(jnp.arange(ncb), cnt.shape)
    new["roc_pos"] = state["roc_pos"].at[
        cidx.reshape(-1), cnt.reshape(-1)
    ].add(pos.reshape(-1))
    new["roc_neg"] = state["roc_neg"].at[
        cidx.reshape(-1), cnt.reshape(-1)
    ].add(neg.reshape(-1))

    # ---- ECE over max-prob confidence (host: (conf * bins) truncated)
    conf = rows_p.max(axis=-1)
    bins = jnp.clip(
        (conf * NUM_ECE_BINS).astype(jnp.int32), 0, NUM_ECE_BINS - 1
    )
    correct = (pred_idx == rows_t).astype(jnp.int32) * rows_w
    new["ece_counts"] = state["ece_counts"].at[bins].add(rows_w)
    # the lone float accumulator: a plain f32 running sum stops absorbing
    # ~1.0-sized confidences once a bin passes 2^24 (~100k dense images),
    # so sum per batch into a fresh zero vector (exact at batch scale) and
    # fold it in with Neumaier compensation - the (sum, comp) f32 pair
    # carries ~f64 precision for unbounded test sets
    batch_conf = jnp.zeros((NUM_ECE_BINS,), jnp.float32).at[bins].add(
        conf * rows_w.astype(jnp.float32)
    )
    s = state["ece_conf"]
    t = s + batch_conf
    new["ece_conf_comp"] = state["ece_conf_comp"] + jnp.where(
        jnp.abs(s) >= jnp.abs(batch_conf),
        (s - t) + batch_conf,
        (batch_conf - t) + s,
    )
    new["ece_conf"] = t
    new["ece_correct"] = state["ece_correct"].at[bins].add(correct)

    # ---- missed / extra per-class counters (always accumulated)
    miss_w = missed.reshape(-1).astype(jnp.int32)
    new["missed_by_class"] = state["missed_by_class"].at[
        gt_cls.reshape(-1)
    ].add(miss_w)
    det_cls = jnp.argmax(det_probs, axis=-1)  # (B, K) real classes
    extra_w = (det_valid & ~matched).reshape(-1).astype(jnp.int32)
    new["extra_by_class"] = state["extra_by_class"].at[
        det_cls.reshape(-1)
    ].add(extra_w)
    new["total_matched"] = state["total_matched"] + (
        (det_valid & matched).sum()
    )
    new["n_images"] = state["n_images"] + real.sum()
    new["gt_overflow"] = state["gt_overflow"] + gt_overflow
    new["det_overflow"] = state["det_overflow"] + det_overflow

    # ---- binned mAP states
    if include_mAP:
        nb = map_score_bins
        sbin = jnp.clip((det_obj * nb).astype(jnp.int32), 0, nb - 1)  # (B,K)
        thr_map = jnp.asarray(IOU_THRESHOLDS, jnp.float32)  # (10,)
        # every valid det contributes at each IoU threshold: TP iff matched
        # with the right class at sufficient IoU, else FP (extras included)
        tp = (
            matched[..., None]
            & (pair_gt_cls == det_cls)[..., None]
            & (pair_iou[..., None] >= thr_map)
        ).astype(jnp.int32) * det_valid[..., None].astype(jnp.int32)
        fpw = det_valid[..., None].astype(jnp.int32) - tp  # (B, K, 10)
        ti = jnp.broadcast_to(jnp.arange(10), tp.shape)
        flat_idx = (
            (det_cls[..., None] * 10 + ti) * nb + sbin[..., None]
        ).reshape(-1)
        new["map_tp"] = (
            state["map_tp"].reshape(-1).at[flat_idx].add(tp.reshape(-1))
        ).reshape(nc, 10, nb)
        new["map_fp"] = (
            state["map_fp"].reshape(-1).at[flat_idx].add(fpw.reshape(-1))
        ).reshape(nc, 10, nb)
        new["map_ngt"] = state["map_ngt"].at[gt_cls.reshape(-1)].add(
            gt_valid.reshape(-1).astype(jnp.int32)
        )
    return new


# ------------------------------------------------------------------ class
class DeviceMetrics:
    """Drop-in Metrics replacement whose update() is one jitted device
    program and whose compute() returns the same 10-tuple.

    Capacities are smaller than the host engine's by default (the device
    state is fixed-shape): `max_detections` detections and `max_labels`
    ground-truth boxes per image. Overflow is counted and warned about at
    compute() - fall back to the host engine if a dataset exceeds them.

    mesh (optional): a jax Mesh with a "data" axis. update() is then jitted
    SPMD over it - predictions/labels/mask stay batch-sharded (no all-gather
    of the 38 MB/batch prediction tensor), each device scatter-adds its
    shard's rows, and GSPMD all-reduces into the replicated accumulator
    state. Integer counters are order-independent, so the sharded state is
    bit-identical to the single-device one (the lone f32 accumulator,
    ece_conf, picks up reduction-order noise only).
    """

    def __init__(
        self,
        classes: List[str],
        min_class_confidence_threshold: float = 0.9,
        include_mAP: bool = True,
        include_background: bool = True,
        obj_thresh: float = 0.5,
        iou_thresh: float = 0.5,
        max_detections: int = 256,
        max_labels: int = 256,
        map_score_bins: int = DEFAULT_MAP_SCORE_BINS,
        mesh=None,
    ):
        self.class_names = classes + (
            ["background"] if include_background else []
        )
        self.num_classes = len(classes)
        self.include_mAP = include_mAP
        self.include_background = include_background
        self.min_class_confidence_threshold = min_class_confidence_threshold
        self.obj_thresh = obj_thresh
        self.iou_thresh = iou_thresh
        self.max_detections = max_detections
        self.max_labels = max_labels
        self.map_score_bins = map_score_bins
        self.mesh = mesh
        update = partial(
            _update_batch,
            num_classes=self.num_classes,
            include_background=include_background,
            include_mAP=include_mAP,
            obj_thresh=obj_thresh,
            iou_thresh=iou_thresh,
            min_class_confidence_threshold=min_class_confidence_threshold,
            max_detections=max_detections,
            max_labels=max_labels,
            map_score_bins=map_score_bins,
        )
        if mesh is None:
            self._update = jax.jit(update, donate_argnums=0)
            self._rep = None
        else:
            from yogo_tpu.parallel.mesh import data_sharded, replicated

            self._rep = replicated(mesh)
            self._update = jax.jit(
                update,
                donate_argnums=0,
                # the replicated spec is a pytree prefix covering the whole
                # state dict; batch inputs shard on the data axis
                in_shardings=(
                    self._rep,
                    data_sharded(mesh),
                    data_sharded(mesh),
                    data_sharded(mesh, ndim=1),
                ),
                out_shardings=self._rep,
            )
        self.reset()

    def reset(self) -> None:
        nc = self.num_classes
        ncb = nc + 1 if self.include_background else nc
        st = {
            "confusion": jnp.zeros((ncb, ncb), jnp.int32),
            "roc_pos": jnp.zeros((ncb, NUM_ROC_THRESHOLDS + 1), jnp.int32),
            "roc_neg": jnp.zeros((ncb, NUM_ROC_THRESHOLDS + 1), jnp.int32),
            "ece_counts": jnp.zeros((NUM_ECE_BINS,), jnp.int32),
            "ece_conf": jnp.zeros((NUM_ECE_BINS,), jnp.float32),
            "ece_conf_comp": jnp.zeros((NUM_ECE_BINS,), jnp.float32),
            "ece_correct": jnp.zeros((NUM_ECE_BINS,), jnp.int32),
            "missed_by_class": jnp.zeros((nc,), jnp.int32),
            "extra_by_class": jnp.zeros((nc,), jnp.int32),
            "total_matched": jnp.zeros((), jnp.int32),
            "n_images": jnp.zeros((), jnp.int32),
            "gt_overflow": jnp.zeros((), jnp.int32),
            "det_overflow": jnp.zeros((), jnp.int32),
        }
        if self.include_mAP:
            st["map_tp"] = jnp.zeros(
                (nc, 10, self.map_score_bins), jnp.int32
            )
            st["map_fp"] = jnp.zeros(
                (nc, 10, self.map_score_bins), jnp.int32
            )
            st["map_ngt"] = jnp.zeros((nc,), jnp.int32)
        if self._rep is not None:
            # commit the fresh state replicated so the donated buffers
            # already live in the layout the SPMD update expects
            st = jax.device_put(st, self._rep)
        self._state = st

    # ---------------------------------------------------------------- api
    def update(self, preds, labels, image_mask=None) -> None:
        preds = jnp.asarray(preds)
        labels = jnp.asarray(labels)
        if image_mask is None:
            image_mask = jnp.ones((preds.shape[0],), jnp.float32)
        else:
            image_mask = jnp.asarray(image_mask)
        self._state = self._update(self._state, preds, labels, image_mask)

    def compute(self) -> Tuple:
        st = jax.tree.map(np.asarray, self._state)
        if st["gt_overflow"] > 0 or st["det_overflow"] > 0:
            warnings.warn(
                f"DeviceMetrics capacity overflow: {int(st['gt_overflow'])} "
                f"image(s) had more than max_labels={self.max_labels} boxes,"
                f" {int(st['det_overflow'])} had more than max_detections="
                f"{self.max_detections} passing cells; overflowing boxes "
                "were dropped. Use the host Metrics engine (or raise the "
                "capacities) for exact results on this dataset."
            )

        # rebuild the host engine's (ncb, T, 4) tp/fp/fn/tn from the
        # threshold-count histograms: tp[c,t] = #{pos rows: cnt >= t+1}
        pos_sfx = np.cumsum(st["roc_pos"][:, ::-1], axis=1)[:, ::-1]
        neg_sfx = np.cumsum(st["roc_neg"][:, ::-1], axis=1)[:, ::-1]
        tp = pos_sfx[:, 1:].astype(np.int64)  # (ncb, T)
        fp = neg_sfx[:, 1:].astype(np.int64)
        npos = st["roc_pos"].sum(axis=1).astype(np.int64)[:, None]
        nneg = st["roc_neg"].sum(axis=1).astype(np.int64)[:, None]
        roc_counts = np.stack([tp, fp, npos - tp, nneg - fp], axis=-1)

        if not self.include_mAP:
            mAP: Dict[str, float] = {"map": 0.0}
        elif st["n_images"] == 0:
            mAP = MeanAveragePrecision(self.num_classes)._empty_result()
        else:
            mAP = self._compute_map(
                st["map_tp"], st["map_fp"], st["map_ngt"]
            )

        return finish_metrics(
            confusion=st["confusion"].astype(np.int64),
            roc_counts=roc_counts,
            roc_thresholds=np.linspace(0.0, 1.0, NUM_ROC_THRESHOLDS),
            ece_counts=st["ece_counts"].astype(np.int64),
            ece_conf=st["ece_conf"].astype(np.float64)
            + st["ece_conf_comp"].astype(np.float64),
            ece_correct=st["ece_correct"].astype(np.float64),
            mAP=mAP,
            missed_by_class=st["missed_by_class"].astype(np.int64),
            extra_by_class=st["extra_by_class"].astype(np.int64),
            total_true_objects=int(st["total_matched"]),
        )

    def forward(self, preds, labels) -> Tuple:
        self.update(preds, labels)
        res = self.compute()
        self.reset()
        return res

    # ------------------------------------------------------------ mAP fin
    def _compute_map(
        self, tp_hist: np.ndarray, fp_hist: np.ndarray, ngt: np.ndarray
    ) -> Dict[str, float]:
        """Finish COCO AP from per-(class, threshold) score-binned TP/FP.

        Walking bins in descending score reproduces the host engine's
        score-sorted cumsums exactly when scores occupy distinct bins;
        same-bin ties aggregate into one P-R point (binned-mode semantics).
        """
        nc = self.num_classes
        ap = np.full((len(IOU_THRESHOLDS), nc), -1.0)
        for c in range(nc):
            n_gt = int(ngt[c])
            if n_gt == 0:
                continue
            for ti in range(len(IOU_THRESHOLDS)):
                tp_desc = tp_hist[c, ti, ::-1].astype(np.float64)
                fp_desc = fp_hist[c, ti, ::-1].astype(np.float64)
                ap[ti, c] = MeanAveragePrecision._ap_from_pr(
                    tp_desc, fp_desc, n_gt
                )

        recalls = []
        for c in range(nc):
            n_gt = int(ngt[c])
            if n_gt == 0:
                continue
            # only correct-class matches count toward recall; tp rows are
            # exactly those, so the bin sum is order-independent and exact
            recalls.append(
                float(
                    np.mean(
                        [
                            tp_hist[c, ti].sum() / n_gt
                            for ti in range(len(IOU_THRESHOLDS))
                        ]
                    )
                )
            )
        return MeanAveragePrecision.assemble_result(
            ap, float(np.mean(recalls)) if recalls else -1.0
        )
