"""Pin metrics/mean_ap.py to an independent oracle reproducing torchmetrics'
pseudo-image COCO evaluation (reference: yogo/metrics.py:112-157,208-234).

The reference converts every Hungarian-matched (pred, label) pair - plus,
when include_background=True, every missed label and extra prediction - into
a one-box pseudo-image and feeds torchmetrics MeanAveragePrecision. The
oracle below implements COCO's evaluation (greedy per-image matching at IoU
thresholds .5:.05:.95, score-sorted, 101-point interpolated AP) directly on
those pseudo-images in numpy, with no shared code with the implementation.

Documented divergences from the reference pipeline (measured in
test_background_class_divergence_documented):
  * reference include_background=True also averages a degenerate synthetic
    "background" class AP (always 0.0 whenever any extra predictions exist,
    because background's only detections are missed-label pseudo-preds whose
    GT is a real class) into `map`; our map averages real classes only. The
    oracle here confirms per-REAL-class AP equality.
  * reference include_background=False drops missed labels and extra
    predictions from the mAP entirely (matched pairs only); we always count
    missed in n_gt and extras as false positives (the standard COCO
    quantity). The magnitude of that difference is asserted below.
"""

import numpy as np

from yogo_tpu.metrics.mean_ap import IOU_THRESHOLDS, MeanAveragePrecision

RECALL_POINTS = np.linspace(0.0, 1.0, 101)


# --------------------------------------------------------------------- oracle
def _iou(a, b):
    ix = max(0.0, min(a[2], b[2]) - max(a[0], b[0]))
    iy = max(0.0, min(a[3], b[3]) - max(a[1], b[1]))
    inter = ix * iy
    ua = (a[2] - a[0]) * (a[3] - a[1]) + (b[2] - b[0]) * (b[3] - b[1]) - inter
    return inter / ua if ua > 0 else 0.0


def coco_eval_pseudo_images(pseudo_images, num_classes):
    """COCO evaluation over one-box pseudo-images.

    pseudo_images: list of dicts with keys
        pred: None or (box xyxy, score, cls)
        gt:   None or (box xyxy, cls)
    Returns ap[t, c] (-1 where class has no GT), following COCOeval:
    detections sorted by score (stable), greedy-matched per image to unused
    GT of the same class with IoU >= t, 101-point interpolated AP.
    """
    ap = np.full((len(IOU_THRESHOLDS), num_classes), -1.0)
    for c in range(num_classes):
        dets = []  # (score, image_idx)
        gts = {}  # image_idx -> box
        for i, pi in enumerate(pseudo_images):
            if pi.get("pred") is not None and pi["pred"][2] == c:
                dets.append((pi["pred"][1], i, pi["pred"][0]))
            if pi.get("gt") is not None and pi["gt"][1] == c:
                gts[i] = pi["gt"][0]
        n_gt = len(gts)
        if n_gt == 0:
            continue
        order = sorted(range(len(dets)), key=lambda k: -dets[k][0])
        for ti, t in enumerate(IOU_THRESHOLDS):
            used = set()
            tp = np.zeros(len(dets))
            for rank, k in enumerate(order):
                _, img, box = dets[k]
                if img in gts and img not in used:
                    if _iou(box, gts[img]) >= t:
                        tp[rank] = 1.0
                        used.add(img)
            fp = 1.0 - tp
            tp_c, fp_c = np.cumsum(tp), np.cumsum(fp)
            recall = tp_c / n_gt
            precision = tp_c / np.maximum(tp_c + fp_c, 1e-12)
            for i in range(len(precision) - 1, 0, -1):
                precision[i - 1] = max(precision[i - 1], precision[i])
            idx = np.searchsorted(recall, RECALL_POINTS, side="left")
            prec_at = np.where(
                idx < len(precision),
                precision[np.minimum(idx, max(len(precision) - 1, 0))]
                if len(precision)
                else 0.0,
                0.0,
            )
            ap[ti, c] = prec_at.mean() if len(precision) else 0.0
    return ap


# ------------------------------------------------------------------- scenario
def _box(cx, cy, w, h):
    return (cx - w / 2, cy - h / 2, cx + w / 2, cy + h / 2)


def nontrivial_scenario():
    """3 classes, multiple images worth of matches: high-IoU TPs at varied
    scores, low-IoU matches (TP at 0.5 but FP at higher thresholds), a
    cross-class match, extras, and missed labels."""
    matches = []  # (score, pred_cls, gt_cls, pred_box, gt_box)

    def pair(score, pc, gc, iou_target):
        # construct two boxes with a controlled IoU: same height/width,
        # shifted horizontally. For w=0.2 squares shifted by d: IoU =
        # (0.2-d)/(0.2+d) -> d = 0.2*(1-i)/(1+i)
        d = 0.2 * (1 - iou_target) / (1 + iou_target)
        gb = _box(0.5, 0.5, 0.2, 0.2)
        pb = _box(0.5 + d, 0.5, 0.2, 0.2)
        matches.append((score, pc, gc, pb, gb))

    pair(0.95, 0, 0, 0.92)   # clean TP for class 0
    pair(0.90, 0, 0, 0.60)   # TP at t<=0.6, FP above
    pair(0.85, 0, 0, 0.52)   # TP only at t=0.5
    pair(0.80, 1, 1, 0.88)   # clean TP for class 1
    pair(0.75, 1, 0, 0.90)   # class confusion: FP for 1, consumes gt of 0? no - gt cls 0
    pair(0.70, 2, 2, 0.55)   # low-iou TP for class 2
    pair(0.65, 2, 2, 0.45)   # below 0.5: FP at every threshold
    extras = [(0.60, 0, _box(0.1, 0.1, 0.15, 0.15)),
              (0.55, 2, _box(0.9, 0.9, 0.12, 0.12))]
    missed = [1, 1, 2]
    return matches, extras, missed


def build_pseudo_images(matches, extras, missed, include_background, nc):
    """Reference _format_for_mAP semantics: each match is a pseudo-image
    with one pred and one gt; with include_background, missed/extra become
    same-box pseudo-images against the synthetic background class."""
    pis = []
    for score, pc, gc, pb, gb in matches:
        pis.append({"pred": (pb, score, pc), "gt": (gb, gc)})
    if include_background:
        bg = nc
        for cls in missed:
            b = _box(0.3, 0.3, 0.1, 0.1)
            pis.append({"pred": (b, 1.0, bg), "gt": (b, cls)})
        for score, cls, b in extras:
            pis.append({"pred": (b, score, cls), "gt": (b, bg)})
    return pis


def run_ours(matches, extras, missed, nc):
    m = MeanAveragePrecision(nc)
    scores = np.array([s for s, *_ in matches])
    pcls = np.array([pc for _, pc, *_ in matches])
    gcls = np.array([gc for _, _, gc, *_ in matches])
    ious = np.array([_iou(pb, gb) for *_, pb, gb in matches])
    m.update(
        scores, pcls, gcls, ious,
        np.array([s for s, _, _ in extras]),
        np.array([c for _, c, _ in extras]),
        np.array(missed),
    )
    return m.compute()


def test_map_matches_pseudo_image_coco_oracle():
    """Per-real-class AP must equal the torchmetrics pseudo-image oracle
    (include_background=True wiring, which is the only reference mode that
    feeds missed/extra to mAP at all)."""
    matches, extras, missed = nontrivial_scenario()
    nc = 3
    pis = build_pseudo_images(matches, extras, missed, True, nc)
    oracle_ap = coco_eval_pseudo_images(pis, nc + 1)  # + background

    ours = run_ours(matches, extras, missed, nc)

    # reproduce the per-class x per-threshold AP table ourselves for real
    # classes and compare the aggregated values
    real_ap = oracle_ap[:, :nc]

    def mean_valid(a):
        v = a > -1
        return float(a[v].mean()) if v.any() else -1.0

    per_class_oracle = np.array([mean_valid(real_ap[:, c]) for c in range(nc)])
    np.testing.assert_allclose(
        ours["map_per_class"], per_class_oracle, atol=1e-12
    )
    np.testing.assert_allclose(ours["map"], mean_valid(real_ap), atol=1e-12)
    np.testing.assert_allclose(ours["map_50"], mean_valid(real_ap[0]), atol=1e-12)
    t75 = int(np.argmin(np.abs(IOU_THRESHOLDS - 0.75)))
    np.testing.assert_allclose(
        ours["map_75"], mean_valid(real_ap[t75]), atol=1e-12
    )


def test_oracle_sanity_perfect_detection():
    """Oracle self-check: perfect same-box detections give AP 1.0."""
    pis = [
        {"pred": (_box(0.5, 0.5, 0.2, 0.2), 0.9, 0),
         "gt": (_box(0.5, 0.5, 0.2, 0.2), 0)}
        for _ in range(4)
    ]
    ap = coco_eval_pseudo_images(pis, 2)
    assert np.allclose(ap[:, 0], 1.0)
    assert np.all(ap[:, 1] == -1.0)


def test_background_class_divergence_documented():
    """Measure (and thereby document) the two divergences from the reference
    pipeline described in the module docstring."""
    matches, extras, missed = nontrivial_scenario()
    nc = 3
    ours = run_ours(matches, extras, missed, nc)

    # 1. reference include_background=True also averages the synthetic
    #    background class whose AP is 0 here (its only dets are
    #    missed-pseudo preds with real-class GTs)
    pis = build_pseudo_images(matches, extras, missed, True, nc)
    oracle_ap = coco_eval_pseudo_images(pis, nc + 1)
    assert np.allclose(oracle_ap[:, nc], 0.0)  # degenerate bg AP

    def mean_valid(a):
        v = a > -1
        return float(a[v].mean()) if v.any() else -1.0

    ref_map_with_bg = mean_valid(oracle_ap)
    # ours excludes the degenerate class: strictly larger, by bg's 0 share
    assert ours["map"] > ref_map_with_bg
    np.testing.assert_allclose(
        ref_map_with_bg, ours["map"] * nc / (nc + 1), atol=1e-12
    )

    # 2. reference include_background=False = matched pairs only (no missed
    #    in n_gt, no extra FPs) - systematically higher than the full COCO
    #    quantity we report
    pis_nobg = build_pseudo_images(matches, extras, missed, False, nc)
    oracle_nobg = coco_eval_pseudo_images(pis_nobg, nc)
    ref_map_matched_only = mean_valid(oracle_nobg[:, :nc])
    assert ref_map_matched_only >= ours["map"]


def test_reference_background_conversion_is_broken_upstream():
    """Evidence that the include_background divergence documented above is a
    BUG FIX, not a parity gap: the reference's own convert_background_errors
    builds synthetic missed-label prediction rows one column NARROWER than
    the real rows (it one-hots with the un-expanded class count while
    appending a background column to the matched preds), so its
    include_background metrics path raises RuntimeError the moment any
    label goes undetected. Imported standalone with torchvision stubbed
    (reference: yogo/utils/prediction_formatting.py:206-251,
    yogo/metrics.py:36,146-149 pass num_classes WITHOUT background)."""
    import importlib.util
    import sys
    import types
    from pathlib import Path

    import pytest

    torch = pytest.importorskip("torch")
    ref_path = Path("/root/reference/yogo/utils/prediction_formatting.py")
    if not ref_path.exists():
        pytest.skip("reference repo unavailable")

    # stub torchvision.ops (absent in this env; only .nms is referenced)
    tv = types.ModuleType("torchvision")
    tv_ops = types.ModuleType("torchvision.ops")
    tv_ops.nms = lambda boxes, scores, iou: torch.arange(len(boxes))
    tv.ops = tv_ops
    sys.modules.setdefault("torchvision", tv)
    sys.modules.setdefault("torchvision.ops", tv_ops)
    spec = importlib.util.spec_from_file_location("ref_pred_fmt", ref_path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    nc = 3  # real classes, as the reference's Metrics passes
    matched_pred = torch.tensor([[0.1, 0.1, 0.3, 0.3, 0.9, 0.7, 0.2, 0.1]])
    matched_label = torch.tensor([[1.0, 0.1, 0.1, 0.3, 0.3, 0.0]])
    missed = torch.tensor([[1.0, 0.5, 0.5, 0.7, 0.7, 1.0]])
    pm = mod.PredictionLabelMatch(
        preds=matched_pred,
        labels=matched_label,
        missed_labels=missed,
        extra_predictions=None,
    )
    with pytest.raises(RuntimeError):
        pm.convert_background_errors(nc)

    # ours handles the same scenario (background gets its own expanded index)
    from yogo_tpu.ops.postprocess import PredictionLabelMatch as OurPM

    ours = OurPM(
        preds=matched_pred.numpy(),
        labels=matched_label.numpy(),
        missed_labels=missed.numpy(),
        extra_predictions=None,
    )
    conv = ours.convert_background_errors(nc + 1)
    assert conv.preds.shape[0] == 2 and conv.labels.shape[0] == 2
