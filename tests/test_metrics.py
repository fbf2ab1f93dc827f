import numpy as np
import pytest

from yogo_tpu.metrics import Metrics
from yogo_tpu.metrics.matching import linear_sum_assignment
from yogo_tpu.metrics.mean_ap import MeanAveragePrecision
from yogo_tpu.ops.grid import encode_label_grid_np

CLASSES = ["a", "b", "c"]


def make_pred_grid(boxes, sy=8, sx=10, num_classes=3):
    """boxes: list of (cx, cy, w, h, objectness, class_idx, class_prob)."""
    pred = np.zeros((5 + num_classes, sy, sx), np.float32)
    pred[5:] = (1.0 - 0.95) / (num_classes - 1)  # low uniform probs
    for cx, cy, w, h, obj, cls, p in boxes:
        i = min(int(cx * sx), sx - 1)
        j = min(int(cy * sy), sy - 1)
        pred[:4, j, i] = [cx, cy, w, h]
        pred[4, j, i] = obj
        pred[5:, j, i] = (1 - p) / (num_classes - 1)
        pred[5 + cls, j, i] = p
    return pred


def make_label_grid(boxes, sy=8, sx=10):
    """boxes: list of (cls, x1, y1, x2, y2)."""
    rows = np.asarray(boxes, np.float32)
    return encode_label_grid_np(rows, sx, sy)


def test_perfect_predictions():
    label_boxes = [
        (0, 0.1, 0.1, 0.3, 0.3),
        (1, 0.5, 0.5, 0.7, 0.7),
        (2, 0.2, 0.6, 0.4, 0.8),
    ]
    pred_boxes = [
        (0.2, 0.2, 0.2, 0.2, 0.95, 0, 0.99),
        (0.6, 0.6, 0.2, 0.2, 0.95, 1, 0.99),
        (0.3, 0.7, 0.2, 0.2, 0.95, 2, 0.99),
    ]
    m = Metrics(CLASSES, include_background=False)
    m.update(
        make_pred_grid(pred_boxes)[None], make_label_grid(label_boxes)[None]
    )
    mAP, confusion, acc, roc, prec, rec, ece, missed, extra, total = m.compute()
    np.testing.assert_allclose(mAP["map"], 1.0)
    np.testing.assert_allclose(mAP["map_50"], 1.0)
    assert confusion.trace() == 3 and confusion.sum() == 3
    np.testing.assert_allclose(acc, 1.0)
    np.testing.assert_allclose(prec, 1.0)
    assert missed.sum() == 0 and extra.sum() == 0
    assert total[0] == 3


def test_missed_and_extra_counters():
    label_boxes = [(0, 0.1, 0.1, 0.3, 0.3), (1, 0.5, 0.5, 0.7, 0.7)]
    # only one prediction, overlapping label 0; plus one far-away extra
    pred_boxes = [
        (0.2, 0.2, 0.2, 0.2, 0.95, 0, 0.99),
        (0.85, 0.15, 0.1, 0.1, 0.95, 2, 0.99),
    ]
    m = Metrics(CLASSES, include_background=False)
    m.update(
        make_pred_grid(pred_boxes)[None], make_label_grid(label_boxes)[None]
    )
    mAP, confusion, *_rest = m.compute()
    missed, extra, total = _rest[-3], _rest[-2], _rest[-1]
    # Hungarian pairs both preds to both labels (even at 0 IoU); the far-away
    # "extra" matches label 1 with IoU 0. For counters this means 0 missed /
    # 0 extra but a wrong-class confusion entry - same behavior as the
    # reference, which also matches all preds when M == N.
    assert total[0] == 2
    assert missed.sum() == 0 and extra.sum() == 0  # all paired, M == N
    assert confusion[0, 0] == 1
    assert confusion[1, 2] == 1  # label b predicted as c


def test_true_missed_label():
    label_boxes = [(0, 0.1, 0.1, 0.3, 0.3), (1, 0.5, 0.5, 0.7, 0.7)]
    pred_boxes = [(0.2, 0.2, 0.2, 0.2, 0.95, 0, 0.99)]
    m = Metrics(CLASSES, include_background=False)
    m.update(
        make_pred_grid(pred_boxes)[None], make_label_grid(label_boxes)[None]
    )
    *_, missed, extra, total = m.compute()
    np.testing.assert_array_equal(missed, [0, 1, 0])
    assert extra.sum() == 0 and total[0] == 1


def test_background_conversion():
    label_boxes = [(0, 0.1, 0.1, 0.3, 0.3), (1, 0.5, 0.5, 0.7, 0.7)]
    pred_boxes = [(0.2, 0.2, 0.2, 0.2, 0.95, 0, 0.99)]
    m = Metrics(CLASSES, include_background=True)
    m.update(
        make_pred_grid(pred_boxes)[None], make_label_grid(label_boxes)[None]
    )
    _, confusion, *_ = m.compute()
    assert confusion.shape == (4, 4)
    # the missed class-1 label shows as "predicted background"
    assert confusion[1, 3] == 1


def test_min_class_confidence_filters_eval_preds():
    label_boxes = [(0, 0.1, 0.1, 0.3, 0.3)]
    pred_boxes = [(0.2, 0.2, 0.2, 0.2, 0.95, 0, 0.6)]  # below the 0.9 default
    m = Metrics(CLASSES, include_background=False)
    m.update(
        make_pred_grid(pred_boxes)[None], make_label_grid(label_boxes)[None]
    )
    *_, missed, extra, total = m.compute()
    np.testing.assert_array_equal(missed, [1, 0, 0])


def test_calibration_error_zero_for_confident_correct():
    label_boxes = [(0, 0.1, 0.1, 0.3, 0.3)]
    pred_boxes = [(0.2, 0.2, 0.2, 0.2, 0.95, 0, 0.99)]
    m = Metrics(CLASSES, include_background=False)
    for _ in range(3):
        m.update(
            make_pred_grid(pred_boxes)[None], make_label_grid(label_boxes)[None]
        )
    ece = m.compute()[6]
    assert 0 <= ece < 0.02  # confidence .99, accuracy 1 -> tiny ECE


def test_roc_shapes_and_extremes():
    label_boxes = [(0, 0.1, 0.1, 0.3, 0.3)]
    pred_boxes = [(0.2, 0.2, 0.2, 0.2, 0.95, 0, 0.99)]
    m = Metrics(CLASSES, include_background=False)
    m.update(
        make_pred_grid(pred_boxes)[None], make_label_grid(label_boxes)[None]
    )
    _, _, _, (fpr, tpr, thr), *_ = m.compute()
    assert fpr.shape == tpr.shape == (3, 500)
    # torchmetrics orientation: thresholds DESCEND, curves ascend
    assert thr[0, 0] == 1.0 and thr[0, -1] == 0.0
    assert np.all(np.diff(thr[0]) <= 0)
    assert np.all(np.diff(tpr[0]) >= 0) and np.all(np.diff(fpr[0]) >= 0)
    # at threshold 0 (now the LAST point) every sample is predicted positive
    assert tpr[0, -1] == 1.0


def test_reset():
    m = Metrics(CLASSES, include_background=False)
    m.update(
        make_pred_grid([(0.2, 0.2, 0.2, 0.2, 0.95, 0, 0.99)])[None],
        make_label_grid([(0, 0.1, 0.1, 0.3, 0.3)])[None],
    )
    m.reset()
    assert m.confusion.sum() == 0 and m.total_num_true_objects == 0


# ----------------------------------------------------------------- mAP unit
def test_map_half_iou():
    """One detection at IoU ~0.6: counts at t=.5/.55/.6 but not above."""
    ap = MeanAveragePrecision(1)
    ap.update(
        matched_scores=np.array([0.9]),
        matched_pred_cls=np.array([0]),
        matched_gt_cls=np.array([0]),
        matched_ious=np.array([0.62]),
        extra_scores=np.empty(0),
        extra_cls=np.empty(0, np.int64),
        missed_cls=np.empty(0, np.int64),
    )
    res = ap.compute()
    assert res["map_50"] == 1.0
    assert res["map_75"] == 0.0
    np.testing.assert_allclose(res["map"], 3 / 10)  # thresholds .5,.55,.6 pass


def test_map_false_positive_ordering():
    """A higher-scored FP before the TP drags precision down."""
    ap = MeanAveragePrecision(1)
    ap.update(
        matched_scores=np.array([0.8]),
        matched_pred_cls=np.array([0]),
        matched_gt_cls=np.array([0]),
        matched_ious=np.array([0.9]),
        extra_scores=np.array([0.95]),
        extra_cls=np.array([0]),
        missed_cls=np.empty(0, np.int64),
    )
    res = ap.compute()
    assert 0 < res["map_50"] < 1.0


# ------------------------------------------------------------- assignment
def test_linear_sum_assignment_basic():
    cost = np.array([[1.0, 2.0], [2.0, 1.0]])
    r, c = linear_sum_assignment(cost)
    assert cost[r, c].sum() == 2.0


def test_linear_sum_assignment_rectangular():
    cost = np.array([[1.0, 0.1, 2.0]])
    r, c = linear_sum_assignment(cost)
    assert (r.tolist(), c.tolist()) == ([0], [1])


def test_hungarian_fallback_matches_scipy_exactly():
    """The pure-numpy JV fallback must equal scipy's linear_sum_assignment
    EXACTLY (same arrays, same sort convention) on random rectangular
    matrices - a transposed-case sort bug once returned optimal but
    unsorted row indices, diverging between scipy-present and
    scipy-absent environments."""
    scipy_lsa = pytest.importorskip("scipy.optimize").linear_sum_assignment
    from yogo_tpu.metrics.matching import _hungarian_numpy

    rng = np.random.default_rng(0)
    for _ in range(200):
        n, m = rng.integers(1, 9, 2)
        cost = rng.normal(0, 1, (n, m))
        r1, c1 = _hungarian_numpy(cost)
        r2, c2 = scipy_lsa(cost)
        np.testing.assert_array_equal(r1, r2)
        np.testing.assert_array_equal(c1, c2)


def test_dense_scene_within_detection_cap():
    """The device formatter caps detections at max_detections per image; a
    realistic dense 772x1032 scene (base-model grid 97x129, several hundred
    objects - far above real blood-smear densities) must stay under the 1024
    cap, and when the cap IS binding the Metrics engine must still count
    every kept detection and never silently drop matched labels."""
    import jax.numpy as jnp

    from yogo_tpu.ops.postprocess import format_preds_batched

    rng = np.random.default_rng(0)
    sy, sx = 97, 129
    c = 3
    n_obj = 700  # dense: ~6% of cells occupied
    pred = np.zeros((1, 5 + c, sy, sx), np.float32)
    cells = rng.choice(sy * sx, n_obj, replace=False)
    ys, xs = np.unravel_index(cells, (sy, sx))
    pred[0, 0, ys, xs] = (xs + 0.5) / sx
    pred[0, 1, ys, xs] = (ys + 0.5) / sy
    pred[0, 2, ys, xs] = 0.004  # small boxes: no NMS suppression
    pred[0, 3, ys, xs] = 0.004
    pred[0, 4, ys, xs] = 0.9
    pred[0, 5 + 0, ys, xs] = 0.95
    f = format_preds_batched(jnp.asarray(pred))
    assert int(np.asarray(f["valid"]).sum()) == n_obj  # cap not hit

    # force the cap: capacity below the object count drops the excess but
    # keeps exactly max_detections (documented truncation behavior)
    f_small = format_preds_batched(jnp.asarray(pred), max_detections=512)
    assert int(np.asarray(f_small["valid"]).sum()) == 512


def test_metrics_dense_scene_counts_complete():
    """End-to-end Metrics.update on a dense scene: every object is matched
    (no silent drops below the cap)."""
    rng = np.random.default_rng(1)
    sy, sx = 97, 129
    classes = ["a", "b", "c"]
    n_obj = 600
    pred = np.zeros((1, 8, sy, sx), np.float32)
    labels = np.zeros((1, 6, sy, sx), np.float32)
    cells = rng.choice(sy * sx, n_obj, replace=False)
    ys, xs = np.unravel_index(cells, (sy, sx))
    cls = rng.integers(0, 3, n_obj)
    cx, cy = (xs + 0.5) / sx, (ys + 0.5) / sy
    w = h = 0.004
    pred[0, 0, ys, xs] = cx
    pred[0, 1, ys, xs] = cy
    pred[0, 2, ys, xs] = w
    pred[0, 3, ys, xs] = h
    pred[0, 4, ys, xs] = 0.9
    pred[0, 5 + 0, ys, xs] = 0.02
    for k in range(3):
        pred[0, 5 + k, ys[cls == k], xs[cls == k]] = 0.95
    labels[0, 0, ys, xs] = 1
    labels[0, 1, ys, xs] = cx - w / 2
    labels[0, 2, ys, xs] = cy - h / 2
    labels[0, 3, ys, xs] = cx + w / 2
    labels[0, 4, ys, xs] = cy + h / 2
    labels[0, 5, ys, xs] = cls

    m = Metrics(classes=classes, include_mAP=True, include_background=True)
    m.update(pred, labels)
    out = m.compute()
    total_true = int(out[9][0])
    assert total_true == n_obj  # every detection matched, none dropped
    assert int(out[7].sum()) == 0  # no missed
    assert int(out[8].sum()) == 0  # no extra
    assert out[0]["map_50"] > 0.99
