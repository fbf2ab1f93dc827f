"""Windowed (grid-local) NMS count path vs the host oracle and the global
device path (ops/window_nms.py).

The windowed formulation is capacity-free and provably equal to global
greedy NMS whenever every passing box fits the window's certified extents
(proof in the module docstring); these tests pin that equality, the tie
order, the premise flag, and the reference's threshold semantics.
"""

import numpy as np
import pytest

from yogo_tpu.ops.postprocess import count_class_predictions, format_preds
from yogo_tpu.ops.window_nms import premise_extents, windowed_count

SY, SX, C = 24, 32, 4
RY = RX = 4
IOU_T = 0.5
HMAX, WMAX = premise_extents(RY, RX, SY, SX, IOU_T)


def host_counts(pred, obj_t=0.5, iou_t=IOU_T, conf_t=0.0):
    out = np.zeros(C, np.int64)
    for row in format_preds(
        pred, obj_thresh=obj_t, iou_thresh=iou_t,
        min_class_confidence_threshold=conf_t,
    ):
        out[int(np.argmax(row[5:]))] += 1
    return out


def make_grid(rng, b=2, density=30, hmax=HMAX * 0.999, wmax=WMAX * 0.999):
    """Random decoded-style predictions: centers confined to their cells
    (the decode guarantees this), extents bounded, overlap clusters to
    force suppression cascades, quantized scores to force ties."""
    d = 5 + C
    pred = rng.uniform(0, 0.3, (b, d, SY, SX)).astype(np.float32)
    pred[:, 0] = (np.arange(SX)[None, :] + rng.uniform(0.02, 0.98, (b, SY, SX))) / SX
    pred[:, 1] = (np.arange(SY)[:, None] + rng.uniform(0.02, 0.98, (b, SY, SX))) / SY
    pred[:, 2] = rng.uniform(0.2, 0.98, (b, SY, SX)) * wmax
    pred[:, 3] = rng.uniform(0.2, 0.98, (b, SY, SX)) * hmax
    pred[:, 4] = np.round(rng.uniform(0, 0.49, (b, SY, SX)) * 64) / 64
    for bi in range(b):
        for _ in range(density):
            cy0, cx0 = rng.integers(0, SY), rng.integers(0, SX)
            for dy in range(-2, 3):
                for dx in range(-2, 3):
                    y, x = cy0 + dy, cx0 + dx
                    if 0 <= y < SY and 0 <= x < SX and rng.uniform() < 0.6:
                        pred[bi, 4, y, x] = round(rng.uniform(0.51, 0.99) * 64) / 64
    pred[:, 5:] = np.round(rng.uniform(0, 1, (b, C, SY, SX)) * 8) / 8
    return pred


@pytest.mark.parametrize("seed", range(8))
def test_matches_host_oracle_and_global_device_path(seed):
    rng = np.random.default_rng(seed)
    conf_t = 0.25 if seed % 2 else 0.0
    pred = make_grid(rng)
    res = windowed_count(
        pred, obj_thresh=0.5, iou_thresh=IOU_T,
        min_class_confidence_threshold=conf_t, ry=RY, rx=RX,
    )
    assert not bool(res["exceeded"])
    want = sum(host_counts(p, conf_t=conf_t) for p in pred)
    np.testing.assert_array_equal(np.asarray(res["counts"]), want)
    dev = count_class_predictions(
        pred, obj_thresh=0.5, iou_thresh=IOU_T,
        min_class_confidence_threshold=conf_t, max_detections=SY * SX,
    )
    np.testing.assert_array_equal(np.asarray(dev), want)


def test_tie_broken_by_lower_cell_index():
    """Two identical overlapping boxes with equal scores: the lower
    original cell index survives - the ops/nms.py (and host stable-sort)
    tie order."""
    pred = np.zeros((1, 5 + C, SY, SX), np.float32)
    # same box geometry emitted from two horizontally adjacent cells
    for x_cell, frac in ((10, 0.9), (11, 0.1)):
        pred[0, 0, 5, x_cell] = (x_cell + frac) / SX
        pred[0, 1, 5, x_cell] = 5.5 / SY
        pred[0, 2, 5, x_cell] = 3.0 / SX
        pred[0, 3, 5, x_cell] = 3.0 / SY
        pred[0, 4, 5, x_cell] = 0.9
        pred[0, 5, 5, x_cell] = 1.0
    # boxes differ by 0.8 cells of center offset -> IoU well above 0.5
    res = windowed_count(pred, ry=RY, rx=RX)
    keep = np.asarray(res["keep"][0])
    assert keep[5, 10] and not keep[5, 11]
    assert np.asarray(res["counts"]).tolist() == [1, 0, 0, 0]


def test_premise_flag_on_oversize_boxes():
    pred = np.zeros((1, 5 + C, SY, SX), np.float32)
    pred[0, 0, 5, 10] = 10.5 / SX
    pred[0, 1, 5, 10] = 5.5 / SY
    pred[0, 2, 5, 10] = WMAX * 2  # wider than the window certifies
    pred[0, 3, 5, 10] = HMAX * 0.5
    pred[0, 4, 5, 10] = 0.9
    pred[0, 5, 5, 10] = 1.0
    assert bool(windowed_count(pred, ry=RY, rx=RX)["exceeded"])
    # the same box below the objectness threshold does not trip the flag
    pred[0, 4, 5, 10] = 0.3
    assert not bool(windowed_count(pred, ry=RY, rx=RX)["exceeded"])


def test_iou_zero_disables_suppression():
    """Reference semantics: iou_thresh 0 disables NMS entirely
    (yogo/utils/prediction_formatting.py:81-86 guard)."""
    rng = np.random.default_rng(7)
    pred = make_grid(rng, b=1)
    res = windowed_count(pred, obj_thresh=0.5, iou_thresh=0.0, ry=RY, rx=RX)
    want = host_counts(pred[0], iou_t=0.0)
    np.testing.assert_array_equal(np.asarray(res["counts"]), want)
    assert int(np.asarray(res["keep"]).sum()) == int(
        (pred[0, 4] > 0.5).sum()
    )


def test_image_mask_excludes_padding_images():
    rng = np.random.default_rng(11)
    pred = make_grid(rng, b=3)
    masked = windowed_count(
        pred, ry=RY, rx=RX, image_mask=np.array([True, True, False])
    )
    want = sum(host_counts(p) for p in pred[:2])
    np.testing.assert_array_equal(np.asarray(masked["counts"]), want)


def test_nan_scores_rank_last():
    """A NaN class-prob box overlapping a clean one must lose, like the
    host oracle's stable sort (NaN to the end) and ops/nms.py."""
    pred = np.zeros((1, 5 + C, SY, SX), np.float32)
    for x_cell, nan in ((10, True), (11, False)):
        pred[0, 0, 5, x_cell] = (x_cell + (0.9 if x_cell == 10 else 0.1)) / SX
        pred[0, 1, 5, x_cell] = 5.5 / SY
        pred[0, 2, 5, x_cell] = 3.0 / SX
        pred[0, 3, 5, x_cell] = 3.0 / SY
        pred[0, 4, 5, x_cell] = 0.9
        pred[0, 5, 5, x_cell] = np.nan if nan else 1.0
    res = windowed_count(pred, ry=RY, rx=RX)
    keep = np.asarray(res["keep"][0])
    assert keep[5, 11] and not keep[5, 10]


def test_long_suppression_chain_converges_to_greedy():
    """A score-descending chain of overlapping neighbors: greedy keeps
    every other box; one-pass pairwise suppression would keep only the
    first. Pins that the fixed point resolves cascades."""
    pred = np.zeros((1, 5 + C, SY, SX), np.float32)
    n = 10
    for i in range(n):
        # adjacent cells, centers 1 cell apart, width 3 cells -> IoU 0.5+
        pred[0, 0, 5, 5 + i] = (5 + i + 0.5) / SX
        pred[0, 1, 5, 5 + i] = 5.5 / SY
        pred[0, 2, 5, 5 + i] = 3.2 / SX
        pred[0, 3, 5, 5 + i] = 3.2 / SY
        pred[0, 4, 5, 5 + i] = 0.9
        pred[0, 5, 5, 5 + i] = (n - i) / n  # strictly descending scores
    res = windowed_count(pred, ry=RY, rx=RX)
    keep = np.asarray(res["keep"][0])[5, 5 : 5 + n]
    want_rows = format_preds(pred[0], obj_thresh=0.5, iou_thresh=IOU_T)
    assert keep.sum() == len(want_rows)
    assert list(keep) == [True, False] * (n // 2)
