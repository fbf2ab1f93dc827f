import jax
import jax.numpy as jnp
import numpy as np
import pytest

from yogo_tpu.ops.boxes import (
    box_cxcywh_to_xyxy,
    box_iou,
    box_xyxy_to_cxcywh,
    complete_box_iou_loss,
    elementwise_box_iou,
    encode_label_grid,
)
from yogo_tpu.ops.grid import cell_offsets, encode_label_grid_np


def test_box_convert_roundtrip():
    rng = np.random.default_rng(0)
    cxcywh = rng.uniform(0.1, 0.4, size=(32, 4)).astype(np.float32)
    xyxy = box_cxcywh_to_xyxy(jnp.asarray(cxcywh))
    back = box_xyxy_to_cxcywh(xyxy)
    np.testing.assert_allclose(np.asarray(back), cxcywh, rtol=1e-6, atol=1e-7)


def test_box_convert_values():
    box = jnp.array([[0.5, 0.5, 0.1, 0.2]])
    out = np.asarray(box_cxcywh_to_xyxy(box))
    np.testing.assert_allclose(out, [[0.45, 0.4, 0.55, 0.6]], atol=1e-7)


def test_box_iou_known_values():
    a = jnp.array([[0.0, 0.0, 1.0, 1.0]])
    b = jnp.array([[0.0, 0.0, 1.0, 1.0], [0.5, 0.5, 1.5, 1.5], [2.0, 2.0, 3.0, 3.0]])
    iou = np.asarray(box_iou(a, b))[0]
    np.testing.assert_allclose(iou, [1.0, 0.25 / 1.75, 0.0], rtol=1e-6)


def test_elementwise_iou_matches_pairwise_diag():
    rng = np.random.default_rng(1)
    pts = rng.uniform(0, 1, size=(16, 2, 2)).astype(np.float32)
    boxes = np.concatenate([pts.min(1), pts.max(1)], axis=1)
    a, b = jnp.asarray(boxes), jnp.asarray(np.roll(boxes, 1, axis=0))
    full = np.asarray(box_iou(a, b))
    elem = np.asarray(elementwise_box_iou(a, b))
    np.testing.assert_allclose(np.diag(full), elem, rtol=1e-5, atol=1e-6)


def test_ciou_identical_boxes_is_zero():
    b = jnp.array([[0.2, 0.2, 0.6, 0.7]])
    loss = np.asarray(complete_box_iou_loss(b, b))
    np.testing.assert_allclose(loss, [0.0], atol=1e-5)


def test_ciou_disjoint_greater_than_one():
    a = jnp.array([[0.0, 0.0, 0.1, 0.1]])
    b = jnp.array([[0.8, 0.8, 1.0, 1.0]])
    loss = float(complete_box_iou_loss(a, b)[0])
    assert loss > 1.0  # 1 - 0 IoU + positive distance penalty


def test_ciou_matches_manual_formula():
    # hand-computed CIoU for a simple pair
    pred = np.array([[0.0, 0.0, 2.0, 2.0]], np.float32)
    tgt = np.array([[1.0, 1.0, 3.0, 3.0]], np.float32)
    eps = 1e-7
    inter = 1.0
    union = 4 + 4 - inter
    iou = inter / (union + eps)
    diag = 3**2 + 3**2 + eps
    center = (1.0**2 + 1.0**2)
    v = 0.0  # same aspect ratio
    expected = 1 - iou + center / diag + 0.0 * v
    got = float(complete_box_iou_loss(jnp.asarray(pred), jnp.asarray(tgt))[0])
    np.testing.assert_allclose(got, expected, rtol=1e-6)


def test_ciou_gradient_finite_with_mask():
    """Masked degenerate boxes must not poison gradients (NaN * 0 trap)."""

    def loss_fn(p):
        boxes = jnp.stack([p, jnp.zeros(4)])  # second row degenerate
        tgt = jnp.array([[0.1, 0.1, 0.3, 0.3], [0.0, 0.0, 0.0, 0.0]])
        mask = jnp.array([1.0, 0.0])
        return jnp.sum(complete_box_iou_loss(boxes, tgt) * mask)

    g = jax.grad(loss_fn)(jnp.array([0.1, 0.1, 0.25, 0.35]))
    assert np.all(np.isfinite(np.asarray(g)))


def test_ciou_degenerate_boxes_finite_documented_divergence():
    """Boxes degenerate along one axis stay FINITE (value and grad) - the
    documented divergence from torchvision, which yields pi/2 atan terms
    (h==0, w>0) or NaN (fully degenerate). Unreachable from the decoded
    loss path; pinned so the guard is never 'simplified' away."""
    pred = jnp.array(
        [[0.2, 0.0, 0.5, 0.0], [1.0, 1.0, 1.0, 1.0], [0.0, 0.0, 0.0, 0.0]]
    )
    tgt = jnp.array(
        [[0.1, 0.1, 0.4, 0.4], [0.1, 0.1, 0.4, 0.4], [0.0, 0.0, 0.0, 0.0]]
    )
    loss = np.asarray(complete_box_iou_loss(pred, tgt))
    assert np.all(np.isfinite(loss))
    g = np.asarray(
        jax.grad(lambda p: jnp.sum(complete_box_iou_loss(p, tgt)))(pred)
    )
    assert np.all(np.isfinite(g))


def test_encode_label_grid_np_matches_reference_semantics():
    Sx, Sy = 8, 6
    labels = np.array(
        [
            [2.0, 0.1, 0.1, 0.3, 0.3],  # center (0.2, 0.2) -> cell (1, 1)
            [0.0, 0.85, 0.8, 0.95, 0.9],  # center (0.9, 0.85) -> cell (7, 5)
        ],
        np.float32,
    )
    grid = encode_label_grid_np(labels, Sx, Sy)
    assert grid.shape == (6, Sy, Sx)
    assert grid[0].sum() == 2
    assert grid[0, 1, 1] == 1 and grid[5, 1, 1] == 2.0
    np.testing.assert_allclose(grid[1:5, 1, 1], [0.1, 0.1, 0.3, 0.3])
    assert grid[0, 5, 7] == 1 and grid[5, 5, 7] == 0.0


def test_encode_label_grid_np_last_write_wins():
    Sx, Sy = 4, 4
    labels = np.array(
        [[1.0, 0.4, 0.4, 0.6, 0.6], [3.0, 0.45, 0.45, 0.55, 0.55]], np.float32
    )
    grid = encode_label_grid_np(labels, Sx, Sy)
    assert grid[5, 2, 2] == 3.0  # later label overwrote earlier one


def test_encode_label_grid_jnp_matches_np():
    rng = np.random.default_rng(2)
    Sx, Sy = 12, 9
    n = 20
    cx = rng.uniform(0.05, 0.95, n)
    cy = rng.uniform(0.05, 0.95, n)
    w = rng.uniform(0.01, 0.08, n)
    h = rng.uniform(0.01, 0.08, n)
    cls = rng.integers(0, 4, n).astype(np.float32)
    labels = np.stack(
        [cls, cx - w / 2, cy - h / 2, cx + w / 2, cy + h / 2], axis=1
    ).astype(np.float32)
    # keep only labels whose cells are unique so write order can't matter
    ii = ((labels[:, 1] + labels[:, 3]) * Sx // 2).astype(int)
    jj = ((labels[:, 2] + labels[:, 4]) * Sy // 2).astype(int)
    _, first_idx = np.unique(jj * Sx + ii, return_index=True)
    labels = labels[sorted(first_idx)]
    got = np.asarray(encode_label_grid(jnp.asarray(labels), Sx, Sy))
    want = encode_label_grid_np(labels, Sx, Sy)
    np.testing.assert_allclose(got, want, atol=1e-6)


def test_encode_label_grid_jnp_padding_rows_dropped():
    Sx, Sy = 4, 4
    labels = jnp.array(
        [[1.0, 0.4, 0.4, 0.6, 0.6], [-1.0, 0.0, 0.0, 0.0, 0.0]], jnp.float32
    )
    grid = np.asarray(encode_label_grid(labels, Sx, Sy))
    assert grid[0].sum() == 1
    assert grid[0, 0, 0] == 0  # padding row did not scatter to cell (0,0)


def test_cell_offsets():
    cxs, cys = cell_offsets(4, 2)
    assert cxs.shape == (2, 4) and cys.shape == (2, 4)
    np.testing.assert_allclose(cxs[0], [0.0, 0.25, 0.5, 0.75])
    np.testing.assert_allclose(cys[:, 0], [0.0, 0.5])


@pytest.mark.skipif(
    not pytest.importorskip("importlib.util").find_spec("torch"),
    reason="torch unavailable",
)
def test_ciou_matches_torch_reimplementation():
    """Cross-check our CIoU against an independent torch implementation of the
    published torchvision formula (torchvision itself is not installed)."""
    import torch

    from tests.data_fixtures import torch_ciou_oracle as torch_ciou

    rng = np.random.default_rng(3)
    n = 64
    cx, cy = rng.uniform(0.2, 0.8, (2, n))
    w, h = rng.uniform(0.05, 0.3, (2, n))
    pred = np.stack([cx - w / 2, cy - h / 2, cx + w / 2, cy + h / 2], -1)
    cx2, cy2 = rng.uniform(0.2, 0.8, (2, n))
    w2, h2 = rng.uniform(0.05, 0.3, (2, n))
    tgt = np.stack([cx2 - w2 / 2, cy2 - h2 / 2, cx2 + w2 / 2, cy2 + h2 / 2], -1)

    ours = np.asarray(
        complete_box_iou_loss(
            jnp.asarray(pred, jnp.float32), jnp.asarray(tgt, jnp.float32)
        )
    )
    theirs = torch_ciou(
        torch.tensor(pred, dtype=torch.float32), torch.tensor(tgt, dtype=torch.float32)
    ).numpy()
    np.testing.assert_allclose(ours, theirs, rtol=1e-4, atol=1e-6)


def test_encode_label_grid_drops_out_of_range_centers():
    """A box whose center lands outside [0,1) (legal YOLO txt at the image
    edge) must be DROPPED by both encoders: the reference python loop raises
    IndexError on it, and an unguarded device scatter would silently wrap it
    into a cell on the opposite edge of the grid."""
    Sx, Sy = 8, 6
    labels = np.array(
        [
            [1.0, 0.95, 0.4, 1.05, 0.6],  # center x == 1.0 -> column Sx
            [2.0, -0.10, 0.4, 0.05, 0.6],  # center x < 0 -> wraps negative
            [0.0, 0.40, 0.4, 0.60, 0.6],  # in range -> kept
        ],
        np.float32,
    )
    dev = np.asarray(encode_label_grid(jnp.asarray(labels), Sx, Sy))
    host = encode_label_grid_np(labels, Sx, Sy)
    np.testing.assert_array_equal(dev, host)
    assert dev[0].sum() == 1.0  # only the in-range box survives
    assert dev[5, 3, 4] == 0.0 and dev[0, 3, 4] == 1.0  # center (0.5, 0.5)
    assert dev[0, :, 0].sum() == 0.0  # nothing wrapped into column 0


def test_encode_label_grid_np_drops_padding_rows():
    """The numpy twin accepts the same padded (class < 0) layout as the
    device encoder instead of writing a phantom class -1 object at (0,0)."""
    Sx, Sy = 8, 6
    labels = np.array(
        [
            [0.0, 0.40, 0.4, 0.60, 0.6],
            [-1.0, 0.0, 0.0, 0.0, 0.0],  # padding row
        ],
        np.float32,
    )
    host = encode_label_grid_np(labels, Sx, Sy)
    dev = np.asarray(encode_label_grid(jnp.asarray(labels), Sx, Sy))
    np.testing.assert_array_equal(dev, host)
    assert host[0].sum() == 1.0
    assert host[0, 0, 0] == 0.0  # no phantom object at (0,0)
