import jax
import jax.numpy as jnp
import numpy as np
import pytest

from yogo_tpu.losses import smoothed_cross_entropy, yogo_loss
from yogo_tpu.ops.grid import encode_label_grid_np


def make_batch(rng, b=2, c=4, sy=6, sx=8, n_obj=5):
    """Random decoded predictions + label grids."""
    preds = rng.normal(size=(b, 5 + c, sy, sx)).astype(np.float32)
    # make box channels look like decoded outputs: cx/cy in [0,1], w/h positive
    preds[:, 0] = rng.uniform(0, 1, (b, sy, sx))
    preds[:, 1] = rng.uniform(0, 1, (b, sy, sx))
    preds[:, 2] = rng.uniform(0.01, 0.2, (b, sy, sx))
    preds[:, 3] = rng.uniform(0.01, 0.2, (b, sy, sx))
    preds[:, 4] = rng.uniform(0, 1, (b, sy, sx))

    labels = np.zeros((b, 6, sy, sx), np.float32)
    for i in range(b):
        cx = rng.uniform(0.1, 0.9, n_obj)
        cy = rng.uniform(0.1, 0.9, n_obj)
        w = rng.uniform(0.03, 0.15, n_obj)
        h = rng.uniform(0.03, 0.15, n_obj)
        cls = rng.integers(0, c, n_obj).astype(np.float32)
        rows = np.stack([cls, cx - w / 2, cy - h / 2, cx + w / 2, cy + h / 2], 1)
        labels[i] = encode_label_grid_np(rows.astype(np.float32), sx, sy)
    return preds, labels


def test_loss_components_finite_and_positive():
    rng = np.random.default_rng(0)
    preds, labels = make_batch(rng)
    total, comps = yogo_loss(jnp.asarray(preds), jnp.asarray(labels))
    total = float(total)
    assert np.isfinite(total) and total > 0
    assert set(comps) == {"iou_loss", "objectness_loss", "classification_loss"}
    assert float(comps["iou_loss"]) > 0
    np.testing.assert_allclose(
        total, sum(float(v) for v in comps.values()), rtol=1e-6
    )


def test_no_objects_only_objectness_term():
    rng = np.random.default_rng(1)
    preds, labels = make_batch(rng)
    labels[:] = 0
    total, comps = yogo_loss(jnp.asarray(preds), jnp.asarray(labels))
    assert float(comps["iou_loss"]) == 0
    assert float(comps["classification_loss"]) == 0
    # objectness: all cells weighted no_obj_weight=0.5
    expected = 0.5 * (preds[:, 4] ** 2).sum() / preds.shape[0]
    np.testing.assert_allclose(float(comps["objectness_loss"]), expected, rtol=1e-5)


def test_gradients_finite_and_masked_cells_have_zero_box_grad():
    rng = np.random.default_rng(2)
    preds, labels = make_batch(rng, b=1, n_obj=3)

    def f(p):
        return yogo_loss(p, jnp.asarray(labels))[0]

    g = np.asarray(jax.grad(f)(jnp.asarray(preds)))
    assert np.isfinite(g).all()
    mask = labels[0, 0] > 0
    # box-channel grads vanish off the object cells
    assert np.abs(g[0, :4][:, ~mask]).max() == 0
    # class-logit grads vanish off the object cells
    assert np.abs(g[0, 5:][:, ~mask]).max() == 0
    # objectness grads exist everywhere
    assert (np.abs(g[0, 4]) > 0).all()


def test_loss_matches_reference_algorithm_in_torch():
    """Oracle: an independent torch implementation that follows the reference
    control flow exactly (masked gather -> drop degenerate -> CIoU sum;
    full-grid CE masked; weighted MSE) - validates our full-grid masked
    formulation against the gather-based one (reference: yogo/yogo_loss.py:38-129).
    """
    torch = pytest.importorskip("torch")

    rng = np.random.default_rng(3)
    preds, labels = make_batch(rng, b=3, c=5, sy=5, sx=7, n_obj=6)

    from tests.data_fixtures import torch_reference_yogo_loss

    want, want_comps = torch_reference_yogo_loss(
        torch.tensor(preds), torch.tensor(labels)
    )
    iou_loss = want_comps["iou_loss"]
    cls_loss = want_comps["classification_loss"]
    obj_loss = want_comps["objectness_loss"]
    want_total = float(want)

    total, comps = yogo_loss(jnp.asarray(preds), jnp.asarray(labels))
    np.testing.assert_allclose(float(comps["iou_loss"]), float(iou_loss), rtol=1e-4)
    np.testing.assert_allclose(
        float(comps["classification_loss"]), float(cls_loss), rtol=1e-4
    )
    np.testing.assert_allclose(
        float(comps["objectness_loss"]), float(obj_loss), rtol=1e-4
    )
    np.testing.assert_allclose(float(total), want_total, rtol=1e-4)


def test_smoothed_ce_matches_torch():
    torch = pytest.importorskip("torch")
    rng = np.random.default_rng(4)
    logits = rng.normal(size=(32, 6)).astype(np.float32)
    targets = rng.integers(0, 6, 32)
    ours = np.asarray(
        smoothed_cross_entropy(
            jnp.asarray(logits), jnp.asarray(targets), 0.01
        )
    )
    theirs = (
        torch.nn.CrossEntropyLoss(reduction="none", label_smoothing=0.01)(
            torch.tensor(logits), torch.tensor(targets)
        ).numpy()
    )
    np.testing.assert_allclose(ours, theirs, rtol=1e-4, atol=1e-5)


def test_loss_weights_scale_components():
    rng = np.random.default_rng(5)
    preds, labels = make_batch(rng)
    _, c1 = yogo_loss(jnp.asarray(preds), jnp.asarray(labels), iou_weight=5.0)
    _, c2 = yogo_loss(jnp.asarray(preds), jnp.asarray(labels), iou_weight=10.0)
    np.testing.assert_allclose(
        2 * float(c1["iou_loss"]), float(c2["iou_loss"]), rtol=1e-5
    )
