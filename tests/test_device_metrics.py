"""DeviceMetrics (jitted on-device accumulation) vs the host Metrics engine.

Parity strategy: on scenes where the matching is unambiguous (each
detection overlaps at most one label and vice versa), greedy max-IoU
matching equals Hungarian, so every accumulator must agree EXACTLY -
including mAP, because the test scores are placed on the 1/4096 score-bin
grid (distinct bins -> the binned PR walk equals the host's per-detection
sort) and class probabilities on the 1/512 grid (never between the f32 and
f64 renderings of a ROC threshold t/499, since gcd(499, 512) = 1).
"""

import numpy as np
import pytest

from yogo_tpu.metrics import DeviceMetrics, Metrics
from yogo_tpu.ops.grid import encode_label_grid_np

CLASSES = ["a", "b", "c"]
SY, SX = 12, 16


def assert_tuple_equal(host, dev, map_atol=0.0):
    """Compare the 10-tuples from Metrics.compute / DeviceMetrics.compute."""
    h_map, d_map = host[0], dev[0]
    assert set(h_map) == set(d_map)
    for k in h_map:
        np.testing.assert_allclose(
            np.asarray(h_map[k], np.float64),
            np.asarray(d_map[k], np.float64),
            atol=map_atol,
            err_msg=f"mAP[{k}]",
        )
    for name, i in (("confusion", 1), ("accuracy", 2), ("precision", 4),
                    ("recall", 5), ("missed", 7), ("extra", 8), ("total", 9)):
        np.testing.assert_array_equal(
            np.asarray(host[i], np.float64),
            np.asarray(dev[i], np.float64),
            err_msg=name,
        )
    for j, name in enumerate(("fpr", "tpr", "thresholds")):
        np.testing.assert_allclose(
            host[3][j], dev[3][j], atol=1e-12, err_msg=f"roc {name}"
        )
    assert abs(host[6] - dev[6]) < 1e-9, "ece"


def make_scene(rng, n_classes=3, p_missed=0.2, p_extra=0.2, p_wrong=0.25,
               p_loose=0.2, score_iter=None):
    """One image: well-separated boxes so matching is unambiguous.

    Cells come from a stride-2 subgrid (boxes never overlap a neighbour's),
    scores on the 1/4096 grid, probabilities on the 1/512 grid.

    NOTE for exact-parity scenes: pass p_missed=0 or p_extra=0. When an
    image has BOTH a missed label and an extra detection, the assignment
    must still reach cardinality min(M, N), so a zero-IoU (det, gt) pair is
    formed - and WHICH pair is arbitrary (all completions cost the same):
    scipy picks one by algorithm internals, the device engine pairs in
    index order. That divergence is inherent to the reference's Hungarian
    semantics, not a device-engine defect (see
    test_ambiguous_overlap_invariants for the mixed case).
    Returns (pred_grid (5+C, SY, SX), label_grid (6, SY, SX)).
    """
    sub = [(j, i) for j in range(1, SY - 1, 2) for i in range(1, SX - 1, 2)]
    n = rng.integers(4, min(14, len(sub)))
    cells = [sub[k] for k in rng.choice(len(sub), n, replace=False)]
    if score_iter is not None:
        # globally-unique scores: two same-class detections with EQUAL
        # scores order stably per-detection on the host but aggregate
        # jointly in the device engine's score bins (binned-mode tie
        # semantics) - a real, documented divergence the exactness fuzz
        # must not trip over
        score_bins = [next(score_iter) for _ in range(n)]
    else:
        score_bins = rng.choice(np.arange(2100, 4090), n, replace=False)

    pred = np.zeros((5 + n_classes, SY, SX), np.float32)
    label_rows = []
    w = 1.2 / SX
    h = 1.2 / SY
    for (j, i), sbin in zip(cells, score_bins):
        cx = (i + 0.5) / SX
        cy = (j + 0.5) / SY
        cls = int(rng.integers(0, n_classes))
        kind = rng.random()
        has_label = kind > p_extra  # else: prediction with no label
        if has_label:
            label_rows.append(
                (cls, cx - w / 2, cy - h / 2, cx + w / 2, cy + h / 2)
            )
            if kind < p_extra + p_missed:
                continue  # label with no prediction
        # prediction in this cell
        pcls = cls
        if rng.random() < p_wrong:
            pcls = int((cls + 1) % n_classes)
        if has_label and rng.random() < p_loose:
            # low-IoU prediction: shifted so IoU ~ 0.09, far from every
            # COCO threshold (>= 0.5) so f32-vs-f64 IoU rounding can't
            # flip a TP/FP decision, and NOT overlapping any neighbouring
            # stride-2 cell's box (0.6 * w < spacing - w)
            bx, by = cx + w * 0.6, cy + h * 0.6
        else:
            bx, by = cx, cy
        pred[:4, j, i] = [bx, by, w, h]
        pred[4, j, i] = sbin / 4096.0
        # probs on the 1/512 grid, max > 0.9 (the eval confidence filter)
        pmax = int(rng.integers(467, 510))  # 0.912..0.996
        rest = (512 - pmax) // (n_classes - 1)
        probs = np.full(n_classes, rest / 512.0, np.float32)
        probs[pcls] = pmax / 512.0
        pred[5:, j, i] = probs
    label = (
        encode_label_grid_np(np.asarray(label_rows, np.float32), SX, SY)
        if label_rows
        else np.zeros((6, SY, SX), np.float32)
    )
    return pred, label


@pytest.mark.parametrize("include_background", [True, False])
@pytest.mark.parametrize("seed", [0, 1, 2, 3, 4])
def test_randomized_scene_parity(include_background, seed):
    rng = np.random.default_rng(seed)
    host = Metrics(CLASSES, include_background=include_background)
    dev = DeviceMetrics(CLASSES, include_background=include_background)
    scores = iter(rng.permutation(np.arange(2100, 4090)))
    for _ in range(3):  # multi-update accumulation
        # missed XOR extra per image (see make_scene docstring)
        batch = [
            make_scene(rng, p_missed=0.3, p_extra=0.0, score_iter=scores)
            if k % 2
            else make_scene(rng, p_missed=0.0, p_extra=0.3, score_iter=scores)
            for k in range(3)
        ]
        preds = np.stack([p for p, _ in batch])
        labels = np.stack([l for _, l in batch])
        host.update(preds, labels)
        dev.update(preds, labels)
    assert_tuple_equal(host.compute(), dev.compute())


def test_padded_image_mask_parity():
    rng = np.random.default_rng(7)
    scores = iter(rng.permutation(np.arange(2100, 4090)))
    batch = [
        make_scene(rng, p_missed=0.3 * (k % 2), p_extra=0.3 * (1 - k % 2),
                   score_iter=scores)
        for k in range(4)
    ]
    preds = np.stack([p for p, _ in batch])
    labels = np.stack([l for _, l in batch])
    mask = np.array([1.0, 1.0, 0.0, 0.0], np.float32)
    host = Metrics(CLASSES)
    dev = DeviceMetrics(CLASSES)
    host.update(preds, labels, image_mask=mask)
    dev.update(preds, labels, image_mask=mask)
    h, d = host.compute(), dev.compute()
    assert_tuple_equal(h, d)
    # and the padded rows really were excluded
    host2 = Metrics(CLASSES)
    host2.update(preds[:2], labels[:2])
    assert_tuple_equal(host2.compute(), d)


def test_empty_scene_parity():
    preds = np.zeros((2, 5 + 3, SY, SX), np.float32)
    labels = np.zeros((2, 6, SY, SX), np.float32)
    host = Metrics(CLASSES)
    dev = DeviceMetrics(CLASSES)
    host.update(preds, labels)
    dev.update(preds, labels)
    assert_tuple_equal(host.compute(), dev.compute())


def test_include_map_false():
    rng = np.random.default_rng(11)
    pred, label = make_scene(rng)
    dev = DeviceMetrics(CLASSES, include_mAP=False)
    dev.update(pred[None], label[None])
    res = dev.compute()
    assert res[0] == {"map": 0.0}
    assert "map_tp" not in dev._state


def test_label_capacity_overflow_warns():
    rng = np.random.default_rng(3)
    pred, label = make_scene(rng)
    n_obj = int(label[0].sum())
    assert n_obj > 2
    dev = DeviceMetrics(CLASSES, max_labels=2)
    dev.update(pred[None], label[None])
    with pytest.warns(UserWarning, match="capacity overflow"):
        dev.compute()


def test_ambiguous_overlap_invariants():
    """Overlapping detections competing for overlapping labels: greedy may
    pick different pairs than Hungarian, but the structural counts must
    still agree (cardinality of a rectangular assignment is min(M, N))."""
    pred = np.zeros((5 + 3, SY, SX), np.float32)
    # two labels nearly on top of each other, two detections straddling both
    label_rows = [(0, 0.30, 0.30, 0.50, 0.50), (1, 0.32, 0.32, 0.52, 0.52)]
    label = encode_label_grid_np(np.asarray(label_rows, np.float32), SX, SY)
    # det-det IoU ~0.22 (survives NMS at 0.5); each det overlaps BOTH labels
    for (cx, cy, sbin, cls) in (
        (0.38, 0.38, 3000, 0),
        (0.46, 0.46, 2800, 1),
    ):
        i, j = int(cx * SX), int(cy * SY)
        pred[:4, j, i] = [cx, cy, 0.2, 0.2]
        pred[4, j, i] = sbin / 4096.0
        probs = np.full(3, 10 / 512.0, np.float32)
        probs[cls] = 492 / 512.0
        pred[5:, j, i] = probs
    host = Metrics(CLASSES)
    dev = DeviceMetrics(CLASSES)
    host.update(pred[None], label[None])
    dev.update(pred[None], label[None])
    h, d = host.compute(), dev.compute()
    # same matched cardinality and same total row mass per engine
    assert int(h[9][0]) == int(d[9][0])
    assert h[1].sum() == d[1].sum()
    assert h[7].sum() == d[7].sum() and h[8].sum() == d[8].sum()


def test_greedy_equals_hungarian_on_near_permutation():
    """The trained-model regime: each detection overlaps exactly its own
    label. Exercises the zero-IoU remainder pairing too (one extra
    detection + one missed label, far apart)."""
    pred = np.zeros((5 + 3, SY, SX), np.float32)
    label_rows = [
        (0, 0.10, 0.10, 0.20, 0.20),
        (1, 0.60, 0.60, 0.70, 0.70),
        (2, 0.10, 0.60, 0.20, 0.70),  # missed (no detection near it)
    ]
    label = encode_label_grid_np(np.asarray(label_rows, np.float32), SX, SY)
    for (cx, cy, sbin, cls) in (
        (0.15, 0.15, 3500, 0),
        (0.65, 0.65, 3400, 1),
        (0.65, 0.15, 3300, 2),  # extra (no label near it)
    ):
        i, j = int(cx * SX), int(cy * SY)
        pred[:4, j, i] = [cx, cy, 0.1, 0.1]
        pred[4, j, i] = sbin / 4096.0
        probs = np.full(3, 10 / 512.0, np.float32)
        probs[cls] = 492 / 512.0
        pred[5:, j, i] = probs
    for bg in (True, False):
        host = Metrics(CLASSES, include_background=bg)
        dev = DeviceMetrics(CLASSES, include_background=bg)
        host.update(pred[None], label[None])
        dev.update(pred[None], label[None])
        assert_tuple_equal(host.compute(), dev.compute())


def test_trainer_test_fast_eval_matches_host(tmp_path):
    """Trainer.test(fast_eval=True) end-to-end on synthetic batches."""
    import jax
    import jax.numpy as jnp

    from yogo_tpu.models.yogo import YOGO
    from yogo_tpu.train import Trainer
    from yogo_tpu.utils.default_hyperparams import DefaultHyperparams as df

    rng = np.random.default_rng(0)
    model = YOGO.create(
        (96, 128), df.ANCHOR_W, df.ANCHOR_H, num_classes=3,
        compute_dtype=jnp.float32,
    )
    variables = model.init(jax.random.key(0))
    Sx, Sy = model.grid
    imgs = rng.integers(0, 255, (4, 1, 96, 128)).astype(np.uint8)
    labels = np.zeros((4, 6, Sy, Sx), np.float32)
    labels[:, 0, 4, 5] = 1
    labels[:, 1:5, 4, 5] = [0.3, 0.3, 0.4, 0.4]
    mask = np.ones(4, np.float32)
    loader = [(imgs, labels, mask)]
    config = {
        "class_names": CLASSES,
        "iou_weight": 1.0,
        "no_obj_weight": 0.5,
        "label_smoothing": 1e-4,
        "half": False,
    }
    slow = Trainer.test(loader, config, model, variables, include_mAP=True)
    fast = Trainer.test(
        loader, config, model, variables, include_mAP=True, fast_eval=True
    )
    assert slow is not None and fast is not None
    # loss identical; structural metric counts identical (an untrained net
    # emits near-arbitrary boxes, so per-pair metrics may differ through
    # greedy-vs-Hungarian tie handling - compare the stable aggregates)
    assert abs(slow[0] - fast[0]) < 1e-6
    assert slow[2].sum() == fast[2].sum()  # confusion total mass
    assert int(slow[10][0]) == int(fast[10][0])


def test_mesh_sharded_update_matches_unsharded():
    """DeviceMetrics(mesh=...) SPMD update over 8 devices == single-device.

    The accumulators are integer scatter-adds (order-independent), so the
    sharded state must be BIT-identical; ece_conf (the lone f32 sum) may
    carry reduction-order noise, bounded by assert_tuple_equal's ece check.
    """
    from yogo_tpu.parallel.mesh import get_mesh, shard_batch

    mesh = get_mesh()
    rng = np.random.default_rng(11)
    scores = iter(rng.permutation(np.arange(2100, 4090)))
    batch = [
        make_scene(rng, p_missed=0.3 * (k % 2), p_extra=0.3 * (1 - k % 2),
                   score_iter=scores)
        for k in range(mesh.size)
    ]
    preds = np.stack([p for p, _ in batch])
    labels = np.stack([l for _, l in batch])
    mask = np.ones(mesh.size, np.float32)
    mask[-1] = 0.0  # a padded row, to prove masking survives sharding

    plain = DeviceMetrics(CLASSES)
    sharded = DeviceMetrics(CLASSES, mesh=mesh)
    preds_d, labels_d, mask_d = shard_batch(mesh, preds, labels, mask)
    plain.update(preds, labels, image_mask=mask)
    sharded.update(preds_d, labels_d, image_mask=mask_d)
    assert_tuple_equal(plain.compute(), sharded.compute())

    # raw integer states bit-match (scatter-adds commute exactly)
    for key, val in plain._state.items():
        if np.asarray(val).dtype == np.int32:
            np.testing.assert_array_equal(
                np.asarray(val), np.asarray(sharded._state[key]),
                err_msg=f"state[{key}]",
            )

    # the host engine agrees too on these unambiguous scenes
    host = Metrics(CLASSES)
    host.update(preds, labels, image_mask=mask)
    assert_tuple_equal(host.compute(), sharded.compute())


def test_ece_conf_survives_f32_saturation():
    """A plain f32 running sum stops absorbing ~1.0-sized confidences once
    a bin passes 2^24 (ulp >= 2); the (ece_conf, ece_conf_comp) Neumaier
    pair must keep absorbing them. Simulates a huge prior test set by
    pre-seeding the running sum at 2^25 (ulp = 4.0) and checks the next
    batch's confidence mass still lands exactly."""
    import jax.numpy as jnp

    rng = np.random.default_rng(7)
    pred, label = make_scene(rng)

    dev = DeviceMetrics(CLASSES)
    dev.update(pred[None], label[None])
    base = np.asarray(dev._state["ece_conf"], np.float64) + np.asarray(
        dev._state["ece_conf_comp"], np.float64
    )
    assert base.sum() > 0

    big = float(2**25)
    dev2 = DeviceMetrics(CLASSES)
    dev2._state["ece_conf"] = jnp.full_like(dev2._state["ece_conf"], big)
    dev2.update(pred[None], label[None])
    total = np.asarray(dev2._state["ece_conf"], np.float64) + np.asarray(
        dev2._state["ece_conf_comp"], np.float64
    )
    # without compensation every per-bin batch contribution < 4.0 would
    # round away entirely and total - big would be identically zero
    np.testing.assert_allclose(total - big, base, atol=1e-3)


def test_trainer_test_fast_eval_capacity_plumbing(monkeypatch):
    """Trainer.test threads fast_eval_max_detections/_labels into the
    DeviceMetrics engine (the CLI's --fast-eval-max-* flags end here)."""
    import jax
    import jax.numpy as jnp

    import yogo_tpu.train as train_mod
    from yogo_tpu.models.yogo import YOGO
    from yogo_tpu.train import Trainer
    from yogo_tpu.utils.default_hyperparams import DefaultHyperparams as df

    captured = {}
    real = train_mod.DeviceMetrics

    def spy(*args, **kwargs):
        captured.update(kwargs)
        return real(*args, **kwargs)

    monkeypatch.setattr(train_mod, "DeviceMetrics", spy)

    rng = np.random.default_rng(0)
    model = YOGO.create(
        (96, 128), df.ANCHOR_W, df.ANCHOR_H, num_classes=3,
        compute_dtype=jnp.float32,
    )
    variables = model.init(jax.random.key(0))
    Sx, Sy = model.grid
    imgs = rng.integers(0, 255, (4, 1, 96, 128)).astype(np.uint8)
    labels = np.zeros((4, 6, Sy, Sx), np.float32)
    labels[:, 0, 4, 5] = 1
    labels[:, 1:5, 4, 5] = [0.3, 0.3, 0.4, 0.4]
    mask = np.ones(4, np.float32)
    config = {
        "class_names": CLASSES,
        "iou_weight": 1.0,
        "no_obj_weight": 0.5,
        "label_smoothing": 1e-4,
        "half": False,
    }
    out = Trainer.test(
        [(imgs, labels, mask)], config, model, variables,
        include_mAP=False, fast_eval=True,
        fast_eval_max_detections=64, fast_eval_max_labels=48,
    )
    assert out is not None
    assert captured["max_detections"] == 64
    assert captured["max_labels"] == 48
