import jax.numpy as jnp
import numpy as np
import pytest

from yogo_tpu.ops.nms import batched_nms, nms_fixed, nms_numpy
from yogo_tpu.ops.postprocess import (
    count_cells_for_formatted_preds,
    count_class_predictions,
    format_preds,
    format_preds_batched,
    format_to_numpy,
)


# ---------------------------------------------------------------- NMS kernel
def random_boxes(rng, n, scale=1.0):
    cx, cy = rng.uniform(0.2, 0.8, (2, n))
    w, h = rng.uniform(0.02, 0.3, (2, n)) * scale
    return np.stack([cx - w / 2, cy - h / 2, cx + w / 2, cy + h / 2], -1).astype(
        np.float32
    )


@pytest.mark.parametrize("seed", [0, 1, 2, 3])
def test_nms_fixed_matches_host_oracle(seed):
    rng = np.random.default_rng(seed)
    n = 64
    boxes = random_boxes(rng, n, scale=3.0)  # big boxes -> many overlaps
    scores = rng.uniform(0.1, 1.0, n).astype(np.float32)
    keep_ref = set(nms_numpy(boxes, scores, 0.5).tolist())
    keep_dev = np.asarray(
        nms_fixed(jnp.asarray(boxes), jnp.asarray(scores), jnp.ones(n, bool), 0.5)
    )
    assert set(np.nonzero(keep_dev)[0].tolist()) == keep_ref


def test_nms_fixed_respects_padding():
    rng = np.random.default_rng(5)
    boxes = random_boxes(rng, 16, scale=3.0)
    scores = rng.uniform(0.1, 1.0, 16).astype(np.float32)
    valid = np.zeros(16, bool)
    valid[:9] = True
    keep = np.asarray(
        nms_fixed(jnp.asarray(boxes), jnp.asarray(scores), jnp.asarray(valid), 0.5)
    )
    assert not keep[9:].any()
    keep_ref = set(nms_numpy(boxes[:9], scores[:9], 0.5).tolist())
    assert set(np.nonzero(keep[:9])[0].tolist()) == keep_ref


def test_batched_nms_agrees_per_image():
    rng = np.random.default_rng(7)
    b, n = 4, 48
    boxes = np.stack([random_boxes(rng, n, 2.0) for _ in range(b)])
    scores = rng.uniform(0.1, 1, (b, n)).astype(np.float32)
    keep = np.asarray(
        batched_nms(jnp.asarray(boxes), jnp.asarray(scores), jnp.ones((b, n), bool), 0.4)
    )
    for i in range(b):
        ref = set(nms_numpy(boxes[i], scores[i], 0.4).tolist())
        assert set(np.nonzero(keep[i])[0].tolist()) == ref


def test_nms_suppression_chain():
    """a suppresses b, b would suppress c, but b is gone -> c survives."""
    boxes = np.array(
        [
            [0.0, 0.0, 1.0, 1.0],
            [0.05, 0.05, 1.05, 1.05],  # overlaps a heavily
            [0.55, 0.55, 1.55, 1.55],  # overlaps b heavily, a only slightly
        ],
        np.float32,
    )
    scores = np.array([0.9, 0.8, 0.7], np.float32)
    keep = np.asarray(
        nms_fixed(jnp.asarray(boxes), jnp.asarray(scores), jnp.ones(3, bool), 0.5)
    )
    np.testing.assert_array_equal(keep, [True, False, True])
    np.testing.assert_array_equal(
        sorted(nms_numpy(boxes, scores, 0.5).tolist()), [0, 2]
    )


# --------------------------------------------------- format_preds (host path)
# Vectors equivalent to the reference's unit tests
# (reference: tests/test_utils_tensor_formatting.py:8-68)
def _grid(pred_dim=12, s=4):
    return np.zeros((pred_dim, s, s), np.float32)


def test_format_preds_empty():
    out = format_preds(_grid())
    assert out.shape == (0, 12)


def test_format_preds_objectness_filter():
    g = _grid()
    g[4, 0, 0] = 1.0
    g[5, :, :] = 1.0
    out = format_preds(g)
    assert out.shape == (1, 12)
    np.testing.assert_allclose(out[0], g[:, 0, 0])


def test_format_preds_cxcywh_passthrough():
    g = _grid()
    g[5, :, :] = 1.0
    g[4, 1, 1] = 1.0
    g[0, 1, 1], g[1, 1, 1], g[2, 1, 1], g[3, 1, 1] = 0.5, 0.5, 0.1, 0.1
    out = format_preds(g)
    np.testing.assert_allclose(out[0], g[:, 1, 1])


def test_format_preds_xyxy_conversion():
    g = _grid()
    g[5, :, :] = 1.0
    g[4, 1, 1] = 1.0
    g[0, 1, 1], g[1, 1, 1], g[2, 1, 1], g[3, 1, 1] = 0.5, 0.5, 0.1, 0.1
    out = format_preds(g, box_format="xyxy")
    np.testing.assert_allclose(out[0, :4], [0.45, 0.45, 0.55, 0.55], atol=1e-6)


def test_format_preds_rejects_batched():
    with pytest.raises(ValueError):
        format_preds(np.zeros((1, 12, 4, 4), np.float32))
    with pytest.raises(ValueError):
        format_preds(_grid(), box_format="bad")  # type: ignore[arg-type]


def test_format_preds_min_class_confidence():
    g = _grid()
    g[4, 0, 0] = 0.9
    g[5:, 0, 0] = 1 / 7
    g[4, 2, 2] = 0.9
    g[5, 2, 2] = 0.95
    out = format_preds(g, min_class_confidence_threshold=0.5)
    assert out.shape == (1, 12)
    assert out[0, 5] == pytest.approx(0.95)


# ------------------------------------------------- device-path equivalences
def make_fake_preds(rng, b=2, c=4, sy=6, sx=8, frac=0.3):
    pred = rng.uniform(0, 1, (b, 5 + c, sy, sx)).astype(np.float32)
    pred[:, 4] = (rng.uniform(0, 1, (b, sy, sx)) < frac) * rng.uniform(
        0.55, 1.0, (b, sy, sx)
    )
    pred[:, 2:4] *= 0.2  # reasonable w/h
    return pred


def test_format_preds_batched_matches_host():
    rng = np.random.default_rng(11)
    preds = make_fake_preds(rng)
    out = {
        k: np.asarray(v)
        for k, v in format_preds_batched(
            jnp.asarray(preds), max_detections=48
        ).items()
    }
    for i in range(preds.shape[0]):
        host = format_preds(preds[i])  # cxcywh
        nvalid = out["valid"][i].sum()
        assert nvalid == len(host)
        dev_boxes = out["boxes_cxcywh"][i][out["valid"][i]]
        # same set of boxes (device is objectness-sorted, host is cell-order)
        host_sorted = host[np.argsort(-host[:, 4], kind="stable")]
        np.testing.assert_allclose(dev_boxes, host_sorted[:, :4], atol=1e-6)


def test_count_class_predictions_matches_host():
    rng = np.random.default_rng(13)
    preds = make_fake_preds(rng, b=3)
    dev_counts = np.asarray(
        count_class_predictions(jnp.asarray(preds), max_detections=48)
    )
    host_counts = np.zeros(4, np.int64)
    for i in range(preds.shape[0]):
        f = format_preds(preds[i])
        if len(f):
            host_counts += count_cells_for_formatted_preds(f[:, 5:])
    np.testing.assert_array_equal(dev_counts, host_counts)


# -------------------------------------------------- counting (host), parity
# with reference tests/test_count_predictions.py:7-42
def test_count_simple():
    inp = np.zeros((3, 5))
    inp[:, 0] = 1
    np.testing.assert_array_equal(
        count_cells_for_formatted_preds(inp), [3, 0, 0, 0, 0]
    )


def test_count_float():
    row = np.array([0.1, 0.2, 0.3, 0.4])
    inp = np.stack([row] * 3)
    np.testing.assert_array_equal(count_cells_for_formatted_preds(inp), [0, 0, 0, 3])


def test_count_threshold_filters_all():
    inp = np.tile([0.2, 0.4, 0.2, 0.2], (3, 1))
    np.testing.assert_array_equal(
        count_cells_for_formatted_preds(inp, min_confidence_threshold=0.6),
        [0, 0, 0, 0],
    )


def test_count_threshold_partial():
    inp = np.array(
        [[0.2, 0.7, 0.2, 0.2], [0.2, 0.4, 0.2, 0.2], [0.2, 0.4, 0.9, 0.2]]
    )
    np.testing.assert_array_equal(
        count_cells_for_formatted_preds(inp, min_confidence_threshold=0.6),
        [0, 1, 1, 0],
    )


# ------------------------------------------------------------ npy schema
def test_format_to_numpy_schema():
    rng = np.random.default_rng(17)
    pred = make_fake_preds(rng, b=1, c=7)[0]
    arr = format_to_numpy(3, pred, img_h=772, img_w=1032)
    assert arr.shape[0] == 8 + 7
    assert (arr[0] == 3).all()
    n = arr.shape[1]
    f = format_preds(pred, box_format="xyxy")
    assert n == len(f)
    if n:
        np.testing.assert_allclose(arr[1], f[:, 0] * 1032, rtol=1e-5)
        np.testing.assert_allclose(arr[4], f[:, 3] * 772, rtol=1e-5)
        # peak prob == class probs at argmax row
        labels = arr[6].astype(int)
        np.testing.assert_allclose(arr[7], arr[8 + labels, np.arange(n)])


# ------------------------------------------------- image_mask (padded batches)
def _batch_preds(rng, b=4, c=7, s=6):
    """Random decoded-style prediction batch with plausible ranges."""
    preds = rng.uniform(0.0, 1.0, (b, 5 + c, s, s)).astype(np.float32)
    preds[:, 2:4] *= 0.1  # small w/h
    return preds


def test_count_class_predictions_image_mask_equals_slice():
    """Masking padded tail images must give the same counts as slicing them
    off, without changing the compiled batch shape."""
    rng = np.random.default_rng(11)
    preds = _batch_preds(rng, b=6)
    real = 4
    mask = np.arange(6) < real
    counted_mask = np.asarray(
        count_class_predictions(jnp.asarray(preds), image_mask=jnp.asarray(mask))
    )
    counted_slice = np.asarray(
        count_class_predictions(jnp.asarray(preds[:real]))
    )
    np.testing.assert_array_equal(counted_mask, counted_slice)


def test_count_class_predictions_mask_no_recompile():
    """Different `real` tail sizes at the same batch shape must reuse one
    compiled executable (the round-1 [:real] slice recompiled per tail)."""
    rng = np.random.default_rng(12)
    preds = jnp.asarray(_batch_preds(rng, b=6))
    count_class_predictions(preds, image_mask=jnp.arange(6) < 3)
    misses_before = count_class_predictions._cache_size()
    for real in (1, 2, 4, 5, 6):
        count_class_predictions(preds, image_mask=jnp.arange(6) < real)
    assert count_class_predictions._cache_size() == misses_before


def test_format_preds_batched_image_mask_invalidates_padding():
    rng = np.random.default_rng(13)
    preds = _batch_preds(rng, b=4)
    mask = np.array([True, True, False, False])
    f = format_preds_batched(jnp.asarray(preds), image_mask=jnp.asarray(mask))
    valid = np.asarray(f["valid"])
    assert not valid[2:].any()


def test_nms_numpy_huge_boxes_no_overflow():
    """Untrained models can emit exp-huge box extents; the host oracle must
    not overflow f32 (inf-inf -> NaN would silently become IoU 0)."""
    big = np.float64(1e30)
    boxes = np.array(
        [[0, 0, big, big], [0, 0, big, big], [0, 0, 1, 1]], np.float32
    )
    scores = np.array([0.9, 0.8, 0.7], np.float32)
    import warnings as _w

    with _w.catch_warnings():
        _w.simplefilter("error", RuntimeWarning)
        keep = nms_numpy(boxes, scores, 0.5)
    # the two identical huge boxes suppress to one; the small box survives
    assert sorted(keep.tolist()) == [0, 2]


# --------------------------- PredictionLabelMatch / format_preds_and_labels_v2
from yogo_tpu.ops.postprocess import (  # noqa: E402
    PredictionLabelMatch,
    format_preds_and_labels_v2,
    match_preds_and_labels,
)


def _pred_row(box, obj, probs):
    return np.array([*box, obj, *probs], np.float32)


def _label_row(box, cls):
    return np.array([1.0, *box, cls], np.float32)


def test_match_preds_and_labels_hungarian():
    """Two preds, three labels: IoU-optimal assignment, one missed label."""
    preds = np.stack([
        _pred_row([0.1, 0.1, 0.3, 0.3], 0.9, [0.8, 0.2]),
        _pred_row([0.6, 0.6, 0.8, 0.8], 0.7, [0.1, 0.9]),
    ])
    labels = np.stack([
        _label_row([0.12, 0.12, 0.32, 0.32], 0),
        _label_row([0.61, 0.61, 0.81, 0.81], 1),
        _label_row([0.4, 0.4, 0.5, 0.5], 1),  # no pred overlaps -> missed
    ])
    m = match_preds_and_labels(preds, labels)
    assert m.preds.shape == (2, 7) and m.labels.shape == (2, 6)
    # assignment pairs each pred with its overlapping label
    order = np.argsort(m.labels[:, 5])
    np.testing.assert_allclose(m.preds[order][0][:4], preds[0][:4])
    np.testing.assert_allclose(m.preds[order][1][:4], preds[1][:4])
    assert m.missed_labels is not None and len(m.missed_labels) == 1
    assert m.missed_labels[0, 5] == 1
    assert m.extra_predictions is None


def test_match_preds_and_labels_extra():
    preds = np.stack([
        _pred_row([0.1, 0.1, 0.3, 0.3], 0.9, [0.8, 0.2]),
        _pred_row([0.6, 0.6, 0.8, 0.8], 0.7, [0.1, 0.9]),
    ])
    labels = _label_row([0.12, 0.12, 0.32, 0.32], 0)[None]
    m = match_preds_and_labels(preds, labels)
    assert len(m.preds) == 1
    assert m.extra_predictions is not None and len(m.extra_predictions) == 1
    np.testing.assert_allclose(m.extra_predictions[0][:4], preds[1][:4])
    assert m.missed_labels is None


def test_prediction_label_match_concat():
    a = match_preds_and_labels(
        _pred_row([0.1, 0.1, 0.3, 0.3], 0.9, [0.8, 0.2])[None],
        _label_row([0.1, 0.1, 0.3, 0.3], 0)[None],
    )
    b = match_preds_and_labels(
        np.zeros((0, 7), np.float32),
        _label_row([0.5, 0.5, 0.6, 0.6], 1)[None],
    )
    cat = PredictionLabelMatch.concat([a, b])
    assert cat.preds.shape == (1, 7)
    assert cat.labels.shape == (1, 6)
    assert cat.missed_labels is not None and len(cat.missed_labels) == 1
    assert cat.extra_predictions is None


def test_convert_background_errors_semantics():
    """Reference semantics (yogo/utils/prediction_formatting.py:206-251):
    missed label -> (synthetic bg-onehot pred, original label); extra pred ->
    (pred with 0 bg prob, bg label); matched preds gain a zero bg column."""
    matched_pred = _pred_row([0.1, 0.1, 0.3, 0.3], 0.9, [0.8, 0.2])
    m = PredictionLabelMatch(
        preds=matched_pred[None],
        labels=_label_row([0.1, 0.1, 0.3, 0.3], 0)[None],
        missed_labels=_label_row([0.5, 0.5, 0.6, 0.6], 1)[None],
        extra_predictions=_pred_row([0.7, 0.7, 0.9, 0.9], 0.6, [0.3, 0.7])[None],
    )
    out = m.convert_background_errors(3)  # 2 real classes + background
    assert out.missed_labels is None and out.extra_predictions is None
    assert out.preds.shape == (3, 8)  # 4 box + obj + 3 class probs
    assert out.labels.shape == (3, 6)
    # matched row: zero bg prob appended
    np.testing.assert_allclose(out.preds[0], [*matched_pred, 0.0])
    # missed row: bg onehot pred with objectness 1, label preserved
    np.testing.assert_allclose(out.preds[1], [0.5, 0.5, 0.6, 0.6, 1, 0, 0, 1])
    np.testing.assert_allclose(out.labels[1], [1, 0.5, 0.5, 0.6, 0.6, 1])
    # extra row: original probs + 0 bg, label class = background (2)
    np.testing.assert_allclose(out.preds[2], [0.7, 0.7, 0.9, 0.9, 0.6, 0.3, 0.7, 0])
    np.testing.assert_allclose(out.labels[2], [1, 0.7, 0.7, 0.9, 0.9, 2])


def test_convert_background_errors_rejects_bad_num_classes():
    m = PredictionLabelMatch(
        preds=np.zeros((1, 7), np.float32),
        labels=np.zeros((1, 6), np.float32),
        missed_labels=None,
        extra_predictions=None,
    )
    with pytest.raises(ValueError, match="background"):
        m.convert_background_errors(2)  # preds have C=2, need 3


def test_format_preds_and_labels_v2_end_to_end():
    """Build a (5+C, Sy, Sx) grid with one confident cell matching one label
    cell and one labeled-but-unpredicted cell."""
    c, s = 2, 4
    pred = np.zeros((5 + c, s, s), np.float32)
    # one detection at cell (1,1): cxcywh ~ (0.375, 0.375, 0.2, 0.2)
    pred[:, 1, 1] = [0.375, 0.375, 0.2, 0.2, 0.95, 0.9, 0.1]
    label = np.zeros((6, s, s), np.float32)
    label[:, 1, 1] = [1, 0.28, 0.28, 0.48, 0.48, 0]
    label[:, 3, 3] = [1, 0.8, 0.8, 0.9, 0.9, 1]  # missed
    m = format_preds_and_labels_v2(pred, label)
    assert len(m.preds) == 1 and len(m.labels) == 1
    assert m.labels[0, 5] == 0
    # preds are xyxy-formatted
    np.testing.assert_allclose(
        m.preds[0, :4], [0.275, 0.275, 0.475, 0.475], atol=1e-6)
    assert m.missed_labels is not None and m.missed_labels[0, 5] == 1
    assert m.extra_predictions is None


def test_format_preds_and_labels_v2_rejects_batched():
    with pytest.raises(ValueError, match="unbatched"):
        format_preds_and_labels_v2(
            np.zeros((2, 7, 4, 4), np.float32), np.zeros((2, 6, 4, 4), np.float32)
        )


def test_format_preds_and_labels_deprecated():
    """Reference-parity behavior of the deprecated cell/argmax matcher
    (reference: yogo/utils/prediction_formatting.py:333-424)."""
    import warnings as _w

    from yogo_tpu.ops.postprocess import format_preds_and_labels

    c, s = 2, 4
    pred = np.zeros((5 + c, s, s), np.float32)
    pred[:, 1, 1] = [0.375, 0.375, 0.2, 0.2, 0.95, 0.9, 0.1]
    pred[:, 3, 3] = [0.875, 0.875, 0.1, 0.1, 0.8, 0.2, 0.8]
    label = np.zeros((6, s, s), np.float32)
    label[:, 1, 1] = [1, 0.28, 0.28, 0.48, 0.48, 0]

    with _w.catch_warnings():
        _w.simplefilter("ignore", DeprecationWarning)
        preds, labels = format_preds_and_labels(pred, label)
    # one label -> argmax-IoU pred selected, boxes converted to xyxy
    assert preds.shape == (1, 7) and labels.shape == (1, 6)
    np.testing.assert_allclose(preds[0, :4], [0.275, 0.275, 0.475, 0.475],
                               atol=1e-6)

    # fallback: objectness threshold removes all preds -> same-cell matching
    with _w.catch_warnings():
        _w.simplefilter("ignore", DeprecationWarning)
        preds2, labels2 = format_preds_and_labels(pred, label,
                                                  objectness_thresh=0.99)
    assert preds2.shape == (1, 7)
    np.testing.assert_allclose(preds2[0, :4], [0.275, 0.275, 0.475, 0.475],
                               atol=1e-6)

    with pytest.raises(ValueError, match="objectness_thresh"):
        format_preds_and_labels(pred, label, objectness_thresh=1.5)


# ------------------------------------------- selection-first raw-head path
# (format_preds_batched_raw / count_class_predictions_raw must be
# indistinguishable from decode-everything + format_preds_batched)


def _small_model_and_raw(compute_dtype, hw=(64, 96), b=4, seed=0):
    import jax
    import jax.numpy as jnp

    from yogo_tpu.models.yogo import YOGO

    model = YOGO.create(
        hw, 0.1, 0.12, 3,
        model_version="quarter_filters", compute_dtype=compute_dtype,
    )
    variables = model.init(jax.random.key(seed))
    # bias objectness up so a healthy fraction of cells pass 0.5
    bias = np.asarray(variables["params"]["conv7"]["bias"]).copy()
    bias[4] = 0.5
    variables["params"]["conv7"]["bias"] = jnp.asarray(bias)
    x = np.random.default_rng(seed).integers(
        0, 256, (b, 1, *hw), np.uint8
    )
    raw = model.apply(variables, jnp.asarray(x), decode=False)
    decoded = model.apply(variables, jnp.asarray(x), inference=True)
    return model, np.asarray(raw), np.asarray(decoded)


@pytest.mark.parametrize("dtype_name", ["float32", "bfloat16"])
def test_raw_formatter_equals_decoded_formatter(dtype_name):
    import jax.numpy as jnp

    from yogo_tpu.ops.postprocess import format_preds_batched_raw

    model, raw, decoded = _small_model_and_raw(getattr(jnp, dtype_name))
    a = format_preds_batched(jnp.asarray(decoded), max_detections=64)
    b = format_preds_batched_raw(
        jnp.asarray(raw), model.anchor_w, model.anchor_h,
        max_detections=64,
    )
    np.testing.assert_array_equal(np.asarray(a["valid"]), np.asarray(b["valid"]))
    v = np.asarray(a["valid"])
    for key in ("boxes_cxcywh", "boxes_xyxy", "objectness", "class_probs"):
        np.testing.assert_allclose(
            np.asarray(a[key])[v], np.asarray(b[key])[v], rtol=2e-6, atol=2e-7,
            err_msg=key,
        )


def test_raw_count_equals_decoded_count_with_mask_and_resize():
    import jax
    import jax.numpy as jnp

    from yogo_tpu.models.yogo import YOGO
    from yogo_tpu.ops.postprocess import count_class_predictions_raw

    base = YOGO.create(
        (64, 96), 0.1, 0.12, 3,
        model_version="quarter_filters", compute_dtype=jnp.bfloat16,
    )
    model = base.resize(32, 64)  # non-unit width/height multipliers
    variables = model.init(jax.random.key(1))
    bias = np.asarray(variables["params"]["conv7"]["bias"]).copy()
    bias[4] = 0.5
    variables["params"]["conv7"]["bias"] = jnp.asarray(bias)
    x = jnp.asarray(
        np.random.default_rng(1).integers(0, 256, (4, 1, 32, 64), np.uint8)
    )
    mask = jnp.asarray([1.0, 1.0, 0.0, 1.0])
    decoded = model.apply(variables, x, inference=True)
    raw = model.apply(variables, x, decode=False)
    want = count_class_predictions(
        decoded, max_detections=32, image_mask=mask
    )
    got = count_class_predictions_raw(
        raw, model.anchor_w, model.anchor_h,
        width_multiplier=model.width_multiplier,
        height_multiplier=model.height_multiplier,
        max_detections=32, image_mask=mask,
    )
    np.testing.assert_array_equal(np.asarray(want), np.asarray(got))


def test_cell_offsets_bitmatch_arithmetic_form():
    """The raw path computes cell offsets as i/Sx; pin bit-equality with
    cell_offsets' linspace for every grid size the models can produce."""
    from yogo_tpu.ops.grid import cell_offsets

    for s in (1, 2, 3, 8, 12, 97, 129, 516, 1032, 4096):
        cxs, _ = cell_offsets(s, 1)
        arith = (np.arange(s, dtype=np.float32) / np.float32(s)).astype(
            np.float32
        )
        np.testing.assert_array_equal(cxs[0], arith)


@pytest.mark.parametrize("dtype_name", ["float32", "bfloat16"])
def test_select_top_candidates_raw_equals_decoded(dtype_name):
    import jax.numpy as jnp

    from yogo_tpu.ops.postprocess import (
        decode_raw_slice,
        select_top_candidates,
        select_top_candidates_raw,
    )

    model, raw, decoded = _small_model_and_raw(getattr(jnp, dtype_name))
    k = 16
    rows_a, idx_a = select_top_candidates(jnp.asarray(decoded), k)
    rows_b, idx_b = select_top_candidates_raw(
        jnp.asarray(raw), k, model.anchor_w, model.anchor_h,
        width_multiplier=model.width_multiplier,
        height_multiplier=model.height_multiplier,
    )
    np.testing.assert_array_equal(np.asarray(idx_a), np.asarray(idx_b))
    np.testing.assert_allclose(
        np.asarray(rows_a), np.asarray(rows_b), rtol=2e-6, atol=2e-7
    )
    # the fallback slice+decode reproduces the decoded full grid
    for i in (0, raw.shape[0] - 1):
        got = np.asarray(
            decode_raw_slice(
                jnp.asarray(raw), jnp.int32(i), model.anchor_w,
                model.anchor_h,
                width_multiplier=model.width_multiplier,
                height_multiplier=model.height_multiplier,
            )
        )
        np.testing.assert_allclose(
            got, decoded[i], rtol=2e-6, atol=2e-7
        )
