import numpy as np
import pytest
import yaml

from tests.data_fixtures import CLASSES, make_label_file, make_pair_dirs, write_defn
from yogo_tpu.utils.cluster_anchors import (
    best_anchor,
    centers_to_corners,
    corners_to_centers,
    gen_random_box,
    iou,
    k_means,
)
from yogo_tpu.utils.drawing import bbox_colour, draw_yogo_prediction, format_rects, iter_in_chunks


# ------------------------------------------------------------------ anchors
def test_center_corner_roundtrip():
    rng = np.random.default_rng(0)
    centers = np.stack(
        [
            rng.uniform(0.3, 0.7, 16),
            rng.uniform(0.3, 0.7, 16),
            rng.uniform(0.05, 0.2, 16),
            rng.uniform(0.05, 0.2, 16),
        ],
        axis=1,
    )
    back = corners_to_centers(centers_to_corners(centers))
    np.testing.assert_allclose(back, centers, atol=1e-12)


def test_anchor_iou_identity():
    b = gen_random_box(4)
    np.testing.assert_allclose(iou(b, b), 1.0)


def test_kmeans_converges_to_cluster_means():
    rng = np.random.default_rng(1)
    # two tight clusters of box sizes
    small = np.stack(
        [np.full(50, 0.3), np.full(50, 0.4), np.full(50, 0.3), np.full(50, 0.4)],
        axis=1,
    ) + rng.normal(0, 0.002, (50, 4))
    means = k_means(small, k=1, seed=0)
    np.testing.assert_allclose(means[0], small.mean(axis=0), atol=0.01)


def test_best_anchor_from_label_dirs(tmp_path):
    d = tmp_path / "labels"
    d.mkdir()
    make_label_file(d / "a.txt", [[0, 0.5, 0.5, 0.1, 0.2], [1, 0.3, 0.3, 0.1, 0.2]])
    make_label_file(d / "b.txt", [[0, 0.7, 0.7, 0.1, 0.2]])
    w, h = best_anchor([d])
    assert abs(w - 0.1) < 0.02 and abs(h - 0.2) < 0.02


def test_best_anchor_tolerates_empty_dirs(tmp_path):
    """A dir with no labels contributes a (0, 4) block (not a shape-(0,)
    vstack crash); all-empty input raises instead of returning the k-means
    random init."""
    full = tmp_path / "labels"
    full.mkdir()
    make_label_file(full / "a.txt", [[0, 0.5, 0.5, 0.1, 0.2]])
    empty = tmp_path / "empty"
    empty.mkdir()
    w, h = best_anchor([full, empty])
    assert abs(w - 0.1) < 0.02 and abs(h - 0.2) < 0.02
    with pytest.raises(ValueError, match="no bounding boxes"):
        best_anchor([empty])


# ------------------------------------------------------------------ drawing
def test_bbox_colour_deterministic_and_distinct():
    c0 = bbox_colour(0, 7)
    c1 = bbox_colour(1, 7)
    assert c0 == bbox_colour(0, 7)
    assert c0 != c1
    assert all(0 <= v <= 255 for v in c0)


def test_format_rects_pixel_space():
    pred = np.zeros((8, 4, 4), np.float32)
    pred[:, 1, 1] = [0.5, 0.5, 0.2, 0.4, 0.9, 0.1, 0.8, 0.1]
    rects = format_rects(pred, img_h=100, img_w=200)
    assert rects.shape == (1, 6)
    np.testing.assert_allclose(rects[0, :4], [0.4 * 200, 0.3 * 100, 0.6 * 200, 0.7 * 100], atol=1e-4)
    assert rects[0, 4] == 1  # argmax class
    np.testing.assert_allclose(rects[0, 5], 0.9)


def test_draw_yogo_prediction_smoke():
    rng = np.random.default_rng(2)
    img = rng.integers(0, 255, (1, 64, 96), np.uint8)
    pred = np.zeros((8, 8, 12), np.float32)
    pred[:, 4, 6] = [0.5, 0.5, 0.2, 0.2, 0.9, 0.1, 0.8, 0.1]
    out = draw_yogo_prediction(img, pred, labels=["a", "b", "c"])
    assert out.size == (96, 64) and out.mode == "RGBA"
    # normalized image path
    out2 = draw_yogo_prediction(
        img.astype(np.float32) / 255.0, pred, images_are_normalized=True
    )
    assert out2.size == (96, 64)


def test_iter_in_chunks():
    assert [list(c) for c in iter_in_chunks(list(range(7)), 3)] == [
        [0, 1, 2],
        [3, 4, 5],
        [6],
    ]


# ------------------------------------------------------- ultralytics export
def test_ultralytics_converter(tmp_path):
    from yogo_tpu.data.utils import (
        convert_dataset_definition_to_ultralytics_format,
    )

    pairs = [make_pair_dirs(tmp_path, "u0"), make_pair_dirs(tmp_path, "u1")]
    test_pairs = [make_pair_dirs(tmp_path, "ut")]
    defn = write_defn(
        tmp_path / "d.yml",
        dataset_pairs=pairs,
        test_pairs=test_pairs,
        split={"train": 0.8, "val": 0.2},
    )
    target = tmp_path / "ultra"
    convert_dataset_definition_to_ultralytics_format(defn, target)
    spec = yaml.safe_load((target / "dataset_defn.yaml").read_text())
    assert spec["names"] == dict(enumerate(CLASSES))
    assert len(spec["train"]) == 2 and len(spec["val"]) == 1
    # symlinks resolve to the original data
    from pathlib import Path

    link = Path(spec["train"][0])
    assert link.is_symlink() and link.resolve().is_dir()
