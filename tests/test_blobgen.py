"""BlobDataset (synthetic thumbnail-pasting augmentation) tests
(reference behavior: yogo/data/blobgen.py:23-263) plus the
thumbnail_augmentation -> train-loader wiring
(reference: yogo/data/yogo_dataloader.py:137-152)."""

from pathlib import Path

import numpy as np
import pytest
from PIL import Image

from tests.data_fixtures import CLASSES, make_pair_dirs, write_defn
from yogo_tpu.data.blobgen import BlobDataset
from yogo_tpu.data.definition import DatasetDefinition
from yogo_tpu.data.loader import get_dataloader, get_datasets


def make_thumb_dir(root: Path, name: str, n=4, size=(30, 34), shade=60, seed=0):
    d = root / name
    d.mkdir(parents=True, exist_ok=True)
    rng = np.random.default_rng(seed)
    for i in range(n):
        arr = np.full(size, shade, np.uint8)
        arr += rng.integers(0, 10, size).astype(np.uint8)
        # bright corner pixels so _background_shade has >210 samples
        arr[0, :2] = 230
        Image.fromarray(arr).save(d / f"t{i}.png")
    return d


@pytest.fixture()
def thumb_dirs(tmp_path):
    return {
        "healthy": [make_thumb_dir(tmp_path, "th_healthy", seed=1)],
        "ring": [make_thumb_dir(tmp_path, "th_ring", seed=2)],
    }


def decode_grid(grid):
    """(6, Sy, Sx) -> (N, 5) rows [cls, x1, y1, x2, y2]."""
    flat = grid.reshape(6, -1).T
    rows = flat[flat[:, 0] == 1]
    return np.concatenate([rows[:, 5:6], rows[:, 1:5]], axis=1)


def test_blobdataset_basic_sample(thumb_dirs):
    bd = BlobDataset(
        thumb_dirs, Sx=16, Sy=12, classes=CLASSES, n=8, length=5,
        background_img_shape=(200, 260), seed=7,
    )
    assert len(bd) == 5
    img, grid = bd[0]
    assert img.shape == (1, 200, 260) and img.dtype == np.uint8
    assert grid.shape == (6, 12, 16)
    rows = decode_grid(grid)
    assert 1 <= len(rows) <= 8
    # classes restricted to the provided thumbnail classes (healthy=0, ring=1)
    assert set(rows[:, 0].astype(int)) <= {0, 1}
    # each labeled box covers a pasted (dark) thumbnail on the bright bg
    for cls, x1, y1, x2, y2 in rows:
        xs, xe = int(round(x1 * 260)), int(round(x2 * 260))
        ys, ye = int(round(y1 * 200)), int(round(y2 * 200))
        patch = img[0, ys:ye, xs:xe]
        assert patch.size > 0
        assert patch.mean() < 120  # dark thumbnail, not background


def test_blobdataset_non_overlapping_boxes(thumb_dirs):
    bd = BlobDataset(
        thumb_dirs, Sx=16, Sy=12, classes=CLASSES, n=20, length=3,
        background_img_shape=(200, 260), seed=3,
    )
    for i in range(3):
        _, grid = bd[i]
        rows = decode_grid(grid)
        boxes = rows[:, 1:5]
        # rejection sampling guarantees zero pairwise intersection
        for a in range(len(boxes)):
            for b in range(a + 1, len(boxes)):
                ix = min(boxes[a, 2], boxes[b, 2]) - max(boxes[a, 0], boxes[b, 0])
                iy = min(boxes[a, 3], boxes[b, 3]) - max(boxes[a, 1], boxes[b, 1])
                assert ix <= 0 or iy <= 0


def test_blobdataset_background_shade(tmp_path):
    # thumbnails whose bright (>210) pixels average exactly 230
    d = make_thumb_dir(tmp_path, "th", shade=50, seed=0)
    bd = BlobDataset(
        {"misc": [d]}, Sx=8, Sy=8, classes=CLASSES, n=2, length=1,
        background_img_shape=(100, 130), seed=0,
    )
    img, grid = bd[0]
    rows = decode_grid(grid)
    # sample a pixel far from any box: background shade == bright mean (230)
    mask = np.ones((100, 130), bool)
    for _, x1, y1, x2, y2 in rows:
        mask[int(y1 * 100):int(y2 * 100) + 1, int(x1 * 130):int(x2 * 130) + 1] = False
    assert mask.any()
    bg_vals = img[0][mask]
    assert abs(float(np.median(bg_vals)) - 230) <= 1


def test_blobdataset_normalize_images(thumb_dirs):
    bd = BlobDataset(
        thumb_dirs, Sx=8, Sy=8, classes=CLASSES, n=2, length=1,
        background_img_shape=(100, 130), normalize_images=True, seed=0,
    )
    img, _ = bd[0]
    assert img.dtype == np.float32 and img.max() <= 1.0


def test_blobdataset_label_validation(tmp_path, thumb_dirs):
    with pytest.raises(ValueError, match="not a valid YOGO class"):
        BlobDataset(
            {"nonexistent": [make_thumb_dir(tmp_path, "x")]},
            Sx=8, Sy=8, classes=CLASSES,
        )
    with pytest.raises(ValueError, match="out of range"):
        BlobDataset(
            {17: [make_thumb_dir(tmp_path, "y")]},
            Sx=8, Sy=8, classes=CLASSES,
        )
    with pytest.raises(FileNotFoundError):
        BlobDataset(
            {"healthy": [tmp_path / "missing_dir"]},
            Sx=8, Sy=8, classes=CLASSES,
        )


def test_blobdataset_index_bounds(thumb_dirs):
    bd = BlobDataset(
        thumb_dirs, Sx=8, Sy=8, classes=CLASSES, n=2, length=2,
        background_img_shape=(100, 130), seed=0,
    )
    with pytest.raises(IndexError):
        bd[2]
    with pytest.raises(IndexError):
        bd[-3]
    # python sequence semantics: dataset[-1] is the last item
    img_neg, grid_neg = bd[-1]
    img_pos, grid_pos = bd[1]
    np.testing.assert_array_equal(img_neg, img_pos)
    np.testing.assert_array_equal(grid_neg, grid_pos)


def test_blobdataset_drops_small_thumbnails(tmp_path):
    d = tmp_path / "tiny"
    d.mkdir()
    # area 20*20=400 <= 500 threshold -> dropped; no readable thumbnails left
    Image.fromarray(np.full((20, 20), 80, np.uint8)).save(d / "small.png")
    with pytest.raises(FileNotFoundError, match="no readable thumbnails"):
        BlobDataset({"misc": [d]}, Sx=8, Sy=8, classes=CLASSES)


# ------------------------------------------------ loader wiring (defn -> train)
def test_thumbnail_augmentation_extends_train_split(tmp_path, thumb_dirs):
    pairs = [make_pair_dirs(tmp_path, str(i), n_images=8, seed=i) for i in range(2)]
    defn_path = write_defn(
        tmp_path / "d.yml",
        dataset_pairs=pairs,
        split={"train": 0.75, "val": 0.25},
        thumbs={k: [str(p) for p in v] for k, v in thumb_dirs.items()},
    )
    defn = DatasetDefinition.from_yaml(defn_path)
    assert defn.thumbnail_augmentation is not None

    split = get_datasets(defn, Sx=8, Sy=6, image_hw=(48, 64))
    base_train = round(16 * 0.75)
    # reference: BlobDataset of length len(train)//2 is concatenated onto
    # train (yogo/data/yogo_dataloader.py:137-152)
    assert len(split["train"]) == base_train + base_train // 2
    assert len(split["val"]) == 16 - base_train

    # synthetic samples come out of the train loader with the right shapes
    loaders = get_dataloader(defn, batch_size=4, Sx=8, Sy=6, image_hw=(48, 64))
    imgs, labels, mask = next(iter(loaders["train"]))
    assert imgs.shape == (4, 1, 48, 64)
    assert labels.shape == (4, 6, 6, 8)

    # the blob samples themselves are reachable through the concat dataset
    blob_img, blob_grid = split["train"][len(split["train"]) - 1]
    assert blob_img.shape == (1, 48, 64)
    assert blob_grid.shape == (6, 6, 8)


def test_thumbnail_augmentation_rejects_rgb(tmp_path, thumb_dirs):
    """BlobDataset emits (1, H, W) images; combining it with an RGB train
    split must fail at build time, not as a collate shape mismatch."""
    pairs = [make_pair_dirs(tmp_path, "0", n_images=4, seed=0)]
    defn_path = write_defn(
        tmp_path / "d.yml",
        dataset_pairs=pairs,
        split={"train": 0.75, "val": 0.25},
        thumbs={k: [str(p) for p in v] for k, v in thumb_dirs.items()},
    )
    defn = DatasetDefinition.from_yaml(defn_path)
    with pytest.raises(ValueError, match="single-channel"):
        get_datasets(defn, Sx=8, Sy=6, image_hw=(48, 64), rgb=True)


def test_blobdataset_epoch_resampling_reproducible(thumb_dirs):
    """dataset[i] is stable within an epoch (lock-free thread-safe AND
    reproducible across runs) but resamples when set_epoch advances -
    preserving the reference's fresh-synthetic-augmentation-per-epoch
    diversity (reference: yogo/data/blobgen.py draws per access)."""
    bd = BlobDataset(
        thumb_dirs, Sx=8, Sy=8, classes=CLASSES, n=3, length=4,
        background_img_shape=(100, 130), seed=5,
    )
    a1, l1 = bd[2]
    a2, l2 = bd[2]
    assert np.array_equal(a1, a2) and np.array_equal(l1, l2)

    bd.set_epoch(1)
    b1, _ = bd[2]
    assert not np.array_equal(a1, b1), "epoch change must resample"
    bd.set_epoch(0)
    c1, m1 = bd[2]
    assert np.array_equal(a1, c1) and np.array_equal(l1, m1)

    # the loader + ConcatDataset chain forwards set_epoch down to the blob
    from yogo_tpu.data.dataset import ConcatDataset
    from yogo_tpu.data.loader import DataLoader

    cd = ConcatDataset([bd])
    dl = DataLoader(cd, batch_size=2, shuffle=False, num_workers=0)
    dl.set_epoch(3)
    assert bd._epoch == 3
