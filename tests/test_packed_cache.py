"""Decode-once packed dataset cache (data/packed_cache.py): bit-parity
with the live dataset, content-keyed invalidation, build reuse, failed
decodes, and loader integration. The cache replaces the reference's
N-worker per-epoch PNG re-decode (reference:
yogo/data/yogo_dataloader.py:258-272) with pay-once decode + memmap reads."""

import time

import numpy as np
import pytest

from tests.data_fixtures import (
    CLASSES,
    make_label_file,
    make_pair_dirs,
    write_defn,
)
from yogo_tpu.data import packed_cache
from yogo_tpu.data.dataset import ObjectDetectionDataset
from yogo_tpu.data.definition import DatasetDefinition
from yogo_tpu.data.loader import get_dataloader
from yogo_tpu.data.packed_cache import PackedDataset, dataset_signature

SX, SY = 7, 5


def make_source(tmp_path, name="pk", normalize=False, **kw):
    img_dir, lbl_dir = make_pair_dirs(tmp_path, name, **kw)
    return ObjectDetectionDataset(
        img_dir, lbl_dir, SX, SY, classes=CLASSES, image_hw=(40, 56),
        normalize_images=normalize,
    )


@pytest.mark.parametrize("normalize", [False, True])
def test_packed_matches_live_dataset_exactly(tmp_path, normalize):
    src = make_source(tmp_path, normalize=normalize, n_images=5)
    packed = PackedDataset(src, Sx=SX, Sy=SY, cache_root=tmp_path / "cache")
    assert len(packed) == len(src) == 5
    for i in range(len(src)):
        li, lg = src[i]
        pi, pg = packed[i]
        assert li.dtype == pi.dtype
        np.testing.assert_array_equal(li, pi)
        np.testing.assert_array_equal(lg, pg)


def test_cache_reused_not_rebuilt(tmp_path, monkeypatch):
    src = make_source(tmp_path)
    root = tmp_path / "cache"
    PackedDataset(src, Sx=SX, Sy=SY, cache_root=root)

    # a second construction must map the existing cache without building
    def boom(*a, **k):  # pragma: no cover - failure path
        raise AssertionError("cache should not rebuild")

    monkeypatch.setattr(packed_cache, "_build", boom)
    packed2 = PackedDataset(src, Sx=SX, Sy=SY, cache_root=root)
    assert packed2[0] is not None
    # and the grid-independence: a DIFFERENT model grid reuses the same
    # cache directory (rows are stored, grids encoded at read)
    packed3 = PackedDataset(src, Sx=13, Sy=11, cache_root=root)
    assert packed3[0][1].shape == (6, 11, 13)


def test_source_change_invalidates(tmp_path):
    src = make_source(tmp_path)
    sig1 = dataset_signature(src)
    root = tmp_path / "cache"
    PackedDataset(src, Sx=SX, Sy=SY, cache_root=root)

    lbl = next(iter(sorted((tmp_path / "labels_pk").glob("*.txt"))))
    time.sleep(0.01)  # ensure mtime_ns moves
    make_label_file(lbl, [[0, 0.5, 0.5, 0.3, 0.3]])
    src2 = ObjectDetectionDataset(
        tmp_path / "images_pk", tmp_path / "labels_pk", SX, SY,
        classes=CLASSES, image_hw=(40, 56),
    )
    assert dataset_signature(src2) != sig1

    p2 = PackedDataset(src2, Sx=SX, Sy=SY, cache_root=root)
    # the rebuilt cache reflects the new label file (index 0 = img_0.txt)
    _, grid = p2[0]
    assert grid[0].sum() == 1.0


def test_failed_decode_masked(tmp_path):
    make_source(tmp_path, n_images=3)
    # corrupt one image (truncated PNG decodes to None), then pair
    bad = tmp_path / "images_pk" / "img_1.png"
    bad.write_bytes(bad.read_bytes()[:20])
    src = ObjectDetectionDataset(
        tmp_path / "images_pk", tmp_path / "labels_pk", SX, SY,
        classes=CLASSES, image_hw=(40, 56),
    )
    packed = PackedDataset(src, Sx=SX, Sy=SY, cache_root=tmp_path / "cache")
    assert packed[0] is not None
    assert packed[1] is None  # matches the live dataset's robust-read None
    assert packed[2] is not None


def test_class_counts_match(tmp_path):
    src = make_source(tmp_path, n_images=4, boxes_per_image=3)
    packed = PackedDataset(src, Sx=SX, Sy=SY, cache_root=tmp_path / "cache")
    np.testing.assert_array_equal(
        packed.calc_class_counts(), src.calc_class_counts()
    )


def test_loader_integration_batches_match(tmp_path):
    pairs = [make_pair_dirs(tmp_path, "a", n_images=4)]
    defn = DatasetDefinition.from_yaml(
        write_defn(
            tmp_path / "d.yml",
            dataset_pairs=pairs,
            split={"train": 0.5, "val": 0.25, "test": 0.25},
        )
    )
    kw = dict(batch_size=2, Sx=SX, Sy=SY, image_hw=(40, 56))
    live = get_dataloader(defn, **kw)
    packed = get_dataloader(defn, packed_cache=tmp_path / "cache", **kw)
    for split in live:
        for (li, ll, lm), (pi, pl, pm) in zip(live[split], packed[split]):
            np.testing.assert_array_equal(li, pi)
            np.testing.assert_array_equal(ll, pl)
            np.testing.assert_array_equal(lm, pm)


def test_incomplete_cache_dir_recovered(tmp_path):
    """A crashed build (cache dir present, meta.json missing) must not
    poison future constructions - it is cleared and rebuilt."""
    src = make_source(tmp_path)
    root = tmp_path / "cache"
    sig = dataset_signature(src)
    stale = root / sig[:24]
    stale.mkdir(parents=True)
    (stale / "images.npy").write_bytes(b"garbage")
    packed = PackedDataset(src, Sx=SX, Sy=SY, cache_root=root)
    assert packed[0] is not None
    assert (stale / "meta.json").exists()


def test_blob_augmented_train_split_with_packed_cache(tmp_path):
    """thumbnail_augmentation mixes a per-epoch-resampling BlobDataset
    into the train concat; with the packed cache enabled the loader must
    fall back to per-item reads for that split (BlobDataset has no
    vectorized path) and still yield the same batches as the live
    pipeline."""
    from tests.test_blobgen import make_thumb_dir
    from yogo_tpu.data.loader import get_datasets

    pairs = [make_pair_dirs(tmp_path, "ba", n_images=8)]
    thumbs = {
        "healthy": [str(make_thumb_dir(tmp_path, "th_h", seed=1))],
        "ring": [str(make_thumb_dir(tmp_path, "th_r", seed=2))],
    }
    defn = DatasetDefinition.from_yaml(
        write_defn(
            tmp_path / "d.yml",
            dataset_pairs=pairs,
            split={"train": 0.75, "val": 0.25},
            thumbs=thumbs,
        )
    )
    kw = dict(Sx=SX, Sy=SY, image_hw=(40, 56))
    live = get_datasets(defn, **kw)
    packed = get_datasets(defn, packed_cache=tmp_path / "cache", **kw)
    # the mixed concat (packed + blob) exposes no vectorized path
    assert packed["train"].get_batch([0]) is None
    assert len(packed["train"]) == len(live["train"])

    # the REAL (cached) region is bit-identical; blob samples themselves
    # use fresh per-instance entropy (unseeded BlobDataset), so only
    # their shapes are comparable across constructions
    n_real = len(live["train"]) - len(live["train"].datasets[-1])
    for i in range(n_real):
        li, lg = live["train"][i]
        pi, pg = packed["train"][i]
        np.testing.assert_array_equal(li, pi)
        np.testing.assert_array_equal(lg, pg)

    # the loader runs the whole mixed split through the per-item
    # fallback: fixed shapes, all-real masks
    lpacked = get_dataloader(
        defn, batch_size=3, packed_cache=tmp_path / "cache", **kw
    )
    n = 0
    for pi, pl, pm in lpacked["train"]:
        assert pi.shape == (3, 1, 40, 56) and pl.shape == (3, 6, SY, SX)
        n += int(pm.sum())
    assert n == len(packed["train"])
