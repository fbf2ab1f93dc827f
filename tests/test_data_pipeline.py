import json

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tests.data_fixtures import CLASSES, make_label_file, make_pair_dirs, write_defn
from yogo_tpu.data.dataset import ConcatDataset, ObjectDetectionDataset, Subset
from yogo_tpu.data.definition import DatasetDefinition
from yogo_tpu.data.labels import AREA_FILTER_THRESHOLD, load_labels
from yogo_tpu.data.loader import (
    DataLoader,
    choose_dataloader_num_workers,
    get_class_counts,
    get_dataloader,
    split_dataset,
    split_permutation,
)
from yogo_tpu.data.split_fractions import SplitFractions
from yogo_tpu.data.transforms import hflip, random_flips, vflip
from yogo_tpu.ops.grid import encode_label_grid_np


# ------------------------------------------------------------------ labels
def test_load_labels_space_and_comma(tmp_path):
    sp = tmp_path / "space.txt"
    make_label_file(sp, [[0, 0.5, 0.5, 0.1, 0.1], [1, 0.2, 0.2, 0.15, 0.12]])
    out = load_labels(sp, CLASSES)
    assert len(out) == 2 and out[0][0] == 0.0

    cm = tmp_path / "comma.txt"
    cm.write_text("1,0.5,0.5,0.1,0.1\n")
    out = load_labels(cm, CLASSES)
    assert out == [[1.0, 0.5, 0.5, 0.1, 0.1]]


def test_load_labels_empty_file(tmp_path):
    p = tmp_path / "empty.txt"
    p.write_text("")
    assert load_labels(p, CLASSES) == []


def test_load_labels_area_filter(tmp_path):
    p = tmp_path / "small.txt"
    tiny = 0.9 * AREA_FILTER_THRESHOLD**0.5
    make_label_file(p, [[0, 0.5, 0.5, tiny, tiny], [0, 0.5, 0.5, 0.1, 0.1]])
    out = load_labels(p, CLASSES)
    assert len(out) == 1


def test_load_labels_notes_json_remap(tmp_path):
    notes = {
        "categories": [
            {"id": 7, "name": "misc"},
            {"id": 3, "name": "healthy"},
        ]
    }
    p = tmp_path / "l.txt"
    make_label_file(p, [[7, 0.5, 0.5, 0.1, 0.1], [3, 0.3, 0.3, 0.1, 0.1]])
    out = load_labels(p, CLASSES, notes_data=notes)
    assert out[0][0] == CLASSES.index("misc")
    assert out[1][0] == CLASSES.index("healthy")
    bad = tmp_path / "bad.txt"
    make_label_file(bad, [[9, 0.5, 0.5, 0.1, 0.1]])
    with pytest.raises(ValueError, match="not found in notes"):
        load_labels(bad, CLASSES, notes_data=notes)


# ------------------------------------------------------------------ dataset
def test_dataset_pairing_and_getitem(tmp_path):
    img_dir, lbl_dir = make_pair_dirs(tmp_path, "a", n_images=3)
    ds = ObjectDetectionDataset(
        img_dir, lbl_dir, Sx=8, Sy=6, classes=CLASSES, image_hw=(40, 56)
    )
    assert len(ds) == 3
    img, grid = ds[0]
    assert img.shape == (1, 40, 56) and img.dtype == np.uint8
    assert grid.shape == (6, 6, 8)
    assert grid[0].sum() >= 1  # at least one object cell


def test_dataset_resizes(tmp_path):
    img_dir, lbl_dir = make_pair_dirs(tmp_path, "rz", n_images=1)
    ds = ObjectDetectionDataset(
        img_dir, lbl_dir, Sx=4, Sy=4, classes=CLASSES, image_hw=(32, 32)
    )
    img, _ = ds[0]
    assert img.shape == (1, 32, 32)


def test_dataset_missing_images_error(tmp_path):
    img_dir, lbl_dir = make_pair_dirs(tmp_path, "m", n_images=2)
    extra = lbl_dir / "img_9.txt"
    make_label_file(extra, [[0, 0.5, 0.5, 0.1, 0.1]])
    with pytest.raises(FileNotFoundError, match="images not found"):
        ObjectDetectionDataset(
            img_dir, lbl_dir, Sx=4, Sy=4, classes=CLASSES, image_hw=(40, 56)
        )


def test_dataset_notes_json_autoload(tmp_path):
    img_dir, lbl_dir = make_pair_dirs(tmp_path, "n", n_images=1)
    (lbl_dir.parent / "notes.json").write_text(
        json.dumps({"categories": [{"id": i, "name": c} for i, c in enumerate(CLASSES)]})
    )
    ds = ObjectDetectionDataset(
        img_dir, lbl_dir, Sx=4, Sy=4, classes=CLASSES, image_hw=(40, 56)
    )
    assert ds.notes_data is not None


def test_class_counts(tmp_path):
    img_dir, lbl_dir = make_pair_dirs(tmp_path, "cc", n_images=1)
    make_label_file(lbl_dir / "img_0.txt", [[0, 0.5, 0.5, 0.1, 0.1],
                                            [0, 0.3, 0.3, 0.1, 0.1],
                                            [2, 0.7, 0.7, 0.1, 0.1]])
    ds = ObjectDetectionDataset(
        img_dir, lbl_dir, Sx=4, Sy=4, classes=CLASSES, image_hw=(40, 56)
    )
    np.testing.assert_array_equal(ds.calc_class_counts(), [2, 0, 1])


def test_concat_and_subset(tmp_path):
    d1 = make_pair_dirs(tmp_path, "c1", n_images=2)
    d2 = make_pair_dirs(tmp_path, "c2", n_images=3)
    ds = ConcatDataset(
        ObjectDetectionDataset(i, lab, 4, 4, CLASSES, image_hw=(40, 56))
        for i, lab in (d1, d2)
    )
    assert len(ds) == 5
    assert ds[4] is not None
    sub = Subset(ds, [0, 4])
    assert len(sub) == 2


# ------------------------------------------------------------------ splits
def test_split_permutation_matches_torch_randperm():
    torch = pytest.importorskip("torch")
    g = torch.Generator().manual_seed(7271978)
    want = torch.randperm(100, generator=g).numpy()
    np.testing.assert_array_equal(split_permutation(100), want)


def test_split_dataset_sizes_and_disjoint():
    data = list(range(20))
    sf = SplitFractions.from_list([0.75, 0.125, 0.125], test_paths_present=False)
    split = split_dataset(data, sf)
    assert len(split["train"]) == 15
    assert len(split["val"]) + len(split["test"]) == 5
    all_idx = np.concatenate(
        [split[k].indices for k in ("train", "val", "test")]
    )
    assert len(set(all_idx.tolist())) == 20


# ------------------------------------------------------------------ loader
class ArrayDataset:
    def __init__(self, n, fail_at=()):
        self.n = n
        self.fail_at = set(fail_at)

    def __len__(self):
        return self.n

    def __getitem__(self, i):
        if i in self.fail_at:
            return None
        img = np.full((1, 8, 8), i, np.uint8)
        lbl = np.full((6, 2, 2), i, np.float32)
        return img, lbl


def test_loader_batches_and_padding():
    dl = DataLoader(ArrayDataset(10), batch_size=4)
    batches = list(dl)
    assert len(batches) == 3 == len(dl)
    imgs, labels, mask = batches[-1]
    assert imgs.shape == (4, 1, 8, 8)
    assert mask.tolist() == [1.0, 1.0, 0.0, 0.0]  # 10 = 4+4+2 real


def test_loader_pads_when_dataset_smaller_than_batch():
    """Padding must wrap the dataset as many times as needed: a single
    concatenate slice under-fills when pad > len(dataset), breaking the
    fixed-batch-shape contract the one-compiled-program design relies on."""
    dl = DataLoader(ArrayDataset(3), batch_size=8)
    (imgs, labels, mask), = list(dl)
    assert imgs.shape == (8, 1, 8, 8)
    assert mask.tolist() == [1.0, 1.0, 1.0, 0.0, 0.0, 0.0, 0.0, 0.0]
    # wrapped indices cycle through the dataset
    assert imgs[:, 0, 0, 0].tolist() == [0, 1, 2, 0, 1, 2, 0, 1]


def test_loader_shuffle_deterministic_per_epoch():
    dl = DataLoader(ArrayDataset(16), batch_size=4, shuffle=True)
    dl.set_epoch(0)
    e0 = np.concatenate([b[0][:, 0, 0, 0] for b in dl])
    e0b = np.concatenate([b[0][:, 0, 0, 0] for b in dl])
    np.testing.assert_array_equal(e0, e0b)  # same epoch -> same order
    dl.set_epoch(1)
    e1 = np.concatenate([b[0][:, 0, 0, 0] for b in dl])
    assert not np.array_equal(e0, e1)  # different epoch -> reshuffled


def test_loader_robust_to_failed_reads():
    dl = DataLoader(ArrayDataset(8, fail_at={3}), batch_size=4)
    batches = list(dl)
    _, _, mask0 = batches[0]
    assert mask0.sum() == 3  # one sample failed -> masked out


def test_loader_sharding_covers_all():
    seen = []
    for rank in range(4):
        dl = DataLoader(ArrayDataset(10), batch_size=2, shard=(rank, 4))
        for imgs, _, mask in dl:
            seen.extend(imgs[mask.astype(bool), 0, 0, 0].tolist())
    assert set(seen) == set(range(10))
    # every shard sees the same number of items (padded)
    lens = [
        len(DataLoader(ArrayDataset(10), batch_size=2, shard=(r, 4)))
        for r in range(4)
    ]
    assert len(set(lens)) == 1


def test_loader_sharding_smaller_than_world_size():
    """Pad > dataset size (3 samples over 8 ranks): indices repeat
    cyclically (DistributedSampler semantics) so EVERY rank still gets the
    same nonzero step count - unequal counts would deadlock the cross-host
    collectives inside the jitted step. A single `order[: total - n]`
    slice under-fills here (ranks 6-7 would see zero batches)."""
    lens, seen = [], []
    for rank in range(8):
        dl = DataLoader(ArrayDataset(3), batch_size=2, shard=(rank, 8))
        batches = list(dl)
        lens.append(len(batches))
        assert len(dl) == len(batches)  # __len__ is arithmetic, must agree
        for imgs, _, mask in batches:
            seen.extend(imgs[mask.astype(bool), 0, 0, 0].tolist())
    assert lens == [1] * 8
    assert set(seen) == set(range(3))  # every real sample still surfaces


def test_choose_num_workers():
    assert choose_dataloader_num_workers(100) == 0
    assert choose_dataloader_num_workers(5000, 4) == 4
    assert choose_dataloader_num_workers(5000) >= 1


# ------------------------------------------------------------ get_dataloader
def test_get_dataloader_end_to_end(tmp_path):
    pairs = [make_pair_dirs(tmp_path, str(i), n_images=4, seed=i) for i in range(2)]
    d = write_defn(
        tmp_path / "d.yml",
        dataset_pairs=pairs,
        split={"train": 0.75, "val": 0.25},
    )
    defn = DatasetDefinition.from_yaml(d)
    loaders = get_dataloader(
        defn, batch_size=2, Sx=8, Sy=6, image_hw=(40, 56)
    )
    assert set(loaders) == {"train", "val"}
    imgs, labels, mask = next(iter(loaders["train"]))
    assert imgs.shape == (2, 1, 40, 56)
    assert labels.shape == (2, 6, 6, 8)
    counts = get_class_counts(loaders["train"], len(CLASSES))
    assert counts.sum() > 0


def test_get_dataloader_skips_empty_split(tmp_path):
    pairs = [make_pair_dirs(tmp_path, "only", n_images=3)]
    d = write_defn(tmp_path / "d.yml", dataset_pairs=pairs)  # train-only
    defn = DatasetDefinition.from_yaml(d)
    loaders = get_dataloader(defn, batch_size=2, Sx=4, Sy=4, image_hw=(40, 56))
    assert set(loaders) == {"train"}


# ------------------------------------------------------------- transforms
def test_hflip_roundtrip_and_box_semantics():
    rng = np.random.default_rng(0)
    imgs = jnp.asarray(rng.integers(0, 255, (2, 1, 16, 24), np.uint8))
    rows = np.array([[1.0, 0.1, 0.2, 0.3, 0.5]], np.float32)
    grid = encode_label_grid_np(rows, 6, 4)
    labels = jnp.asarray(np.stack([grid, grid]))

    fi, fl = hflip(imgs, labels)
    fl = np.asarray(fl)
    # mask cells moved to mirrored x cell; box x coords flipped
    j, i = np.argwhere(grid[0] == 1)[0]
    assert fl[0, 0, j, 6 - 1 - i] == 1
    np.testing.assert_allclose(
        fl[0, 1:5, j, 6 - 1 - i], [1 - 0.3, 0.2, 1 - 0.1, 0.5], atol=1e-6
    )
    # double flip is identity
    ri, rl = hflip(fi, fl)
    np.testing.assert_array_equal(np.asarray(ri), np.asarray(imgs))
    np.testing.assert_allclose(np.asarray(rl), np.asarray(labels), atol=1e-6)


def test_vflip_box_semantics():
    rows = np.array([[2.0, 0.1, 0.2, 0.3, 0.5]], np.float32)
    grid = encode_label_grid_np(rows, 6, 4)
    labels = jnp.asarray(grid[None])
    imgs = jnp.zeros((1, 1, 16, 24), jnp.uint8)
    _, fl = vflip(imgs, labels)
    fl = np.asarray(fl)
    j, i = np.argwhere(grid[0] == 1)[0]
    assert fl[0, 0, 4 - 1 - j, i] == 1
    np.testing.assert_allclose(
        fl[0, 1:5, 4 - 1 - j, i], [0.1, 1 - 0.5, 0.3, 1 - 0.2], atol=1e-6
    )
    assert fl[0, 5, 4 - 1 - j, i] == 2.0


def test_random_flips_jittable():
    imgs = jnp.zeros((2, 1, 8, 8), jnp.float32)
    labels = jnp.zeros((2, 6, 2, 2), jnp.float32)
    f = jax.jit(random_flips)
    i1, l1 = f(jax.random.key(0), imgs, labels)
    assert i1.shape == imgs.shape and l1.shape == labels.shape


def test_split_override_merges_test_paths(tmp_path):
    """--dataset-split-override pools dataset_paths AND test_paths, then
    resplits randomly (reference: yogo/data/yogo_dataloader.py:119-122)."""
    from yogo_tpu.data.loader import get_datasets

    pairs = [make_pair_dirs(tmp_path, f"o{i}", n_images=4, seed=i) for i in range(2)]
    tpair = [make_pair_dirs(tmp_path, "ot", n_images=4, seed=9)]
    d = write_defn(
        tmp_path / "d.yml",
        dataset_pairs=pairs,
        test_pairs=tpair,
        split={"train": 0.75, "val": 0.25},
    )
    from yogo_tpu.data.definition import DatasetDefinition

    defn = DatasetDefinition.from_yaml(d)
    override = SplitFractions.from_list([0.5, 0.25, 0.25], test_paths_present=False)
    split = get_datasets(defn, Sx=8, Sy=6, image_hw=(40, 56),
                         split_fraction_override=override)
    total = 12  # 8 train + 4 explicit test, pooled
    assert len(split["train"]) == 6
    assert len(split["val"]) + len(split["test"]) == 6
    assert len(split["train"]) + len(split["val"]) + len(split["test"]) == total
