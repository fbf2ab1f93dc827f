"""Dataset-definition parsing: covers the same behaviors as the reference's
tests/test_dataset_definition.py (flatten equivalence, cycles, duplicates,
missing paths, class mismatch, test-path disjointness, default split), with
fixtures generated programmatically instead of a static file tree."""

import pytest

from tests.data_fixtures import CLASSES, make_pair_dirs, write_defn
from yogo_tpu.data.definition import (
    DatasetDefinition,
    InvalidDatasetDefinitionFile,
)
from yogo_tpu.data.split_fractions import InvalidSplitFraction, SplitFractions


@pytest.fixture()
def pairs(tmp_path):
    return [make_pair_dirs(tmp_path, str(i), seed=i) for i in range(3)]


def test_literal_basic(tmp_path, pairs):
    d = write_defn(tmp_path / "d.yml", dataset_pairs=pairs)
    defn = DatasetDefinition.from_yaml(d)
    assert len(defn.dataset_paths) == 3
    assert defn.classes == CLASSES
    assert defn.test_dataset_paths == []
    # default split is train-only (reference: dataset_definition_file.py:241)
    assert defn.split_fractions == SplitFractions.train_only()


def test_recursive_flattening_equivalence(tmp_path, pairs):
    """A recursive defn flattens to the same set as the literal one."""
    lit = DatasetDefinition.from_yaml(
        write_defn(tmp_path / "lit.yml", dataset_pairs=pairs)
    )
    write_defn(tmp_path / "child1.yml", dataset_pairs=pairs[:1])
    write_defn(tmp_path / "child23.yml", dataset_pairs=pairs[1:])
    rec = DatasetDefinition.from_yaml(
        write_defn(
            tmp_path / "rec.yml",
            defn_paths=[tmp_path / "child1.yml", tmp_path / "child23.yml"],
        )
    )
    assert rec._dataset_paths == lit._dataset_paths
    assert rec == lit


def test_relative_defn_paths(tmp_path, pairs):
    write_defn(tmp_path / "child.yml", dataset_pairs=pairs[:2])
    rec = DatasetDefinition.from_yaml(
        write_defn(tmp_path / "parent.yml", defn_paths=["child.yml"])
    )
    assert len(rec.dataset_paths) == 2


def test_cycle_self_detected(tmp_path, pairs):
    p = tmp_path / "self.yml"
    write_defn(p, dataset_pairs=pairs[:1], defn_paths=[p])
    with pytest.raises(InvalidDatasetDefinitionFile, match="cycle"):
        DatasetDefinition.from_yaml(p)


def test_cycle_mutual_detected(tmp_path, pairs):
    a, b = tmp_path / "a.yml", tmp_path / "b.yml"
    write_defn(a, dataset_pairs=pairs[:1], defn_paths=[b])
    write_defn(b, dataset_pairs=pairs[1:2], defn_paths=[a])
    with pytest.raises(InvalidDatasetDefinitionFile, match="cycle"):
        DatasetDefinition.from_yaml(a)


def test_duplicate_paths_rejected(tmp_path, pairs):
    # same (image, label) pair under two DIFFERENT keys in one file
    # (write_defn keys pairs as pair0/pair1, so yaml does not collapse them)
    d1 = write_defn(tmp_path / "dup.yml", dataset_pairs=[pairs[0], pairs[0]])
    with pytest.raises(InvalidDatasetDefinitionFile, match="duplicate"):
        DatasetDefinition.from_yaml(d1)
    # and the same pair reached through two child definition files
    write_defn(tmp_path / "c1.yml", dataset_pairs=pairs[:1])
    write_defn(tmp_path / "c2.yml", dataset_pairs=pairs[:1])
    d2 = write_defn(
        tmp_path / "dup2.yml",
        defn_paths=[tmp_path / "c1.yml", tmp_path / "c2.yml"],
    )
    with pytest.raises(InvalidDatasetDefinitionFile, match="duplicate"):
        DatasetDefinition.from_yaml(d2)


def test_missing_dirs_raise_filenotfound(tmp_path):
    d = write_defn(
        tmp_path / "bad.yml",
        dataset_pairs=[(tmp_path / "nope_img", tmp_path / "nope_lbl")],
    )
    with pytest.raises(FileNotFoundError):
        DatasetDefinition.from_yaml(d)


def test_class_mismatch_in_child(tmp_path, pairs):
    write_defn(tmp_path / "child.yml", dataset_pairs=pairs[:1],
               classes=["other", "classes"])
    d = write_defn(tmp_path / "parent.yml", defn_paths=[tmp_path / "child.yml"])
    with pytest.raises(InvalidDatasetDefinitionFile, match="classes mismatch"):
        DatasetDefinition.from_yaml(d)


def test_missing_class_names_key(tmp_path, pairs):
    import yaml as _yaml

    p = tmp_path / "noclass.yml"
    with open(p, "w") as f:
        _yaml.safe_dump(
            {
                "dataset_paths": {
                    "a": {
                        "image_path": str(pairs[0][0]),
                        "label_path": str(pairs[0][1]),
                    }
                }
            },
            f,
        )
    with pytest.raises(InvalidDatasetDefinitionFile, match="class_names"):
        DatasetDefinition.from_yaml(p)


def test_invalid_spec_shape(tmp_path, pairs):
    import yaml as _yaml

    p = tmp_path / "badspec.yml"
    with open(p, "w") as f:
        _yaml.safe_dump(
            {
                "class_names": CLASSES,
                "dataset_paths": {"a": {"image_path": str(pairs[0][0])}},
            },
            f,
        )
    with pytest.raises(InvalidDatasetDefinitionFile):
        DatasetDefinition.from_yaml(p)


def test_test_paths_kept_separate(tmp_path, pairs):
    d = write_defn(
        tmp_path / "t.yml",
        dataset_pairs=pairs[:2],
        test_pairs=pairs[2:],
        split={"train": 0.8, "val": 0.2},
    )
    defn = DatasetDefinition.from_yaml(d)
    assert len(defn.dataset_paths) == 2
    assert len(defn.test_dataset_paths) == 1
    assert len(defn.all_dataset_paths) == 3


def test_test_paths_overlapping_train_rejected(tmp_path, pairs):
    d = write_defn(
        tmp_path / "overlap.yml",
        dataset_pairs=pairs[:2],
        test_pairs=pairs[:1],  # duplicate with train
        split={"train": 0.8, "val": 0.2},
    )
    with pytest.raises(InvalidDatasetDefinitionFile, match="duplicate"):
        DatasetDefinition.from_yaml(d)


def test_split_test_key_rejected_with_test_paths(tmp_path, pairs):
    d = write_defn(
        tmp_path / "st.yml",
        dataset_pairs=pairs[:2],
        test_pairs=pairs[2:],
        split={"train": 0.7, "val": 0.2, "test": 0.1},
    )
    with pytest.raises(InvalidSplitFraction):
        DatasetDefinition.from_yaml(d)


def test_order_agnostic_equality(tmp_path, pairs):
    d1 = DatasetDefinition.from_yaml(
        write_defn(tmp_path / "o1.yml", dataset_pairs=pairs)
    )
    d2 = DatasetDefinition.from_yaml(
        write_defn(tmp_path / "o2.yml", dataset_pairs=pairs[::-1])
    )
    assert d1 == d2


def test_add_concatenation(tmp_path, pairs):
    d1 = DatasetDefinition.from_yaml(
        write_defn(tmp_path / "a1.yml", dataset_pairs=pairs[:1])
    )
    d2 = DatasetDefinition.from_yaml(
        write_defn(tmp_path / "a2.yml", dataset_pairs=pairs[1:])
    )
    both = d1 + d2
    assert len(both.dataset_paths) == 3
    d3 = DatasetDefinition.from_yaml(
        write_defn(tmp_path / "a3.yml", dataset_pairs=pairs[:1],
                   classes=["x", "y"])
    )
    with pytest.raises(ValueError, match="different classes"):
        d1 + d3


def test_thumbnail_augmentation_validation(tmp_path, pairs):
    thumb_dir = tmp_path / "thumbs"
    thumb_dir.mkdir()
    d = write_defn(
        tmp_path / "th.yml",
        dataset_pairs=pairs[:1],
        thumbs={"misc": str(thumb_dir)},
    )
    defn = DatasetDefinition.from_yaml(d)
    assert defn.thumbnail_augmentation is not None
    assert "misc" in defn.thumbnail_augmentation

    bad = write_defn(
        tmp_path / "thbad.yml",
        dataset_pairs=pairs[:1],
        thumbs={"not_a_class": str(thumb_dir)},
    )
    with pytest.raises(InvalidDatasetDefinitionFile, match="not a valid class"):
        DatasetDefinition.from_yaml(bad)


# ---------------------------------------------------------- split fractions
def test_split_fraction_validation():
    with pytest.raises(ValueError, match="sum to 1"):
        SplitFractions(0.5, 0.2, 0.1)
    with pytest.raises(ValueError, match="in range"):
        SplitFractions(1.5, -0.5, None)
    sf = SplitFractions.from_list([0.7, 0.2, 0.1], test_paths_present=False)
    assert sf.test == 0.1
    with pytest.raises(InvalidSplitFraction):
        SplitFractions.from_list([0.7, 0.3], test_paths_present=False)


def test_partition_sizes_remainder_to_last():
    sf = SplitFractions.from_list([0.75, 0.125, 0.125], test_paths_present=False)
    sizes = sf.partition_sizes(10)
    assert sizes["train"] + sizes["val"] + sizes["test"] == 10
    assert sizes["train"] == 8  # round(7.5) == 8 banker's? round(7.5)=8? no: 8
    sf2 = SplitFractions.train_only()
    assert sf2.partition_sizes(7) == {"train": 7, "val": 0}
