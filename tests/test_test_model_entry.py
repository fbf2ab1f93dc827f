"""`yogo test` entry path: checkpoint + dataset definition -> metric tuple."""

from types import SimpleNamespace

import jax

from tests.data_fixtures import CLASSES, make_pair_dirs, write_defn
from yogo_tpu.models.yogo import YOGO
from yogo_tpu.utils.checkpoint import save_checkpoint
from yogo_tpu.utils.test_model import test_model as run_test_model


def test_test_model_end_to_end(tmp_path, capsys):
    model = YOGO.create(
        (40, 56), 0.15, 0.2, len(CLASSES), model_version="quarter_filters"
    )
    variables = model.init(jax.random.key(0))
    ckpt = tmp_path / "m.ckpt"
    save_checkpoint(ckpt, model, variables, classes=CLASSES)

    pairs = [make_pair_dirs(tmp_path, "tr", n_images=4)]
    tpairs = [make_pair_dirs(tmp_path, "te", n_images=3, seed=5)]
    defn = write_defn(
        tmp_path / "d.yml",
        dataset_pairs=pairs,
        test_pairs=tpairs,
        split={"train": 0.75, "val": 0.25},
    )

    args = SimpleNamespace(
        ckpt_path=ckpt,
        dataset_defn_path=defn,
        wandb=False,
        wandb_entity=None,
        wandb_project=None,
        wandb_resume_id=None,
        dump_to_disk=False,
        include_mAP=True,
        include_background=True,
        note=None,
        tags=None,
    )
    run_test_model(args)
    out = capsys.readouterr().out
    assert "test loss:" in out
    assert "test mAP:" in out
    assert "confusion matrix:" in out
    assert "calibration error" in out


def test_test_model_requires_test_split(tmp_path):
    import pytest

    model = YOGO.create((40, 56), 0.15, 0.2, len(CLASSES),
                        model_version="quarter_filters")
    variables = model.init(jax.random.key(0))
    ckpt = tmp_path / "m.ckpt"
    save_checkpoint(ckpt, model, variables, classes=CLASSES)
    pairs = [make_pair_dirs(tmp_path, "only", n_images=3)]
    defn = write_defn(tmp_path / "d.yml", dataset_pairs=pairs)  # train-only

    args = SimpleNamespace(
        ckpt_path=ckpt, dataset_defn_path=defn, wandb=False,
        wandb_entity=None, wandb_project=None, wandb_resume_id=None,
        dump_to_disk=False, include_mAP=False, include_background=False,
        note=None, tags=None,
    )
    with pytest.raises(ValueError, match="no test split"):
        run_test_model(args)
