"""`yogo test` entry path: checkpoint + dataset definition -> metric tuple."""

from types import SimpleNamespace

import jax
import pytest

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


@pytest.mark.parametrize(
    "model_version,image_hw",
    [("quarter_filters", (40, 56)), ("convnext_small", (64, 96))],
)
def test_test_model_quantize_end_to_end(tmp_path, model_version, image_hw):
    """`yogo test --quantize` (extension): evaluates the int8 PTQ program
    on the test split for BOTH quantizable families - the same program
    `yogo infer --quantize` / `yogo serve --quantize` serve
    (ops/quant.family_quant_plan); metrics come out sane and close to the
    float run. (`yogo test` used to reject convnext while the other two
    entry points supported it.)"""
    from yogo_tpu.data.definition import DatasetDefinition
    from yogo_tpu.data.loader import get_dataloader
    from yogo_tpu.train import Trainer

    model = YOGO.create(
        image_hw, 0.15, 0.2, len(CLASSES), model_version=model_version
    )
    variables = model.init(jax.random.key(0))
    pairs = [make_pair_dirs(tmp_path, "tr", n_images=4)]
    tpairs = [make_pair_dirs(tmp_path, "te", n_images=3, seed=5)]
    defn_path = write_defn(
        tmp_path / "d.yml",
        dataset_pairs=pairs,
        test_pairs=tpairs,
        split={"train": 0.75, "val": 0.25},
    )
    data_defn = DatasetDefinition.from_yaml(defn_path)
    Sx, Sy = model.grid
    config = {
        "class_names": data_defn.classes,
        "no_classify": False,
        "iou_weight": 1,
        "no_obj_weight": 0.5,
        "label_smoothing": 0.0001,
        "half": False,
        "model": "m",
        "test_set": str(defn_path),
    }

    def loader():
        return get_dataloader(
            data_defn, 4, Sx=Sx, Sy=Sy, image_hw=image_hw
        )["test"]

    f_metrics = Trainer.test(loader(), config, model, variables,
                             include_mAP=False)
    q_metrics = Trainer.test(loader(), config, model, variables,
                             include_mAP=False, quantize=True)
    f_loss, q_loss = f_metrics[0], q_metrics[0]
    assert jax.numpy.isfinite(q_loss)
    # int8 noise on an untrained net stays a perturbation, not a rewrite
    assert abs(q_loss - f_loss) / f_loss < 0.2, (f_loss, q_loss)
    # confusion matrix still shaped (C+1, C+1) and counts preserved
    assert q_metrics[2].shape == f_metrics[2].shape


def test_test_model_quantize_rejects_unknown_family(tmp_path):
    """A family with no int8 path is rejected BEFORE a test batch is
    consumed for calibration (the loader here would blow up if touched)."""
    from yogo_tpu.train import Trainer

    stub = SimpleNamespace(
        defn=SimpleNamespace(family="transformer"), input_channels=1
    )

    class ExplodingLoader:
        def __len__(self):
            return 1

        def __iter__(self):
            raise AssertionError("loader consumed before family validation")

    with pytest.raises(ValueError, match="conv-stack and convnext"):
        Trainer.test(
            ExplodingLoader(),
            {
                "class_names": ["a", "b"],
                "no_classify": False,
                "iou_weight": 1,
                "no_obj_weight": 0.5,
                "label_smoothing": 0.0001,
                "half": False,
                "model": "m",
                "test_set": "d",
            },
            stub,
            {},
            include_mAP=False,
            quantize=True,
        )


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


def test_test_model_quantize_fast_eval_composition(tmp_path):
    """`yogo test --quantize --fast-eval`: the int8 PTQ eval program with
    SPMD device-accumulated metrics. The quantized forward's predictions
    stay batch-sharded into the DeviceMetrics update; loss must bit-match
    the quantized host-engine run (same eval program, only the metrics
    engine differs) and the stable aggregates must agree."""
    from yogo_tpu.data.definition import DatasetDefinition
    from yogo_tpu.data.loader import get_dataloader
    from yogo_tpu.train import Trainer

    image_hw = (40, 56)
    model = YOGO.create(
        image_hw, 0.15, 0.2, len(CLASSES), model_version="quarter_filters"
    )
    variables = model.init(jax.random.key(0))
    pairs = [make_pair_dirs(tmp_path, "tr", n_images=4)]
    tpairs = [make_pair_dirs(tmp_path, "te", n_images=3, seed=5)]
    defn_path = write_defn(
        tmp_path / "d.yml",
        dataset_pairs=pairs,
        test_pairs=tpairs,
        split={"train": 0.75, "val": 0.25},
    )
    data_defn = DatasetDefinition.from_yaml(defn_path)
    Sx, Sy = model.grid
    config = {
        "class_names": data_defn.classes,
        "no_classify": False,
        "iou_weight": 1,
        "no_obj_weight": 0.5,
        "label_smoothing": 0.0001,
        "half": False,
        "model": "m",
        "test_set": str(defn_path),
    }

    def loader():
        return get_dataloader(
            data_defn, 4, Sx=Sx, Sy=Sy, image_hw=image_hw
        )["test"]

    q_host = Trainer.test(loader(), config, model, variables,
                          include_mAP=False, quantize=True)
    q_fast = Trainer.test(loader(), config, model, variables,
                          include_mAP=False, quantize=True, fast_eval=True)
    assert abs(q_host[0] - q_fast[0]) < 1e-6  # identical eval program
    assert q_host[2].sum() == q_fast[2].sum()  # confusion total mass
    assert int(q_host[10][0]) == int(q_fast[10][0])  # total true objects


def test_test_model_class_mismatch_fails_fast(tmp_path):
    """A checkpoint evaluated against a dataset with a different class
    count must raise a clear error up front, not an opaque broadcast
    failure deep in the metrics engine (the reference silently builds
    metrics from the dataset's classes, yogo/utils/test_model.py:32-34)."""
    model = YOGO.create(
        (40, 56), 0.15, 0.2, len(CLASSES), model_version="quarter_filters"
    )
    variables = model.init(jax.random.key(0))
    ckpt = tmp_path / "m.ckpt"
    save_checkpoint(ckpt, model, variables, classes=CLASSES)

    pairs = [make_pair_dirs(tmp_path, "tr", n_images=4)]
    defn = write_defn(
        tmp_path / "d.yml",
        dataset_pairs=pairs,
        split={"train": 0.5, "val": 0.25, "test": 0.25},
        classes=CLASSES + ["extra"],
    )
    args = SimpleNamespace(
        ckpt_path=ckpt,
        dataset_defn_path=defn,
        wandb=False,
        wandb_entity=None,
        wandb_project=None,
        wandb_resume_id=None,
        dump_to_disk=False,
        include_mAP=False,
        include_background=True,
        note=None,
        tags=None,
    )
    with pytest.raises(ValueError, match="classes"):
        run_test_model(args)
