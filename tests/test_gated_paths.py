"""Exercise the import-gated paths (zarr, wandb) with in-test fakes.

zarr and wandb are absent from this environment, so round 1 left
ZarrDataset, the RunLogger wandb mirror, and the wandb table helpers
unexecuted. These tests install minimal fake modules in sys.modules to run
the real code paths (reference behaviors: yogo/data/image_path_dataset.py:
76-126, yogo/train.py:225-265,329-339, yogo/utils/utils.py:50-129)."""

import sys
import types
from pathlib import Path

import numpy as np
import pytest


# ------------------------------------------------------------------ fake zarr
class _FakeZarrArray:
    """(H, W, N) image stack with zarr.Array's `initialized` property."""

    def __init__(self, data):
        self._d = np.asarray(data)

    @property
    def initialized(self):
        return self._d.shape[2]

    def __getitem__(self, idx):
        return self._d[idx]


class _FakeZarrGroup:
    def __init__(self, arrays):
        self._arrays = [np.asarray(a) for a in arrays]

    def __len__(self):
        return len(self._arrays)

    def __getitem__(self, idx):
        return _FakeZarrLeaf(self._arrays[idx])


class _FakeZarrLeaf:
    def __init__(self, arr):
        self._arr = arr

    def __getitem__(self, sl):
        return self._arr[sl]


@pytest.fixture()
def fake_zarr(monkeypatch, tmp_path):
    mod = types.ModuleType("zarr")
    mod.Array = _FakeZarrArray
    stores = {}

    def open(path, mode="r"):
        return stores[str(path)]

    mod.open = open
    mod._stores = stores
    monkeypatch.setitem(sys.modules, "zarr", mod)
    return mod, tmp_path


def test_zarr_source_rejects_rgb(fake_zarr):
    """zarr stacks are single-channel; an RGB checkpoint must be rejected
    upfront instead of failing inside the jitted forward."""
    from yogo_tpu.data.image_source import get_dataset

    mod, tmp_path = fake_zarr
    zp = tmp_path / "imgs.zip"
    zp.write_bytes(b"")
    mod._stores[str(zp)] = _FakeZarrArray(np.zeros((8, 8, 2), np.uint8))
    with pytest.raises(ValueError, match="single-channel"):
        get_dataset(path_to_zarr=zp, rgb=True)


def test_zarr_dataset_array_mode(fake_zarr):
    mod, tmp_path = fake_zarr
    from yogo_tpu.data.image_source import ZarrDataset

    rng = np.random.default_rng(0)
    stack = rng.integers(0, 255, (40, 56, 12), np.uint8)
    zp = tmp_path / "imgs.zip"
    zp.write_bytes(b"")  # existence check only; store resolved via fake
    mod._stores[str(zp)] = _FakeZarrArray(stack)

    ds = ZarrDataset(zp)
    assert len(ds) == 12
    img, name = ds[3]
    assert img.shape == (1, 40, 56)
    np.testing.assert_array_equal(img[0], stack[:, :, 3])
    # zero-padded synthesized names (reference: image_path_dataset.py:105-106)
    assert name == "img_03.png"


def test_zarr_dataset_group_mode_crop_normalize(fake_zarr):
    mod, tmp_path = fake_zarr
    from yogo_tpu.data.image_source import ZarrDataset

    rng = np.random.default_rng(1)
    arrays = [rng.integers(0, 255, (40, 56), np.uint8) for _ in range(3)]
    zp = tmp_path / "group.zarr"
    zp.mkdir()
    mod._stores[str(zp)] = _FakeZarrGroup(arrays)

    ds = ZarrDataset(zp, crop_hw=(20, 56), normalize_images=True)
    assert len(ds) == 3
    img, name = ds[1]
    assert img.shape == (1, 20, 56)
    assert img.dtype == np.float32 and img.max() <= 1.0
    np.testing.assert_allclose(
        img[0], arrays[1][10:30].astype(np.float32) / 255.0
    )


def test_get_dataset_zarr_selector(fake_zarr):
    mod, tmp_path = fake_zarr
    from yogo_tpu.data.image_source import ZarrDataset, get_dataset

    zp = tmp_path / "s.zip"
    zp.write_bytes(b"")
    mod._stores[str(zp)] = _FakeZarrArray(np.zeros((8, 8, 2), np.uint8))
    ds = get_dataset(path_to_zarr=zp)
    assert isinstance(ds, ZarrDataset)
    with pytest.raises(ValueError):
        get_dataset(path_to_images=tmp_path, path_to_zarr=zp)


def test_zarr_dataset_missing_file(fake_zarr):
    from yogo_tpu.data.image_source import ZarrDataset

    with pytest.raises(FileNotFoundError):
        ZarrDataset(Path("/nonexistent/store.zip"))


# ----------------------------------------------------------------- fake wandb
class _FakeRun:
    name = "fake-run-7"


class _Calls:
    def __init__(self):
        self.logs = []
        self.summary = {}
        self.finished = False
        self.config_updates = []
        self.init_kwargs = {}


@pytest.fixture()
def fake_wandb(monkeypatch):
    calls = _Calls()
    mod = types.ModuleType("wandb")

    class _Config:
        @staticmethod
        def update(d, allow_val_change=False):
            calls.config_updates.append(d)

    mod.login = lambda anonymous=None: None
    mod.init = lambda **kw: (calls.init_kwargs.update(kw), _FakeRun())[1]
    mod.log = lambda metrics, step=None: calls.logs.append((step, metrics))
    mod.summary = calls.summary
    mod.finish = lambda: setattr(calls, "finished", True)
    mod.config = _Config()

    class _Table:
        def __init__(self, data=None, columns=None):
            self.data = data
            self.columns = columns

    mod.Table = _Table
    mod.plot_table = lambda vspec, table, fields, strings: (vspec, table)
    monkeypatch.setitem(sys.modules, "wandb", mod)
    return mod, calls


def test_runlogger_mirrors_to_wandb(fake_wandb, tmp_path):
    mod, calls = fake_wandb
    from yogo_tpu.utils.logging import RunLogger

    lg = RunLogger(log_dir=tmp_path, config={"a": 1}, use_wandb=True,
                   name=None)
    assert lg.run_name == "fake-run-7"  # picked up from the wandb run
    lg.update_config({"Sx": 8})
    lg.log({"train loss": 1.5}, step=1, commit=False)
    # advancing the step flushes the buffered step-1 row (wandb semantics:
    # uncommitted rows belong to one step; merging across steps loses data)
    lg.log({"LR": 0.1}, step=2, commit=True)
    lg.summary({"test mAP": 0.5})
    lg.finish()

    assert calls.config_updates == [{"Sx": 8}]
    assert calls.logs == [
        (1, {"train loss": 1.5}),
        (2, {"LR": 0.1}),
    ]
    assert calls.summary["test mAP"] == 0.5
    assert calls.finished
    # the jsonl mirror is written regardless
    assert (tmp_path / "metrics.jsonl").exists()


def test_runlogger_forwards_wandb_resume_id(fake_wandb):
    """yogo test --wandb-resume-id must APPEND to the named run, not open
    a fresh one (reference: yogo/utils/test_model.py:47-52 passes
    id=..., resume='allow')."""
    mod, calls = fake_wandb
    from yogo_tpu.utils.logging import RunLogger

    RunLogger(use_wandb=True, wandb_resume_id="abc123")
    assert calls.init_kwargs["id"] == "abc123"
    assert calls.init_kwargs["resume"] == "allow"

    calls.init_kwargs.clear()
    RunLogger(use_wandb=True)  # no resume: a fresh run, no resume kwarg
    assert calls.init_kwargs["id"] is None
    assert calls.init_kwargs["resume"] is None


def test_wandb_roc_and_confusion_helpers(fake_wandb):
    mod, _ = fake_wandb
    from yogo_tpu.utils.wandb_helpers import get_wandb_confusion, get_wandb_roc

    fpr = [np.linspace(0, 1, 5), np.linspace(0, 1, 5)]
    tpr = [np.linspace(0, 1, 5) ** 0.5, np.linspace(0, 1, 5) ** 2]
    thr = np.linspace(0, 1, 5)
    table = get_wandb_roc(fpr, tpr, thr, ["a", "b"])
    assert table.columns == ["fpr", "tpr", "threshold", "class"]
    assert len(table.data) == 10

    conf = np.array([[5, 1], [2, 7]])
    vspec, tbl = get_wandb_confusion(conf, ["a", "b"], "test confusion")
    assert vspec == "wandb/confusion_matrix/v1"
    rows = tbl.data
    assert ["0 - a", "1 - b", 1] in [list(r) for r in rows]


# ------------------------------------------------------------------- fake mo
def test_openvino_mo_invoked_when_on_path(monkeypatch, tmp_path):
    """`yogo export` runs OpenVINO's `mo` converter when it exists on PATH
    (reference: yogo/utils/export_model.py:138-150). A fake `mo` script
    records its argv and emits the IR files."""
    import os
    import stat
    from types import SimpleNamespace

    import jax

    from yogo_tpu.models.yogo import YOGO
    from yogo_tpu.utils.checkpoint import save_checkpoint
    from yogo_tpu.utils.export_model import do_export

    bindir = tmp_path / "bin"
    bindir.mkdir()
    mo = bindir / "mo"
    arglog = tmp_path / "mo_args.txt"
    mo.write_text(
        "#!/usr/bin/env bash\n"
        f'echo "$@" > {arglog}\n'
        'out=""; model=""\n'
        'while [ $# -gt 0 ]; do\n'
        '  case "$1" in\n'
        '    --input_model) model="$2"; shift 2;;\n'
        '    --output_dir) out="$2"; shift 2;;\n'
        "    *) shift;;\n"
        "  esac\n"
        "done\n"
        'base=$(basename "$model" .onnx)\n'
        'touch "$out/$base.xml" "$out/$base.bin"\n'
    )
    mo.chmod(mo.stat().st_mode | stat.S_IEXEC)
    monkeypatch.setenv("PATH", f"{bindir}:{os.environ['PATH']}")

    model = YOGO.create((48, 64), 0.1, 0.12, 3, model_version="quarter_filters")
    variables = model.init(jax.random.key(0))
    ckpt = tmp_path / "m.ckpt"
    save_checkpoint(ckpt, model, variables, classes=["a", "b", "c"])

    outfile = tmp_path / "exported"
    do_export(SimpleNamespace(input=str(ckpt), crop_height=None,
                              output_filename=str(outfile), simplify=True,
                              format="onnx"))
    assert (tmp_path / "exported.onnx").exists()
    assert (tmp_path / "exported.xml").exists()
    assert (tmp_path / "exported.bin").exists()
    args = arglog.read_text()
    assert "--compress_to_fp16 True" in args


def test_wandb_roc_accepts_ragged_curves(fake_wandb):
    """Per-class ROC curves of different lengths (per-class-threshold ROC
    output) must build a table - np.asarray on a ragged list raises on
    numpy>=1.24, which the pure-python iteration avoids."""
    from yogo_tpu.utils.wandb_helpers import get_wandb_roc

    table = get_wandb_roc(
        fpr=[[0.0, 0.5, 1.0], [0.0, 0.2, 0.6, 1.0]],
        tpr=[[0.0, 0.7, 1.0], [0.0, 0.4, 0.8, 1.0]],
        thresholds=[[0.9, 0.5, 0.1], [0.95, 0.6, 0.3, 0.05]],
        classes=["a", "b"],
    )
    assert len(table.data) == 7  # 3 + 4 rows
    # shared 1-D thresholds broadcast over rectangular classes
    table2 = get_wandb_roc(
        fpr=[0.0, 0.5, 1.0],
        tpr=[[0.0, 0.7, 1.0], [0.0, 0.4, 0.8]],
        thresholds=[0.9, 0.5, 0.1],
        classes=["a", "b"],
    )
    assert len(table2.data) == 6


def test_openvino_mo_failure_not_reported_as_success(monkeypatch, tmp_path, capsys):
    """A failing `mo` (nonzero exit) must not print .xml/.bin paths that
    were never written; the .onnx export itself stays valid."""
    import os
    import stat
    from types import SimpleNamespace

    import jax

    from yogo_tpu.models.yogo import YOGO
    from yogo_tpu.utils.checkpoint import save_checkpoint
    from yogo_tpu.utils.export_model import do_export

    bindir = tmp_path / "bin"
    bindir.mkdir()
    mo = bindir / "mo"
    mo.write_text(
        "#!/usr/bin/env bash\n"
        'echo "unsupported op: Futz" >&2\n'
        "exit 3\n"
    )
    mo.chmod(mo.stat().st_mode | stat.S_IEXEC)
    monkeypatch.setenv("PATH", f"{bindir}:{os.environ['PATH']}")

    model = YOGO.create((48, 64), 0.1, 0.12, 3, model_version="quarter_filters")
    variables = model.init(jax.random.key(0))
    ckpt = tmp_path / "m.ckpt"
    save_checkpoint(ckpt, model, variables, classes=["a", "b", "c"])

    do_export(SimpleNamespace(input=str(ckpt), crop_height=None,
                              output_filename=str(tmp_path / "exported"),
                              simplify=False, format="onnx"))
    out = capsys.readouterr().out
    assert (tmp_path / "exported.onnx").exists()
    assert not (tmp_path / "exported.xml").exists()
    assert "exported.xml" not in out  # no phantom IR files in the message
    assert "mo failed (exit 3)" in out
    assert "unsupported op: Futz" in out  # mo's stderr surfaced
