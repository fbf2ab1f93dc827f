import json

from yogo_tpu.utils.logging import RunLogger


def test_jsonl_commit_buffering(tmp_path):
    log = RunLogger(log_dir=tmp_path, config={"a": 1}, use_wandb=False)
    log.log({"loss": 1.0}, step=1, commit=False)
    log.log({"loss": 0.9}, step=2, commit=False)
    log.log({"loss": 0.8}, step=3, commit=True)  # flush
    log.log({"loss": 0.7}, step=4, commit=True)
    log.summary({"final": 0.5})
    log.finish()

    lines = [
        json.loads(ln) for ln in (tmp_path / "metrics.jsonl").read_text().splitlines()
    ]
    committed = [ln for ln in lines if "loss" in ln]
    # wandb semantics: an uncommitted row flushes when the step advances,
    # so EVERY step survives (merging across steps would overwrite 99 of
    # every 100 per-step train records)
    assert [(ln["step"], ln["loss"]) for ln in committed] == [
        (1, 1.0),
        (2, 0.9),
        (3, 0.8),
        (4, 0.7),
    ]
    assert any("_summary" in ln for ln in lines)
    assert json.loads((tmp_path / "config.json").read_text()) == {"a": 1}


def test_disabled_logger_writes_nothing(tmp_path):
    log = RunLogger(log_dir=tmp_path, use_wandb=False, enabled=False)
    log.log({"x": 1}, step=1)
    log.summary({"y": 2})
    log.finish()
    assert not (tmp_path / "metrics.jsonl").exists()


def test_zarr_gated_error(tmp_path):
    import importlib.util

    import pytest

    from yogo_tpu.data.image_source import ZarrDataset

    (tmp_path / "x.zarr").mkdir()
    if importlib.util.find_spec("zarr") is not None:
        pytest.skip("zarr installed; the gated ImportError path is moot")
    with pytest.raises(ImportError, match="path-to-images"):
        ZarrDataset(tmp_path / "x.zarr")


def test_finish_flushes_trailing_uncommitted_row(tmp_path):
    """A trailing commit=False row must survive finish() (it used to be
    silently dropped when the file closed)."""
    log = RunLogger(log_dir=tmp_path, use_wandb=False)
    log.log({"loss": 1.0}, step=1, commit=False)
    log.finish()
    lines = [
        json.loads(ln) for ln in (tmp_path / "metrics.jsonl").read_text().splitlines()
    ]
    assert any(ln.get("loss") == 1.0 and ln.get("step") == 1 for ln in lines)
