"""CLI surface smoke tests (subprocess level - catches import-time breaks)."""

import os
import subprocess
import sys

import pytest

ENV = {**os.environ, "JAX_PLATFORMS": "cpu"}


def run_cli(*args, timeout=120):
    return subprocess.run(
        [sys.executable, "-m", "yogo_tpu", *args],
        capture_output=True,
        text=True,
        timeout=timeout,
        env=ENV,
    )


def test_global_help():
    r = run_cli("--help")
    assert r.returncode == 0
    for sub in ("train", "test", "export", "infer"):
        assert sub in r.stdout


@pytest.mark.parametrize("sub", ["train", "test", "export", "infer"])
def test_subcommand_help(sub):
    r = run_cli(sub, "--help")
    assert r.returncode == 0


def test_no_task_prints_help():
    r = run_cli()
    assert r.returncode == 0
    assert "what can yogo do" in r.stdout


def test_infer_requires_source():
    r = run_cli("infer", "some.ckpt")
    assert r.returncode == 2
    assert "required" in r.stderr


def test_train_flags_match_reference_surface():
    """Every reference train flag exists here too
    (reference: yogo/utils/argparsers.py:98-258)."""
    r = run_cli("train", "--help")
    for flag in (
        "--from-pretrained",
        "--dataset-split-override",
        "--batch-size",
        "--learning-rate",
        "--lr-decay-factor",
        "--label-smoothing",
        "--weight-decay",
        "--epochs",
        "--no-obj-weight",
        "--iou-weight",
        "--classify-weight",
        "--normalize-images",
        "--image-hw",
        "--rgb-images",
        "--model",
        "--half",
        "--device",
        "--note",
        "--name",
        "--tags",
        "--wandb-entity",
        "--wandb-project",
    ):
        assert flag in r.stdout, f"missing train flag {flag}"


def test_infer_flags_match_reference_surface():
    r = run_cli("infer", "--help")
    for flag in (
        "--path-to-images",
        "--path-to-zarr",
        "--draw-boxes",
        "--save-preds",
        "--save-npy",
        "--count",
        "--output-dir",
        "--class-names",
        "--batch-size",
        "--half",
        "--crop-height",
        "--output-img-filetype",
        "--obj-thresh",
        "--iou-thresh",
        "--min-class-confidence-threshold",
        "--heatmap-mask-path",
        "--use-tqdm",
    ):
        assert flag in r.stdout, f"missing infer flag {flag}"
