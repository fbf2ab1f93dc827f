"""CLI surface smoke tests (subprocess level - catches import-time breaks)."""

import os
import subprocess
import sys

import pytest

# NOTE: this env var alone does NOT force CPU once a backend initializes
# (the axon sitecustomize overrides it with jax.config.update - CLAUDE.md);
# it is sufficient here ONLY because every run_cli call exits inside
# argparse before backend init. A future smoke test that actually runs a
# subcommand must pass `--device cpu` (which calls jax.config.update).
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
    for sub in ("train", "test", "export", "infer", "serve"):
        assert sub in r.stdout


@pytest.mark.parametrize("sub", ["train", "test", "export", "infer", "serve"])
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


def test_train_remat_flag_extension():
    """--remat (TPU-native extension): present, validated choices."""
    r = run_cli("train", "--help")
    assert "--remat" in r.stdout
    from yogo_tpu.utils.argparsers import train_parser

    args = train_parser().parse_args(["d.yml", "--remat", "blocks"])
    assert args.remat == "blocks"
    with pytest.raises(SystemExit):
        train_parser().parse_args(["d.yml", "--remat", "sometimes"])


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


def test_device_flag_actually_switches_backend():
    """--device must change the executing JAX platform. Regression: the CLI
    previously only set the JAX_PLATFORMS env var AFTER jax was already
    imported (and sitecustomize-style setups override the env var anyway),
    so --device cpu silently kept running on the accelerator."""
    code = (
        "from yogo_tpu.utils.argparsers import global_parser\n"  # imports jax
        "from yogo_tpu.__main__ import apply_device_override\n"
        "apply_device_override('cpu')\n"
        "import jax\n"
        "print('BACKEND=' + jax.default_backend())\n"
    )
    env = {k: v for k, v in os.environ.items() if k != "JAX_PLATFORMS"}
    r = subprocess.run(
        [sys.executable, "-c", code],
        capture_output=True, text=True, timeout=300, env=env,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    assert "BACKEND=cpu" in r.stdout


def test_fast_eval_is_default_and_opt_out_works():
    """Round 4: the device metrics engine is the default on both train's
    post-test pass and `yogo test`; --no-fast-eval restores the
    host-exact Hungarian engine."""
    from yogo_tpu.utils.argparsers import test_parser, train_parser

    t = test_parser().parse_args(["m.ckpt", "d.yml"])
    assert t.fast_eval is True
    assert test_parser().parse_args(
        ["m.ckpt", "d.yml", "--no-fast-eval"]
    ).fast_eval is False
    tr = train_parser().parse_args(["d.yml"])
    assert tr.fast_eval is True
    assert train_parser().parse_args(
        ["d.yml", "--no-fast-eval"]
    ).fast_eval is False
