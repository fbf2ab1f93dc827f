"""Native single-file checkpoints.

Carries the same metadata as the reference's torch.save dict (reference:
yogo/train.py:267-293): epoch, step, normalize_images, classes, model_name,
model weights (params + batch stats), optimizer state, model_version - plus
our model config. Format: msgpack via flax.serialization, one file, no torch
needed. For .pth interop use yogo_tpu.utils.torch_bridge.
"""

from __future__ import annotations

import dataclasses
import json
import os
from pathlib import Path
from typing import Any, Dict, Optional, Tuple, Union

import jax
import numpy as np
from flax import serialization

from yogo_tpu.models.yogo import YOGO

CKPT_SUFFIX = ".ckpt"


def _to_numpy_tree(tree: Any) -> Any:
    return jax.tree.map(lambda x: np.asarray(x), tree)


def model_config_dict(model: YOGO) -> Dict[str, Any]:
    cfg = {
        f.name: getattr(model, f.name)
        for f in dataclasses.fields(model)
        if f.name != "compute_dtype"
    }
    cfg["img_size"] = list(cfg["img_size"])
    return cfg


def model_from_config(cfg: Dict[str, Any]) -> YOGO:
    cfg = dict(cfg)
    cfg["img_size"] = tuple(cfg["img_size"])
    return YOGO(**cfg)


def save_checkpoint(
    path: Union[str, Path],
    model: YOGO,
    variables: Dict[str, Any],
    opt_state: Any = None,
    epoch: int = 0,
    step: int = 0,
    classes: Optional[list] = None,
    model_name: Optional[str] = None,
    **extra_metadata,
) -> None:
    payload = {
        "meta": json.dumps(
            {
                "format": "yogo_tpu.ckpt.v1",
                "epoch": epoch,
                "step": step,
                "normalize_images": bool(model.normalize_images),
                "classes": classes,
                "model_name": model_name,
                "model_version": model.model_version,
                "model_config": model_config_dict(model),
                **extra_metadata,
            }
        ),
        "variables": _to_numpy_tree(variables),
    }
    if opt_state is not None:
        payload["opt_state"] = serialization.to_bytes(
            _to_numpy_tree(opt_state)
        )
    data = serialization.msgpack_serialize(payload)
    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    # pid-unique tmp name: even if two processes ever write the same
    # checkpoint path, neither renames a torn interleaved file into place
    tmp = path.with_suffix(path.suffix + f".tmp.{os.getpid()}")
    # fsync BEFORE the rename: the rename alone can be journaled durable
    # while the tmp file's data blocks are not, leaving a truncated file at
    # the final path after power loss - the exact torn state the atomic
    # rename is supposed to rule out. (Directory fsync afterwards makes the
    # rename itself durable.)
    with open(tmp, "wb") as f:
        f.write(data)
        f.flush()
        os.fsync(f.fileno())
    tmp.replace(path)  # atomic: never leave a torn checkpoint
    try:
        dfd = os.open(path.parent, os.O_RDONLY)
        try:
            os.fsync(dfd)
        finally:
            os.close(dfd)
    except OSError:
        pass  # e.g. a filesystem that can't fsync directories


def load_checkpoint(
    path: Union[str, Path],
) -> Tuple[YOGO, Dict[str, Any], Dict[str, Any]]:
    """Returns (model_config, variables, meta). meta includes the raw
    opt_state bytes under '_opt_state_bytes' (restore with
    restore_opt_state once the optimizer is built)."""
    raw = Path(path).read_bytes()
    payload = serialization.msgpack_restore(raw)
    meta = json.loads(payload["meta"])
    model = model_from_config(meta["model_config"])
    variables = payload["variables"]
    if "opt_state" in payload:
        meta["_opt_state_bytes"] = payload["opt_state"]
    return model, variables, meta


def restore_opt_state(meta: Dict[str, Any], opt_state_template: Any) -> Any:
    if "_opt_state_bytes" not in meta:
        return opt_state_template
    return serialization.from_bytes(
        opt_state_template, meta["_opt_state_bytes"]
    )


def load_any(path: Union[str, Path]):
    """Load either a native .ckpt or a reference-format .pth
    (dispatch on content), returning (model, variables, meta).

    There is no `inference` flag here: the reference bakes inference mode
    into the loaded module (yogo/model.py:94-147), while this model is a
    frozen config whose apply(inference=...) decides per call."""
    path = Path(path)
    if path.suffix == CKPT_SUFFIX:
        return load_checkpoint(path)
    if path.suffix == ".pth":
        from yogo_tpu.utils.torch_bridge import load_pth

        return load_pth(path)
    # sniff: msgpack checkpoints start with a fixmap/map byte, torch zips "PK"
    with open(path, "rb") as f:
        head = f.read(2)
    if head == b"PK":
        from yogo_tpu.utils.torch_bridge import load_pth

        return load_pth(path)
    return load_checkpoint(path)
