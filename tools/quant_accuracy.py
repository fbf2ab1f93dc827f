"""PTQ accuracy receipt: float vs int8 eval on the trained golden ckpt.

Regenerates the learning-validation held-out blob set (same generator +
seed as tools/learning_validation.py gen("test", 32, 2)), then runs
Trainer.test twice on tests/goldens/trained_half_filters.ckpt - the
float path and the `--quantize` int8 path - and prints both metric rows.
This is the measured answer to "what does int8 serving cost in mAP".

CPU-friendly (96x128 half_filters):
  PYTHONPATH=/root/repo:/root/.axon_site python tools/quant_accuracy.py
Set QA_CKPT to point at a different trained checkpoint.
"""

import json
import os
import tempfile
from pathlib import Path

import numpy as np
import yaml
from PIL import Image

import jax

if os.environ.get("QA_DEVICE", "cpu") == "cpu":
    jax.config.update("jax_platforms", "cpu")
jax.config.update(
    "jax_compilation_cache_dir",
    os.environ.get("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache"),
)

from yogo_tpu.data.definition import DatasetDefinition
from yogo_tpu.data.loader import get_dataloader
from yogo_tpu.train import Trainer
from yogo_tpu.utils.checkpoint import load_checkpoint

CKPT = Path(
    os.environ.get(
        "QA_CKPT",
        Path(__file__).parent.parent
        / "tests"
        / "goldens"
        / "trained_half_filters.ckpt",
    )
)


def gen(root: Path, name: str, n: int, seed: int) -> None:
    # identical recipe to tools/learning_validation.py gen() so the held-out
    # distribution matches what the golden ckpt was validated on
    imgd, lbld = root / f"img_{name}", root / f"lbl_{name}"
    imgd.mkdir(exist_ok=True), lbld.mkdir(exist_ok=True)
    r = np.random.default_rng(seed)
    for i in range(n):
        arr = np.full((96, 128), 225, np.uint8)
        rows = []
        for _ in range(int(r.integers(2, 5))):
            cls = int(r.integers(0, 2))
            h, w = (12, 12) if cls == 0 else (8, 16)
            y, x = int(r.integers(2, 94 - h)), int(r.integers(2, 126 - w))
            arr[y : y + h, x : x + w] = 60 if cls == 0 else 130
            rows.append(
                f"{cls} {(x + w / 2) / 128:.5f} {(y + h / 2) / 96:.5f} "
                f"{w / 128:.5f} {h / 96:.5f}"
            )
        arr += r.integers(0, 12, arr.shape).astype(np.uint8)
        Image.fromarray(arr).save(imgd / f"i{i:03d}.png")
        (lbld / f"i{i:03d}.txt").write_text("\n".join(rows))


def main() -> None:
    root = Path(tempfile.mkdtemp(prefix="yogo_qa_"))
    gen(root, "test", 32, 2)
    gen(root, "train", 2, 1)  # train/test dirs must differ (defn validation)
    yaml.safe_dump(
        {
            "class_names": ["cell", "parasite"],
            "dataset_paths": {
                "t": {
                    "image_path": str(root / "img_train"),
                    "label_path": str(root / "lbl_train"),
                }
            },
            "test_paths": {
                "h": {
                    "image_path": str(root / "img_test"),
                    "label_path": str(root / "lbl_test"),
                }
            },
            "dataset_split_fractions": {"train": 0.9, "val": 0.1},
        },
        (root / "d.yml").open("w"),
    )

    model, variables, _meta = load_checkpoint(CKPT)
    defn = DatasetDefinition.from_yaml(root / "d.yml")
    Sx, Sy = model.grid
    config = {
        "class_names": defn.classes,
        "no_classify": False,
        "iou_weight": 5.0,
        "no_obj_weight": 0.5,
        "label_smoothing": 0.01,
        "half": False,
        "model": str(CKPT),
        "test_set": str(root / "d.yml"),
    }

    def loader():
        return get_dataloader(
            defn, 32, Sx=Sx, Sy=Sy, image_hw=tuple(model.img_size)
        )["test"]

    rows = {}
    for tag, quantize in (("float", False), ("int8", True)):
        m = Trainer.test(
            loader(), config, model, variables, include_mAP=True,
            quantize=quantize,
        )
        (loss, mAP, confusion, _acc, _roc, prec, rec, ece, missed, extra,
         total, names) = m
        rows[tag] = {
            "loss": round(float(loss), 4),
            "mAP": round(float(mAP["map"]), 4),
            "mAP@0.5": round(float(mAP["map_50"]), 4),
            "precision": [round(float(p), 4) for p in prec],
            "recall": [round(float(r), 4) for r in rec],
            "ECE": round(float(ece), 4),
            "missed": [int(x) for x in missed],
            "extra": [int(x) for x in extra],
        }
        print(tag, json.dumps(rows[tag]))
    d50 = rows["float"]["mAP@0.5"] - rows["int8"]["mAP@0.5"]
    print(f"mAP@0.5 delta (float - int8): {d50:+.4f}")


if __name__ == "__main__":
    main()
