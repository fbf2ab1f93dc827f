"""Programmatic fake-data fixtures: tiny PNGs + YOLO label txts + definition
YAMLs, generated into tmp dirs (equivalent coverage to the reference's static
tests/fake-data tree, reference: tests/test_dataset_definition.py:20-158)."""

from pathlib import Path

import numpy as np
import yaml
from PIL import Image

CLASSES = ["healthy", "ring", "misc"]


def make_image(path: Path, h=40, w=56, seed=0):
    rng = np.random.default_rng(seed)
    arr = np.full((h, w), 220, np.uint8)
    arr += rng.integers(0, 20, (h, w)).astype(np.uint8)
    Image.fromarray(arr).save(path)


def make_label_file(path: Path, rows):
    with open(path, "w") as f:
        f.write("\n".join(" ".join(str(v) for v in r) for r in rows))


def make_pair_dirs(root: Path, name: str, n_images=3, boxes_per_image=2, seed=0):
    """Create images_<name>/ + labels_<name>/ with matching files."""
    img_dir = root / f"images_{name}"
    lbl_dir = root / f"labels_{name}"
    img_dir.mkdir(parents=True, exist_ok=True)
    lbl_dir.mkdir(parents=True, exist_ok=True)
    rng = np.random.default_rng(seed)
    for i in range(n_images):
        make_image(img_dir / f"img_{i}.png", seed=seed * 100 + i)
        rows = []
        for _ in range(boxes_per_image):
            cls = int(rng.integers(0, len(CLASSES)))
            xc, yc = rng.uniform(0.2, 0.8, 2).round(4)
            w, h = rng.uniform(0.1, 0.2, 2).round(4)
            rows.append([cls, xc, yc, w, h])
        make_label_file(lbl_dir / f"img_{i}.txt", rows)
    return img_dir, lbl_dir


def write_defn(path: Path, dataset_pairs=None, test_pairs=None, defn_paths=None,
               test_defn_paths=None, classes=CLASSES, split=None, thumbs=None):
    data = {"class_names": list(classes)}
    paths = {}
    for i, (img, lbl) in enumerate(dataset_pairs or []):
        paths[f"pair{i}"] = {"image_path": str(img), "label_path": str(lbl)}
    for i, d in enumerate(defn_paths or []):
        paths[f"defn{i}"] = {"defn_path": str(d)}
    if paths:
        data["dataset_paths"] = paths
    tpaths = {}
    for i, (img, lbl) in enumerate(test_pairs or []):
        tpaths[f"tpair{i}"] = {"image_path": str(img), "label_path": str(lbl)}
    for i, d in enumerate(test_defn_paths or []):
        tpaths[f"tdefn{i}"] = {"defn_path": str(d)}
    if tpaths:
        data["test_paths"] = tpaths
    if split is not None:
        data["dataset_split_fractions"] = split
    if thumbs is not None:
        data["thumbnail_augmentation"] = thumbs
    with open(path, "w") as f:
        yaml.safe_dump(data, f)
    return path


def torch_reference_yogo_loss(
    pred_batch,
    label_batch,
    no_obj_weight=0.5,
    iou_weight=5.0,
    classify_weight=1.0,
    label_smoothing=0.01,
):
    """Differentiable torch twin of the reference YOGOLoss.forward control
    flow (masked gather -> drop degenerate boxes -> clamped CIoU sum;
    full-grid CE masked by objectness; objectness-weighted MSE; every term
    / batch_size) - the single shared oracle for tests/test_loss.py and
    tools/head_to_head.py (reference: yogo/yogo_loss.py:38-129).

    pred_batch: (B, 5+C, Sy, Sx) decoded predictions (class logits);
    label_batch: (B, 6, Sy, Sx) [mask, x1, y1, x2, y2, class].
    Returns (total, components) - both still attached to the graph.
    """
    import torch

    bs = pred_batch.shape[0]
    flat_p = pred_batch[:, :4].permute(1, 0, 2, 3).reshape(4, -1)
    flat_l = label_batch[:, 1:5].permute(1, 0, 2, 3).reshape(4, -1)
    m = label_batch[:, 0:1].permute(1, 0, 2, 3).reshape(-1).bool()
    pm = flat_p[:, m].T
    lm = flat_l[:, m].T
    pm_xyxy = torch.stack(
        [
            pm[:, 0] - pm[:, 2] / 2,
            pm[:, 1] - pm[:, 3] / 2,
            pm[:, 0] + pm[:, 2] / 2,
            pm[:, 1] + pm[:, 3] / 2,
        ],
        dim=1,
    )
    ok = (pm_xyxy[:, 0] != pm_xyxy[:, 2]) & (pm_xyxy[:, 1] != pm_xyxy[:, 3])
    iou_loss = (
        iou_weight
        * torch_ciou_oracle(pm_xyxy[ok].clamp(0, 1), lm[ok]).sum()
        / bs
    )
    cel = torch.nn.CrossEntropyLoss(
        reduction="none", label_smoothing=label_smoothing
    )
    cls_loss = (
        classify_weight
        * (label_batch[:, 0] * cel(pred_batch[:, 5:], label_batch[:, 5].long())).sum()
        / bs
    )
    mse = torch.nn.MSELoss(reduction="none")
    obj_loss = (
        mse(pred_batch[:, 4], label_batch[:, 0])
        * (label_batch[:, 0] * (1 - no_obj_weight) + no_obj_weight)
    ).sum() / bs
    total = obj_loss + iou_loss + cls_loss
    return total, {
        "iou_loss": iou_loss,
        "objectness_loss": obj_loss,
        "classification_loss": cls_loss,
    }


def torch_ciou_oracle(b1, b2, eps=1e-7):
    """Independent torch reimplementation of the published torchvision CIoU
    formula - the single shared oracle for tests/test_boxes.py and
    tests/test_loss.py (duplicated copies could drift apart silently).
    Callers have already import-gated torch."""
    import torch

    x1, y1, x2, y2 = b1.unbind(-1)
    x1g, y1g, x2g, y2g = b2.unbind(-1)
    a1 = (x2 - x1) * (y2 - y1)
    a2 = (x2g - x1g) * (y2g - y1g)
    lt = torch.max(b1[..., :2], b2[..., :2])
    rb = torch.min(b1[..., 2:], b2[..., 2:])
    wh = (rb - lt).clamp(min=0)
    inter = wh[..., 0] * wh[..., 1]
    iou = inter / (a1 + a2 - inter + eps)
    xc1 = torch.min(x1, x1g)
    yc1 = torch.min(y1, y1g)
    xc2 = torch.max(x2, x2g)
    yc2 = torch.max(y2, y2g)
    diag = (xc2 - xc1) ** 2 + (yc2 - yc1) ** 2 + eps
    center = ((x1 + x2 - x1g - x2g) ** 2 + (y1 + y2 - y1g - y2g) ** 2) / 4
    v = (4 / torch.pi**2) * (
        torch.atan((x2g - x1g) / (y2g - y1g))
        - torch.atan((x2 - x1) / (y2 - y1))
    ) ** 2
    alpha = (v / (1 - iou + v + eps)).detach()
    return 1 - iou + center / diag + alpha * v
