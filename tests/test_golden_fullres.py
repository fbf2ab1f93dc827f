"""Full-resolution (772x1032) golden detections from a TRAINED model.

The committed 96x128 goldens (tests/test_golden_detections.py) pin the
small-shape program; bench.py measures the canonical 772x1032 production
shape - this golden pins THAT program on a checkpoint trained at the
canonical shape (tools/learning_validation.py with LV_HW=772,1032:
production-like scenes - ~36px objects matching the default anchors
0.0425x0.0555, 20-60 objects per image). The stripped checkpoint lives
at tests/goldens/trained_half_filters_fullres.ckpt.

Pins, all via the PRODUCT surface (`infer.predict`):
  - per-image detections (host-exact formatter) at obj/iou 0.5,
  - per-class totals,
  - the FUSED device count path (`--count`; selection-first
    count_class_predictions_raw) printing totals equal to the host path,
  - YOLO-txt export strings.

Regenerate deliberately (CPU-pinned):
  LV_CKPT=<path/to/fullres best.ckpt> python tests/test_golden_fullres.py
Fresh checkpoint:  LV_OUT=<dir> LV_HW=772,1032 LV_EPOCHS=120 \
  python tools/learning_validation.py   (TPU, ~6 min)

VERDICT r3 next-step #5. Detection schema anchor: reference
yogo/infer.py:39-57.
"""

import os
from pathlib import Path

import numpy as np

GOLDEN_DIR = Path(__file__).parent / "goldens"
GOLDEN_PATH = GOLDEN_DIR / "detections_fullres.npz"
CKPT_PATH = GOLDEN_DIR / "trained_half_filters_fullres.ckpt"
HW = (772, 1032)
CLASSES = ["cell", "parasite"]
N_IMAGES = 6


def gen_test_images(tmp_dir: Path, n: int = N_IMAGES, seed: int = 3):
    """Frozen copy of the FULLRES branch of the learning-validation
    generator (tools/learning_validation.py) at the held-out seed; PNG
    round-trip is lossless."""
    from PIL import Image

    tmp_dir.mkdir(parents=True, exist_ok=True)
    H, W = HW
    blobs = {0: (36, 36), 1: (24, 48)}
    r = np.random.default_rng(seed)
    for i in range(n):
        arr = np.full((H, W), 225, np.uint8)
        for _ in range(int(r.integers(20, 61))):
            cls = int(r.integers(0, 2))
            h, w = blobs[cls]
            y = int(r.integers(2, H - 2 - h))
            x = int(r.integers(2, W - 2 - w))
            arr[y : y + h, x : x + w] = 60 if cls == 0 else 130
        arr += r.integers(0, 12, arr.shape).astype(np.uint8)
        Image.fromarray(arr).save(tmp_dir / f"i{i:03d}.png")


def compute_outputs(tmp_path: Path):
    from yogo_tpu.infer import predict
    from yogo_tpu.ops.postprocess import format_preds

    img_dir = tmp_path / "imgs"
    out_dir = tmp_path / "out"
    gen_test_images(img_dir)

    preds = predict(
        CKPT_PATH,
        path_to_images=img_dir,
        output_dir=str(out_dir),
        save_preds=True,
        class_names=CLASSES,
        return_full_predictions=True,
        batch_size=2,
    )
    preds = np.asarray(preds, np.float32)

    dets = [format_preds(p, obj_thresh=0.5, iou_thresh=0.5) for p in preds]
    counts = np.zeros(len(CLASSES), np.int64)
    for d in dets:
        if len(d):
            np.add.at(counts, d[:, 5:].argmax(axis=1), 1)
    txts = {p.name: p.read_text() for p in sorted(out_dir.glob("*.txt"))}
    return dets, counts, txts


def test_golden_fullres_detections(tmp_path):
    assert CKPT_PATH.exists() and GOLDEN_PATH.exists(), (
        "full-res golden fixtures missing; see module docstring"
    )
    golden = np.load(GOLDEN_PATH, allow_pickle=True)
    dets, counts, txts = compute_outputs(tmp_path)

    assert sum(len(d) for d in dets) == int(golden["n_total_dets"])
    # the trained model detects a dense production-like scene: >= 20
    # objects per image on average
    assert int(golden["n_total_dets"]) >= 20 * N_IMAGES
    np.testing.assert_array_equal(counts, golden["class_counts"])
    for i, d in enumerate(dets):
        g = golden[f"dets_{i}"]
        assert d.shape == g.shape, f"detection count changed for image {i}"
        if len(d):
            np.testing.assert_allclose(d, g, rtol=2e-3, atol=2e-4)
    assert txts == golden["txts"].item()


def test_golden_fullres_fused_count_matches_host(tmp_path, capsys):
    """`--count` (the selection-first fused device path) on the canonical
    shape totals exactly the committed per-class counts."""
    from yogo_tpu.infer import predict

    assert CKPT_PATH.exists() and GOLDEN_PATH.exists()
    golden = np.load(GOLDEN_PATH, allow_pickle=True)
    img_dir = tmp_path / "imgs"
    gen_test_images(img_dir)
    predict(
        CKPT_PATH,
        path_to_images=img_dir,
        class_names=CLASSES,
        count_predictions=True,
        batch_size=2,
    )
    out = capsys.readouterr().out
    want = list(zip(CLASSES, (int(v) for v in golden["class_counts"])))
    assert str(want) in out, f"fused counts not found in output: {out!r}"


if __name__ == "__main__":
    import tempfile

    import jax

    jax.config.update("jax_platforms", "cpu")
    GOLDEN_DIR.mkdir(exist_ok=True)

    lv_ckpt = os.environ.get("LV_CKPT")
    if lv_ckpt:
        from yogo_tpu.utils.checkpoint import load_checkpoint, save_checkpoint

        model, variables, meta = load_checkpoint(lv_ckpt)
        assert tuple(model.img_size) == HW, model.img_size
        save_checkpoint(
            CKPT_PATH,
            model,
            variables,
            epoch=meta.get("epoch", 0),
            step=meta.get("step", 0),
            classes=meta.get("classes"),
            model_name=meta.get("model_name"),
        )
        print(f"stripped {lv_ckpt} -> {CKPT_PATH}")

    with tempfile.TemporaryDirectory() as d:
        dets, counts, txts = compute_outputs(Path(d))
    np.savez_compressed(
        GOLDEN_PATH,
        n_total_dets=sum(len(d) for d in dets),
        class_counts=counts,
        txts=np.array(txts, dtype=object),
        **{f"dets_{i}": d for i, d in enumerate(dets)},
    )
    print(
        f"wrote {GOLDEN_PATH} - det counts {[len(d) for d in dets]}, "
        f"class counts {counts.tolist()}"
    )
