"""Golden detection-level regression fixtures.

A deterministic model (fixed init seed) run on deterministic synthetic
images produces a detection set that is snapshotted into
tests/goldens/detections.npz. Any change to the conv stack, decode, NMS, or
formatting that shifts detections beyond float tolerance trips this test.
Regenerate deliberately with: python tests/test_golden_detections.py
"""

from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

GOLDEN_PATH = Path(__file__).parent / "goldens" / "detections.npz"
HW = (96, 128)
NUM_CLASSES = 4


def build_case():
    from yogo_tpu.models.yogo import YOGO

    model = YOGO.create(HW, 0.12, 0.15, NUM_CLASSES, model_version="base_model")
    variables = model.init(jax.random.key(1234))

    rng = np.random.default_rng(99)
    imgs = np.full((4, 1, *HW), 215, np.uint8)
    # deterministic dark blobs
    for i in range(4):
        for _ in range(3):
            y, x = int(rng.integers(8, 80)), int(rng.integers(8, 110))
            imgs[i, 0, y : y + 10, x : x + 12] = 35
    return model, variables, imgs


def compute_outputs():
    from yogo_tpu.ops.postprocess import format_preds

    model, variables, imgs = build_case()
    preds = np.asarray(
        model.apply(variables, jnp.asarray(imgs), inference=True), np.float32
    )
    # low thresholds so the untrained net yields detections deterministically
    dets = [
        format_preds(p, obj_thresh=0.45, iou_thresh=0.5) for p in preds
    ]
    return preds, dets


def test_golden_detections():
    assert GOLDEN_PATH.exists(), (
        "golden fixture missing; run python tests/test_golden_detections.py"
    )
    golden = np.load(GOLDEN_PATH)
    preds, dets = compute_outputs()

    np.testing.assert_allclose(
        preds, golden["raw_preds"], rtol=2e-3, atol=2e-4
    )
    for i, d in enumerate(dets):
        g = golden[f"dets_{i}"]
        assert d.shape == g.shape, f"detection count changed for image {i}"
        if len(d):
            np.testing.assert_allclose(d, g, rtol=2e-3, atol=2e-4)


if __name__ == "__main__":
    # regeneration must use the SAME CPU numerics the pytest comparison
    # runs under; without this, sitecustomize-style setups would bake the
    # golden with accelerator bf16-noisy convs
    import jax

    jax.config.update("jax_platforms", "cpu")
    GOLDEN_PATH.parent.mkdir(exist_ok=True)
    preds, dets = compute_outputs()
    np.savez_compressed(
        GOLDEN_PATH,
        raw_preds=preds,
        **{f"dets_{i}": d for i, d in enumerate(dets)},
    )
    print(
        f"wrote {GOLDEN_PATH} - raw {preds.shape}, det counts "
        f"{[len(d) for d in dets]}"
    )
