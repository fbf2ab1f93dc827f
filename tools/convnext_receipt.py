"""ConvNeXt-Small from-scratch learning receipt at DEVICE speed.

The disk-based learning-validation runs are loader-bound on this host's
single CPU core (~20-50 img/s of PNG decode vs the v5e's ~780 img/s
convnext train step), which starves the 50M-parameter convnext of steps:
100 epochs x 160 images barely moves it (loss ~10, mAP 0.0 - receipts in
docs/perf-notes.md). This harness trains the SAME production
make_train_step on in-memory synthetic blobs (identical recipe to
tools/learning_validation.py), so the step count is set by the chip, not
the loader: ~10k steps in ~10 min.

The disk pipeline itself is already convergence-proven by the
half_filters/base_model LV receipts; what this adds is the CONVNEXT
family's receipt (reference builds it with pretrained=False and an
untested "TODO is it better starting from pretrained?" -
yogo/model_defns.py:533-558 - so from-scratch convergence was never
demonstrated upstream either).

Run: PYTHONPATH=/root/repo:/root/.axon_site python tools/convnext_receipt.py
Env: CR_STEPS (default 8000), CR_LR (4e-4), CR_BS (32), CR_MODEL
(convnext_small). Prints a JSON receipt; asserts mAP@0.5 > 0.5 and
(for convnext) float-vs-int8 trained-net quant parity.
"""

from __future__ import annotations

import json
import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax

jax.config.update(
    "jax_compilation_cache_dir",
    os.environ.get("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache_tpu"),
)

import jax.numpy as jnp
import numpy as np

from yogo_tpu.models.yogo import YOGO
from yogo_tpu.ops.grid import encode_label_grid_np
from yogo_tpu.train import TrainState, make_optimizer, make_train_step

HW = (96, 128)
CLASSES = ["cell", "parasite"]
STEPS = int(os.environ.get("CR_STEPS", "8000"))
LR = float(os.environ.get("CR_LR", "4e-4"))
BS = int(os.environ.get("CR_BS", "32"))
MODEL = os.environ.get("CR_MODEL", "convnext_small")
N_TRAIN, N_TEST = 640, 32


def gen(n: int, seed: int, Sx: int, Sy: int):
    """The learning-validation blob recipe (96x128), in memory."""
    r = np.random.default_rng(seed)
    H, W = HW
    imgs = np.empty((n, H, W), np.uint8)
    grids = np.empty((n, 6, Sy, Sx), np.float32)
    for i in range(n):
        arr = np.full((H, W), 225, np.uint8)
        rows = []
        for _ in range(int(r.integers(2, 5))):
            cls = int(r.integers(0, 2))
            h, w = (12, 12) if cls == 0 else (8, 16)
            y, x = int(r.integers(2, H - 2 - h)), int(r.integers(2, W - 2 - w))
            arr[y : y + h, x : x + w] = 60 if cls == 0 else 130
            rows.append(
                [cls, x / W, y / H, (x + w) / W, (y + h) / H]
            )
        arr += r.integers(0, 12, arr.shape).astype(np.uint8)
        imgs[i] = arr
        grids[i] = encode_label_grid_np(np.asarray(rows, np.float32), Sx, Sy)
    return imgs, grids


def main() -> None:
    model = YOGO.create(
        HW, 0.1, 0.12, len(CLASSES),
        model_version=MODEL, compute_dtype=jnp.bfloat16,
    )
    Sx, Sy = model.grid
    imgs, grids = gen(N_TRAIN, 1, Sx, Sy)
    test_imgs, test_grids = gen(N_TEST, 2, Sx, Sy)

    variables = model.init(jax.random.key(0))
    loss_kwargs = dict(
        no_obj_weight=0.5, iou_weight=5.0, classify_weight=1.0,
        label_smoothing=0.01,
    )
    tx, _ = make_optimizer(LR, 5e-2, 10.0, total_steps=STEPS)
    step_fn = jax.jit(
        make_train_step(model, tx, loss_kwargs, augment=True),
        donate_argnums=(0,),
    )
    state = TrainState(
        params=variables["params"],
        batch_stats=variables.get("batch_stats", {}),
        opt_state=tx.init(variables["params"]),
        step=jnp.zeros((), jnp.int32),
    )

    # device-resident data; each step indexes a shuffled batch on host
    d_imgs = jax.device_put(imgs[:, None])  # (N, 1, H, W)
    d_grids = jax.device_put(grids)
    img_mask = jnp.ones((BS,), jnp.float32)
    rng = jax.random.key(0)
    order = np.random.default_rng(7)

    # CR_EVAL_EVERY > 0: held-out mAP@0.5 every N steps - the plateau
    # trajectory the round-5 receipt needs (is 20k steps converged, or
    # still climbing?)
    eval_every = int(os.environ.get("CR_EVAL_EVERY", "0"))
    map_traj = []

    from yogo_tpu.metrics.metrics import Metrics

    def map50_now(st) -> float:
        v = {"params": st.params, "batch_stats": st.batch_stats}
        m = Metrics(classes=CLASSES, include_mAP=True)
        for start in range(0, N_TEST, BS):
            xb = jnp.asarray(test_imgs[start : start + BS, None])
            m.update(
                np.asarray(model.apply(v, xb, inference=True), np.float32),
                test_grids[start : start + BS],
            )
        return float(m.compute()[0]["map_50"])

    losses = []
    idx_pool: list = []
    for s in range(STEPS):
        if len(idx_pool) < BS:
            idx_pool = list(order.permutation(N_TRAIN))
        bi = jnp.asarray(np.asarray(idx_pool[:BS]))
        idx_pool = idx_pool[BS:]
        state, loss, _ = step_fn(
            state, jnp.take(d_imgs, bi, axis=0),
            jnp.take(d_grids, bi, axis=0), img_mask, rng
        )
        if s % 250 == 0 or s == STEPS - 1:
            v = float(loss)  # fetch fences the chain, keeps dispatch async
            losses.append(round(v, 3))
            print(f"step {s}: loss {v:.3f}", flush=True)
        if eval_every and s > 0 and s % eval_every == 0:
            m50 = map50_now(state)
            map_traj.append({"step": s, "map_50": round(m50, 4)})
            print(f"step {s}: mAP@0.5 {m50:.4f}", flush=True)

    # ---- held-out eval through the host-exact engine

    final_vars = {"params": state.params, "batch_stats": state.batch_stats}
    metrics = Metrics(classes=CLASSES, include_mAP=True)
    for start in range(0, N_TEST, BS):
        xb = jnp.asarray(test_imgs[start : start + BS, None])
        preds = model.apply(final_vars, xb, inference=True)
        metrics.update(
            np.asarray(preds, np.float32),
            test_grids[start : start + BS],
        )
    mAP, confusion, _acc, _roc, prec, rec, _ece, missed, extra, total = (
        metrics.compute()
    )

    receipt = {
        "model": MODEL,
        "steps": STEPS,
        "lr": LR,
        "loss_trajectory": losses,
        "map50_trajectory": map_traj,
        "map_50": round(float(mAP["map_50"]), 4),
        "map": round(float(mAP["map"]), 4),
        "precision": [round(float(p), 4) for p in prec],
        "recall": [round(float(r), 4) for r in rec],
        "missed": np.asarray(missed).tolist(),
        "extra": np.asarray(extra).tolist(),
        "total_objects": int(np.asarray(total)[0]),
    }

    # ---- trained-net int8 quant parity (the convnext quant path)
    if MODEL.startswith("convnext"):
        from yogo_tpu.ops.quant import family_quant_plan

        build_qp, fwd_quant, _, _ = family_quant_plan(model, final_vars)
        qp = build_qp([test_imgs[:8, None]])
        xb = jnp.asarray(test_imgs[:16, None])
        f_preds = np.asarray(
            model.apply(final_vars, xb, inference=True), np.float32
        )
        q_preds = np.asarray(
            fwd_quant(model, qp, xb, inference=True), np.float32
        )
        from yogo_tpu.ops.postprocess import format_preds

        n_f = n_q = n_match = 0
        from tools.head_to_head import match_detections

        iou_sum = 0.0
        for i in range(len(xb)):
            df, dq = format_preds(f_preds[i]), format_preds(q_preds[i])
            m, miou, _ = match_detections(df, dq)
            n_f += len(df)
            n_q += len(dq)
            n_match += m
            iou_sum += miou * m
        receipt["quant_parity"] = {
            "float_dets": n_f,
            "int8_dets": n_q,
            "matched@0.5": n_match,
            "mean_match_iou": round(iou_sum / max(n_match, 1), 4),
        }

    print(json.dumps(receipt))
    out = os.environ.get("CR_JSON")
    if out:
        with open(out, "w") as f:
            json.dump(receipt, f, indent=1)

    assert receipt["map_50"] > 0.5, f"did not learn: mAP@0.5={receipt['map_50']}"
    if "quant_parity" in receipt:
        qpr = receipt["quant_parity"]
        assert qpr["matched@0.5"] >= 0.9 * max(qpr["float_dets"], 1), (
            f"int8 detections diverge from float: {qpr}"
        )
    print("CONVNEXT RECEIPT PASSED")


if __name__ == "__main__":
    main()
