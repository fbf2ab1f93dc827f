"""Eval-path throughput: jitted eval step + full Metrics engine on TPU.

Measures what `yogo test` spends per batch: sharded eval forward, device
format/NMS at the Metrics default K=1024, then the host side (fetch,
Hungarian matching, confusion/mAP accumulation). Run before/after NMS or
formatter changes to quantify the eval speedup (the round-3 sort-free NMS
also serves this path).

Usage: PYTHONPATH=/root/repo:/root/.axon_site python tools/perf_eval.py [bs] [batches]
"""

import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update(
    "jax_compilation_cache_dir",
    os.environ.get("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache_tpu"),
)

IMG_HW = (772, 1032)


def main():
    from yogo_tpu.metrics.metrics import Metrics
    from yogo_tpu.models.yogo import YOGO
    from yogo_tpu.train import make_eval_step
    from yogo_tpu.utils.default_hyperparams import DefaultHyperparams as df

    bs = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    n_batches = int(sys.argv[2]) if len(sys.argv) > 2 else 4

    model = YOGO.create(
        IMG_HW, df.ANCHOR_W, df.ANCHOR_H, num_classes=7,
        compute_dtype=jnp.bfloat16,
    )
    variables = model.init(jax.random.key(0))
    Sx, Sy = model.grid

    imgs = jax.jit(
        lambda k: jax.random.randint(k, (bs, 1, *IMG_HW), 0, 256, jnp.uint8)
    )(jax.random.key(0))
    labels = np.zeros((bs, 6, Sy, Sx), np.float32)
    rng = np.random.default_rng(0)
    for i in range(bs):  # ~50 objects per image
        cells = rng.choice(Sy * Sx, 50, replace=False)
        ys, xs = np.unravel_index(cells, (Sy, Sx))
        labels[i, 0, ys, xs] = 1
        labels[i, 1, ys, xs] = np.clip((xs + 0.5) / Sx - 0.02, 0, 1)
        labels[i, 2, ys, xs] = np.clip((ys + 0.5) / Sy - 0.03, 0, 1)
        labels[i, 3, ys, xs] = np.clip((xs + 0.5) / Sx + 0.02, 0, 1)
        labels[i, 4, ys, xs] = np.clip((ys + 0.5) / Sy + 0.03, 0, 1)
        labels[i, 5, ys, xs] = rng.integers(0, 7, len(xs))
    labels_j = jnp.asarray(labels)
    mask = jnp.ones(bs, jnp.float32)
    jax.block_until_ready((imgs, labels_j))

    lk = dict(no_obj_weight=0.5, iou_weight=5.0, classify_weight=1.0,
              label_smoothing=0.01)
    jeval = jax.jit(make_eval_step(model, lk))

    from yogo_tpu.metrics import DeviceMetrics

    def run(metrics, fetch):
        loss, preds = jeval(
            variables["params"], variables.get("batch_stats", {}),
            imgs, labels_j, mask,
        )
        p = np.asarray(preds, np.float32) if fetch else preds
        metrics.update(p, labels if fetch else labels_j, mask)  # warmup
        metrics.reset()
        t0 = time.perf_counter()
        for _ in range(n_batches):
            loss, preds = jeval(
                variables["params"], variables.get("batch_stats", {}),
                imgs, labels_j, mask,
            )
            p = np.asarray(preds, np.float32) if fetch else preds
            metrics.update(p, labels if fetch else labels_j, mask)
        metrics.compute()  # device engine: forces the state fetch
        return time.perf_counter() - t0

    classes = [str(i) for i in range(7)]
    for k in (1024, 256):
        dt = run(Metrics(classes, max_detections=k, obj_thresh=0.5), True)
        print(
            f"host  bs={bs} K={k}: {n_batches * bs / dt:.1f} img/s eval "
            f"({dt / n_batches * 1000:.0f} ms/batch incl. host matching)",
            flush=True,
        )
    for k in (1024, 256):
        dt = run(
            DeviceMetrics(
                classes, max_detections=k, max_labels=k, obj_thresh=0.5
            ),
            False,
        )
        print(
            f"device bs={bs} K={k}: {n_batches * bs / dt:.1f} img/s eval "
            f"({dt / n_batches * 1000:.0f} ms/batch, jitted accumulate)",
            flush=True,
        )


if __name__ == "__main__":
    main()
