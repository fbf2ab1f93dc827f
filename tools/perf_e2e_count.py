"""End-to-end inference throughput: forward + fused on-device postprocess
(filter -> top-K -> NMS -> per-class count), swept over the NMS capacity K.

The (B, K, K) IoU/suppression matrices are the memory hot spot
(ops/nms.py:111-115): K=1024 at bs=512 is ~2 GB of f32 per buffer, K=256 is
134 MB. This sweep measures what capacity the 772x1032 count path can afford
while holding the >=5k img/s north star (VERDICT r2 next-step #1).

Usage: PYTHONPATH=/root/repo:/root/.axon_site python tools/perf_e2e_count.py [bs] [K ...]
"""

import os
import sys
import time

import jax
import jax.numpy as jnp

jax.config.update(
    "jax_compilation_cache_dir",
    os.environ.get("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache_tpu"),
)

NUM_BATCHES = 16
IMG_HW = (772, 1032)


def main() -> None:
    from yogo_tpu.models.yogo import YOGO
    from yogo_tpu.ops.postprocess import count_class_predictions
    from yogo_tpu.utils.default_hyperparams import DefaultHyperparams as df

    bs = int(sys.argv[1]) if len(sys.argv) > 1 else 512
    ks = [int(k) for k in sys.argv[2:]] or [0, 128, 256, 512, 1024]

    model = YOGO.create(
        IMG_HW, df.ANCHOR_W, df.ANCHOR_H, num_classes=7,
        compute_dtype=jnp.bfloat16,
    )
    variables = model.init(jax.random.key(0))

    dstack = jax.jit(
        lambda k: jax.random.randint(
            k, (NUM_BATCHES, bs, 1, *IMG_HW), 0, 256, jnp.uint8
        )
    )(jax.random.key(0))
    jax.block_until_ready(dstack)

    def run_for_k(k: int):
        if k == 0:  # forward-only reference point

            @jax.jit
            def run_all(stack):
                def body(carry, batch):
                    out = model.apply(variables, batch, inference=True)
                    return carry + out[:, 4].sum(), None

                total, _ = jax.lax.scan(body, jnp.float32(0), stack)
                return total

        else:

            @jax.jit
            def run_all(stack):
                def body(carry, batch):
                    out = model.apply(variables, batch, inference=True)
                    counts = count_class_predictions(
                        out, obj_thresh=0.5, iou_thresh=0.5,
                        max_detections=k,
                    )
                    return carry + counts.sum().astype(jnp.float32), None

                total, _ = jax.lax.scan(body, jnp.float32(0), stack)
                return total

        float(run_all(dstack))  # compile + warmup
        best = 0.0
        for _ in range(3):
            t0 = time.perf_counter()
            float(run_all(dstack))  # scalar fetch = honest fence
            dt = time.perf_counter() - t0
            best = max(best, NUM_BATCHES * bs / dt)
        return best

    for k in ks:
        try:
            rate = run_for_k(k)
            tag = "forward-only" if k == 0 else f"K={k}"
            print(f"bs={bs} {tag}: {rate:.1f} img/s", flush=True)
        except Exception as e:
            print(f"bs={bs} K={k}: FAIL {type(e).__name__} {str(e)[:120]}",
                  flush=True)


if __name__ == "__main__":
    main()
