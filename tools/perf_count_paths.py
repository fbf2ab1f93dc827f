"""Fused count-path throughput at saturated vs production detection
density (bs=512, K=256). Historical note: this tool originally A/B'd a
'lean' count rewrite against the formatter path and measured the lean one
1.8x slower (per-channel gathers); that rewrite was reverted, so both
arms now measure the shipped formatter-based count_class_predictions -
the density axis is the remaining informative comparison (measured:
density changes throughput by <1 img/s; the cost is shape-static).

The production-density head mutation is imported from bench.py so this
tool always measures the same operating point as the headline e2e metric.

Usage: PYTHONPATH=... python tools/perf_count_paths.py [bs] [K]
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


def main():
    from yogo_tpu.models.yogo import YOGO
    from yogo_tpu.ops.postprocess import (
        count_class_predictions,
        format_preds_batched,
    )
    from yogo_tpu.utils.default_hyperparams import DefaultHyperparams as df

    bs = int(sys.argv[1]) if len(sys.argv) > 1 else 512
    k = int(sys.argv[2]) if len(sys.argv) > 2 else 256

    model = YOGO.create(
        IMG_HW, df.ANCHOR_W, df.ANCHOR_H, num_classes=7,
        compute_dtype=jnp.bfloat16,
    )
    v_raw = model.init(jax.random.key(0))
    import bench

    v_prod = bench.production_density_variables(v_raw)

    dstack = jax.jit(
        lambda key: jax.random.randint(
            key, (NUM_BATCHES, bs, 1, *IMG_HW), 0, 256, jnp.uint8
        )
    )(jax.random.key(0))
    jax.block_until_ready(dstack)

    def formatter_count(out):
        f = format_preds_batched(
            out, obj_thresh=0.5, iou_thresh=0.5, max_detections=k
        )
        cls = jnp.argmax(f["class_probs"], axis=-1)
        onehot = jax.nn.one_hot(cls, 7, dtype=jnp.int32)
        return jnp.sum(onehot * f["valid"][..., None].astype(jnp.int32))

    def lean_count(out):
        return count_class_predictions(
            out, obj_thresh=0.5, iou_thresh=0.5, max_detections=k
        ).sum()

    def make(variables, tail):
        @jax.jit
        def run_all(stack):
            def body(carry, batch):
                out = model.apply(variables, batch, inference=True)
                return carry + tail(out).astype(jnp.float32), None

            return jax.lax.scan(body, jnp.float32(0), stack)[0]

        return run_all

    for dname, variables in [("raw", v_raw), ("prod", v_prod)]:
        for pname, tail in [("lean", lean_count), ("formatter", formatter_count)]:
            fn = make(variables, tail)
            try:
                float(fn(dstack))
                best = 0.0
                for _ in range(3):
                    t0 = time.perf_counter()
                    float(fn(dstack))
                    dt = time.perf_counter() - t0
                    best = max(best, NUM_BATCHES * bs / dt)
                print(f"bs={bs} K={k} {dname:4s} {pname:9s}: {best:7.1f} img/s",
                      flush=True)
            except Exception as e:
                print(f"bs={bs} K={k} {dname} {pname}: FAIL "
                      f"{type(e).__name__} {str(e)[:100]}", flush=True)


if __name__ == "__main__":
    main()
