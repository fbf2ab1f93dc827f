"""Attribute the fused-postprocess cost: top-K vs gather vs NMS vs count.

Variants, all fused after the base_model forward in the bench's scanned
program (bs x 16 batches, device-resident):
  fwd        forward only (reference point)
  topk       forward + masked top-K by objectness + gather + count (iou 0
             disables the NMS stage entirely in count_class_predictions)
  topk_apx   like topk but jax.lax.approx_max_k instead of exact top_k
  nms        forward + full count path (top-K + NMS + count)

Usage: PYTHONPATH=... python tools/perf_postprocess_parts.py [bs] [K]
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
    from yogo_tpu.ops.postprocess import count_class_predictions
    from yogo_tpu.utils.default_hyperparams import DefaultHyperparams as df

    bs = int(sys.argv[1]) if len(sys.argv) > 1 else 512
    k = int(sys.argv[2]) if len(sys.argv) > 2 else 256

    model = YOGO.create(
        IMG_HW, df.ANCHOR_W, df.ANCHOR_H, num_classes=7,
        compute_dtype=jnp.bfloat16,
    )
    variables = model.init(jax.random.key(0))
    dstack = jax.jit(
        lambda key: jax.random.randint(
            key, (NUM_BATCHES, bs, 1, *IMG_HW), 0, 256, jnp.uint8
        )
    )(jax.random.key(0))
    jax.block_until_ready(dstack)

    def approx_topk_count(out):
        b, d, sy, sx = out.shape
        flat = out.reshape(b, d, sy * sx).transpose(0, 2, 1)
        obj = flat[..., 4]
        sort_key = jnp.where(obj > 0.5, obj, -1.0)
        top_val, top_idx = jax.lax.approx_max_k(sort_key, k)
        valid = top_val > 0.5
        sel = jnp.take_along_axis(flat, top_idx[..., None], axis=1)
        cls = jnp.argmax(sel[..., 5:], axis=-1)
        onehot = jax.nn.one_hot(cls, d - 5, dtype=jnp.int32)
        return jnp.sum(onehot * valid[..., None].astype(jnp.int32), axis=(0, 1))

    def make(tail):
        @jax.jit
        def run_all(stack):
            def body(carry, batch):
                out = model.apply(variables, batch, inference=True)
                return carry + tail(out), None

            return jax.lax.scan(body, jnp.float32(0), stack)[0]

        return run_all

    cases = [
        ("fwd", make(lambda out: out[:, 4].sum().astype(jnp.float32))),
        (
            "topk",
            make(
                lambda out: count_class_predictions(
                    out, obj_thresh=0.5, iou_thresh=0.0, max_detections=k
                ).sum().astype(jnp.float32)
            ),
        ),
        ("topk_apx", make(lambda out: approx_topk_count(out).sum().astype(jnp.float32))),
        (
            "nms",
            make(
                lambda out: count_class_predictions(
                    out, obj_thresh=0.5, iou_thresh=0.5, max_detections=k
                ).sum().astype(jnp.float32)
            ),
        ),
    ]
    for name, fn in cases:
        try:
            float(fn(dstack))
            best = 0.0
            for _ in range(3):
                t0 = time.perf_counter()
                float(fn(dstack))
                dt = time.perf_counter() - t0
                best = max(best, NUM_BATCHES * bs / dt)
            print(f"bs={bs} K={k} {name:9s}: {best:7.1f} img/s", flush=True)
        except Exception as e:
            print(f"bs={bs} K={k} {name}: FAIL {type(e).__name__} {str(e)[:100]}",
                  flush=True)


if __name__ == "__main__":
    main()
