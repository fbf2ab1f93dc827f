"""Time the windowed (selection-free) count path vs the top-K+NMS path.

Fused after the base_model forward in the bench's scanned program
(production detection density via bench.production_density_variables),
sweeping the window radius. Also times the stencil pass alone (iou+direction
planes, no fixed point) for attribution.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python tools/perf_window_nms.py \
         [bs] [radii...]   (default bs=512, radii 3 4 5)
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

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

NUM_BATCHES = 16
IMG_HW = (772, 1032)


def main():
    from bench import production_density_variables
    from yogo_tpu.models.yogo import YOGO
    from yogo_tpu.ops.postprocess import (
        INFER_COUNT_MAX_DETECTIONS,
        count_class_predictions,
    )
    from yogo_tpu.ops.window_nms import windowed_count
    from yogo_tpu.utils.default_hyperparams import DefaultHyperparams as df

    bs = int(sys.argv[1]) if len(sys.argv) > 1 else 512
    radii = [int(a) for a in sys.argv[2:]] or [3, 4, 5]

    model = YOGO.create(
        IMG_HW, df.ANCHOR_W, df.ANCHOR_H, num_classes=7,
        compute_dtype=jnp.bfloat16,
    )
    variables = production_density_variables(model.init(jax.random.key(0)))
    dstack = jax.jit(
        lambda key: jax.random.randint(
            key, (NUM_BATCHES, bs, 1, *IMG_HW), 0, 256, jnp.uint8
        )
    )(jax.random.key(0))
    jax.block_until_ready(dstack)

    def make(tail):
        @jax.jit
        def run_all(stack):
            def body(carry, batch):
                out = model.apply(variables, batch, inference=True)
                return carry + tail(out), None

            return jax.lax.scan(body, jnp.float32(0), stack)[0]

        return run_all

    def win_tail(r):
        def tail(out):
            res = windowed_count(out, obj_thresh=0.5, iou_thresh=0.5, ry=r, rx=r)
            return (
                res["counts"].sum().astype(jnp.float32)
                + res["exceeded"].astype(jnp.float32)
            )

        return tail

    def stencil_tail(r):
        """The iou+direction stencil pass alone - same plane math as
        windowed_count's precompute, reduced to a checksum with NO
        fixed-point iteration (attribution: stencil vs convergence cost)."""
        from yogo_tpu.ops.window_nms import _half_offsets, _shift

        def tail(out):
            f = out.astype(jnp.float32)
            cx, cy, w, h, obj = f[:, 0], f[:, 1], f[:, 2], f[:, 3], f[:, 4]
            passing = obj > 0.5
            x1, y1, x2, y2 = cx - w / 2, cy - h / 2, cx + w / 2, cy + h / 2
            area = jnp.clip(x2 - x1, 0, 1e19) * jnp.clip(y2 - y1, 0, 1e19)
            score = f[:, 5:].max(axis=1) * obj
            acc = jnp.zeros((), jnp.int32)
            for dy, dx in _half_offsets(r, r):
                iw = jnp.clip(
                    jnp.minimum(x2, _shift(x2, dy, dx, 0.0))
                    - jnp.maximum(x1, _shift(x1, dy, dx, 0.0)), 0, 1e19,
                )
                ih = jnp.clip(
                    jnp.minimum(y2, _shift(y2, dy, dx, 0.0))
                    - jnp.maximum(y1, _shift(y1, dy, dx, 0.0)), 0, 1e19,
                )
                inter = iw * ih
                iou = inter / (area + _shift(area, dy, dx, 0.0) - inter)
                ov = (iou > 0.5) & passing & _shift(passing, dy, dx, False)
                n_first = _shift(score, dy, dx, -jnp.inf) > score
                acc = acc + (ov & n_first).sum() + (ov & ~n_first).sum()
            return acc.astype(jnp.float32)

        return tail

    cases = [
        ("fwd", make(lambda out: out[:, 4].sum().astype(jnp.float32))),
        (
            "topk_nms",
            make(
                lambda out: count_class_predictions(
                    out, obj_thresh=0.5, iou_thresh=0.5,
                    max_detections=INFER_COUNT_MAX_DETECTIONS,
                ).sum().astype(jnp.float32)
            ),
        ),
    ] + [(f"window_r{r}", make(win_tail(r))) for r in radii] + [
        (f"stencil_r{r}", make(stencil_tail(r))) for r in radii
    ]

    for name, fn in cases:
        try:
            t0 = time.perf_counter()
            float(fn(dstack))
            tc = time.perf_counter() - t0
            best = 0.0
            for _ in range(3):
                t0 = time.perf_counter()
                float(fn(dstack))
                dt = time.perf_counter() - t0
                best = max(best, NUM_BATCHES * bs / dt)
            ms = NUM_BATCHES * bs / best / NUM_BATCHES * 1000
            print(
                f"bs={bs} {name:12s}: {best:7.1f} img/s ({ms:6.2f} ms/batch,"
                f" compile+warm {tc:.0f}s)",
                flush=True,
            )
        except Exception as e:
            print(
                f"bs={bs} {name}: FAIL {type(e).__name__} {str(e)[:120]}",
                flush=True,
            )


if __name__ == "__main__":
    main()
