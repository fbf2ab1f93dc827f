"""Attribute batched_nms internal cost at (bs, K): sort, IoU matrix,
fixed-point while, and the final original-order scatter.

Variants:
  full        batched_nms as shipped
  no_scatter  stop at keep_ranked (skip keep.at[order].set - TPU scatters
              are serialized and O(K) per row)
  iou_only    suppression matrix built, single fixed-point step, no while
  sort_only   argsort + gathers alone

Usage: PYTHONPATH=... python tools/perf_nms_parts.py [bs] [K]
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

SCAN = 16


def main():
    from yogo_tpu.ops.boxes import box_area
    from yogo_tpu.ops.nms import _greedy_keep_from_suppression, batched_nms

    bs = int(sys.argv[1]) if len(sys.argv) > 1 else 512
    k = int(sys.argv[2]) if len(sys.argv) > 2 else 256

    def gen(key):
        kx, kw, ks, kv = jax.random.split(key, 4)
        cxy = jax.random.uniform(kx, (bs, k, 2))
        wh = jax.random.uniform(kw, (bs, k, 2), minval=0.02, maxval=0.08)
        boxes = jnp.concatenate([cxy - wh / 2, cxy + wh / 2], axis=-1)
        scores = jax.random.uniform(ks, (bs, k))
        valid = jax.random.uniform(kv, (bs, k)) < 0.7
        return boxes, scores, valid

    boxes, scores, valid = jax.jit(gen)(jax.random.key(0))
    jax.block_until_ready((boxes, scores, valid))

    def pieces(b, s, v, mode):
        neg_inf = jnp.finfo(s.dtype).min
        ranked = jnp.where(v, s, neg_inf)
        order = jnp.argsort(-ranked, axis=-1, stable=True)
        rboxes = jnp.take_along_axis(b, order[..., None], axis=1)
        rvalid = jnp.take_along_axis(v, order, axis=1)
        if mode == "sort_only":
            return rboxes.sum() + rvalid.sum()
        area = box_area(rboxes)
        lt = jnp.maximum(rboxes[..., :, None, :2], rboxes[..., None, :, :2])
        rb = jnp.minimum(rboxes[..., :, None, 2:], rboxes[..., None, :, 2:])
        wh = jnp.clip(rb - lt, 0)
        inter = wh[..., 0] * wh[..., 1]
        iou = inter / (area[..., :, None] + area[..., None, :] - inter)
        upper = jnp.triu(jnp.ones((k, k), bool), k=1)
        suppress = (
            (iou > 0.5) & upper & rvalid[..., :, None] & rvalid[..., None, :]
        )
        if mode == "iou_only":
            keep0 = jnp.ones(suppress.shape[:-1], bool)
            first = ~jnp.any(suppress & keep0[..., :, None], axis=-2)
            return first.sum()
        keep_ranked = _greedy_keep_from_suppression(suppress) & rvalid
        return keep_ranked.sum()  # no_scatter

    cases = [
        ("full", lambda b, s, v: batched_nms(b, s, v, 0.5).sum()),
        ("no_scatter", lambda b, s, v: pieces(b, s, v, "no_scatter")),
        ("iou_only", lambda b, s, v: pieces(b, s, v, "iou_only")),
        ("sort_only", lambda b, s, v: pieces(b, s, v, "sort_only")),
    ]
    for name, fn in cases:
        @jax.jit
        def run(b, s, v, _fn=fn):
            def body(c, i):
                return c + _fn(b, s + 1e-6 * i, v).astype(jnp.float32), None

            return jax.lax.scan(body, jnp.float32(0), jnp.arange(SCAN))[0]

        try:
            float(run(boxes, scores, valid))
            best = float("inf")
            for _ in range(3):
                t0 = time.perf_counter()
                float(run(boxes, scores, valid))
                best = min(best, time.perf_counter() - t0)
            print(f"bs={bs} K={k} {name:10s}: {best / SCAN * 1000:6.2f} ms/batch",
                  flush=True)
        except Exception as e:
            print(f"{name}: FAIL {type(e).__name__} {str(e)[:100]}", flush=True)


if __name__ == "__main__":
    main()
