"""Micro-benchmark of postprocess formulations on a precomputed prediction
tensor (no model forward - fast compiles, isolates the postprocess cost).

Variants at (bs, 12, 97, 129), K:
  tr_f32_1g    transpose to (B,cells,D), f32 top-K, one 12-value gather
               (= format_preds_batched's shape plan)
  f32_1g       NO transpose: f32 top-K on (B,cells) obj, one gather from
               the (B,D,cells) layout, small (B,D,K) transpose after
  bf16_1g      like f32_1g but bf16 sort keys
  f32_8g       f32 top-K + per-channel gathers (the round-3 'lean' rewrite)
  + each with NMS on/off to attribute the suppression stage.

Usage: PYTHONPATH=... python tools/perf_postprocess_micro.py [bs] [K]
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

SY, SX, D = 97, 129, 12
SCAN = 16


def main():
    from yogo_tpu.ops.nms import batched_nms

    bs = int(sys.argv[1]) if len(sys.argv) > 1 else 512
    k = int(sys.argv[2]) if len(sys.argv) > 2 else 256
    cells = SY * SX

    # realistic-ish decoded predictions: obj in [0,1], ~170 passing
    def gen(key):
        u = jax.random.uniform(key, (bs, D, SY, SX))
        obj = jnp.where(u[:, 4] > 0.9865, 0.5 + 0.5 * u[:, 4], 0.4 * u[:, 4])
        return u.at[:, 4].set(obj)

    preds = jax.jit(gen)(jax.random.key(0))
    jax.block_until_ready(preds)

    def tail_common(sel_kd, valid, with_nms):
        # sel_kd: (B, K, D) gathered payload in cell order
        if with_nms:
            cx, cy, w, h = (sel_kd[..., i] for i in range(4))
            boxes = jnp.stack(
                [cx - w / 2, cy - h / 2, cx + w / 2, cy + h / 2], axis=-1
            )
            scores = sel_kd[..., 5:].max(axis=-1) * sel_kd[..., 4]
            valid = valid & batched_nms(boxes, scores, valid, 0.5)
        cls = jnp.argmax(sel_kd[..., 5:], axis=-1)
        onehot = jax.nn.one_hot(cls, D - 5, dtype=jnp.int32)
        return jnp.sum(onehot * valid[..., None].astype(jnp.int32))

    def v_tr_f32_1g(p, with_nms):
        flat = p.reshape(bs, D, cells).transpose(0, 2, 1)
        obj = flat[..., 4]
        key = jnp.where(obj > 0.5, obj, -1.0)
        top_val, idx = jax.lax.top_k(key, k)
        valid = top_val > 0.5
        sel = jnp.take_along_axis(flat, idx[..., None], axis=1)
        return tail_common(sel, valid, with_nms)

    def v_f32_1g(p, with_nms):
        flat = p.reshape(bs, D, cells)
        obj = flat[:, 4]
        key = jnp.where(obj > 0.5, obj, -1.0)
        top_val, idx = jax.lax.top_k(key, k)
        valid = top_val > 0.5
        sel = jnp.take_along_axis(flat, idx[:, None, :], axis=2)  # (B,D,K)
        return tail_common(sel.transpose(0, 2, 1), valid, with_nms)

    def v_bf16_1g(p, with_nms):
        flat = p.reshape(bs, D, cells)
        obj = flat[:, 4]
        passing = obj > 0.5
        key = jnp.where(passing, obj, -1.0).astype(jnp.bfloat16)
        _, idx = jax.lax.top_k(key, k)
        valid = jnp.take_along_axis(passing, idx, axis=1)
        sel = jnp.take_along_axis(flat, idx[:, None, :], axis=2)
        return tail_common(sel.transpose(0, 2, 1), valid, with_nms)

    def v_f32_8g(p, with_nms):
        flat = p.reshape(bs, D, cells)
        obj = flat[:, 4]
        key = jnp.where(obj > 0.5, obj, -1.0)
        top_val, idx = jax.lax.top_k(key, k)
        valid = top_val > 0.5
        chans = [jnp.take_along_axis(flat[:, i], idx, axis=1) for i in range(D)]
        return tail_common(jnp.stack(chans, axis=-1), valid, with_nms)

    variants = [
        ("tr_f32_1g", v_tr_f32_1g),
        ("f32_1g", v_f32_1g),
        ("bf16_1g", v_bf16_1g),
        ("f32_8g", v_f32_8g),
    ]
    for with_nms in (False, True):
        for name, fn in variants:
            @jax.jit
            def run(p, _fn=fn, _n=with_nms):
                def body(c, i):
                    return c + _fn(p + 0.0001 * i.astype(p.dtype), _n).astype(
                        jnp.float32
                    ), None

                return jax.lax.scan(body, jnp.float32(0), jnp.arange(SCAN))[0]

            try:
                float(run(preds))
                best = float("inf")
                for _ in range(3):
                    t0 = time.perf_counter()
                    float(run(preds))
                    best = min(best, time.perf_counter() - t0)
                ms = best / SCAN * 1000
                print(
                    f"bs={bs} K={k} nms={int(with_nms)} {name:10s}: "
                    f"{ms:6.2f} ms/batch",
                    flush=True,
                )
            except Exception as e:
                print(f"{name} nms={int(with_nms)}: FAIL {type(e).__name__} "
                      f"{str(e)[:100]}", flush=True)


if __name__ == "__main__":
    main()
