"""Isolated timings: lax.top_k vs group-pruned top-k, old-vs-new NMS.

Usage: PYTHONPATH=... python tools/perf_topk_nms_iso.py [bs] [K]
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
CELLS = 97 * 129


def bench(name, fn, *args):
    @jax.jit
    def run(*a):
        def body(c, i):
            out = fn(*((a[0] + 1e-6 * i,) + a[1:]))
            return c + out.astype(jnp.float32), None

        return jax.lax.scan(body, jnp.float32(0), jnp.arange(SCAN))[0]

    try:
        float(run(*args))
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            float(run(*args))
            best = min(best, time.perf_counter() - t0)
        print(f"{name:24s}: {best / SCAN * 1000:6.2f} ms/batch", flush=True)
    except Exception as e:
        print(f"{name}: FAIL {type(e).__name__} {str(e)[:100]}", flush=True)


def _topk_group_pruned(keys, k, block=8):
    """The rejected exact group-max-pruned two-stage top-k, kept HERE (it
    was removed from ops/postprocess.py after measuring 2.3-12x slower
    than lax.top_k) so the recorded negative result stays reproducible."""
    b, n = keys.shape
    g = -(-n // block)
    kp = jnp.pad(keys, ((0, 0), (0, g * block - n)), constant_values=-jnp.inf)
    gmax = kp.reshape(b, g, block).max(axis=-1)
    _, gidx = jax.lax.top_k(gmax, min(k, g))
    cand_idx = (gidx[..., None] * block + jnp.arange(block)).reshape(b, -1)
    cand = jnp.take_along_axis(kp, cand_idx, axis=1)
    top_val, ci = jax.lax.top_k(cand, k)
    return top_val, jnp.take_along_axis(cand_idx, ci, axis=1)


def main():
    from yogo_tpu.ops.nms import batched_nms

    bs = int(sys.argv[1]) if len(sys.argv) > 1 else 512
    k = int(sys.argv[2]) if len(sys.argv) > 2 else 256

    keys = jax.jit(
        lambda s: jax.random.uniform(s, (bs, CELLS)) - 0.5
    )(jax.random.key(0))
    jax.block_until_ready(keys)

    bench("lax.top_k", lambda x: jax.lax.top_k(x, k)[0].sum(), keys)
    for blk in (8, 16, 32, 64):
        bench(
            f"group_pruned b={blk}",
            lambda x, _b=blk: _topk_group_pruned(x, k, block=_b)[0].sum(),
            keys,
        )
    bench(
        "group_max_only b=8",
        lambda x: jax.lax.top_k(
            x.reshape(bs, -1, 8).max(axis=-1), k
        )[0].sum(),
        keys,
    )

    def genb(s):
        kx, kw, ks, kv = jax.random.split(s, 4)
        cxy = jax.random.uniform(kx, (bs, k, 2))
        wh = jax.random.uniform(kw, (bs, k, 2), minval=0.02, maxval=0.08)
        boxes = jnp.concatenate([cxy - wh / 2, cxy + wh / 2], axis=-1)
        return boxes, jax.random.uniform(ks, (bs, k)), jax.random.uniform(kv, (bs, k)) < 0.7

    boxes, scores, valid = jax.jit(genb)(jax.random.key(1))
    jax.block_until_ready(boxes)
    bench(
        "nms sort-free (new)",
        lambda b, s, v: batched_nms(b, s, v, 0.5).sum(),
        boxes, scores, valid,
    )


if __name__ == "__main__":
    main()
