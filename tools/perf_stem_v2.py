"""Time the v2 Pallas stem on TPU vs the XLA stem, standalone and feeding b1.

JAX_COMPILATION_CACHE_DIR=.jax_cache_tpu python tools/perf_stem_v2.py
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

from yogo_tpu.ops.pallas_stem import fold_stem_params, fused_stem_nchw

BS = 128
K = 4


def timeit(fn, *args, reps=3):
    jfn = jax.jit(fn)
    r = jfn(*args)
    jax.block_until_ready(r)
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        float(jnp.sum(jfn(*args)))
        best = min(best, time.perf_counter() - t0)
    return best / K * 1000.0


def scan_over(fn):
    # NOTE: pallas_call inside lax.scan faults on this backend (axon) -
    # unroll the K batches as a python loop inside one jitted program
    def run(stack, *params):
        tot = jnp.float32(0)
        for i in range(K):
            tot = tot + fn(stack[i], *params).astype(jnp.float32).sum()
        return tot

    return run


def main():
    rng = np.random.default_rng(0)
    imgs = jax.jit(
        lambda k: jax.random.randint(k, (K, BS, 772, 1032), 0, 255, jnp.uint8)
    )(jax.random.key(0))
    jax.block_until_ready(imgs)

    kern = rng.normal(0, 0.3, (3, 3, 1, 16)).astype(np.float32)
    w, b = fold_stem_params(
        kern, None,
        rng.normal(1, 0.1, 16).astype(np.float32),
        rng.normal(0, 0.1, 16).astype(np.float32),
        rng.normal(0, 1, 16).astype(np.float32),
        rng.uniform(0.5, 2, 16).astype(np.float32),
    )
    w, b = jnp.asarray(w), jnp.asarray(b)
    w_hwio = jnp.asarray(kern, jnp.bfloat16)
    scale = jnp.asarray(rng.normal(1, 0.1, 16), jnp.bfloat16)
    bias16 = jnp.asarray(rng.normal(0, 0.1, 16), jnp.bfloat16)
    w1_hwio = jnp.asarray(rng.normal(0, 0.1, (3, 3, 16, 32)), jnp.bfloat16)

    results = {}

    # baseline XLA b0 (NHWC)
    def b0_xla(x, wx, s, bb):
        x = x[..., None].astype(jnp.bfloat16)
        y = jax.lax.conv_general_dilated(
            x, wx, (2, 2), [(1, 1), (1, 1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.float32)
        y = y * s + bb
        return jnp.where(y > 0, y, 0.01 * y).astype(jnp.bfloat16)

    results["b0 xla nhwc"] = timeit(scan_over(b0_xla), imgs, w_hwio, scale, bias16)

    # pallas v2 stem alone
    def b0_pallas(x, wf, bf):
        return fused_stem_nchw(x, wf, bf)

    results["b0 pallas v2 (tile 32)"] = timeit(scan_over(b0_pallas), imgs, w, b)

    def b0_pallas64(x, wf, bf):
        return fused_stem_nchw(x, wf, bf, tile_h=64)

    results["b0 pallas v2 (tile 64)"] = timeit(scan_over(b0_pallas64), imgs, w, b)

    # b0+b1: XLA baseline
    def chain_xla(x, wx, s, bb, w1):
        y = b0_xla(x, wx, s, bb)
        z = jax.lax.conv_general_dilated(
            y, w1, (1, 1), [(1, 1), (1, 1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.float32)
        return jnp.where(z > 0, z, 0.01 * z).astype(jnp.bfloat16)

    results["b0+b1 xla nhwc"] = timeit(
        scan_over(chain_xla), imgs, w_hwio, scale, bias16, w1_hwio)

    # b0 pallas NCHW -> b1 consuming NCHW, emitting NHWC
    def chain_pallas(x, wf, bf, w1):
        y = fused_stem_nchw(x, wf, bf)
        z = jax.lax.conv_general_dilated(
            y, w1, (1, 1), [(1, 1), (1, 1)],
            dimension_numbers=("NCHW", "HWIO", "NHWC"),
            preferred_element_type=jnp.float32)
        return jnp.where(z > 0, z, 0.01 * z).astype(jnp.bfloat16)

    results["b0 pallas + b1 nchw->nhwc"] = timeit(
        scan_over(chain_pallas), imgs, w, b, w1_hwio)

    # b0 pallas NCHW -> transpose -> b1 NHWC
    def chain_pallas_t(x, wf, bf, w1):
        y = jnp.transpose(fused_stem_nchw(x, wf, bf), (0, 2, 3, 1))
        z = jax.lax.conv_general_dilated(
            y, w1, (1, 1), [(1, 1), (1, 1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.float32)
        return jnp.where(z > 0, z, 0.01 * z).astype(jnp.bfloat16)

    results["b0 pallas + T + b1 nhwc"] = timeit(
        scan_over(chain_pallas_t), imgs, w, b, w1_hwio)

    for k, v in results.items():
        print(f"{k:30s} {v:7.2f} ms/batch (bs={BS})")


if __name__ == "__main__":
    main()
