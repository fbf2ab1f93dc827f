"""Layout/formulation experiments for the slow blocks (b0 stem, b4 s2 conv).

Runs standalone block variants device-resident on the TPU and prints a
ms-per-batch table. Methodology per docs/perf-notes.md: scan K batches inside
one jitted program, checksum consumer, scalar fetch to fence.

Usage: JAX_COMPILATION_CACHE_DIR=.jax_cache_tpu python tools/perf_experiments.py
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

BS = 128
K = 4


def timeit(fn, *args, reps=3):
    jfn = jax.jit(fn)
    r = jfn(*args)
    jax.block_until_ready(r)
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        _ = float(jnp.sum(jfn(*args)))  # scalar fetch = honest fence
        dt = time.perf_counter() - t0
        best = min(best, dt)
    return best / K * 1000.0  # ms per batch


def scan_over(fn):
    def run(stack, *params):
        def body(c, x):
            out = fn(x, *params)
            return c + out.astype(jnp.float32).sum(), None

        tot, _ = jax.lax.scan(body, jnp.float32(0), stack)
        return tot

    return run


def conv(x, w, strides, dn):
    return jax.lax.conv_general_dilated(
        x, w, window_strides=strides, padding=[(1, 1), (1, 1)],
        dimension_numbers=dn, preferred_element_type=jnp.float32,
    )


def conv_p(x, w, strides, dn, pad):
    return jax.lax.conv_general_dilated(
        x, w, window_strides=strides, padding=pad,
        dimension_numbers=dn, preferred_element_type=jnp.float32,
    )


def leaky_bn(y, scale, bias):
    y = y * scale + bias
    return jnp.where(y > 0, y, 0.01 * y).astype(jnp.bfloat16)


def main():
    rng = np.random.default_rng(0)
    results = {}

    # ---------------------------------------------------------------- b0 stem
    # 1 -> 16 channels, 3x3 stride 2, 772x1032 -> 386x516, uint8 in, bf16 out
    # (generated on device: the dev-harness H2D relay runs at ~40 MB/s)
    imgs_u8 = jax.jit(
        lambda k: jax.random.randint(k, (K, BS, 772, 1032), 0, 255, jnp.uint8)
    )(jax.random.key(0))
    jax.block_until_ready(imgs_u8)
    w_hwio = jnp.asarray(rng.normal(0, 0.1, (3, 3, 1, 16)), jnp.bfloat16)
    scale = jnp.asarray(rng.normal(1, 0.1, 16), jnp.bfloat16)
    bias = jnp.asarray(rng.normal(0, 0.1, 16), jnp.bfloat16)

    def b0_nhwc(x, w, s, b):
        x = x[..., None].astype(jnp.bfloat16)
        y = conv(x, w, (2, 2), ("NHWC", "HWIO", "NHWC"))
        return leaky_bn(y, s, b)

    results["b0 nhwc (baseline)"] = timeit(
        scan_over(b0_nhwc), imgs_u8, w_hwio, scale, bias
    )

    w_oihw = jnp.transpose(w_hwio, (3, 2, 0, 1))

    def b0_nchw(x, w, s, b):
        x = x[:, None].astype(jnp.bfloat16)
        y = conv(x, w, (2, 2), ("NCHW", "OIHW", "NCHW"))
        return leaky_bn(y, s[:, None, None], b[:, None, None])

    results["b0 nchw"] = timeit(scan_over(b0_nchw), imgs_u8, w_oihw, scale, bias)

    # space-to-depth: (772,1032) -> (386,516,4); 3x3s2 over 1ch == 2x2s1 over
    # 4ch with rearranged weights (pad input H,W by 1 first: original padding
    # (1,1); phase p=(dy%2,dx%2) taps map to s2d channels)
    def s2d(x):  # (B, 772, 1032) uint8 -> (B, 387, 517, 4) bf16, padded +1
        x = jnp.pad(x, ((0, 0), (1, 1), (1, 1)))  # 774 x 1034
        x = x.reshape(x.shape[0], 387, 2, 517, 2)
        x = x.transpose(0, 1, 3, 2, 4).reshape(x.shape[0], 387, 517, 4)
        return x.astype(jnp.bfloat16)

    # weights (3,3,1,16) -> k2 s1 over 4 phase channels
    w_s2d = jnp.zeros((2, 2, 4, 16), jnp.bfloat16)
    for dy in range(3):
        for dx in range(3):
            ky, py = (dy + 0) // 2, (dy + 0) % 2  # tap at padded offset dy
            kx, px = (dx + 0) // 2, (dx + 0) % 2
            w_s2d = w_s2d.at[ky, kx, py * 2 + px].set(w_hwio[dy, dx, 0])

    def b0_s2d_nhwc(x, w, s, b):
        x = s2d(x)
        y = conv_p(x, w, (1, 1), ("NHWC", "HWIO", "NHWC"),
                   [(0, 0), (0, 0)])  # 387->386, 517->516
        return leaky_bn(y, s, b)

    results["b0 s2d k2s1 nhwc"] = timeit(
        scan_over(b0_s2d_nhwc), imgs_u8, w_s2d, scale, bias
    )

    # f32 accumulate variant of baseline (rule out dtype conversion cost)
    def b0_nhwc_f32in(x, w, s, b):
        x = x[..., None].astype(jnp.float32)
        y = conv(x, w.astype(jnp.float32), (2, 2), ("NHWC", "HWIO", "NHWC"))
        return leaky_bn(y, s, b)

    results["b0 nhwc f32-in"] = timeit(
        scan_over(b0_nhwc_f32in), imgs_u8, w_hwio, scale, bias
    )

    del imgs_u8

    # ------------------------------------------------------------------- b4
    # 128 -> 128, 3x3 stride 2, 193x258 -> 97x129 (SAME padding semantics:
    # pad 1 -> (195,260) -> ceil). bf16 activations.
    x4 = jax.jit(
        lambda k: jax.random.normal(k, (K, BS, 193, 258, 128), jnp.bfloat16)
    )(jax.random.key(1))
    jax.block_until_ready(x4)
    w4 = jnp.asarray(rng.normal(0, 0.05, (3, 3, 128, 128)), jnp.bfloat16)

    def b4_nhwc(x, w):
        y = conv(x, w, (2, 2), ("NHWC", "HWIO", "NHWC"))
        return leaky_bn(y, jnp.bfloat16(1.0), jnp.bfloat16(0.0))

    results["b4 nhwc (baseline)"] = timeit(scan_over(b4_nhwc), x4, w4)

    # s2d on b4: (193,258,128) pad-> (194,260) -> (97,130,512), k2s1 conv
    # contraction 2*2*512
    w4_s2d = jnp.zeros((2, 2, 512, 128), jnp.bfloat16)
    for dy in range(3):
        for dx in range(3):
            ky, py = dy // 2, dy % 2
            kx, px = dx // 2, dx % 2
            w4_s2d = w4_s2d.at[ky, kx, (py * 2 + px) * 128:(py * 2 + px + 1) * 128].set(
                w4[dy, dx]
            )

    def b4_s2d(x, w):
        b = x.shape[0]
        x = jnp.pad(x, ((0, 0), (1, 1), (1, 2), (0, 0)))  # 195x261... keep even: 196x262
        x = jnp.pad(x, ((0, 0), (0, 1), (0, 1), (0, 0)))
        x = x.reshape(b, 98, 2, 131, 2, 128)
        x = x.transpose(0, 1, 3, 2, 4, 5).reshape(b, 98, 131, 512)
        y = conv_p(x, w, (1, 1), ("NHWC", "HWIO", "NHWC"), [(0, 0), (0, 0)])
        return leaky_bn(y[:, :97, :129], jnp.bfloat16(1.0), jnp.bfloat16(0.0))

    results["b4 s2d k2s1 nhwc"] = timeit(scan_over(b4_s2d), x4, w4_s2d)

    for k, v in results.items():
        print(f"{k:28s} {v:7.2f} ms/batch (bs={BS})")


if __name__ == "__main__":
    main()
