"""Per-block BACKWARD cost attribution for base_model at bs=64 bf16.

The train step measures 74.4 ms at bs=64 with fwd ~13 ms, so bwd+opt is
~61 ms (~4.7x fwd) -- this tool isolates each block's contribution.

For each block: build the block as a pure fn (conv + BN-or-bias + leaky +
channel-dropout where the spec has them), then time
  fwd   : scan of block(x) over K batches
  bwd   : scan of vjp (grads wrt weights AND input; input grad skipped for
          b0 since the train loss differentiates only wrt params)
Methodology per docs/perf-notes.md: device-resident inputs, K-batch scan in
one jit, scalar fetch fences.

Usage: JAX_COMPILATION_CACHE_DIR=.jax_cache_tpu python tools/perf_bwd_blocks.py [bs] [K]
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

BS = int(sys.argv[1]) if len(sys.argv) > 1 else 64
K = int(sys.argv[2]) if len(sys.argv) > 2 else 4

# (name, Cin, Cout, stride, H, W, bn, dropout) -- H,W are INPUT dims
BLOCKS = [
    ("b0 1->16 s2 772x1032", 1, 16, 2, 772, 1032, True, 0.0),
    ("b1 16->32 s1 386x516", 16, 32, 1, 386, 516, False, 0.05),
    ("b2 32->64 s2 386x516", 32, 64, 2, 386, 516, False, 0.10),
    ("b3 64->128 s1 193x258", 64, 128, 1, 193, 258, False, 0.15),
    ("b4 128->128 s2 193x258", 128, 128, 2, 193, 258, True, 0.0),
    ("b5 128->128 s1 97x129", 128, 128, 1, 97, 129, True, 0.0),
    ("b6 128->128 s1 97x129", 128, 128, 1, 97, 129, False, 0.0),
    ("head 128->12 1x1 97x129", 128, 12, 1, 97, 129, False, 0.0),
]


def timeit(jfn, *args, reps=3):
    r = jfn(*args)
    jax.block_until_ready(r)
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        _ = float(jfn(*args))  # scalar fetch = honest fence
        dt = time.perf_counter() - t0
        best = min(best, dt)
    return best / K * 1000.0


def block_fn(cin, cout, stride, bn, dropout, kernel):
    pad = [(1, 1), (1, 1)] if kernel == 3 else [(0, 0), (0, 0)]

    def f(x, w, gamma, beta, mask):
        y = jax.lax.conv_general_dilated(
            x, w, window_strides=(stride, stride), padding=pad,
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        if bn:
            yf = y.astype(jnp.float32)
            mu = jnp.mean(yf, axis=(0, 1, 2))
            var = jnp.var(yf, axis=(0, 1, 2))
            y = ((yf - mu) * jax.lax.rsqrt(var + 1e-5) * gamma + beta).astype(
                jnp.bfloat16
            )
        else:
            y = y + beta
        y = jnp.where(y > 0, y, 0.01 * y)
        if dropout:
            y = y * mask  # channel-dropout mask, precomputed
        return y.astype(jnp.bfloat16)

    return f


def main():
    rng = np.random.default_rng(0)
    print(f"bs={BS} K={K}")
    tot_f = tot_b = 0.0
    for name, cin, cout, stride, h, w_, bn, drop in BLOCKS:
        kernel = 1 if "1x1" in name else 3
        f = block_fn(cin, cout, stride, bn, drop, kernel)
        # only 2 resident batches (K stacked copies OOM at the big shapes);
        # the scan alternates between them so the loop body can't be hoisted
        x = jax.jit(
            lambda k: jax.random.normal(k, (2, BS, h, w_, cin), jnp.bfloat16)
        )(jax.random.key(1))
        jax.block_until_ready(x)
        w = jnp.asarray(
            rng.normal(0, 0.05, (kernel, kernel, cin, cout)), jnp.bfloat16
        )
        gamma = jnp.ones((cout,), jnp.float32)
        beta = jnp.zeros((cout,), jnp.float32 if bn else jnp.bfloat16)
        mask = jnp.ones((cout,), jnp.bfloat16)
        wrt_x = cin > 1  # b0's input grad is never needed in training

        def fwd(stack, w, gamma, beta, mask):
            def body(c, i):
                xb = jax.lax.dynamic_index_in_dim(stack, i % 2, keepdims=False)
                return c + f(xb, w, gamma, beta, mask).astype(jnp.float32).sum(), None
            return jax.lax.scan(body, jnp.float32(0), jnp.arange(K))[0]

        def bwd(stack, w, gamma, beta, mask):
            argnums = (0, 1) if wrt_x else (1,)

            def lossb(xb, wb):
                return f(xb, wb, gamma, beta, mask).astype(jnp.float32).sum()

            g = jax.grad(lossb, argnums=argnums)

            def body(c, i):
                xb = jax.lax.dynamic_index_in_dim(stack, i % 2, keepdims=False)
                gs = g(xb, w)
                acc = sum(gi.astype(jnp.float32).sum() for gi in gs)
                return c + acc, None

            return jax.lax.scan(body, jnp.float32(0), jnp.arange(K))[0]

        tf = timeit(jax.jit(fwd), x, w, gamma, beta, mask)
        tb = timeit(jax.jit(bwd), x, w, gamma, beta, mask)
        tot_f += tf
        tot_b += tb
        print(f"{name:26s} fwd {tf:6.2f}  fwd+bwd {tb:6.2f}  ms/batch")
        del x
    print(f"{'TOTAL':26s} fwd {tot_f:6.2f}  fwd+bwd {tot_b:6.2f}")


if __name__ == "__main__":
    main()
