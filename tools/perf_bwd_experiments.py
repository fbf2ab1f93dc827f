"""XLA-level backward-pass experiments for the slow b1-b3 grad convs
(VERDICT r2 next-step #2: try layout/dimension_numbers variants, dw as
matmul, and f32-accumulation variants BEFORE declaring the bwd excess
Pallas-only).

For each of b1 (16->32 s1 386x516), b2 (32->64 s2 386x516) and
b3 (64->128 s1 193x258), times fwd+bwd of a bare conv under four grad
formulations (all numerically validated against jax.grad on small shapes
first - run with --validate on CPU):

  auto        jax.grad of the NHWC conv (XLA's own transposed-conv grads)
  auto_nchw   jax.grad of the same conv expressed in NCHW
  manual      hand-written dx (input-dilated transposed conv) +
              dw as NINE TAP dot_generals (each tap is a (S, Ci) x (S, Co)
              matmul with S = N*OH*OW contracted - the "im2col without
              materializing im2col" formulation, f32 accumulation)
  manual_f32  manual with the dx conv also accumulating in f32
              (preferred_element_type)

Usage:
  python tools/perf_bwd_experiments.py --validate          # CPU, small shapes
  PYTHONPATH=... python tools/perf_bwd_experiments.py [bs] [K]   # TPU timing
"""

import os
import sys
import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

if "--validate" in sys.argv:
    jax.config.update("jax_platforms", "cpu")
else:
    jax.config.update(
        "jax_compilation_cache_dir",
        os.environ.get(
            "JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache_tpu"
        ),
    )

DN = ("NHWC", "HWIO", "NHWC")


def conv(x, w, stride):
    return jax.lax.conv_general_dilated(
        x, w, (stride, stride), [(1, 1), (1, 1)], dimension_numbers=DN
    )


def conv_nchw(x, w, stride):
    # x (N,C,H,W), w (O,I,kh,kw)
    return jax.lax.conv_general_dilated(
        x, w, (stride, stride), [(1, 1), (1, 1)],
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
    )


def manual_grads(x, w, dy, stride, f32_dx=False):
    """(dx, dw) for y = conv(x, w, stride, SAME-1) given cotangent dy."""
    k = w.shape[0]
    # dx: input-dilated conv of dy with the spatially-flipped, io-swapped w
    w_rot = jnp.transpose(w[::-1, ::-1], (0, 1, 3, 2))  # (kh,kw,Co,Ci)
    h, wd = x.shape[1], x.shape[2]
    oh, ow = dy.shape[1], dy.shape[2]
    pl = k - 2  # = kernel-1-pad = 1 for k=3,p=1
    pr_h = h - (oh - 1) * stride + k - 2 - pl
    pr_w = wd - (ow - 1) * stride + k - 2 - pl
    dx = jax.lax.conv_general_dilated(
        dy, w_rot, (1, 1), [(pl, pr_h), (pl, pr_w)],
        lhs_dilation=(stride, stride),
        dimension_numbers=DN,
        preferred_element_type=jnp.float32 if f32_dx else None,
    )
    dx = dx.astype(x.dtype)

    # dw: nine tap-contractions, each a huge-S matmul on the MXU
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    taps = []
    for kh in range(k):
        for kw in range(k):
            tap = jax.lax.slice(
                xp,
                (0, kh, kw, 0),
                (
                    x.shape[0],
                    kh + (oh - 1) * stride + 1,
                    kw + (ow - 1) * stride + 1,
                    x.shape[3],
                ),
                (1, stride, stride, 1),
            )
            taps.append(
                jax.lax.dot_general(
                    tap,
                    dy,
                    ((( 0, 1, 2), (0, 1, 2)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
            )
    dw = jnp.stack(taps).reshape(k, k, x.shape[3], dy.shape[3])
    return dx, dw.astype(w.dtype)


def validate():
    rng = np.random.default_rng(0)
    for stride in (1, 2):
        x = jnp.asarray(rng.normal(0, 1, (2, 10, 14, 3)), jnp.float32)
        w = jnp.asarray(rng.normal(0, 1, (3, 3, 3, 5)), jnp.float32)

        def loss(x, w):
            return conv(x, w, stride).sum()

        dx_a, dw_a = jax.grad(loss, argnums=(0, 1))(x, w)
        dy = jnp.ones_like(conv(x, w, stride))
        dx_m, dw_m = manual_grads(x, w, dy, stride)
        np.testing.assert_allclose(dx_a, dx_m, rtol=1e-5, atol=1e-5)
        np.testing.assert_allclose(dw_a, dw_m, rtol=1e-5, atol=1e-5)
        print(f"stride {stride}: manual grads == jax.grad")
    print("VALIDATION PASSED")


# (name, Cin, Cout, stride, H, W)
BLOCKS = [
    ("b1 16->32 s1 386x516", 16, 32, 1, 386, 516),
    ("b2 32->64 s2 386x516", 32, 64, 2, 386, 516),
    ("b3 64->128 s1 193x258", 64, 128, 1, 193, 258),
]


def timeit(jfn, args, K, reps=3):
    r = jfn(*args)
    jax.block_until_ready(r)
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        _ = float(jfn(*args))
        dt = time.perf_counter() - t0
        best = min(best, dt)
    return best / K * 1000.0


def main():
    bs = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    K = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    print(f"bs={bs} K={K} (ms/batch, fwd+bwd of the bare conv)")
    rng = np.random.default_rng(0)

    for name, cin, cout, stride, h, wd in BLOCKS:
        x = jax.jit(
            lambda kk: jax.random.normal(kk, (2, bs, h, wd, cin), jnp.bfloat16)
        )(jax.random.key(1))
        jax.block_until_ready(x)
        w = jnp.asarray(
            rng.normal(0, 0.05, (3, 3, cin, cout)), jnp.bfloat16
        )
        w_oihw = jnp.transpose(w, (3, 2, 0, 1))

        def scan_over(fn, stack, *args):
            def body(c, i):
                xb = jax.lax.dynamic_index_in_dim(stack, i % 2, keepdims=False)
                return c + fn(xb, *args), None

            return jax.lax.scan(body, jnp.float32(0), jnp.arange(K))[0]

        # ---- auto (NHWC jax.grad)
        def auto_one(xb, wb):
            g = jax.grad(
                lambda a, b: conv(a, b, stride).astype(jnp.float32).sum(),
                argnums=(0, 1),
            )(xb, wb)
            return sum(gi.astype(jnp.float32).sum() for gi in g)

        # ---- auto_nchw
        def nchw_one(xb, wb_oihw):
            xb_t = jnp.transpose(xb, (0, 3, 1, 2))
            g = jax.grad(
                lambda a, b: conv_nchw(a, b, stride).astype(jnp.float32).sum(),
                argnums=(0, 1),
            )(xb_t, wb_oihw)
            return sum(gi.astype(jnp.float32).sum() for gi in g)

        # ---- manual
        def manual_one(xb, wb, f32_dx=False):
            y = conv(xb, wb, stride)
            dy = jnp.ones_like(y)  # cotangent of sum()
            dx, dw = manual_grads(xb, wb, dy, stride, f32_dx=f32_dx)
            return (
                y.astype(jnp.float32).sum()
                + dx.astype(jnp.float32).sum()
                + dw.astype(jnp.float32).sum()
            )

        cases = [
            ("auto", auto_one, (w,)),
            ("auto_nchw", nchw_one, (w_oihw,)),
            ("manual", manual_one, (w,)),
            ("manual_f32", partial(manual_one, f32_dx=True), (w,)),
        ]
        for label, fn, args in cases:
            try:
                t = timeit(
                    jax.jit(lambda s, *a, _fn=fn: scan_over(_fn, s, *a)),
                    (x, *args),
                    K,
                )
                print(f"{name:24s} {label:11s} {t:7.2f}", flush=True)
            except Exception as e:
                print(
                    f"{name:24s} {label:11s} FAIL {type(e).__name__} "
                    f"{str(e)[:100]}",
                    flush=True,
                )
        del x


if __name__ == "__main__":
    if "--validate" in sys.argv:
        validate()
    else:
        main()
