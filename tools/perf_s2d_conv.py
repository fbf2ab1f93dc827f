"""Space-to-depth rewrite of the stride-2 3x3 convs - microbenchmark.

Round-4 HLO dump finding (docs/perf-notes.md): the two interior stride-2
convs of base_model compile to the EmitAllBatchInSublanes /
EmitInputBatchInLanes fallback emitters (conv4 even carries
retry_count=2) and run at ~21-48 TF/s, while the stride-1 128-channel
convs hit 188 TF/s. conv4 alone is 44 ms of the 108 ms e2e batch.

The rewrite: conv(k=3, s=2, C->K) on (H, W, C) is EXACTLY conv(k=2, s=1,
4C->K) on the space-to-depth input (H/2, W/2, 4C) - the 4x4 input region
of each 2x2 block-window covers the 3x3 taps, with the 7 uncovered
(row/col 3) kernel positions zero. 16/9 more MACs, but on the shapes the
MXU likes.

Earlier negative results this does NOT repeat: the round-2 stem s2d (1
input channel - the rewrite helps wide inputs) and the round-3
9x1x1-phase-split of conv4 (a gather-heavy formulation).

Usage: PYTHONPATH=/root/repo:/root/.axon_site python tools/perf_s2d_conv.py
  [--bs 512] [--check]   (--check verifies numerics on CPU f32 first)
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np


def s2d_kernel(kern: np.ndarray) -> np.ndarray:
    """(3, 3, C, K) stride-2 kernel -> (2, 2, 4C, K) stride-1 kernel on
    space-to-depth input with channel layout c* = (pi*2 + pj)*C + c."""
    kh, kw, c, k = kern.shape
    assert (kh, kw) == (3, 3)
    out = np.zeros((2, 2, 4 * c, k), kern.dtype)
    for bi in range(2):
        for bj in range(2):
            for pi in range(2):
                for pj in range(2):
                    di, dj = 2 * bi + pi, 2 * bj + pj
                    if di < 3 and dj < 3:
                        out[bi, bj, (pi * 2 + pj) * c : (pi * 2 + pj + 1) * c] = (
                            kern[di, dj]
                        )
    return out


def s2d_input(x, pad_h, pad_w):
    """(B, H, W, C) -> (B, ceil((H+2)/2), ceil((W+2)/2), 4C): pad 1 on
    top/left (the conv's pad=1), zero-fill bottom/right to even dims,
    then stack each 2x2 block into channels."""
    import jax.numpy as jnp

    b, h, w, c = x.shape
    x = jnp.pad(x, ((0, 0), (1, pad_h), (1, pad_w), (0, 0)))
    hb, wb = x.shape[1] // 2, x.shape[2] // 2
    x = x.reshape(b, hb, 2, wb, 2, c)
    x = x.transpose(0, 1, 3, 2, 4, 5).reshape(b, hb, wb, 4 * c)
    return x


def conv_ref(x, kern):
    import jax.lax as lax

    return lax.conv_general_dilated(
        x, kern, window_strides=(2, 2), padding=((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )


def conv_s2d(x, kern2, pad_h, pad_w):
    import jax.lax as lax

    xb = s2d_input(x, pad_h, pad_w)
    return lax.conv_general_dilated(
        xb, kern2, window_strides=(1, 1), padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )


def check_numerics():
    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    rng = np.random.default_rng(0)
    for h, w, c, k in ((13, 17, 3, 5), (96, 128, 8, 16), (21, 20, 4, 4)):
        x = rng.normal(size=(2, h, w, c)).astype(np.float32)
        kern = rng.normal(size=(3, 3, c, k)).astype(np.float32)
        pad_h = 1 + (h % 2)  # total padded length H+1+pad_h must be even
        pad_w = 1 + (w % 2)
        a = np.asarray(conv_ref(jnp.asarray(x), jnp.asarray(kern)))
        b = np.asarray(
            conv_s2d(jnp.asarray(x), jnp.asarray(s2d_kernel(kern)),
                     pad_h, pad_w)
        )
        # s2d output has ceil((H+2-1)/2) rows; ref has (H+2-3)//2+1 - the
        # trailing zero-pad block can add one extra row/col: trim
        b = b[:, : a.shape[1], : a.shape[2]]
        np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-5)
        print(f"numerics OK {h}x{w} C{c}->K{k}: {a.shape} == trimmed {b.shape}")


def bench(bs: int):
    import jax
    import jax.numpy as jnp

    import bench as bench_mod  # compile cache config  # noqa: F401

    rng = np.random.default_rng(0)
    shapes = [
        ("conv2 (32->64, 386x516)", (386, 516, 32, 64)),
        ("conv4 (64->128, 193x258)", (193, 258, 64, 128)),
    ]
    for name, (h, w, c, k) in shapes:
        x = jnp.asarray(
            rng.normal(size=(bs, h, w, c)).astype(np.float32),
            dtype=jnp.bfloat16,
        )
        kern = rng.normal(size=(3, 3, c, k)).astype(np.float32)
        kj = jnp.asarray(kern, jnp.bfloat16)
        k2 = jnp.asarray(s2d_kernel(kern), jnp.bfloat16)
        pad_h = 1 + (h % 2)
        pad_w = 1 + (w % 2)
        out_h = (h + 2 - 3) // 2 + 1
        out_w = (w + 2 - 3) // 2 + 1

        f_ref = jax.jit(lambda xx: conv_ref(xx, kj))
        f_s2d = jax.jit(
            lambda xx: conv_s2d(xx, k2, pad_h, pad_w)[:, :out_h, :out_w]
        )
        flops = bs * out_h * out_w * 2 * 9 * c * k

        for label, f in (("ref s2", f_ref), ("s2d s1", f_s2d)):
            r = f(x)
            jax.block_until_ready(r)
            # fetch a scalar each rep: block_until_ready alone lies on axon
            reps = 10
            t0 = time.perf_counter()
            for _ in range(reps):
                r = f(x)
            float(jnp.sum(r[:, 0, 0, 0]))
            dt = (time.perf_counter() - t0) / reps
            print(
                f"{name:28s} {label}: {dt * 1e3:8.2f} ms  "
                f"{flops / dt / 1e12:6.1f} TF/s(effective-9tap)"
            )


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--bs", type=int, default=512)
    p.add_argument("--check", action="store_true")
    args = p.parse_args()
    if args.check:
        check_numerics()
    else:
        bench(args.bs)
