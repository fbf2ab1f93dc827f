"""Bisect the v2 stem kernel fault on TPU with small shapes."""

import sys

import jax
import jax.numpy as jnp
import numpy as np

from yogo_tpu.ops.pallas_stem import fold_stem_params, fused_stem_nchw


def ref_stem(imgs, kern, w, b):
    x = jnp.asarray(imgs, jnp.float32)[..., None]
    y = jax.lax.conv_general_dilated(
        x, jnp.asarray(kern), (2, 2), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    # fold_stem_params already folded BN into w/b; rebuild from w/b instead:
    # y_c = sum_taps w9 + b  == conv(kern)*k + shift; easier: compare against
    # direct computation with folded weights
    del y
    wf = np.zeros_like(np.asarray(kern))
    wf[:, :, 0, :] = np.asarray(w)
    y = jax.lax.conv_general_dilated(
        x, jnp.asarray(wf), (2, 2), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    y = y + jnp.asarray(b)
    y = jnp.where(y >= 0, y, 0.01 * y)
    return jnp.transpose(y, (0, 3, 1, 2))


def run_case(name, H, W, tile_h):
    rng = np.random.default_rng(0)
    B = 2
    imgs = rng.integers(0, 255, (B, H, W), np.uint8)
    kern = rng.normal(0, 0.3, (3, 3, 1, 16)).astype(np.float32)
    w, b = fold_stem_params(kern, None)
    try:
        out = fused_stem_nchw(
            jnp.asarray(imgs), jnp.asarray(w), jnp.asarray(b), tile_h=tile_h)
        out = np.asarray(out, np.float32)
        ref = np.asarray(ref_stem(imgs, kern, w, b), np.float32)
        err = np.abs(out - ref) / (np.abs(ref) + 1e-2)
        print(f"{name}: OK maxrel={err.max():.4f}")
    except Exception as e:
        print(f"{name}: FAIL {type(e).__name__}: {str(e)[:200]}")


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    if which in ("all", "div"):
        run_case("divisible (H=128, out 64, tile 32)", 128, 256, 32)
    if which in ("all", "nondiv"):
        run_case("non-divisible (H=132, out 66, tile 32)", 132, 256, 32)
    if which in ("all", "real"):
        run_case("real shape (H=772, out 386, tile 32)", 772, 1032, 32)
