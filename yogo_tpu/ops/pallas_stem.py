"""EXPERIMENTAL Pallas TPU kernel: fused YOGO stem
(uint8 -> conv3x3 stride2 + BN + LeakyReLU).

Motivation: with C_in=1 the stem conv's MXU contraction dim is 9, and XLA
spends ~4.8 ms per 128-image 772x1032 batch on it (vs a ~1.2 ms bandwidth
roofline). This kernel decomposes the stride-2 conv into space-to-depth
phase planes (built by XLA) and computes the 9 taps as unit-offset slices +
FMAs, with inference BatchNorm folded into the weights.

Status: correctness-verified in interpret mode; compiles and runs on v5e,
but the only formulation Mosaic currently lowers (channel-LEADING layout,
9x16 broadcast FMAs) runs ~3x slower than XLA's conv, so the production
inference path keeps the XLA stem. Retained as a tested Pallas example and
a record of the Mosaic lowering constraints encountered:
  - no uint8 -> bf16 cast (hop via int32 -> f32),
  - no strided vector slices (hence XLA-side phase planes),
  - minor-dim insertion only for 32-bit types; lane indexing must be
    128-aligned (rules out per-channel NHWC stores for C=16),
  - rank-3 dot_general unsupported,
  - block sublane dims must be divisible by 8 (pad rows + trim),
  - large unrolled bodies (144 FMA ops) explode remote-compile time.
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array


_TAPS = [(dy, dx) for dy in (-1, 0, 1) for dx in (-1, 0, 1)]


def _tap_view(dy: int, dx: int):
    """Which (phase a, phase b, row-shift i0, col-shift j0) serves tap (dy,dx).
    Tap (dy, dx) reads padded[2h + dy + 1, 2w + dx + 1]; with phase planes
    p[a][b][i, j] = padded[2i + a, 2j + b] that's plane (a, b) at
    (h + i0, w + j0)."""
    a = 0 if dy != 0 else 1
    b = 0 if dx != 0 else 1
    i0 = 1 if dy == 1 else 0
    j0 = 1 if dx == 1 else 0
    return a, b, i0, j0


def _stem_kernel(*refs, out_w: int, negative_slope: float):
    # refs: 9 tap-plane views (1, TH, out_w + 1) uint8, then wc (C, 9) f32,
    # b (C, 1, 1) f32, then out_ref (1, C, TH, out_w) bf16 (channel-major).
    #
    # Mosaic constraints shape this kernel (found the hard way): no
    # uint8->bf16 cast (hop via int32), no strided vector slices (phase
    # planes are pre-split by XLA), no minor-dim insertion for 16-bit types
    # and no unaligned lane indexing (so channels live on a LEADING axis:
    # taps stack on axis 0, the dot contracts the tap axis, and the store is
    # one full channel-major block).
    tap_refs = refs[:9]
    w_ref, b_ref, out_ref = refs[9], refs[10], refs[11]

    # 9 tap FMAs with the channel axis leading (broadcast over C is a
    # leading-dim broadcast, which Mosaic lowers cleanly; rank-3 dots and
    # minor-axis stacks do not)
    out = b_ref[...] * jnp.ones((1, tap_refs[0].shape[1], out_w), jnp.float32)
    for t_idx, ((dy, dx), ref) in enumerate(zip(_TAPS, tap_refs)):
        _, _, _, j0 = _tap_view(dy, dx)
        t = ref[0][:, j0 : j0 + out_w]
        tf = t.astype(jnp.int32).astype(jnp.float32)
        out = out + w_ref[:, t_idx][:, None, None] * tf[None]
    act = jnp.where(out >= 0, out, negative_slope * out)
    out_ref[0] = act.astype(jnp.bfloat16)


def fold_stem_params(
    kernel_hwio: np.ndarray,
    bias: Optional[np.ndarray],
    bn_scale: Optional[np.ndarray] = None,
    bn_bias: Optional[np.ndarray] = None,
    bn_mean: Optional[np.ndarray] = None,
    bn_var: Optional[np.ndarray] = None,
    eps: float = 1e-5,
):
    """(3,3,1,O) HWIO conv kernel (+ optional BN stats) -> folded
    ((3,3,O) weights, (O,) bias) for the fused kernel."""
    w = np.asarray(kernel_hwio, np.float32)[:, :, 0, :]  # (3,3,O)
    b = (
        np.asarray(bias, np.float32)
        if bias is not None
        else np.zeros(w.shape[-1], np.float32)
    )
    if bn_scale is not None:
        k = np.asarray(bn_scale, np.float32) / np.sqrt(
            np.asarray(bn_var, np.float32) + eps
        )
        w = w * k
        b = (b - np.asarray(bn_mean, np.float32)) * k + np.asarray(
            bn_bias, np.float32
        )
    return w, b


@partial(jax.jit, static_argnames=("negative_slope", "interpret"))
def fused_stem(
    images: Array,
    weights: Array,
    bias: Array,
    negative_slope: float = 0.01,
    interpret: bool = False,
) -> Array:
    """images: (B, H, W) uint8 (H, W even) -> (B, H//2, W//2, C_out) bf16.

    Equivalent to: pad 1 -> conv3x3 stride2 (BN pre-folded into
    weights/bias) -> LeakyReLU, computed in f32, emitted bf16.
    """
    b, h, w = images.shape
    out_h, out_w = h // 2, w // 2
    c_out = weights.shape[-1]

    # Mosaic wants the sublane (second-minor) block dim divisible by 8, so
    # pad rows up to a multiple of 8 and trim the output afterwards; pick the
    # largest multiple-of-8 row tile (<=128) dividing the padded height.
    padded_out_h = -(-out_h // 8) * 8
    tile_h = padded_out_h
    for cand in range(128, 0, -8):
        if padded_out_h % cand == 0:
            tile_h = cand
            break

    # phase planes of the 1-padded image, built by XLA (single uint8
    # transpose pass). padded size (h+2, w+2); each plane (out_h+1, out_w+1).
    padded = jnp.pad(images, ((0, 0), (1, 1), (1, 1)))
    ph = padded.reshape(b, out_h + 1, 2, out_w + 1, 2)

    # one (B, padded_out_h, out_w + 1) view per tap: phase plane shifted by
    # its row offset - this turns the 1-row halo into plain non-overlapping
    # blocks; extra rows beyond out_h are garbage and trimmed at the end
    row_pad = padded_out_h - out_h
    tap_views = []
    for dy, dx in _TAPS:
        a, bb, i0, _ = _tap_view(dy, dx)
        view = ph[:, i0 : i0 + out_h, a, :, bb]
        if row_pad:
            view = jnp.pad(view, ((0, 0), (0, row_pad), (0, 0)))
        tap_views.append(view)

    # weights as (C, 9) with columns ordered like _TAPS
    wc = jnp.stack(
        [weights[dy + 1, dx + 1, :] for dy, dx in _TAPS], axis=1
    ).astype(jnp.float32)
    bias3d = bias.reshape(-1, 1, 1).astype(jnp.float32)

    kernel = partial(
        _stem_kernel, out_w=out_w, negative_slope=negative_slope
    )
    tap_spec = pl.BlockSpec(
        (1, tile_h, out_w + 1),
        lambda i, r: (i, r, 0),
        memory_space=pltpu.VMEM,
    )
    out = pl.pallas_call(
        kernel,
        grid=(b, padded_out_h // tile_h),
        in_specs=[tap_spec] * 9
        + [
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, c_out, tile_h, out_w),
            lambda i, r: (i, 0, r, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct(
            (b, c_out, padded_out_h, out_w), jnp.bfloat16
        ),
        interpret=interpret,
    )(*tap_views, wc, bias3d)
    # channel-major (NCHW) -> NHWC, trimming row padding
    out = out[:, :, :out_h] if row_pad else out
    return jnp.transpose(out, (0, 2, 3, 1))
