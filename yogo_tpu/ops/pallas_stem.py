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
    ((3,3,O) weights, (O,) bias) for the fused kernel.

    jnp-based and traceable: YOGO._stem_kernel_params calls this under jit
    (pallas_stem_forward is meant to be jitted by callers), and it is the
    single copy of the fold math - the model must not re-derive it."""
    w = jnp.asarray(kernel_hwio, jnp.float32)[:, :, 0, :]  # (3,3,O)
    b = (
        jnp.asarray(bias, jnp.float32)
        if bias is not None
        else jnp.zeros(w.shape[-1], jnp.float32)
    )
    if bn_scale is not None:
        k = jnp.asarray(bn_scale, jnp.float32) * jax.lax.rsqrt(
            jnp.asarray(bn_var, jnp.float32) + eps
        )
        w = w * k
        b = (b - jnp.asarray(bn_mean, jnp.float32)) * k + jnp.asarray(
            bn_bias, jnp.float32
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


# --------------------------------------------------------------------------
# v2: the production stem kernel.
#
# Round-1 `fused_stem` lost to XLA (14.9 vs 4.8 ms @ bs=128) for three
# reasons this version removes:
#   1. in-kernel unaligned lane slices (t[:, j0:j0+out_w]) forced a lane
#      rotate per tap - v2 pre-shifts ALL 9 tap planes in XLA, so the kernel
#      does only aligned full-block FMAs,
#   2. the padded output was trimmed with a slice (an extra full-tensor
#      copy) - v2 relies on Mosaic's masked final-block writes,
#   3. the NCHW->NHWC transpose at the end (another full copy) - v2 emits
#      channel-major (B, C, H/2, W/2) and the caller feeds it to the next
#      conv with NCHW dimension numbers.
#
# The per-channel fori_loop keeps the unrolled op count small (round 1's
# 144-FMA body took >25 min to remote-compile).


def _stem_kernel_v2(
    planes_ref,  # (1, 9, TH, W2) uint8, fully pre-shifted tap planes
    w_ref,  # (16, 9) f32 in SMEM: folded conv+BN weights per (channel, tap)
    b_ref,  # (16,) f32 in SMEM: folded bias
    out_ref,  # (1, C, TH, W2) bf16, channel-major
    planes_f32,  # scratch (9, TH, W2) f32
    acc_ref,  # scratch (C, TH, W2) f32
    *,
    negative_slope: float,
):
    # hop uint8 -> int32 -> f32 (no direct 8->16/32-bit float cast in Mosaic)
    planes_f32[...] = planes_ref[0].astype(jnp.int32).astype(jnp.float32)
    c_out = acc_ref.shape[0]

    def one_channel(c, _):
        acc = b_ref[c] * jnp.ones(planes_f32.shape[1:], jnp.float32)
        for t in range(9):
            acc = acc + w_ref[c, t] * planes_f32[t]
        acc_ref[c] = jnp.where(acc >= 0, acc, negative_slope * acc)
        return 0

    jax.lax.fori_loop(0, c_out, one_channel, 0, unroll=False)
    out_ref[0] = acc_ref[...].astype(jnp.bfloat16)


@partial(jax.jit, static_argnames=("negative_slope", "interpret", "tile_h"))
def fused_stem_nchw(
    images: Array,
    weights: Array,
    bias: Array,
    negative_slope: float = 0.01,
    interpret: bool = False,
    tile_h: int = 32,
) -> Array:
    """images (B, H, W) uint8 (H, W even) -> (B, C, H//2, W//2) bf16 NCHW.

    pad-1 conv3x3 stride-2 with BN folded into weights/bias + LeakyReLU,
    f32 accumulation. `weights` (3, 3, C) / `bias` (C,) from
    fold_stem_params.
    """
    b, h, w = images.shape
    out_h, out_w = h // 2, w // 2
    c_out = weights.shape[-1]
    n_tiles = -(-out_h // tile_h)
    padded_h = n_tiles * tile_h

    # fully pre-shifted tap planes, built by XLA in one fused pass:
    # planes[:, 3*dy+dx, y, x] = padded[2y + dy, 2x + dx]
    padded = jnp.pad(
        images, ((0, 0), (1, 1 + (2 * padded_h - out_h * 2)), (1, 1))
    )
    planes = jnp.stack(
        [
            padded[:, dy : dy + 2 * padded_h : 2, dx : dx + 2 * out_w : 2]
            for dy in range(3)
            for dx in range(3)
        ],
        axis=1,
    )  # (B, 9, padded_h, out_w) uint8

    wc = jnp.stack(
        [weights[dy, dx, :] for dy in range(3) for dx in range(3)], axis=1
    ).astype(jnp.float32)  # (C, 9)

    kernel = partial(_stem_kernel_v2, negative_slope=negative_slope)
    out = pl.pallas_call(
        kernel,
        grid=(b, n_tiles),
        in_specs=[
            pl.BlockSpec(
                (1, 9, tile_h, out_w),
                lambda i, r: (i, 0, r, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, c_out, tile_h, out_w),
            lambda i, r: (i, 0, r, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((b, c_out, out_h, out_w), jnp.bfloat16),
        scratch_shapes=[
            pltpu.VMEM((9, tile_h, out_w), jnp.float32),
            pltpu.VMEM((c_out, tile_h, out_w), jnp.float32),
        ],
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
        ),
    )(planes, wc, bias.astype(jnp.float32))
    return out
