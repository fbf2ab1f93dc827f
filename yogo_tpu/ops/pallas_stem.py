"""Pallas TPU kernel: fused YOGO stem (uint8 -> conv3x3 stride2 + BN + LeakyReLU).

The first backbone block is the one op XLA handles poorly on TPU: a stride-2
3x3 conv over a single-channel 772x1032 image. With C_in=1 the MXU's
contraction dim is 9, so XLA burns HBM bandwidth on padded layouts instead of
compute (~4.8 ms per 128-image batch, vs a ~1.2 ms bandwidth roofline).

Design: the stride-2 conv is decomposed into 4 space-to-depth *phase planes*
(even/odd row x even/odd column). XLA produces the planes (one uint8
transpose pass - a layout change it lowers well); the Pallas kernel then
computes all 9 taps as unit-offset slices of the planes (no strided vector
access, which Mosaic cannot lower) with VPU FMAs, folds the inference-mode
BatchNorm into the weights, applies LeakyReLU, and writes the
(H/2, W/2, 16) bf16 activation once. Grid = (batch,); one image's planes +
output fit comfortably in VMEM.

Inference-path only (training keeps the differentiable XLA conv).
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


def _stem_kernel(p00_ref, p01_ref, p10_ref, p11_ref, w_ref, b_ref, out_ref,
                 *, out_h: int, out_w: int, negative_slope: float):
    # p{a}{b}: (1, out_h + 1, out_w + 1) uint8 phase planes of the padded
    # image: p[a][b][i, j] = padded[2i + a, 2j + b].
    # Mosaic has no direct uint8 -> bf16 cast; hop through int32 -> f32.
    def load(ref):
        return ref[0].astype(jnp.int32).astype(jnp.float32)

    p00 = load(p00_ref)
    p01 = load(p01_ref)
    p10 = load(p10_ref)
    p11 = load(p11_ref)

    # tap (dy, dx) reads padded[2h + dy + 1, 2w + dx + 1]:
    #   dy=-1 -> plane a=0 rows [0, out_h); dy=0 -> a=1 rows [0, out_h);
    #   dy=+1 -> plane a=0 rows [1, out_h + 1); columns analogous.
    planes = {(0, 0): p00, (0, 1): p01, (1, 0): p10, (1, 1): p11}

    def tap(dy, dx):
        a = 0 if dy != 0 else 1
        b = 0 if dx != 0 else 1
        i0 = 1 if dy == 1 else 0
        j0 = 1 if dx == 1 else 0
        return planes[(a, b)][i0 : i0 + out_h, j0 : j0 + out_w]

    taps = {(dy, dx): tap(dy, dx) for dy in (-1, 0, 1) for dx in (-1, 0, 1)}

    # accumulate per channel in f32, stack, cast once, store the full block
    # (Mosaic only supports minor-dim insertion for 32-bit types)
    c_out = w_ref.shape[-1]
    accs = []
    for o in range(c_out):
        acc = jnp.full((out_h, out_w), b_ref[0, o], jnp.float32)
        for dy in (-1, 0, 1):
            for dx in (-1, 0, 1):
                acc = acc + taps[(dy, dx)] * w_ref[dy + 1, dx + 1, o]
        accs.append(acc)
    stacked = jnp.stack(accs, axis=-1)  # (out_h, out_w, c_out) f32
    act = jnp.where(stacked >= 0, stacked, negative_slope * stacked)
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

    # phase planes of the 1-padded image, built by XLA (single uint8
    # transpose pass). padded size (h+2, w+2); each plane (out_h+1, out_w+1).
    padded = jnp.pad(images, ((0, 0), (1, 1), (1, 1)))
    ph = padded.reshape(b, out_h + 1, 2, out_w + 1, 2)
    planes = [ph[:, :, a, :, bb] for a in (0, 1) for bb in (0, 1)]
    bias2d = bias.reshape(1, -1).astype(jnp.float32)

    kernel = partial(
        _stem_kernel, out_h=out_h, out_w=out_w, negative_slope=negative_slope
    )
    plane_spec = pl.BlockSpec(
        (1, out_h + 1, out_w + 1), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
    )
    return pl.pallas_call(
        kernel,
        grid=(b,),
        in_specs=[
            plane_spec,
            plane_spec,
            plane_spec,
            plane_spec,
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, out_h, out_w, c_out),
            lambda i: (i, 0, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((b, out_h, out_w, c_out), jnp.bfloat16),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
    )(*planes, weights.astype(jnp.float32), bias2d)
