"""Pallas TPU kernel: fused YOGO stem (uint8 -> conv3x3 stride2 + BN + LeakyReLU).

The first backbone block is the one op XLA handles poorly on TPU: a stride-2
3x3 conv over a single-channel 772x1032 image. With C_in=1 the MXU's
contraction dim is 9, so XLA burns HBM bandwidth on padded layouts instead of
compute (~4.8 ms per 128-image batch, vs a ~1.2 ms bandwidth roofline).

This kernel reads the uint8 image once per batch element, decomposes the
stride-2 conv into 9 phase planes (even/odd row x even/odd column shifts -
no strided MXU access, pure VPU FMAs), folds the inference-mode BatchNorm
into the weights, applies LeakyReLU, and writes the (H/2, W/2, 16) bf16
activation once. Grid = (batch,); one whole image per program (a padded
772x1032 uint8 frame + its output fit comfortably in VMEM).

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


def _stem_kernel(x_ref, w_ref, b_ref, out_ref, *, out_h: int, out_w: int,
                 negative_slope: float):
    # x_ref: (1, 2*out_h + 2, 2*out_w + 2) uint8 (pre-padded by 1 on each side)
    # w_ref: (3, 3, C_out) f32, b_ref: (1, C_out) f32
    # out_ref: (1, out_h, out_w, C_out) bf16
    # Mosaic has no direct uint8 -> bf16 cast; hop through int32/f32
    x = x_ref[0].astype(jnp.int32).astype(jnp.float32).astype(jnp.bfloat16)

    even_rows = x[0::2, :]  # (out_h + 1, Wp)
    odd_rows = x[1::2, :]   # (out_h + 1, Wp)

    # rows[dy] has shape (out_h, Wp); padded row index of tap dy is 2h + dy + 1
    rows = {
        -1: even_rows[:out_h],
        0: odd_rows[:out_h],
        1: even_rows[1 : out_h + 1],
    }

    planes = {}
    for dy in (-1, 0, 1):
        r = rows[dy]
        ec = r[:, 0::2]  # padded even cols: 2w
        oc = r[:, 1::2]  # padded odd cols: 2w + 1
        planes[(dy, -1)] = ec[:, :out_w]
        planes[(dy, 0)] = oc[:, :out_w]
        planes[(dy, 1)] = ec[:, 1 : out_w + 1]

    c_out = w_ref.shape[-1]
    for o in range(c_out):
        acc = jnp.full((out_h, out_w), b_ref[0, o], jnp.float32)
        for dy in (-1, 0, 1):
            for dx in (-1, 0, 1):
                w = w_ref[dy + 1, dx + 1, o]
                acc = acc + planes[(dy, dx)].astype(jnp.float32) * w
        act = jnp.where(acc >= 0, acc, negative_slope * acc)
        out_ref[0, :, :, o] = act.astype(jnp.bfloat16)


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
    weights/bias) -> LeakyReLU, in bf16.
    """
    b, h, w = images.shape
    out_h, out_w = h // 2, w // 2
    c_out = weights.shape[-1]

    padded = jnp.pad(images, ((0, 0), (1, 1), (1, 1)))
    bias2d = bias.reshape(1, -1).astype(jnp.float32)

    kernel = partial(
        _stem_kernel, out_h=out_h, out_w=out_w, negative_slope=negative_slope
    )
    return pl.pallas_call(
        kernel,
        grid=(b,),
        in_specs=[
            pl.BlockSpec(
                (1, h + 2, w + 2), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
            ),
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
    )(padded, weights.astype(jnp.float32), bias2d)
