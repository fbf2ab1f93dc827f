"""Paired image+label-grid augmentations as jittable batch ops.

The reference applies random flips on the host inside the dataloader collate
(reference: yogo/data/data_transforms.py:51-98). TPU-first, these run *inside
the jitted train step* on device - uint8 images flip for free in the same
fusion as the normalization, and the PRNG key is explicit so training stays
reproducible.

Label grid layout (B, 6, Sy, Sx): [mask, x1, y1, x2, y2, class]; a horizontal
flip maps x -> 1 - x (swapping x1/x3) and reverses the Sx axis; vertical
analogous.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

Array = jax.Array


def hflip(images: Array, labels: Array) -> Tuple[Array, Array]:
    """Flip a whole batch horizontally. images (B, C, H, W), labels (B, 6, Sy, Sx)."""
    images = jnp.flip(images, axis=3)
    mask = labels[:, 0:1]
    x1 = labels[:, 1:2]
    y1 = labels[:, 2:3]
    x2 = labels[:, 3:4]
    y2 = labels[:, 4:5]
    cls = labels[:, 5:6]
    # new x1 = 1 - old x2, new x2 = 1 - old x1; zero cells stay zero via mask
    new_x1 = (1.0 - x2) * mask
    new_x2 = (1.0 - x1) * mask
    labels = jnp.concatenate([mask, new_x1, y1, new_x2, y2, cls], axis=1)
    return images, jnp.flip(labels, axis=3)


def vflip(images: Array, labels: Array) -> Tuple[Array, Array]:
    """Flip a whole batch vertically."""
    images = jnp.flip(images, axis=2)
    mask = labels[:, 0:1]
    x1 = labels[:, 1:2]
    y1 = labels[:, 2:3]
    x2 = labels[:, 3:4]
    y2 = labels[:, 4:5]
    cls = labels[:, 5:6]
    new_y1 = (1.0 - y2) * mask
    new_y2 = (1.0 - y1) * mask
    labels = jnp.concatenate([mask, x1, new_y1, x2, new_y2, cls], axis=1)
    return images, jnp.flip(labels, axis=2)


def random_flips(
    rng: jax.Array, images: Array, labels: Array, p: float = 0.5
) -> Tuple[Array, Array]:
    """Batch-level random horizontal + vertical flips (each with prob p),
    mirroring the reference's per-batch coin flips
    (reference: yogo/data/yogo_dataloader.py:203-210)."""
    kh, kv = jax.random.split(rng)
    do_h = jax.random.uniform(kh) < p
    do_v = jax.random.uniform(kv) < p
    images, labels = jax.lax.cond(
        do_h, lambda i, l: hflip(i, l), lambda i, l: (i, l), images, labels
    )
    images, labels = jax.lax.cond(
        do_v, lambda i, l: vflip(i, l), lambda i, l: (i, l), images, labels
    )
    return images, labels
