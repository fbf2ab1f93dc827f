"""Device mesh + sharding helpers for data-parallel training.

Replaces the reference's DDP/NCCL machinery (reference: yogo/train.py:152-159,
96-105 - process spawn, TCPStore rendezvous, DistributedSampler) with JAX's
single-controller SPMD: one 1-D mesh over all devices, params replicated,
batch sharded on the "data" axis. XLA inserts the gradient all-reduce over
ICI automatically; there is no process spawn, no port rendezvous, no
side-channel KV store.

Multi-host: call jax.distributed.initialize() before building the mesh; the
loader shards by (process_index, process_count) and per-host batches are
globalized with make_array_from_process_local_data.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
SPACE_AXIS = "space"


def get_mesh(devices: Optional[Sequence[jax.Device]] = None) -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    return Mesh(np.asarray(devices), (DATA_AXIS,))


def get_mesh_2d(
    n_space: int, devices: Optional[Sequence[jax.Device]] = None
) -> Mesh:
    """2-D (data, space) mesh: batch parallelism on the first axis, GSPMD
    spatial partitioning of the image height on the second.

    Spatial partitioning is the TPU-native scale-UP axis the reference has
    no analogue for (its DDP replicates the whole model+image per GPU):
    each image's rows are split over `n_space` devices and XLA's SPMD
    partitioner inserts halo exchanges (collective-permutes of the few
    boundary rows a conv window needs) over ICI automatically. Use it when
    a single device's HBM can't hold the activations - very tall crops, or
    train batches past the documented bs>=256 activation pressure - or to
    cut single-batch latency. n_space=1 degenerates to get_mesh()."""
    devices = list(devices if devices is not None else jax.devices())
    if n_space < 1 or len(devices) % n_space:
        raise ValueError(
            f"spatial axis size {n_space} must divide the device count "
            f"{len(devices)}"
        )
    if n_space == 1:
        return get_mesh(devices)
    grid = np.asarray(devices).reshape(len(devices) // n_space, n_space)
    return Mesh(grid, (DATA_AXIS, SPACE_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def data_sharded(mesh: Mesh, ndim: int = 4) -> NamedSharding:
    """Shard the leading (batch) axis over the data axis."""
    return NamedSharding(mesh, P(DATA_AXIS, *([None] * (ndim - 1))))


def space_sharded(mesh: Mesh, ndim: int = 4, h_axis: int = 2) -> NamedSharding:
    """Batch axis over "data" AND the image height axis over "space"
    (NCHW input: h_axis=2). On a 1-D mesh this is just data_sharded."""
    if SPACE_AXIS not in mesh.axis_names:
        return data_sharded(mesh, ndim)
    spec = [None] * ndim
    spec[0] = DATA_AXIS
    spec[h_axis] = SPACE_AXIS
    return NamedSharding(mesh, P(*spec))


def n_space(mesh: Mesh) -> int:
    """Size of the spatial axis (1 on a 1-D data mesh)."""
    return mesh.shape.get(SPACE_AXIS, 1)


def n_data(mesh: Mesh) -> int:
    """Size of the data axis (the batch-sharding factor): the single
    helper every caller uses so the axis lookup cannot drift."""
    return mesh.shape.get(DATA_AXIS, 1)


def validate_spatial_height(mesh: Mesh, img_h: int) -> None:
    """device_put rejects unevenly-sharded host arrays, so the INPUT height
    must divide the spatial axis (772 divides 2 and 4; intermediate layers
    may be uneven - GSPMD pads those internally inside the jit)."""
    ns = n_space(mesh)
    if img_h % ns:
        raise ValueError(
            f"image height {img_h} is not divisible by the spatial axis "
            f"size {ns}; pick a spatial factor that divides the height "
            f"(772 allows 2 or 4) or crop to a divisible height"
        )


def fsdp_sharding_tree(mesh: Mesh, tree: Any, min_size: int = 4096) -> Any:
    """NamedSharding pytree for FSDP (ZeRO-style) state sharding: each
    array's LAST axis is sharded over the data axis when divisible and the
    array is big enough to be worth scattering; everything else replicates.

    Applied to params, optimizer moments, and batch_stats, per-device
    memory for model state shrinks ~Nx; XLA all-gathers a weight just
    before its conv consumes it and reduce-scatters its gradient - the
    standard GSPMD formulation of fully-sharded data parallelism (the
    scaling-book "fsdp over the data axis" recipe; t5x/maxtext use the
    same axis convention). Conv kernels are HWIO, so the last axis is the
    output-channel dim - the largest and the one XLA tiles anyway.

    min_size keeps small leaves (BN vectors, biases) replicated: scattering
    a 128-float vector saves nothing and costs a collective."""
    n = n_data(mesh)

    def rule(leaf):
        shape = getattr(leaf, "shape", ())
        size = int(np.prod(shape)) if shape else 1
        if n > 1 and len(shape) >= 1 and size >= min_size and shape[-1] % n == 0:
            return NamedSharding(
                mesh, P(*([None] * (len(shape) - 1)), DATA_AXIS)
            )
        return NamedSharding(mesh, P())

    return jax.tree.map(rule, tree)


def shard_batch(mesh: Mesh, *arrays: Any, spatial_first: bool = False):
    """Place host arrays onto the mesh, batch axis sharded.

    spatial_first=True additionally shards the FIRST array's height axis
    (the NCHW image batch) over the mesh's "space" axis; labels/masks stay
    batch-sharded only (the label grid height Sy=97 is prime - GSPMD
    reshards it internally where the loss needs it).

    On a multi-host setup each process passes its local shard; single-host
    this is a plain device_put with a sharding.
    """
    out = []
    for i, a in enumerate(arrays):
        a = np.asarray(a)
        if spatial_first and i == 0:
            validate_spatial_height(mesh, a.shape[2])
            sharding = space_sharded(mesh, a.ndim)
        else:
            sharding = data_sharded(mesh, a.ndim)
        if jax.process_count() > 1:  # exercised by tests/test_multihost.py
            # (two real processes over a localhost coordinator)
            global_shape = (a.shape[0] * jax.process_count(), *a.shape[1:])
            arr = jax.make_array_from_process_local_data(
                sharding, a, global_shape
            )
        else:
            arr = jax.device_put(a, sharding)
        out.append(arr)
    return tuple(out)


def local_rows(global_np: np.ndarray, local_batch: int) -> np.ndarray:
    """This process's rows of a replicated global-batch array built by
    shard_batch: make_array_from_process_local_data lays process p's local
    data at global rows [p*local_batch, (p+1)*local_batch) on the 1-D data
    mesh (devices ordered by process). Single-process: the array unchanged.
    Validated against the round-tripped input in tests/multihost_worker.py.
    """
    if jax.process_count() == 1:
        return global_np
    start = jax.process_index() * local_batch
    return global_np[start : start + local_batch]


def prefetch_to_device(
    batch_iter, mesh: Mesh, prefetch: int = 2, spatial_first: bool = False
):
    """Wrap a host (imgs, labels, mask) iterator with device prefetch.

    Pads each batch to the data-axis size, starts its (async) transfer, and
    keeps `prefetch` batches in flight so H2D overlaps the previous step's
    compute - the single-controller analog of the reference's pin_memory +
    non_blocking copies (reference: yogo/train.py:310-311). spatial_first
    shards image rows over the mesh's "space" axis (see shard_batch).
    """
    import collections

    queue = collections.deque()
    nd = n_data(mesh)

    def put(host_batch):
        imgs, labels, mask = pad_batch_to_multiple(*host_batch, nd)
        queue.append(
            shard_batch(mesh, imgs, labels, mask, spatial_first=spatial_first)
        )

    it = iter(batch_iter)
    try:
        for _ in range(prefetch):
            put(next(it))
    except StopIteration:
        pass
    while queue:
        out = queue.popleft()
        try:
            put(next(it))
        except StopIteration:
            pass
        yield out


def pad_batch_to_multiple(
    imgs: np.ndarray, labels: np.ndarray, mask: np.ndarray, multiple: int
):
    """Pad the batch axis so it divides the mesh size; padded rows masked out."""
    b = imgs.shape[0]
    target = -(-b // multiple) * multiple
    if target == b:
        return imgs, labels, mask
    pad = target - b
    imgs = np.concatenate([imgs, np.repeat(imgs[:1], pad, axis=0)])
    labels = np.concatenate([labels, np.repeat(labels[:1], pad, axis=0)])
    mask = np.concatenate([mask, np.zeros(pad, mask.dtype)])
    return imgs, labels, mask
