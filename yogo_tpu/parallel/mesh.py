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


def get_mesh(devices: Optional[Sequence[jax.Device]] = None) -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    return Mesh(np.asarray(devices), (DATA_AXIS,))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def data_sharded(mesh: Mesh, ndim: int = 4) -> NamedSharding:
    """Shard the leading (batch) axis over the data axis."""
    return NamedSharding(mesh, P(DATA_AXIS, *([None] * (ndim - 1))))


def shard_batch(mesh: Mesh, *arrays: Any):
    """Place host arrays onto the mesh, batch axis sharded.

    On a multi-host setup each process passes its local shard; single-host
    this is a plain device_put with a sharding.
    """
    out = []
    for a in arrays:
        a = np.asarray(a)
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


def prefetch_to_device(batch_iter, mesh: Mesh, prefetch: int = 2):
    """Wrap a host (imgs, labels, mask) iterator with device prefetch.

    Pads each batch to the mesh size, starts its (async) transfer, and keeps
    `prefetch` batches in flight so H2D overlaps the previous step's compute -
    the single-controller analog of the reference's pin_memory +
    non_blocking copies (reference: yogo/train.py:310-311).
    """
    import collections

    queue = collections.deque()

    def put(host_batch):
        imgs, labels, mask = pad_batch_to_multiple(*host_batch, mesh.size)
        queue.append(shard_batch(mesh, imgs, labels, mask))

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
