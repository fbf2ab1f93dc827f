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


def data_sharded(mesh: Mesh, ndim: int = 4, batch_axis: int = 0) -> NamedSharding:
    """Shard the batch axis (default: leading) over the data axis.
    batch_axis=1 serves micro-batch stacks (A, B, ...) for gradient
    accumulation - the accumulation axis stays unsharded."""
    spec = [None] * ndim
    spec[batch_axis] = DATA_AXIS
    return NamedSharding(mesh, P(*spec))


def space_sharded(
    mesh: Mesh, ndim: int = 4, h_axis: int = 2, batch_axis: int = 0
) -> NamedSharding:
    """Batch axis over "data" AND the image height axis over "space"
    (NCHW input: h_axis=2). On a 1-D mesh this is just data_sharded."""
    if SPACE_AXIS not in mesh.axis_names:
        return data_sharded(mesh, ndim, batch_axis)
    spec = [None] * ndim
    spec[batch_axis] = DATA_AXIS
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


def shard_batch(
    mesh: Mesh, *arrays: Any, spatial_first: bool = False, batch_axis: int = 0
):
    """Place host arrays onto the mesh, batch axis sharded.

    spatial_first=True additionally shards the FIRST array's height axis
    (the NCHW image batch) over the mesh's "space" axis; labels/masks stay
    batch-sharded only (the label grid height Sy=97 is prime - GSPMD
    reshards it internally where the loss needs it). batch_axis=1 places
    micro-batch stacks (A, B, ...) for gradient accumulation.

    On a multi-host setup each process passes its local shard; single-host
    this is a plain device_put with a sharding.
    """
    out = []
    for i, a in enumerate(arrays):
        a = np.asarray(a)
        if spatial_first and i == 0:
            validate_spatial_height(mesh, a.shape[batch_axis + 2])
            sharding = space_sharded(
                mesh, a.ndim, h_axis=batch_axis + 2, batch_axis=batch_axis
            )
        else:
            sharding = data_sharded(mesh, a.ndim, batch_axis=batch_axis)
        if jax.process_count() > 1:  # exercised by tests/test_multihost.py
            # (two real processes over a localhost coordinator)
            global_shape = list(a.shape)
            global_shape[batch_axis] *= jax.process_count()
            arr = jax.make_array_from_process_local_data(
                sharding, a, tuple(global_shape)
            )
        else:
            arr = jax.device_put(a, sharding)
        out.append(arr)
    return tuple(out)


def put_with_shardings(tree: Any, shardings: Any) -> Any:
    """Place a host pytree onto a (pytree of) NamedShardings, multi-host safe.

    Single-process this is a plain device_put; multi-host, device_put cannot
    target non-addressable devices, so each leaf is assembled with
    make_array_from_callback: every process feeds its addressable shards by
    slicing its own (full) copy of the value at the global indices the
    sharding assigns. Callers must pass the same host value on every process
    (e.g. parameters from the same seed or checkpoint) - this is how
    multi-host FSDP state sharding scatters an identically-initialized
    state without any process ever holding more than it must on device."""
    if jax.process_count() == 1:
        return jax.device_put(tree, shardings)

    def leaf(x, s):
        a = np.asarray(x)
        return jax.make_array_from_callback(a.shape, s, lambda idx: a[idx])

    if isinstance(shardings, NamedSharding):  # one sharding, whole tree
        return jax.tree.map(lambda x: leaf(x, shardings), tree)
    return jax.tree.map(leaf, tree, shardings)


def replicate_to_mesh(tree: Any, mesh: Mesh) -> Any:
    """Place a host pytree fully replicated on the mesh, multi-host safe."""
    return put_with_shardings(tree, replicated(mesh))


_REPLICATE_JITS: dict = {}


def _replicate_all_fn(mesh: Mesh):
    """One cached jitted identity per mesh: a stable function identity so
    repeated checkpoint saves reuse the compiled all-gather program instead
    of recompiling a fresh jit wrapper per leaf per call."""
    fn = _REPLICATE_JITS.get(mesh)
    if fn is None:
        fn = jax.jit(
            lambda xs: xs,
            out_shardings=NamedSharding(mesh, P()),
        )
        _REPLICATE_JITS[mesh] = fn
    return fn


def fetch_replicated(tree: Any) -> Any:
    """Host (numpy) copy of a device pytree whose leaves may be sharded
    across hosts (multi-host FSDP state at checkpoint time).

    Cross-host-sharded leaves are replicated first in ONE jitted identity
    program with a replicated out_sharding (an XLA all-gather over the
    mesh) - so under multi-host EVERY process must call this together even
    if only process 0 writes the result; fully-addressable or
    fully-replicated leaves fetch directly."""
    leaves, treedef = jax.tree.flatten(tree)
    need = [
        i
        for i, x in enumerate(leaves)
        if isinstance(x, jax.Array)
        and not x.is_fully_addressable
        and not x.is_fully_replicated
    ]
    # group by mesh (in practice all state shares one mesh) and gather each
    # group in a single dispatch: per-leaf jits were 100+ compiles per save
    by_mesh: dict = {}
    for i in need:
        by_mesh.setdefault(leaves[i].sharding.mesh, []).append(i)
    for mesh, idxs in by_mesh.items():
        gathered = _replicate_all_fn(mesh)([leaves[i] for i in idxs])
        for i, g in zip(idxs, gathered):
            leaves[i] = g
    return treedef.unflatten([np.asarray(x) for x in leaves])


def fetch_local_rows(arr: jax.Array) -> np.ndarray:
    """This process's batch rows of a batch-sharded global array.

    Devices on the 1-D data axis are process-contiguous (jax.devices()
    orders by process index), so the addressable shards of a
    P("data", ...) output are exactly the rows this process contributed via
    shard_batch. Space-axis replicas (a 2-D mesh output sharded on "data"
    only) carry duplicate batch slices - deduplicated by slice start.
    Single-process: the whole array."""
    if jax.process_count() == 1:
        return np.asarray(arr)
    # the slice-start dedup below keys on axis 0 only: an array sharded on
    # any OTHER axis would collapse every shard to key 0 and silently
    # return one partial shard - fail loudly instead
    for s in arr.addressable_shards:
        if tuple(s.data.shape[1:]) != tuple(arr.shape[1:]):
            raise ValueError(
                "fetch_local_rows expects an array replicated or sharded "
                "on the leading (batch) axis only; got a shard of shape "
                f"{s.data.shape} from a global array of shape {arr.shape}"
            )
    seen = set()
    parts = []
    for s in sorted(
        arr.addressable_shards, key=lambda s: s.index[0].start or 0
    ):
        start = s.index[0].start or 0
        if start in seen:
            continue
        seen.add(start)
        parts.append(np.asarray(s.data))
    return np.concatenate(parts, axis=0)


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
    batch_iter,
    mesh: Mesh,
    prefetch: int = 2,
    spatial_first: bool = False,
    accumulate: int = 1,
):
    """Wrap a host (imgs, labels, mask) iterator with device prefetch.

    Pads each batch to the data-axis size, starts its (async) transfer, and
    keeps `prefetch` batches in flight so H2D overlaps the previous step's
    compute - the single-controller analog of the reference's pin_memory +
    non_blocking copies (reference: yogo/train.py:310-311). spatial_first
    shards image rows over the mesh's "space" axis (see shard_batch).

    accumulate > 1 groups every `accumulate` consecutive batches into ONE
    stacked (A, B, ...) micro-batch placement (batch axis sharded at axis
    1, accumulation axis unsharded) for gradient accumulation; a final
    short group is padded with zero-mask copies of its first micro-batch so
    the compiled step shape never changes (the count-weighted accumulation
    in make_train_step gives all-padding micros zero weight).
    """
    import collections

    queue = collections.deque()
    nd = n_data(mesh)

    def put(host_batch):
        imgs, labels, mask = pad_batch_to_multiple(*host_batch, nd)
        queue.append(
            shard_batch(mesh, imgs, labels, mask, spatial_first=spatial_first)
        )

    def put_group(group):
        padded = [pad_batch_to_multiple(*b, nd) for b in group]
        # batches within one group may have different raw sizes (an
        # iterator without drop_last at epoch end): pad every micro to the
        # group max so the stack below is rectangular; the max of
        # nd-multiples is an nd-multiple, and extra rows carry mask 0
        tgt = max(b[0].shape[0] for b in padded)
        padded = [pad_batch_to_size(*b, tgt) for b in padded]
        while len(padded) < accumulate:
            i0, l0, m0 = padded[0]
            padded.append((i0, l0, np.zeros_like(m0)))
        imgs = np.stack([b[0] for b in padded])
        labels = np.stack([b[1] for b in padded])
        mask = np.stack([b[2] for b in padded])
        queue.append(
            shard_batch(
                mesh, imgs, labels, mask,
                spatial_first=spatial_first, batch_axis=1,
            )
        )

    def pull(it):
        if accumulate == 1:
            put(next(it))
            return
        group = [next(it)]  # StopIteration here ends cleanly with no group
        try:
            while len(group) < accumulate:
                group.append(next(it))
        except StopIteration:
            pass
        put_group(group)

    it = iter(batch_iter)
    try:
        for _ in range(prefetch):
            pull(it)
    except StopIteration:
        pass
    while queue:
        out = queue.popleft()
        try:
            pull(it)
        except StopIteration:
            pass
        yield out


def pad_batch_to_size(
    imgs: np.ndarray, labels: np.ndarray, mask: np.ndarray, target: int
):
    """Pad the batch axis to exactly `target` rows; padded rows masked out."""
    b = imgs.shape[0]
    if target == b:
        return imgs, labels, mask
    pad = target - b
    imgs = np.concatenate([imgs, np.repeat(imgs[:1], pad, axis=0)])
    labels = np.concatenate([labels, np.repeat(labels[:1], pad, axis=0)])
    mask = np.concatenate([mask, np.zeros(pad, mask.dtype)])
    return imgs, labels, mask


def pad_batch_to_multiple(
    imgs: np.ndarray, labels: np.ndarray, mask: np.ndarray, multiple: int
):
    """Pad the batch axis so it divides the mesh size; padded rows masked out."""
    target = -(-imgs.shape[0] // multiple) * multiple
    return pad_batch_to_size(imgs, labels, mask, target)
