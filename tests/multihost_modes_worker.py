"""Worker for tests/test_multihost.py::test_multi_process_fsdp_and_spatial:
one of two cooperating processes running REAL multi-host FSDP or spatial-
parallel training (jax.distributed over a localhost coordinator, Gloo CPU
collectives).

fsdp mode: params/moments sharded over a 4-device data axis SPANNING the two
processes (put_with_shardings assembles each process's addressable shards
from its identical host copy; XLA all-gathers weights at use and
reduce-scatters grads across hosts).
spatial mode: a 2-D (data=2, space=2) global mesh - each process owns one
data row, image rows split over its two local devices, conv halo exchanges
inserted by GSPMD.

Usage: python tests/multihost_modes_worker.py <pid> <port> <mode> [ckpt]
Prints: MHM <pid> <mode> <loss0> <loss1>
"""

import sys

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

import jax.numpy as jnp
import numpy as np

from yogo_tpu.models.yogo import YOGO
from yogo_tpu.parallel.distributed import initialize_multihost
from yogo_tpu.parallel.mesh import (
    data_sharded,
    fsdp_sharding_tree,
    get_mesh,
    get_mesh_2d,
    put_with_shardings,
    replicated,
    shard_batch,
    space_sharded,
)
from yogo_tpu.train import TrainState, make_optimizer, make_train_step

LOSS_KW = dict(
    no_obj_weight=0.5, iou_weight=5.0, classify_weight=1.0,
    label_smoothing=0.01,
)


def global_batch(Sy, Sx):
    rng = np.random.default_rng(7)
    imgs = rng.integers(0, 255, (4, 1, 48, 64)).astype(np.uint8)
    labels = np.zeros((4, 6, Sy, Sx), np.float32)
    labels[:, :, 2, 3] = np.array([1, 0.4, 0.4, 0.6, 0.6, 1.0])
    mask = np.ones(4, np.float32)
    return imgs, labels, mask


def main() -> None:
    pid = int(sys.argv[1])
    mode = sys.argv[3]

    assert initialize_multihost() is True
    assert jax.process_index() == pid
    nproc = jax.process_count()

    # gloo-handshake: build the collective context while processes are
    # still time-aligned (see tests/multihost_worker.py for the rationale)
    _mesh0 = get_mesh()
    _x = jax.device_put(
        np.zeros(len(jax.devices()), np.float32),
        jax.sharding.NamedSharding(_mesh0, jax.sharding.PartitionSpec("data")),
    )
    assert float(jax.jit(jnp.sum, out_shardings=None)(_x)) == 0.0

    model = YOGO.create((48, 64), 0.08, 0.1, num_classes=3,
                        model_version="quarter_filters")
    variables = model.init(jax.random.key(0))
    tx, _ = make_optimizer(1e-3, 5e-2, 10.0, 50)
    state = TrainState(
        params=variables["params"],
        batch_stats=variables.get("batch_stats", {}),
        opt_state=tx.init(variables["params"]),
        step=jnp.asarray(0, jnp.int32),
    )
    step = make_train_step(model, tx, LOSS_KW)

    if mode == "fsdp":
        mesh = get_mesh()
        assert mesh.size == 4
        rep, dat, msk = (
            replicated(mesh), data_sharded(mesh), data_sharded(mesh, 1)
        )
        img_shd = dat
        # min_size=64 so the small test model's conv kernels actually shard
        # 4 ways ACROSS the two processes
        state_shd = TrainState(
            params=fsdp_sharding_tree(mesh, state.params, min_size=64),
            batch_stats=fsdp_sharding_tree(
                mesh, state.batch_stats, min_size=64
            ),
            opt_state=fsdp_sharding_tree(mesh, state.opt_state, min_size=64),
            step=rep,
        )
        state = put_with_shardings(state, state_shd)
        # at least one param leaf must be genuinely sharded across hosts
        # (otherwise this test silently degrades to plain DP)
        assert any(
            not leaf.is_fully_addressable and not leaf.is_fully_replicated
            for leaf in jax.tree.leaves(state.params)
            if isinstance(leaf, jax.Array)
        ), "no param actually sharded - fsdp path not exercised"
    elif mode == "spatial":
        mesh = get_mesh_2d(2)  # (data=2, space=2); each process one row
        rep = replicated(mesh)
        dat, msk = data_sharded(mesh), data_sharded(mesh, 1)
        img_shd = space_sharded(mesh)
        state_shd = rep
    else:
        raise SystemExit(f"unknown mode {mode}")

    jstep = jax.jit(
        step,
        in_shardings=(state_shd, img_shd, dat, msk, rep),
        out_shardings=(state_shd, rep, rep),
        donate_argnums=(0,),
    )

    Sx, Sy = model.grid
    imgs_g, labels_g, mask_g = global_batch(Sy, Sx)
    per = 4 // nproc
    lo, hi = pid * per, pid * per + per
    imgs_d, labels_d, mask_d = shard_batch(
        mesh, imgs_g[lo:hi], labels_g[lo:hi], mask_g[lo:hi],
        spatial_first=(mode == "spatial"),
    )

    losses = []
    for _ in range(2):
        state, loss, _ = jstep(
            state, imgs_d, labels_d, mask_d, jax.random.key(1)
        )
        losses.append(float(loss))

    if mode == "fsdp" and len(sys.argv) > 4:
        # the multi-host FSDP checkpoint path: fetch_replicated all-gathers
        # the cross-host shards (every process joins), process 0 writes
        from yogo_tpu.parallel.mesh import fetch_replicated
        from yogo_tpu.utils.checkpoint import save_checkpoint

        host_state = fetch_replicated(
            {"params": state.params, "batch_stats": state.batch_stats}
        )
        if pid == 0:
            save_checkpoint(
                sys.argv[4], model, host_state,
                classes=["a", "b", "c"], step=2, model_name="mhm",
            )

    print(f"MHM {pid} {mode} {losses[0]:.6f} {losses[1]:.6f}", flush=True)


if __name__ == "__main__":
    main()
