"""Worker for tests/test_multihost.py: one of two cooperating processes
running the REAL multi-host path (jax.distributed over a localhost
coordinator, Gloo CPU collectives, make_array_from_process_local_data).

Usage: python tests/multihost_worker.py <process_id> <coordinator_port>
Prints one line: MH <pid> <loss0> <loss1>
"""

import sys

import jax

# the container's sitecustomize force-registers the axon TPU backend and
# overrides jax_platforms; this worker must be CPU (2 virtual devices set
# via XLA_FLAGS by the parent test)
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

import jax.numpy as jnp
import numpy as np

from yogo_tpu.models.yogo import YOGO
from yogo_tpu.parallel.distributed import initialize_multihost, process_shard
from yogo_tpu.parallel.mesh import (
    data_sharded,
    get_mesh,
    replicated,
    shard_batch,
)
from yogo_tpu.train import TrainState, make_optimizer, make_train_step


def main() -> None:
    pid = int(sys.argv[1])
    import os

    nproc = int(os.environ["JAX_NUM_PROCESSES"])
    # exercises the env-var path of initialize_multihost (the parent sets
    # JAX_COORDINATOR_ADDRESS/JAX_NUM_PROCESSES/JAX_PROCESS_ID)
    assert initialize_multihost() is True
    assert jax.process_count() == nproc
    assert process_shard() == (pid, nproc), process_shard()

    # Establish the Gloo collective context NOW, while all processes are
    # still time-aligned from the coordinator connect: XLA's gloo kv
    # exchange has a hardcoded 30s GetKeyValue deadline, and on a 1-core
    # host four processes compiling the real train step drift far more than
    # 30s apart. A trivial all-reduce compiles in ~1s, so every process
    # reaches it well inside the window; the per-clique gloo pairs it
    # creates are then reused by the heavy collectives later.
    _mesh0 = get_mesh()
    _x = jax.device_put(
        np.zeros(len(jax.devices()), np.float32),
        jax.sharding.NamedSharding(
            _mesh0, jax.sharding.PartitionSpec("data")
        ),
    )
    _handshake = float(jax.jit(jnp.sum, out_shardings=None)(_x))
    assert _handshake == 0.0

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
    mesh = get_mesh()  # global mesh over all processes' devices
    assert mesh.size == 4
    rep, dat, msk = replicated(mesh), data_sharded(mesh), data_sharded(mesh, 1)
    step = make_train_step(
        model, tx,
        dict(no_obj_weight=0.5, iou_weight=5.0, classify_weight=1.0,
             label_smoothing=0.01),
    )
    jstep = jax.jit(step, in_shardings=(rep, dat, dat, msk, rep),
                    out_shardings=(rep, rep, rep))

    # each process contributes ITS half of the deterministic global batch
    Sx, Sy = model.grid
    rng = np.random.default_rng(7)
    imgs_g = rng.integers(0, 255, (4, 1, 48, 64)).astype(np.uint8)
    labels_g = np.zeros((4, 6, Sy, Sx), np.float32)
    labels_g[:, :, 2, 3] = np.array([1, 0.4, 0.4, 0.6, 0.6, 1.0])
    mask_g = np.ones(4, np.float32)
    per = 4 // nproc
    lo, hi = pid * per, pid * per + per
    imgs_d, labels_d, mask_d = shard_batch(
        mesh, imgs_g[lo:hi], labels_g[lo:hi], mask_g[lo:hi]
    )

    losses = []
    for _ in range(2):
        state, loss, _ = jstep(state, imgs_d, labels_d, mask_d, jax.random.key(1))
        losses.append(float(loss))

    # FSDP over the REAL multi-process mesh: params/moments sharded on the
    # data axis via put_with_shardings (each process assembles only its
    # addressable shards from its identical host copy - no process ever
    # device_puts the full state), same two steps from the same init. The
    # parent test pins these losses against the replicated run's: XLA
    # all-gathers weights at use and reduce-scatters grads, which must not
    # change the training math (Trainer --fsdp takes exactly this path,
    # train.py:506-517)
    from yogo_tpu.parallel.mesh import fsdp_sharding_tree, put_with_shardings
    from yogo_tpu.train import TrainState as TS

    fstate = TS(
        params=variables["params"],
        batch_stats=variables.get("batch_stats", {}),
        opt_state=tx.init(variables["params"]),
        step=jnp.asarray(0, jnp.int32),
    )
    # min_size=1: quarter_filters' leaves are all under the production
    # 4096 cutoff - shard everything divisible so the test is not vacuous
    fshd = TS(
        params=fsdp_sharding_tree(mesh, fstate.params, min_size=1),
        batch_stats=fsdp_sharding_tree(mesh, fstate.batch_stats, min_size=1),
        opt_state=fsdp_sharding_tree(mesh, fstate.opt_state, min_size=1),
        step=rep,
    )
    fstate = put_with_shardings(fstate, fshd)
    n_sharded = sum(
        1
        for s in jax.tree.leaves(
            fshd.params, is_leaf=lambda x: hasattr(x, "spec")
        )
        if any(ax is not None for ax in s.spec)
    )
    assert n_sharded > 0, "FSDP phase vacuous: no param leaf sharded"
    jstep_f = jax.jit(step, in_shardings=(fshd, dat, dat, msk, rep),
                      out_shardings=(fshd, rep, rep))
    flosses = []
    for _ in range(2):
        fstate, floss, _ = jstep_f(
            fstate, imgs_d, labels_d, mask_d, jax.random.key(1)
        )
        flosses.append(float(floss))
    print(f"MHFSDP {pid} {flosses[0]:.9e} {flosses[1]:.9e}", flush=True)

    # validate the local_rows layout assumption Trainer.test relies on:
    # replicating the sharded global batch and slicing this process's rows
    # must recover exactly the local data this process contributed
    from yogo_tpu.parallel.mesh import local_rows

    imgs_rep = jax.jit(
        lambda x: x, in_shardings=dat, out_shardings=rep
    )(imgs_d)
    got = local_rows(np.asarray(imgs_rep), imgs_g[lo:hi].shape[0])
    assert np.array_equal(got, imgs_g[lo:hi]), (
        "local_rows does not recover this process's shard"
    )

    # the REAL multihost eval path Trainer.test runs: sharded eval step,
    # replicated global preds sliced to the local shard, Metrics over it.
    # Every process scores its own rows; the parent test sums the matched+
    # missed object counts across processes and compares with a
    # single-process run of the same global batch.
    from yogo_tpu.metrics.metrics import Metrics
    from yogo_tpu.train import make_eval_step

    jeval = jax.jit(
        make_eval_step(
            model,
            dict(no_obj_weight=0.5, iou_weight=5.0, classify_weight=1.0,
                 label_smoothing=0.01),
        ),
        in_shardings=(rep, rep, dat, dat, msk),
        out_shardings=(rep, rep),
    )
    _, preds = jeval(
        state.params, state.batch_stats, imgs_d, labels_d, mask_d
    )
    preds_local = local_rows(np.asarray(preds, np.float32), hi - lo)
    metrics = Metrics(classes=["a", "b", "c"], obj_thresh=0.3,
                      max_detections=16)
    metrics.update(preds_local, labels_g[lo:hi], mask_g[lo:hi])
    out = metrics.compute()
    missed, total = out[7], out[9]
    # one GT object per image: matched + missed accounts for all of them
    n_objects = int(np.asarray(total).ravel()[0]) + int(missed.sum())
    assert n_objects == hi - lo, (n_objects, hi - lo)
    print(f"MHEVAL {pid} {n_objects}", flush=True)

    # SPMD fast-eval over the multi-process mesh (Trainer.test fast_eval
    # path): the eval step keeps predictions DATA-SHARDED (multi-process
    # jit cannot reshard non-addressable args, so the producer must emit
    # the sharding the update consumes - exactly what Trainer.test does
    # with `out_shardings=(rep, dat)` under fast_eval), every device
    # scatter-adds its shard, and the replicated accumulator state is
    # addressable from all processes - so every rank computes the GLOBAL
    # metrics (the documented fast-eval multihost semantics: the full
    # 4-image batch, not this rank's slice)
    from yogo_tpu.metrics.device_metrics import DeviceMetrics

    jeval_fast = jax.jit(
        make_eval_step(
            model,
            dict(no_obj_weight=0.5, iou_weight=5.0, classify_weight=1.0,
                 label_smoothing=0.01),
        ),
        in_shardings=(rep, rep, dat, dat, msk),
        out_shardings=(rep, dat),
    )
    _, preds_sh = jeval_fast(
        state.params, state.batch_stats, imgs_d, labels_d, mask_d
    )
    dm = DeviceMetrics(
        ["a", "b", "c"], obj_thresh=0.3, max_detections=16, mesh=mesh
    )
    dm.update(preds_sh, labels_d, image_mask=mask_d)
    dout = dm.compute()
    d_n = int(np.asarray(dout[9]).ravel()[0]) + int(dout[7].sum())
    print(f"MHFAST {pid} {d_n}", flush=True)

    # process-0-gated checkpointing of the replicated global state, exactly
    # as Trainer.checkpoint does it (device_get on replicated arrays is
    # fully addressable from every process)
    if len(sys.argv) > 3 and jax.process_index() == 0:
        from yogo_tpu.utils.checkpoint import save_checkpoint

        save_checkpoint(
            sys.argv[3], model,
            {
                "params": jax.device_get(state.params),
                "batch_stats": jax.device_get(state.batch_stats),
            },
            classes=["a", "b", "c"], step=2, model_name="mh",
        )
    print(f"MH {pid} {losses[0]:.6f} {losses[1]:.6f}", flush=True)


if __name__ == "__main__":
    main()
