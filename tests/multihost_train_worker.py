"""Worker for tests/test_multihost.py::test_multi_process_preemption_resume:
one of two cooperating processes running the REAL Trainer.train() loop under
jax.distributed (localhost coordinator, Gloo CPU collectives, 2 virtual
devices per process).

phase "interrupt": a REAL SIGTERM is delivered to rank 1 ONLY, at the end of
epoch 1's latest-checkpoint write. Rank 0 never sees a signal - it must stop
via the epoch-boundary process_allgather consensus, in the same epoch, with
no collective desync (the reference has no preemption handling at all; its
DDP analog would SIGTERM-kill every rank, reference: yogo/train.py:295-372).

phase "resume": --resume from the interrupted latest.ckpt; must pick up at
the recorded epoch and run to completion through the multihost best-reload
barrier + test() tail.

Usage: python tests/multihost_train_worker.py <pid> <defn_yml> <outdir> \
           <phase> [pretrained_ckpt]
Prints: MHT <pid> <phase> <result> <param_norm>
  result = "interrupted" (train() returned None) or "completed"
"""

import os
import sys

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from yogo_tpu.parallel.distributed import initialize_multihost  # noqa: E402


def main() -> None:
    pid = int(sys.argv[1])
    defn = sys.argv[2]
    outdir = sys.argv[3]
    phase = sys.argv[4]
    pretrained = sys.argv[5] if len(sys.argv) > 5 else None

    initialize_multihost()
    assert jax.process_count() == 2

    # gloo handshake while the two processes are still time-aligned: XLA's
    # gloo context setup has a hardcoded 30s KV deadline, and the Trainer
    # compiles for >30s on this 1-core container before its first collective
    from jax.experimental import multihost_utils

    multihost_utils.process_allgather(np.asarray(pid, np.int32))

    from pathlib import Path

    from yogo_tpu.parallel.mesh import fetch_replicated
    from yogo_tpu.train import Trainer

    cfg = {
        "learning_rate": 1e-3, "decay_factor": 10.0, "weight_decay": 5e-2,
        "label_smoothing": 0.01, "iou_weight": 5.0, "no_obj_weight": 0.5,
        "classify_weight": 1.0, "epochs": 4, "batch_size": 2,
        "anchor_w": 0.1, "anchor_h": 0.15, "model": "quarter_filters",
        "half": False, "rgb": False, "image_hw": (40, 56),
        "pretrained_path": pretrained, "normalize_images": False,
        "dataset_split_override": None,
        "dataset_descriptor_file": defn,
        "name": f"mht_{phase}", "note": None, "tags": None,
        "wandb_entity": None, "wandb_project": None, "use_wandb": False,
        "model_save_dir": outdir,
        "resume": phase == "resume",
    }
    t = Trainer(cfg)
    t.init()

    if phase == "interrupt" and pid == 1:
        # real preemption: SIGTERM THIS rank only, right after it joins the
        # epoch-1 latest.ckpt state gather (rank 1 never writes the file -
        # checkpoint() rank-gates - but it must join the fetch collective)
        orig_ckpt = t.checkpoint

        def ckpt_hook(path, model_name, **kw):
            orig_ckpt(path, model_name, **kw)
            if Path(path).name == "latest.ckpt" and t.epoch == 1:
                os.kill(os.getpid(), __import__("signal").SIGTERM)

        t.checkpoint = ckpt_hook

    result = t.train()

    if phase == "interrupt":
        # the defn HAS a test split, so None really means "skipped the test
        # pass because interrupted" - a run that ignored the SIGTERM would
        # have returned test metrics here
        assert result is None, "interrupted run must skip the test pass"
        outcome = "interrupted"
        assert t.epoch == 1, f"consensus stop epoch drifted: {t.epoch}"
    else:
        assert result is not None, "completed run must run the test pass"
        outcome = "completed"
        assert t._start_epoch == 2, t._start_epoch

    params = fetch_replicated(t.state.params)
    # replicated state is bit-identical across ranks, so an f32 norm is an
    # exact cross-rank receipt
    norm = float(
        jnp.sqrt(
            sum(jnp.sum(jnp.square(x)) for x in jax.tree.leaves(params))
        )
    )
    print(f"MHT {pid} {phase} {outcome} {norm:.12e}", flush=True)


if __name__ == "__main__":
    main()
