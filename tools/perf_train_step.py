"""Honest train-step throughput after the buffered-logging fix.

N chained train steps (state donated, each step depends on the previous)
with ONE float(loss) fetch at the end: the data dependency fences every
step, so the wall clock is real, and no per-step host sync throttles
dispatch (the round-1 loop fetched float(loss) every step).

Usage: python tools/perf_train_step.py [bs] [steps] [scan_k] [remat]

remat in {none, blocks, full} (default none) selects activation
rematerialization (train.make_train_step remat=...). YOGO_PERF_MODEL
selects the architecture (default base_model).

With scan_k > 1, additionally times a program that runs scan_k train steps
inside one lax.scan dispatch (same batch each step) — isolating the per-
dispatch overhead from real step compute.
"""

import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from yogo_tpu.models.yogo import YOGO
from yogo_tpu.train import TrainState, make_optimizer, make_train_step
from yogo_tpu.utils.default_hyperparams import DefaultHyperparams as df


def main():
    bs = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    n_steps = int(sys.argv[2]) if len(sys.argv) > 2 else 20
    scan_k = int(sys.argv[3]) if len(sys.argv) > 3 else 0
    remat = sys.argv[4] if len(sys.argv) > 4 else "none"
    accumulate = int(sys.argv[5]) if len(sys.argv) > 5 else 1

    model_version = os.environ.get("YOGO_PERF_MODEL", "base_model")
    model = YOGO.create(
        (772, 1032), df.ANCHOR_W, df.ANCHOR_H, num_classes=7,
        model_version=model_version, compute_dtype=jnp.bfloat16,
    )
    v = model.init(jax.random.key(0))
    tx, _ = make_optimizer(3e-4, 5e-2, 10.0, 1000)
    state = TrainState(
        params=v["params"], batch_stats=v.get("batch_stats", {}),
        opt_state=tx.init(v["params"]), step=jnp.asarray(0, jnp.int32),
    )
    step = jax.jit(
        make_train_step(model, tx, dict(no_obj_weight=0.5, iou_weight=5.0,
                                        classify_weight=1.0,
                                        label_smoothing=0.01), remat=remat,
                        accumulate=accumulate),
        donate_argnums=(0,),
    )

    Sx, Sy = model.grid
    shape = (bs, 1, 772, 1032) if accumulate == 1 else (
        accumulate, bs, 1, 772, 1032
    )
    imgs = jax.jit(
        lambda k: jax.random.randint(k, shape, 0, 255, jnp.uint8)
    )(jax.random.key(1))
    labels = np.zeros((bs, 6, Sy, Sx), np.float32)
    labels[:, :, 20, 30] = [1, 0.4, 0.4, 0.5, 0.5, 2]
    mask = np.ones(bs, np.float32)
    if accumulate > 1:
        labels = np.stack([labels] * accumulate)
        mask = np.stack([mask] * accumulate)
    labels = jnp.asarray(labels)
    mask = jnp.asarray(mask)
    rng = jax.random.key(2)
    imgs_per_step = bs * accumulate

    state, loss, _ = step(state, imgs, labels, mask, rng)  # compile+warm
    print(f"warmup loss {float(loss):.4f}")

    t0 = time.perf_counter()
    for _ in range(n_steps):
        state, loss, _ = step(state, imgs, labels, mask, rng)
    final = float(loss)  # fences the whole chain
    dt = (time.perf_counter() - t0) / n_steps
    print(
        f"train step {model_version} bs={bs} remat={remat} "
        f"accum={accumulate}: {dt * 1000:.1f} ms/step = "
        f"{imgs_per_step / dt:.0f} img/s (final loss {final:.4f})"
    )

    if scan_k > 1:
        # scan_k steps fused into ONE dispatch (same batch each step):
        # the delta vs the loop above is pure per-dispatch overhead
        inner = make_train_step(
            model, tx,
            dict(no_obj_weight=0.5, iou_weight=5.0, classify_weight=1.0,
                 label_smoothing=0.01),
        )

        @jax.jit
        def multi(state, imgs, labels, mask, rng):
            def body(st, _):
                st, loss, _ = inner(st, imgs, labels, mask, rng)
                return st, loss
            state, losses = jax.lax.scan(body, state, None, length=scan_k)
            return state, losses[-1]

        state, loss = multi(state, imgs, labels, mask, rng)  # compile
        print(f"scan warmup loss {float(loss):.4f}")
        t0 = time.perf_counter()
        reps = max(1, n_steps // scan_k)
        for _ in range(reps):
            state, loss = multi(state, imgs, labels, mask, rng)
        final = float(loss)
        dt = (time.perf_counter() - t0) / (reps * scan_k)
        print(
            f"scan({scan_k}) train step bs={bs}: {dt * 1000:.1f} ms/step = "
            f"{bs / dt:.0f} img/s (final loss {final:.4f})"
        )


if __name__ == "__main__":
    main()
