"""Full-model inference throughput with/without the fused Pallas stem.

One jitted forward per dispatch (the axon backend crashes on multiple
pallas_call instances per executable / pallas under lax.scan), timed over
python-level dispatches with a scalar fetch per step.

Usage: python tools/perf_model_stem.py [bs] [reps]
"""

import os
import sys
import time

import jax
import jax.numpy as jnp

from yogo_tpu.models.yogo import YOGO
from yogo_tpu.utils.default_hyperparams import DefaultHyperparams as df


def measure(model, variables, x, reps=6):
    @jax.jit
    def fwd(imgs):
        out = model.apply(variables, imgs, inference=True)
        return out[:, 4].sum()  # checksum consumer

    float(fwd(x))  # compile + warmup
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        float(fwd(x))
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    bs = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 6

    model = YOGO.create(
        (772, 1032), df.ANCHOR_W, df.ANCHOR_H, num_classes=7,
        compute_dtype=jnp.bfloat16,
    )
    variables = model.init(jax.random.key(0))
    x = jax.jit(
        lambda k: jax.random.randint(k, (bs, 1, 772, 1032), 0, 255, jnp.uint8)
    )(jax.random.key(1))
    jax.block_until_ready(x)

    for setting in ("0", "1"):
        os.environ["YOGO_PALLAS_STEM"] = setting
        try:
            dt = measure(model, variables, x, reps)
            print(
                f"pallas_stem={setting}: {dt * 1000:.2f} ms/batch "
                f"= {bs / dt:.0f} img/s (bs={bs})"
            )
        except Exception as e:
            print(f"pallas_stem={setting}: FAIL {type(e).__name__} {str(e)[:140]}")


if __name__ == "__main__":
    main()
