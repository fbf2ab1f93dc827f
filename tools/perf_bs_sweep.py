"""Batch-size + XLA-flag sweep for the XLA-only full model (scan method).

Usage: python tools/perf_bs_sweep.py [bs ...]
"""

import os
import sys
import time

import jax
import jax.numpy as jnp

from yogo_tpu.models.yogo import YOGO
from yogo_tpu.utils.default_hyperparams import DefaultHyperparams as df

K = int(os.environ.get("SWEEP_K", "4"))


def measure(model, variables, bs):
    def fwd(imgs):
        return model.apply(variables, imgs, inference=True)

    @jax.jit
    def run_all(stack):
        def body(c, batch):
            return c + fwd(batch)[:, 4].sum(), None

        tot, _ = jax.lax.scan(body, jnp.float32(0), stack)
        return tot

    stack = jax.jit(
        lambda k: jax.random.randint(
            k, (K, bs, 1, 772, 1032), 0, 255, jnp.uint8
        )
    )(jax.random.key(0))
    jax.block_until_ready(stack)
    float(run_all(stack))
    best = 0.0
    for _ in range(3):
        t0 = time.perf_counter()
        float(run_all(stack))
        dt = time.perf_counter() - t0
        best = max(best, K * bs / dt)
    return best


def main():
    sizes = [int(a) for a in sys.argv[1:]] or [256, 384, 512]
    model = YOGO.create(
        (772, 1032), df.ANCHOR_W, df.ANCHOR_H, num_classes=7,
        compute_dtype=jnp.bfloat16,
    )
    variables = model.init(jax.random.key(0))
    for bs in sizes:
        try:
            r = measure(model, variables, bs)
            print(f"bs={bs} K={K}: {r:.0f} img/s")
        except Exception as e:
            print(f"bs={bs}: FAIL {type(e).__name__} {str(e)[:120]}")


if __name__ == "__main__":
    main()
