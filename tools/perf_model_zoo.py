"""Inference throughput for every registered architecture on the v5e chip.

Same methodology as bench.py (device-resident uint8 batches scanned inside
one jit, checksum consumer, scalar fetch fence), smaller K/bs so 12 models
compile+run in one sitting. Prints a markdown table row per model.

Usage: PYTHONPATH=/root/repo:/root/.axon_site \
  JAX_COMPILATION_CACHE_DIR=.jax_cache_tpu python tools/perf_model_zoo.py [bs] [K]
"""

import sys
import time

import jax
import jax.numpy as jnp

from yogo_tpu.models.defns import MODELS
from yogo_tpu.models.yogo import YOGO
from yogo_tpu.utils.default_hyperparams import DefaultHyperparams as df

BS = int(sys.argv[1]) if len(sys.argv) > 1 else 128
K = int(sys.argv[2]) if len(sys.argv) > 2 else 8
IMG_HW = (772, 1032)


def measure(name: str) -> float:
    model = YOGO.create(
        IMG_HW, df.ANCHOR_W, df.ANCHOR_H, num_classes=7,
        model_version=name, compute_dtype=jnp.bfloat16,
    )
    variables = model.init(jax.random.key(0))

    @jax.jit
    def run_all(stack):
        def body(c, batch):
            return c + model.apply(variables, batch, inference=True)[:, 4].sum(), None

        return jax.lax.scan(body, jnp.float32(0), stack)[0]

    stack = jax.jit(
        lambda k: jax.random.randint(k, (K, BS, 1, *IMG_HW), 0, 255, jnp.uint8)
    )(jax.random.key(1))
    jax.block_until_ready(stack)
    float(run_all(stack))  # compile + warm
    best = 0.0
    for _ in range(3):
        t0 = time.perf_counter()
        float(run_all(stack))
        best = max(best, K * BS / (time.perf_counter() - t0))
    return best


def main() -> None:
    print(f"| model | img/s (bs={BS}, K={K}) |")
    print("|---|---|")
    for name in MODELS:
        try:
            r = measure(name)
            print(f"| {name} | {r:,.0f} |", flush=True)
        except Exception as e:  # OOM on the big variants at this bs
            print(f"| {name} | FAIL {type(e).__name__}: {str(e)[:80]} |",
                  flush=True)


if __name__ == "__main__":
    main()
