"""Headline benchmark: 772x1032 grayscale inference throughput per chip.

Measures the end-to-end inference hot path of the flagship base_model -
uint8 host batches -> device -> bf16 forward -> decoded predictions - on the
real TPU, and prints one JSON line:
  {"metric": ..., "value": N, "unit": "img/s/chip", "vs_baseline": N/5000}

Baseline: the driver's north star of 5,000 img/s/chip on v5e-1
(/root/repo/BASELINE.json); the torch reference publishes no numbers.
"""

import json
import time

import jax
import jax.numpy as jnp
import numpy as np

BASELINE_IMG_PER_S = 5000.0
IMG_HW = (772, 1032)
WARMUP_ITERS = 3
MEASURE_ITERS = 15


def bench_batch_size(model, variables, batch_size: int) -> float:
    @jax.jit
    def forward(imgs):
        return model.apply(variables, imgs, inference=True)

    rng = np.random.default_rng(0)
    host_batch = rng.integers(
        0, 255, (batch_size, 1, *IMG_HW), dtype=np.uint8
    )

    # warmup (compile + caches)
    out = forward(jnp.asarray(host_batch))
    out.block_until_ready()
    for _ in range(WARMUP_ITERS):
        out = forward(jnp.asarray(host_batch))
    out.block_until_ready()

    start = time.perf_counter()
    for _ in range(MEASURE_ITERS):
        out = forward(jnp.asarray(host_batch))
    out.block_until_ready()
    elapsed = time.perf_counter() - start
    return MEASURE_ITERS * batch_size / elapsed


def main() -> None:
    from yogo_tpu.models.yogo import YOGO
    from yogo_tpu.utils.default_hyperparams import DefaultHyperparams as df

    model = YOGO.create(
        IMG_HW,
        df.ANCHOR_W,
        df.ANCHOR_H,
        num_classes=7,
        compute_dtype=jnp.bfloat16,
    )
    variables = model.init(jax.random.key(0))

    best = 0.0
    for bs in (32, 64, 128):
        try:
            rate = bench_batch_size(model, variables, bs)
        except Exception:
            continue
        best = max(best, rate)

    print(
        json.dumps(
            {
                "metric": "infer_throughput_772x1032_base_model_bf16",
                "value": round(best, 1),
                "unit": "img/s/chip",
                "vs_baseline": round(best / BASELINE_IMG_PER_S, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
