"""Full-model int8 vs bf16 forward throughput on the v5e.

tools/perf_int8_conv.py measured the standalone blocks: int8 wins ~1.25x
on the 128->128 convs, LOSES on 64->128, neutral on 16->32. This composes
the real thing - base_model at 772x1032, uint8 input, decode included,
scan-K methodology per docs/perf-notes.md - across quantization configs:

  bf16      : the production YOGO.apply path
  int8_all  : quantized_forward, blocks 1..7 int8
  int8_mxu  : quantized_forward, skip the blocks the micro-bench said lose
              (b1 16->32, b3 64->128) - int8 only on b2, b4..b7

Usage: PYTHONPATH=/root/repo:/root/.axon_site \
       JAX_COMPILATION_CACHE_DIR=.jax_cache_tpu python tools/perf_quant_forward.py
Env: QF_BS (default 128), QF_MODEL (default base_model), QF_K (default 8).
"""

import os
import time

import jax
import jax.numpy as jnp
import numpy as np

from yogo_tpu.models.yogo import YOGO
from yogo_tpu.ops import quant

BS = int(os.environ.get("QF_BS", "128"))
K = int(os.environ.get("QF_K", "8"))
MODEL = os.environ.get("QF_MODEL", "base_model")
HW = (772, 1032)


def timeit(fn, *args, reps=3):
    jfn = jax.jit(fn)
    r = jfn(*args)
    jax.block_until_ready(r)
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        _ = float(jnp.sum(jfn(*args)))
        best = min(best, time.perf_counter() - t0)
    return best / K * 1000.0


def scan_over(fn):
    def run(stack):
        def body(c, x):
            return c + fn(x).astype(jnp.float32).sum(), None

        tot, _ = jax.lax.scan(body, jnp.float32(0), stack)
        return tot

    return run


def main():
    model = YOGO.create(HW, 0.0455, 0.0455, 7, model_version=MODEL).with_compute_dtype(
        jnp.bfloat16
    )
    v = model.init(jax.random.key(0))
    print(f"backend={jax.default_backend()} model={MODEL} bs={BS} scanK={K}")

    imgs = jax.jit(
        lambda k: jax.random.randint(k, (K, BS, 1, *HW), 0, 256, jnp.uint8)
    )(jax.random.key(1))
    jax.block_until_ready(imgs)

    # calibrate on one batch (content irrelevant for timing; scales only
    # change constants)
    calib = [np.asarray(imgs[0, :8])]

    configs = {
        c: (
            quant.default_skip_blocks(model.defn, model.input_channels)
            if c == "rule"
            else tuple(int(t) for t in c.removeprefix("skip").split("_") if t)
        )
        for c in os.environ.get("QF_CONFIGS", "skip,skip1_3").split(",")
    }  # e.g. QF_CONFIGS="rule,skip,skip1_2_3" (skip = all-int8, rule = default)

    ms = timeit(scan_over(lambda x: model.apply(v, x, inference=True)), imgs)
    print(f"bf16: {ms:.2f} ms/batch = {BS / ms * 1000:.0f} img/s", flush=True)

    hdtype = (
        jnp.bfloat16 if os.environ.get("QF_HDTYPE", "f32") == "bf16"
        else jnp.float32
    )
    for name, skip in configs.items():
        qp = quant.quantize_conv_stack(model, v, calib, skip_blocks=skip)
        ms = timeit(
            scan_over(
                lambda x, qp=qp: quant.quantized_forward(
                    model, qp, x, intermediate_dtype=hdtype
                )
            ),
            imgs,
        )
        print(
            f"{name}: {ms:.2f} ms/batch = {BS / ms * 1000:.0f} img/s",
            flush=True,
        )


if __name__ == "__main__":
    main()
