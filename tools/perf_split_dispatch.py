"""Async-dispatch bench methodology + split-jit pallas composition test.

1. methodology: K back-to-back async dispatches of jit(full model), ONE
   scalar fetch at the end -> should match the lax.scan number (~26ms/batch
   @128) rather than the ~54ms synchronous round-trip number.
2. pallas split: jit(pallas stem) and jit(blocks 1.. + decode) as SEPARATE
   executables chained per batch (the axon backend crashes when a Mosaic
   kernel shares an executable with a large XLA graph).
"""

import os
import time

import jax
import jax.numpy as jnp

os.environ.setdefault("YOGO_PALLAS_STEM", "0")

from yogo_tpu.models.yogo import YOGO, decode_predictions  # noqa: E402
from yogo_tpu.ops.grid import cell_offsets  # noqa: E402
from yogo_tpu.utils.default_hyperparams import DefaultHyperparams as df  # noqa: E402

BS = 128
K = 4


def main():
    model = YOGO.create(
        (772, 1032), df.ANCHOR_W, df.ANCHOR_H, num_classes=7,
        compute_dtype=jnp.bfloat16,
    )
    variables = model.init(jax.random.key(0))
    stack = jax.jit(
        lambda k: jax.random.randint(k, (K, BS, 1, 772, 1032), 0, 255, jnp.uint8)
    )(jax.random.key(1))
    jax.block_until_ready(stack)
    batches = [stack[i] for i in range(K)]
    jax.block_until_ready(batches)

    # ---- 1. async-dispatch methodology with the plain XLA model
    @jax.jit
    def fwd_sum(imgs):
        return model.apply(variables, imgs, inference=True)[:, 4].sum()

    float(fwd_sum(batches[0]))  # warm
    for rep in range(3):
        t0 = time.perf_counter()
        acc = [fwd_sum(b) for b in batches]
        _ = float(sum(acc))  # scalar fetch = honest fence
        dt = (time.perf_counter() - t0) / K
        print(f"xla async-dispatch: {dt * 1000:.2f} ms/batch = {BS / dt:.0f} img/s")

    # ---- 2. split-jit pallas composition
    module = model.module()

    @jax.jit
    def stem_only(imgs):
        x = jnp.transpose(imgs, (0, 2, 3, 1))  # NCHW->NHWC uint8
        return model._apply_pallas_stem(variables, x, interpret=False)

    @jax.jit
    def rest(h):
        raw = module.apply(
            variables, h.astype(model.compute_dtype), train=False,
            start_block=1,
        )
        Sx, Sy = model.grid
        cxs, cys = cell_offsets(Sx, Sy)
        out = decode_predictions(
            raw, jnp.asarray(cxs), jnp.asarray(cys), model.anchor_w,
            model.anchor_h, inference=True,
        )
        return out[..., 4].sum()

    try:
        h0 = stem_only(batches[0])
        float(rest(h0))  # warm both
        for rep in range(3):
            t0 = time.perf_counter()
            acc = [rest(stem_only(b)) for b in batches]
            _ = float(sum(acc))  # scalar fetch = honest fence
            dt = (time.perf_counter() - t0) / K
            print(
                f"pallas split-jit:  {dt * 1000:.2f} ms/batch = {BS / dt:.0f} img/s"
            )
    except Exception as e:
        print(f"pallas split-jit: FAIL {type(e).__name__} {str(e)[:140]}")


if __name__ == "__main__":
    main()
