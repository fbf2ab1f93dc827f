"""Measure the split-dispatch pallas pipeline pieces at bs=512.

a) stem-alone: K chained dispatches of jit(fused_stem_nchw) (stable per the
   stability matrix), fenced by a scalar fetch off the last output.
b) rest-alone: jit(scan over blocks 1.. + decode) on stem-shaped NCHW bf16
   inputs (pure XLA - scan is fine).
Sum of the two (+ ~6 ms/dispatch overhead) vs the 100.5 ms/batch-512 full
XLA model tells whether the split pipeline wins.
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

from yogo_tpu.models.yogo import YOGO, decode_predictions
from yogo_tpu.ops.grid import cell_offsets
from yogo_tpu.ops.pallas_stem import fold_stem_params, fused_stem_nchw
from yogo_tpu.utils.default_hyperparams import DefaultHyperparams as df

BS = 512
K = 8


def main():
    model = YOGO.create(
        (772, 1032), df.ANCHOR_W, df.ANCHOR_H, num_classes=7,
        compute_dtype=jnp.bfloat16,
    )
    variables = model.init(jax.random.key(0))
    module = model.module()

    kern = np.asarray(variables["params"]["conv0"]["kernel"], np.float32)
    stats = variables["batch_stats"]
    w, b = fold_stem_params(
        kern, None,
        np.asarray(variables["params"]["bn0"]["scale"], np.float32),
        np.asarray(variables["params"]["bn0"]["bias"], np.float32),
        np.asarray(stats["bn0"]["mean"], np.float32),
        np.asarray(stats["bn0"]["var"], np.float32),
    )
    w, b = jnp.asarray(w), jnp.asarray(b)

    # stem measured at bs=128 (K queued dispatches at 512 hold ~4 GB each
    # of output+planes and exhaust HBM); scale per-image
    SB = 128
    x = jax.jit(
        lambda k: jax.random.randint(k, (SB, 772, 1032), 0, 255, jnp.uint8)
    )(jax.random.key(1))
    jax.block_until_ready(x)

    # ---------------- a) stem alone, K chained dispatches
    stem = jax.jit(lambda xx: fused_stem_nchw(xx, w, b))
    checksum = jax.jit(lambda o: o.astype(jnp.float32).sum())
    out = stem(x)
    jax.block_until_ready(out)
    float(checksum(out))
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        outs = [stem(x) for _ in range(K)]
        float(checksum(outs[-1]))  # device stream is in-order: fences all K
        del outs
        best = min(best, (time.perf_counter() - t0) / K)
    print(f"stem pallas bs={SB}: {best * 1000:.2f} ms/batch "
          f"(= {best * 1000 * BS / SB:.1f} ms at bs={BS})")

    # ---------------- b) rest of the model from block 1, scanned (pure XLA)
    Sx, Sy = model.grid
    cxs, cys = cell_offsets(Sx, Sy)

    def rest(h):
        raw = module.apply(
            variables, h.astype(jnp.bfloat16), train=False, start_block=1
        )
        out = decode_predictions(
            raw, jnp.asarray(cxs), jnp.asarray(cys), model.anchor_w,
            model.anchor_h, inference=True,
        )
        return out[..., 4].sum()

    @jax.jit
    def run_rest(stack):
        def body(c, hh):
            return c + rest(hh), None

        tot, _ = jax.lax.scan(body, jnp.float32(0), stack)
        return tot

    # rest() consumes NHWC (module expects NHWC); feed transposed stem-shaped
    # data. ALSO measure with the NCHW->NHWC transpose inside, which is what
    # the split pipeline would actually pay.
    hstack = jax.jit(
        lambda k: jax.random.normal(
            k, (2, BS, 386, 516, 16), jnp.bfloat16
        )
    )(jax.random.key(2))
    jax.block_until_ready(hstack)
    float(run_rest(hstack))
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        float(run_rest(hstack))
        best = min(best, (time.perf_counter() - t0) / 2)
    print(f"rest (NHWC in) bs={BS}: {best * 1000:.2f} ms/batch")

    @jax.jit
    def run_rest_nchw(stack):
        def body(c, hh):
            h = jnp.transpose(hh, (0, 2, 3, 1))
            return c + rest(h), None

        tot, _ = jax.lax.scan(body, jnp.float32(0), stack)
        return tot

    cstack = jax.jit(
        lambda k: jax.random.normal(
            k, (2, BS, 16, 386, 516), jnp.bfloat16
        )
    )(jax.random.key(3))
    jax.block_until_ready(cstack)
    float(run_rest_nchw(cstack))
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        float(run_rest_nchw(cstack))
        best = min(best, (time.perf_counter() - t0) / 2)
    print(f"rest (NCHW in + transpose) bs={BS}: {best * 1000:.2f} ms/batch")


if __name__ == "__main__":
    main()
