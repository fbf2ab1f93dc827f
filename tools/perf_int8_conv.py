"""Is int8 convolution worth it on v5e through XLA?

The v5e MXU does 394 int8 TOPS vs 197 bf16 TFLOPs - IF XLA lowers an
s8 x s8 -> s32 conv onto it. This measures the MXU-heavy conv-stack blocks
(b3..b6 shapes of base_model at 772x1032) in three formulations:

  bf16      : conv bf16 + BN-scale + leaky            (production today)
  int8_raw  : conv s8xs8->s32 only                    (upper bound)
  int8_chain: conv s8 -> dequant f32 -> leaky -> requant s8  (steady state)

Methodology per docs/perf-notes.md: scan K batches in one jitted program,
checksum consumer, scalar fetch fence.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python tools/perf_int8_conv.py
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

BS = 128
K = 8
DN = ("NHWC", "HWIO", "NHWC")

# (name, H, W, Cin, Cout, stride)  -- base_model blocks 3..6 + head
BLOCKS = [
    ("b3 64->128 s1 193x258", 193, 258, 64, 128, 1),
    ("b4 128->128 s2 193x258", 193, 258, 128, 128, 2),
    ("b5 128->128 s1 97x129", 97, 129, 128, 128, 1),
    ("b1 16->32 s1 386x516", 386, 516, 16, 32, 1),
]


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
    def run(stack, *params):
        def body(c, x):
            return c + fn(x, *params).astype(jnp.float32).sum(), None

        tot, _ = jax.lax.scan(body, jnp.float32(0), stack)
        return tot

    return run


def main():
    rng = np.random.default_rng(0)
    dev = jax.default_backend()
    print(f"backend={dev} bs={BS} scanK={K}")

    for name, H, W, Ci, Co, s in BLOCKS:
        pad = [(1, 1), (1, 1)]

        def make(dtype, H=H, W=W, Ci=Ci):
            if dtype == jnp.int8:
                x = jax.jit(
                    lambda k: jax.random.randint(
                        k, (K, BS, H, W, Ci), -127, 128, jnp.int8
                    )
                )(jax.random.key(1))
            else:
                x = jax.jit(
                    lambda k: jax.random.normal(
                        k, (K, BS, H, W, Ci), jnp.bfloat16
                    )
                )(jax.random.key(1))
            jax.block_until_ready(x)
            return x

        w8 = jnp.asarray(
            rng.integers(-127, 128, (3, 3, Ci, Co)), jnp.int8
        )
        wb = (w8.astype(jnp.bfloat16)) * jnp.bfloat16(0.01)
        scale = jnp.asarray(rng.normal(1, 0.1, Co), jnp.float32)
        deq = jnp.asarray(rng.normal(0, 1e-4, Co) + 1e-3, jnp.float32)

        def f_bf16(x, w, sc):
            y = jax.lax.conv_general_dilated(
                x, w, (s, s), pad, dimension_numbers=DN,
                preferred_element_type=jnp.float32,
            )
            y = y * sc
            return jnp.where(y > 0, y, 0.01 * y).astype(jnp.bfloat16)

        def f_int8_raw(x, w):
            return jax.lax.conv_general_dilated(
                x, w, (s, s), pad, dimension_numbers=DN,
                preferred_element_type=jnp.int32,
            )

        def f_int8_chain(x, w, dq):
            y = jax.lax.conv_general_dilated(
                x, w, (s, s), pad, dimension_numbers=DN,
                preferred_element_type=jnp.int32,
            )
            y = y.astype(jnp.float32) * dq
            y = jnp.where(y > 0, y, 0.01 * y)
            return jnp.clip(jnp.round(y * 127.0), -127, 127).astype(jnp.int8)

        row = {}
        xb = make(jnp.bfloat16)
        row["bf16"] = timeit(scan_over(f_bf16), xb, wb, scale)
        del xb
        x8 = make(jnp.int8)
        for label, fn, args in (
            ("int8_raw", scan_over(f_int8_raw), (x8, w8)),
            ("int8_chain", scan_over(f_int8_chain), (x8, w8, deq)),
        ):
            try:
                row[label] = timeit(fn, *args)
            except Exception as e:  # noqa: BLE001 - report lowering failures
                row[label] = f"FAIL {type(e).__name__}: {str(e)[:120]}"
        del x8
        cells = "  ".join(
            f"{k}={v:.2f}ms" if isinstance(v, float) else f"{k}={v}"
            for k, v in row.items()
        )
        print(f"{name}:  {cells}", flush=True)


if __name__ == "__main__":
    main()
