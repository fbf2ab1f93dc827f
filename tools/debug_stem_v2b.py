"""Bisect WHICH kernel feature produces wrong values on real TPU hardware.

Variants (all small shape, B=1, divisible tiles):
  copy  - kernel just casts plane 0 to bf16 and writes it to out channel 0
  static- per-channel loop unrolled with static stores (no fori_loop)
  fori  - the production kernel (fori_loop + dynamic acc_ref[c] store)
"""


import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

B, H, W = 1, 128, 256
OH, OW = H // 2, W // 2
TH = 32
C = 4


def make_planes(images):
    padded = jnp.pad(images, ((0, 0), (1, 1), (1, 1)))
    return jnp.stack(
        [padded[:, dy:dy + 2 * OH:2, dx:dx + 2 * OW:2]
         for dy in range(3) for dx in range(3)], axis=1)


def ref_out(images, wc, b):
    planes = np.asarray(make_planes(images), np.float32)  # (B,9,OH,OW)
    out = np.einsum("bphw,cp->bchw", planes, np.asarray(wc)) + \
        np.asarray(b)[None, :, None, None]
    return np.where(out >= 0, out, 0.01 * out)


def kern_copy(planes_ref, w_ref, b_ref, out_ref, pf32, acc):
    pf32[...] = planes_ref[0].astype(jnp.int32).astype(jnp.float32)
    out_ref[0, 0] = pf32[0].astype(jnp.bfloat16)
    for c in range(1, C):
        out_ref[0, c] = jnp.zeros_like(pf32[0]).astype(jnp.bfloat16)


def kern_static(planes_ref, w_ref, b_ref, out_ref, pf32, acc):
    pf32[...] = planes_ref[0].astype(jnp.int32).astype(jnp.float32)
    for c in range(C):
        a = b_ref[c] * jnp.ones((TH, OW), jnp.float32)
        for t in range(9):
            a = a + w_ref[c, t] * pf32[t]
        out_ref[0, c] = jnp.where(a >= 0, a, 0.01 * a).astype(jnp.bfloat16)


def kern_fori(planes_ref, w_ref, b_ref, out_ref, pf32, acc):
    pf32[...] = planes_ref[0].astype(jnp.int32).astype(jnp.float32)

    def one(c, _):
        a = b_ref[c] * jnp.ones((TH, OW), jnp.float32)
        for t in range(9):
            a = a + w_ref[c, t] * pf32[t]
        acc[c] = jnp.where(a >= 0, a, 0.01 * a)
        return 0

    jax.lax.fori_loop(0, C, one, 0)
    out_ref[0] = acc[...].astype(jnp.bfloat16)


def run(kernel, images, wc, b):
    call = pl.pallas_call(
        kernel,
        grid=(B, OH // TH),
        in_specs=[
            pl.BlockSpec((1, 9, TH, OW), lambda i, r: (i, 0, r, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((1, C, TH, OW), lambda i, r: (i, 0, r, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, C, OH, OW), jnp.bfloat16),
        scratch_shapes=[
            pltpu.VMEM((9, TH, OW), jnp.float32),
            pltpu.VMEM((C, TH, OW), jnp.float32),
        ],
    )
    planes = make_planes(images)
    return jax.jit(lambda p, w_, b_: call(p, w_, b_))(planes, wc, b)


def main():
    rng = np.random.default_rng(0)
    images = jnp.asarray(rng.integers(0, 255, (B, H, W), np.uint8))
    wc = jnp.asarray(rng.normal(0, 0.3, (C, 9)), jnp.float32)
    b = jnp.asarray(rng.normal(0, 0.5, C), jnp.float32)
    ref = ref_out(images, wc, b)

    for name, k in [("copy", kern_copy), ("static", kern_static),
                    ("fori", kern_fori)]:
        try:
            out = np.asarray(run(k, images, wc, b), np.float32)
            if name == "copy":
                planes = np.asarray(make_planes(images), np.float32)
                err = np.abs(out[0, 0] - planes[0, 0]).max()
                print(f"{name}: maxabs(ch0 vs plane0) = {err}")
            else:
                rel = np.abs(out - ref) / (np.abs(ref) + 1e-2)
                print(f"{name}: maxrel = {rel.max():.5f}")
        except Exception as e:
            print(f"{name}: FAIL {type(e).__name__}: {str(e)[:160]}")


if __name__ == "__main__":
    main()
