"""Third bisection: planes built inside vs outside the jit enclosing pallas."""
import jax, jax.numpy as jnp, numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
from yogo_tpu.ops.pallas_stem import fused_stem_nchw

H, W = 128, 256
OH, OW = H // 2, W // 2
TH, C = 32, 16

def make_planes(images):
    padded = jnp.pad(images, ((0, 0), (1, 1), (1, 1)))
    return jnp.stack([padded[:, dy:dy + 2 * OH:2, dx:dx + 2 * OW:2]
                      for dy in range(3) for dx in range(3)], axis=1)

def ref_out(images, wc, b):
    planes = np.asarray(make_planes(images), np.float32)
    out = np.einsum("bphw,cp->bchw", planes, np.asarray(wc)) + \
        np.asarray(b)[None, :, None, None]
    return np.where(out >= 0, out, 0.01 * out)

def kern(planes_ref, w_ref, b_ref, out_ref, pf32, acc):
    pf32[...] = planes_ref[0].astype(jnp.int32).astype(jnp.float32)
    def one(c, _):
        a = b_ref[c] * jnp.ones((TH, OW), jnp.float32)
        for t in range(9):
            a = a + w_ref[c, t] * pf32[t]
        acc[c] = jnp.where(a >= 0, a, 0.01 * a)
        return 0
    jax.lax.fori_loop(0, C, one, 0)
    out_ref[0] = acc[...].astype(jnp.bfloat16)

def call(planes, wc, b, B):
    return pl.pallas_call(
        kern, grid=(B, OH // TH),
        in_specs=[pl.BlockSpec((1, 9, TH, OW), lambda i, r: (i, 0, r, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_specs=pl.BlockSpec((1, C, TH, OW), lambda i, r: (i, 0, r, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, C, OH, OW), jnp.bfloat16),
        scratch_shapes=[pltpu.VMEM((9, TH, OW), jnp.float32),
                        pltpu.VMEM((C, TH, OW), jnp.float32)],
    )(planes, wc, b)

def main():
    rng = np.random.default_rng(0)
    B = 2
    images = jnp.asarray(rng.integers(0, 255, (B, H, W), np.uint8))
    wc = jnp.asarray(rng.normal(0, 0.3, (C, 9)), jnp.float32)
    b = jnp.asarray(rng.normal(0, 0.5, C), jnp.float32)
    ref = ref_out(images, wc, b)

    @jax.jit
    def fused(imgs, w_, b_):
        return call(make_planes(imgs), w_, b_, B)

    out = np.asarray(fused(images, wc, b), np.float32)
    rel = np.abs(out - ref) / (np.abs(ref) + 1e-2)
    print(f"planes INSIDE jit: maxrel={rel.max():.5f}")

    # production path at same shape
    kern33 = np.zeros((3, 3, C), np.float32)
    for t in range(9):
        kern33[t // 3, t % 3] = np.asarray(wc)[:, t]
    out2 = np.asarray(
        fused_stem_nchw(images, jnp.asarray(kern33), b, tile_h=TH), np.float32)
    rel2 = np.abs(out2 - ref) / (np.abs(ref) + 1e-2)
    print(f"fused_stem_nchw:   maxrel={rel2.max():.5f}")

if __name__ == "__main__":
    main()
