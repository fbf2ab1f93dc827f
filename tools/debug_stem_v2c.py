"""Second bisection: vary C, B, compiler_params, unroll kwarg."""
from functools import partial
import jax, jax.numpy as jnp, numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

H, W = 128, 256
OH, OW = H // 2, W // 2
TH = 32

def make_planes(images):
    padded = jnp.pad(images, ((0, 0), (1, 1), (1, 1)))
    return jnp.stack([padded[:, dy:dy + 2 * OH:2, dx:dx + 2 * OW:2]
                      for dy in range(3) for dx in range(3)], axis=1)

def ref_out(images, wc, b):
    planes = np.asarray(make_planes(images), np.float32)
    out = np.einsum("bphw,cp->bchw", planes, np.asarray(wc)) + \
        np.asarray(b)[None, :, None, None]
    return np.where(out >= 0, out, 0.01 * out)

def kern(planes_ref, w_ref, b_ref, out_ref, pf32, acc, *, C, unroll_kw):
    pf32[...] = planes_ref[0].astype(jnp.int32).astype(jnp.float32)
    def one(c, _):
        a = b_ref[c] * jnp.ones((TH, OW), jnp.float32)
        for t in range(9):
            a = a + w_ref[c, t] * pf32[t]
        acc[c] = jnp.where(a >= 0, a, 0.01 * a)
        return 0
    if unroll_kw:
        jax.lax.fori_loop(0, C, one, 0, unroll=False)
    else:
        jax.lax.fori_loop(0, C, one, 0)
    out_ref[0] = acc[...].astype(jnp.bfloat16)

def run(images, wc, b, C, params, unroll_kw):
    B = images.shape[0]
    call = pl.pallas_call(
        partial(kern, C=C, unroll_kw=unroll_kw),
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
        scratch_shapes=[pltpu.VMEM((9, TH, OW), jnp.float32),
                        pltpu.VMEM((C, TH, OW), jnp.float32)],
        compiler_params=(pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary")) if params else None),
    )
    planes = make_planes(images)
    return jax.jit(lambda p, w_, b_: call(p, w_, b_))(planes, wc, b)

def main():
    rng = np.random.default_rng(0)
    for C, B, params, unroll_kw in [(16, 1, False, False), (4, 2, False, False),
                                     (16, 2, False, False), (16, 2, True, True)]:
        images = jnp.asarray(rng.integers(0, 255, (B, H, W), np.uint8))
        wc = jnp.asarray(rng.normal(0, 0.3, (C, 9)), jnp.float32)
        b = jnp.asarray(rng.normal(0, 0.5, C), jnp.float32)
        try:
            out = np.asarray(run(images, wc, b, C, params, unroll_kw), np.float32)
            rel = np.abs(out - ref_out(images, wc, b)) / (np.abs(ref_out(images, wc, b)) + 1e-2)
            print(f"C={C} B={B} params={params} unroll_kw={unroll_kw}: maxrel={rel.max():.5f}")
        except Exception as e:
            print(f"C={C} B={B} params={params}: FAIL {type(e).__name__} {str(e)[:120]}")

if __name__ == "__main__":
    main()
