"""Fault bisection: batch size and scan-wrapping at real image shape."""

import jax, jax.numpy as jnp, numpy as np
from yogo_tpu.ops.pallas_stem import fused_stem_nchw, fold_stem_params

rng = np.random.default_rng(0)
kern = rng.normal(0, 0.3, (3, 3, 1, 16)).astype(np.float32)
w, b = fold_stem_params(kern, None)
w, b = jnp.asarray(w), jnp.asarray(b)

def gen(B, K=None):
    shape = (B, 772, 1032) if K is None else (K, B, 772, 1032)
    x = jax.jit(lambda k: jax.random.randint(k, shape, 0, 255, jnp.uint8))(jax.random.key(0))
    jax.block_until_ready(x)
    return x

def case_standalone(B):
    x = gen(B)
    out = fused_stem_nchw(x, w, b)
    jax.block_until_ready(out)
    s = float(jnp.sum(out.astype(jnp.float32)))
    print(f"standalone B={B}: OK sum={s:.3e}")

def case_scan(B, K=2):
    x = gen(B, K)
    @jax.jit
    def run(stack):
        def body(c, xx):
            return c + fused_stem_nchw(xx, w, b).astype(jnp.float32).sum(), None
        tot, _ = jax.lax.scan(body, jnp.float32(0), stack)
        return tot
    t = run(x)
    print(f"scan B={B} K={K}: OK sum={float(t):.3e}")

if __name__ == "__main__":
    for fn, arg in [(case_standalone, 32), (case_standalone, 128),
                    (case_scan, 32), (case_scan, 128)]:
        try:
            fn(arg)
        except Exception as e:
            print(f"{fn.__name__}({arg}): FAIL {type(e).__name__} {str(e)[:120]}")
