"""Bisect: how many pallas calls / what input provenance faults in one jit."""
import jax, jax.numpy as jnp, numpy as np
from yogo_tpu.ops.pallas_stem import fused_stem_nchw, fold_stem_params

rng = np.random.default_rng(0)
kern = rng.normal(0, 0.3, (3, 3, 1, 16)).astype(np.float32)
w, b = fold_stem_params(kern, None)
w, b = jnp.asarray(w), jnp.asarray(b)

stack = jax.jit(lambda k: jax.random.randint(k, (2, 64, 772, 1032), 0, 255, jnp.uint8))(jax.random.key(0))
single = jax.jit(lambda k: jax.random.randint(k, (64, 772, 1032), 0, 255, jnp.uint8))(jax.random.key(1))
jax.block_until_ready((stack, single))

def t(name, fn, *args):
    try:
        v = float(jax.jit(fn)(*args))
        print(f"{name}: OK {v:.3e}")
    except Exception as e:
        print(f"{name}: FAIL {type(e).__name__} {str(e)[:100]}")

t("one call, direct input", lambda x: fused_stem_nchw(x, w, b).astype(jnp.float32).sum(), single)
t("one call, sliced input", lambda s: fused_stem_nchw(s[0], w, b).astype(jnp.float32).sum(), stack)
t("two calls, same input", lambda x: (fused_stem_nchw(x, w, b).astype(jnp.float32).sum()
                                      + fused_stem_nchw(x * 2, w, b).astype(jnp.float32).sum()), single)
t("two calls, sliced inputs", lambda s: (fused_stem_nchw(s[0], w, b).astype(jnp.float32).sum()
                                         + fused_stem_nchw(s[1], w, b).astype(jnp.float32).sum()), stack)
