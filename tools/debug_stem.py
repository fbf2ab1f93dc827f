"""Final consolidated debug harness for the Pallas fused stem kernel.

Collapses the round-2 iteration trail (debug_stem_v2{,b,c,d,e,f}.py,
debug_planes.py) into the probes still worth re-running when the axon
backend changes. The intermediate bisections' conclusions are recorded in
CLAUDE.md ("Mosaic lowering constraints") and tools/README.md; their code
is gone — re-derive from the constraints list if ever needed again.

Subcommands (each case is robust to single-case failure):
  correctness  fused_stem_nchw vs folded XLA conv at divisible /
               non-divisible / real (772x1032) shapes  [CPU interpret or TPU]
  batch        batch-size and lax.scan-wrap bisect at the real image shape
               (the scan cases crash the axon worker when composed)  [TPU]
  provenance   input provenance + multiple pallas calls in one jit  [TPU]

Usage: PYTHONPATH=/root/repo:/root/.axon_site python tools/debug_stem.py [sub]
Set STEM_INTERPRET=1 to run the `correctness` case on CPU (Pallas interpret
mode — a non-interpret pallas_call on CPU silently computes garbage).
"""

import os
import sys

import jax
import jax.numpy as jnp
import numpy as np

from yogo_tpu.ops.pallas_stem import fold_stem_params, fused_stem_nchw


def _params(rng):
    kern = rng.normal(0, 0.3, (3, 3, 1, 16)).astype(np.float32)
    w, b = fold_stem_params(kern, None)
    return jnp.asarray(w), jnp.asarray(b)


def _ref_stem(imgs, w, b):
    """XLA conv with the already-folded weights: the numeric oracle."""
    x = jnp.asarray(imgs, jnp.float32)[..., None]
    wf = np.zeros((3, 3, 1, np.asarray(w).shape[-1]), np.float32)
    wf[:, :, 0, :] = np.asarray(w)
    y = jax.lax.conv_general_dilated(
        x, jnp.asarray(wf), (2, 2), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    y = y + jnp.asarray(b)
    y = jnp.where(y >= 0, y, 0.01 * y)
    return jnp.transpose(y, (0, 3, 1, 2))


def correctness():
    rng = np.random.default_rng(0)
    w, b = _params(rng)
    for name, H, W, tile_h in [
        ("divisible (H=128, out 64, tile 32)", 128, 256, 32),
        ("non-divisible (H=132, out 66, tile 32)", 132, 256, 32),
        ("real shape (H=772, out 386, tile 32)", 772, 1032, 32),
    ]:
        imgs = rng.integers(0, 255, (2, H, W), np.uint8)
        try:
            out = np.asarray(
                fused_stem_nchw(
                    jnp.asarray(imgs), w, b, tile_h=tile_h,
                    interpret=bool(os.environ.get("STEM_INTERPRET")),
                ),
                np.float32,
            )
            ref = np.asarray(_ref_stem(imgs, w, b), np.float32)
            err = np.abs(out - ref) / (np.abs(ref) + 1e-2)
            print(f"{name}: OK maxrel={err.max():.4f}")
        except Exception as e:
            print(f"{name}: FAIL {type(e).__name__}: {str(e)[:200]}")


def _gen(B, K=None):
    shape = (B, 772, 1032) if K is None else (K, B, 772, 1032)
    x = jax.jit(
        lambda k: jax.random.randint(k, shape, 0, 255, jnp.uint8)
    )(jax.random.key(0))
    jax.block_until_ready(x)
    return x


def batch():
    rng = np.random.default_rng(0)
    w, b = _params(rng)

    def standalone(B):
        out = fused_stem_nchw(_gen(B), w, b)
        jax.block_until_ready(out)
        print(f"standalone B={B}: OK sum={float(jnp.sum(out.astype(jnp.float32))):.3e}")

    def scan(B, K=2):
        stack = _gen(B, K)

        @jax.jit
        def run(s):
            def body(c, xx):
                return c + fused_stem_nchw(xx, w, b).astype(jnp.float32).sum(), None
            tot, _ = jax.lax.scan(body, jnp.float32(0), s)
            return tot

        print(f"scan B={B} K={K}: OK sum={float(run(stack)):.3e}")

    for fn, arg in [(standalone, 32), (standalone, 128), (scan, 32), (scan, 128)]:
        try:
            fn(arg)
        except Exception as e:
            print(f"{fn.__name__}({arg}): FAIL {type(e).__name__} {str(e)[:120]}")


def provenance():
    rng = np.random.default_rng(0)
    w, b = _params(rng)
    stack = _gen(64, 2)
    single = _gen(64)

    def t(name, fn, *args):
        try:
            v = float(jax.jit(fn)(*args))
            print(f"{name}: OK {v:.3e}")
        except Exception as e:
            print(f"{name}: FAIL {type(e).__name__} {str(e)[:100]}")

    def s(o):
        return o.astype(jnp.float32).sum()
    t("one call, direct input", lambda x: s(fused_stem_nchw(x, w, b)), single)
    t("one call, sliced input", lambda st: s(fused_stem_nchw(st[0], w, b)), stack)
    t("two calls, same input",
      lambda x: s(fused_stem_nchw(x, w, b)) + s(fused_stem_nchw(x * 2, w, b)),
      single)
    t("two calls, sliced inputs",
      lambda st: s(fused_stem_nchw(st[0], w, b)) + s(fused_stem_nchw(st[1], w, b)),
      stack)


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "correctness"
    {"correctness": correctness, "batch": batch, "provenance": provenance}[which]()
