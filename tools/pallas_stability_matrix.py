"""Stability matrix for the Pallas stem on the axon backend.

Hypothesis from observed crashes: XLA ops BEFORE the pallas_call in an
executable are fine (plane construction always precedes it), but ops AFTER
it in the same executable crash the TPU worker. Each case runs in its own
subprocess so a crash cannot poison the next trial.

Usage:
  python tools/pallas_stability_matrix.py            # run all cases
  python tools/pallas_stability_matrix.py <case>     # run one case (child)
"""

import subprocess
import sys
import time

CASES = [
    "pallas_only",
    "pallas_then_sum_same_jit",
    "pallas_jit_then_sum_jit",
    "transpose_pallas_same_jit",
    "pallas_jit_then_conv_jit",
    "two_pallas_dispatches",
    "barrier_then_sum_same_jit",
    "transpose_barrier_pallas_same_jit",
    "barrier_then_model_rest_same_jit",
]

B, H, W = 32, 772, 1032


def child(case: str) -> None:
    import jax
    import jax.numpy as jnp
    import numpy as np

    from yogo_tpu.ops.pallas_stem import fold_stem_params, fused_stem_nchw

    rng = np.random.default_rng(0)
    kern = rng.normal(0, 0.3, (3, 3, 1, 16)).astype(np.float32)
    w, b = fold_stem_params(kern, None)
    w, b = jnp.asarray(w), jnp.asarray(b)
    x = jax.jit(
        lambda k: jax.random.randint(k, (B, H, W), 0, 255, jnp.uint8)
    )(jax.random.key(0))
    jax.block_until_ready(x)

    if case == "pallas_only":
        out = jax.jit(lambda xx: fused_stem_nchw(xx, w, b))(x)
        jax.block_until_ready(out)
        s = float(jnp.sum(out.astype(jnp.float32)))
    elif case == "pallas_then_sum_same_jit":
        s = float(
            jax.jit(
                lambda xx: fused_stem_nchw(xx, w, b).astype(jnp.float32).sum()
            )(x)
        )
    elif case == "pallas_jit_then_sum_jit":
        out = jax.jit(lambda xx: fused_stem_nchw(xx, w, b))(x)
        s = float(jax.jit(lambda o: o.astype(jnp.float32).sum())(out))
    elif case == "transpose_pallas_same_jit":
        xc = x[:, None]  # NCHW
        out = jax.jit(
            lambda xx: fused_stem_nchw(
                jnp.transpose(xx, (0, 2, 3, 1))[..., 0], w, b
            )
        )(xc)
        jax.block_until_ready(out)
        s = float(jnp.sum(out.astype(jnp.float32)))
    elif case == "pallas_jit_then_conv_jit":
        w1 = jnp.asarray(rng.normal(0, 0.1, (3, 3, 16, 32)), jnp.bfloat16)
        out = jax.jit(lambda xx: fused_stem_nchw(xx, w, b))(x)

        @jax.jit
        def conv(o):
            z = jax.lax.conv_general_dilated(
                o, w1, (1, 1), [(1, 1), (1, 1)],
                dimension_numbers=("NCHW", "HWIO", "NHWC"),
                preferred_element_type=jnp.float32)
            return z.sum()

        s = float(conv(out))
    elif case == "two_pallas_dispatches":
        f = jax.jit(lambda xx: fused_stem_nchw(xx, w, b))
        o1 = f(x)
        o2 = f(x)
        jax.block_until_ready((o1, o2))
        s = float(jnp.sum(o1.astype(jnp.float32)))
    elif case == "barrier_then_sum_same_jit":
        # theory: XLA assigns non-default layouts to the pallas custom-call
        # result when a consumer follows in the same executable; a barrier
        # may pin the default layout
        def f(xx):
            o = fused_stem_nchw(xx, w, b)
            (o,) = jax.lax.optimization_barrier((o,))
            return o.astype(jnp.float32).sum()

        s = float(jax.jit(f)(x))
    elif case == "transpose_barrier_pallas_same_jit":
        xc = x[:, None]

        def f(xx):
            t = jnp.transpose(xx, (0, 2, 3, 1))[..., 0]
            (t,) = jax.lax.optimization_barrier((t,))
            return fused_stem_nchw(t, w, b)

        out = jax.jit(f)(xc)
        jax.block_until_ready(out)
        s = float(jnp.sum(out.astype(jnp.float32)))
    elif case == "barrier_then_model_rest_same_jit":
        w1 = jnp.asarray(rng.normal(0, 0.1, (3, 3, 16, 32)), jnp.bfloat16)

        def f(xx):
            o = fused_stem_nchw(xx, w, b)
            (o,) = jax.lax.optimization_barrier((o,))
            z = jax.lax.conv_general_dilated(
                o, w1, (1, 1), [(1, 1), (1, 1)],
                dimension_numbers=("NCHW", "HWIO", "NHWC"),
                preferred_element_type=jnp.float32)
            return z.sum()

        s = float(jax.jit(f)(x))
    else:
        raise SystemExit(f"unknown case {case}")
    print(f"RESULT {case}: OK {s:.3e}")


def main() -> None:
    import os

    env = dict(os.environ)
    env["JAX_COMPILATION_CACHE_DIR"] = "/root/repo/.jax_cache_tpu"
    import sys as _s
    only = _s.argv[2:] if len(_s.argv) > 2 else None
    for case in (only or CASES):
        t0 = time.time()
        r = subprocess.run(
            [sys.executable, __file__, case],
            capture_output=True, text=True, timeout=2400, env=env,
        )
        ok = [ln for ln in r.stdout.splitlines() if ln.startswith("RESULT")]
        if ok:
            print(f"{ok[0]}  ({time.time() - t0:.0f}s)")
        else:
            err = (r.stderr.strip().splitlines() or ["?"])[-1][:140]
            print(f"RESULT {case}: FAIL {err}  ({time.time() - t0:.0f}s)")
        time.sleep(20)  # let the worker settle between trials


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] != "run":
        child(sys.argv[1])
    else:
        main()
