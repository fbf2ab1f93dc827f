"""Fused Pallas stem kernel vs the XLA conv reference (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np


from yogo_tpu.ops.pallas_stem import fold_stem_params, fused_stem


def xla_stem(images_u8, kernel_hwio, bias, bn=None, slope=0.01):
    x = images_u8[..., None].astype(jnp.float32)  # NHWC
    h = jax.lax.conv_general_dilated(
        x,
        jnp.asarray(kernel_hwio, jnp.float32),
        (2, 2),
        [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    if bias is not None:
        h = h + jnp.asarray(bias)
    if bn is not None:
        scale, bbias, mean, var = bn
        h = (h - mean) / jnp.sqrt(var + 1e-5) * scale + bbias
    return jnp.where(h >= 0, h, slope * h)


def test_fused_stem_matches_conv():
    rng = np.random.default_rng(0)
    imgs = rng.integers(0, 255, (2, 16, 24), np.uint8)
    k = rng.normal(size=(3, 3, 1, 16)).astype(np.float32) * 0.1
    b = rng.normal(size=16).astype(np.float32) * 0.1

    w_f, b_f = fold_stem_params(k, b)
    got = np.asarray(
        fused_stem(jnp.asarray(imgs), jnp.asarray(w_f), jnp.asarray(b_f),
                   interpret=True),
        np.float32,
    )
    want = np.asarray(xla_stem(jnp.asarray(imgs), k, b))
    assert got.shape == want.shape == (2, 8, 12, 16)
    np.testing.assert_allclose(got, want, rtol=2e-2, atol=2e-2)  # bf16 kernel


def test_fused_stem_with_bn_folding():
    rng = np.random.default_rng(1)
    imgs = rng.integers(0, 255, (1, 20, 28), np.uint8)
    k = rng.normal(size=(3, 3, 1, 8)).astype(np.float32) * 0.1
    scale = rng.uniform(0.5, 1.5, 8).astype(np.float32)
    bbias = rng.normal(size=8).astype(np.float32)
    mean = rng.normal(size=8).astype(np.float32)
    var = rng.uniform(0.5, 2.0, 8).astype(np.float32)

    w_f, b_f = fold_stem_params(k, None, scale, bbias, mean, var)
    got = np.asarray(
        fused_stem(jnp.asarray(imgs), jnp.asarray(w_f), jnp.asarray(b_f),
                   interpret=True),
        np.float32,
    )
    want = np.asarray(
        xla_stem(jnp.asarray(imgs), k, None, bn=(scale, bbias, mean, var))
    )
    np.testing.assert_allclose(got, want, rtol=2e-2, atol=2e-2)


def test_fused_stem_against_model_block0():
    """Folded stem == the model's first block (conv+BN+leaky) at inference."""
    from yogo_tpu.models.yogo import YOGO

    model = YOGO.create((32, 48), 0.1, 0.1, 3)
    v = model.init(jax.random.key(0))
    w_f, b_f = fold_stem_params(
        np.asarray(v["params"]["conv0"]["kernel"]),
        None,
        np.asarray(v["params"]["bn0"]["scale"]),
        np.asarray(v["params"]["bn0"]["bias"]),
        np.asarray(v["batch_stats"]["bn0"]["mean"]),
        np.asarray(v["batch_stats"]["bn0"]["var"]),
    )
    rng = np.random.default_rng(2)
    imgs = rng.integers(0, 255, (2, 32, 48), np.uint8)
    got = np.asarray(
        fused_stem(jnp.asarray(imgs), jnp.asarray(w_f), jnp.asarray(b_f),
                   interpret=True),
        np.float32,
    )

    # reference: first block of the flax stack
    from yogo_tpu.models.yogo import ConvStack

    sub = ConvStack(blocks=model.defn.blocks[:1])
    subv = {
        "params": {"conv0": v["params"]["conv0"], "bn0": v["params"]["bn0"]},
        "batch_stats": {"bn0": v["batch_stats"]["bn0"]},
    }
    want = np.asarray(
        sub.apply(subv, jnp.asarray(imgs[..., None], jnp.float32), train=False)
    )
    np.testing.assert_allclose(got, want, rtol=2e-2, atol=2e-2)


def test_model_integration_interpret_parity(monkeypatch):
    """YOGO.apply with the fused Pallas stem (interpret mode on CPU) matches
    the XLA path at bf16 tolerance (grid-level, w/h compared in log space)."""
    import jax
    import jax.numpy as jnp

    from yogo_tpu.models.yogo import YOGO

    model = YOGO.create((64, 96), 0.08, 0.1, 3,
                        compute_dtype=jnp.bfloat16)
    v = model.init(jax.random.key(0))
    # damp the random weights: bf16 rounding noise otherwise amplifies
    # multiplicatively through 7 untrained conv blocks, which tests noise
    # propagation rather than the stem wiring
    v = jax.tree.map(lambda a: 0.3 * a, v)
    x = np.random.default_rng(0).integers(0, 255, (2, 1, 64, 96), np.uint8)

    monkeypatch.setenv("YOGO_PALLAS_STEM", "0")
    ref = np.asarray(model.apply(v, jnp.asarray(x), inference=True))
    monkeypatch.setenv("YOGO_PALLAS_STEM", "interpret")
    got = np.asarray(model.apply(v, jnp.asarray(x), inference=True))

    assert got.shape == ref.shape
    np.testing.assert_allclose(got[:, :2], ref[:, :2], rtol=0.05, atol=0.02)
    np.testing.assert_allclose(
        np.log(got[:, 2:4]), np.log(ref[:, 2:4]), rtol=0.05, atol=0.1
    )
    np.testing.assert_allclose(got[:, 4:], ref[:, 4:], rtol=0.05, atol=0.02)
    # NOTE: no detection-SET comparison here, deliberately. An untrained
    # net's objectness clusters in [0.45, 0.50] (sigmoid of near-zero
    # logits), so set membership at any threshold in that band is decided
    # by bf16 rounding noise, not by stem correctness - the earlier
    # shape-only check was masking exactly that. The grid-level
    # comparisons above (incl. log-space w/h) are the rigorous parity
    # check; trained-model detection agreement is covered by
    # tests/test_golden_detections.py and the reference-parity tests.


def test_model_integration_eligibility(monkeypatch):
    """The fast path only engages for the canonical stem at inference with
    raw uint8 input + bf16 compute."""
    import jax
    import jax.numpy as jnp

    from yogo_tpu.models.yogo import YOGO

    monkeypatch.setenv("YOGO_PALLAS_STEM", "interpret")
    m = YOGO.create((64, 96), 0.08, 0.1, 3, compute_dtype=jnp.bfloat16)
    x_u8 = jnp.zeros((1, 64, 96, 1), jnp.uint8)
    x_f32 = jnp.zeros((1, 64, 96, 1), jnp.float32)

    assert m._stem_pallas_mode(x_u8, train=False, mutable=False) == "interpret"
    assert m._stem_pallas_mode(x_u8, train=True, mutable=True) is None
    assert m._stem_pallas_mode(x_f32, train=False, mutable=False) is None
    m32 = m.with_compute_dtype(jnp.float32)
    assert m32._stem_pallas_mode(x_u8, False, False) is None
    cnx = YOGO.create((64, 96), 0.08, 0.1, 3, model_version="convnext_small",
                      compute_dtype=jnp.bfloat16)
    assert cnx._stem_pallas_mode(x_u8, False, False) is None
    monkeypatch.setenv("YOGO_PALLAS_STEM", "0")
    assert m._stem_pallas_mode(x_u8, False, False) is None


def test_split_dispatch_api_interpret_parity(monkeypatch):
    """pallas_stem_forward (own jit) + forward_from_block1 (second jit)
    reproduces YOGO.apply - the split-dispatch structure infer.py uses so
    the Mosaic kernel never shares an executable with the rest of the
    model (docs/perf-notes.md axon stability matrix)."""
    import jax
    import jax.numpy as jnp

    from yogo_tpu.models.yogo import YOGO

    model = YOGO.create((64, 96), 0.08, 0.1, 3, compute_dtype=jnp.bfloat16)
    v = jax.tree.map(lambda a: 0.3 * a, model.init(jax.random.key(0)))
    x = np.random.default_rng(1).integers(0, 255, (2, 1, 64, 96), np.uint8)

    monkeypatch.setenv("YOGO_PALLAS_STEM", "0")
    ref = np.asarray(model.apply(v, jnp.asarray(x), inference=True))

    stem = jax.jit(
        lambda imgs: model.pallas_stem_forward(v, imgs, interpret=True)
    )
    rest = jax.jit(lambda h: model.forward_from_block1(v, h, inference=True))
    h = jax.block_until_ready(stem(jnp.asarray(x)))
    assert h.dtype == jnp.bfloat16 and h.shape[1] == 16  # NCHW block-0 out
    got = np.asarray(rest(h))

    np.testing.assert_allclose(got[:, :2], ref[:, :2], rtol=0.05, atol=0.02)
    np.testing.assert_allclose(got[:, 4:], ref[:, 4:], rtol=0.05, atol=0.02)


def test_compiled_mode_under_jit_falls_back_to_xla(monkeypatch):
    """YOGO_PALLAS_STEM=1 under an outer jit must NOT inline the Mosaic
    kernel into the full-model executable (the axon crash topology):
    apply falls back to the XLA stem when x is a tracer."""
    import jax
    import jax.numpy as jnp

    from yogo_tpu.models.yogo import YOGO

    model = YOGO.create((64, 96), 0.08, 0.1, 3, compute_dtype=jnp.bfloat16)
    v = model.init(jax.random.key(0))
    x = jnp.zeros((1, 1, 64, 96), jnp.uint8)

    monkeypatch.setenv("YOGO_PALLAS_STEM", "0")
    ref = np.asarray(jax.jit(
        lambda i: model.apply(v, i, inference=True)
    )(x))

    calls = []

    def boom(*a, **k):  # the kernel must never be traced under the jit
        calls.append(1)
        raise AssertionError("pallas stem inlined into an outer jit")

    monkeypatch.setattr(
        "yogo_tpu.ops.pallas_stem.fused_stem_nchw", boom
    )
    monkeypatch.setenv("YOGO_PALLAS_STEM", "1")
    got = np.asarray(jax.jit(
        lambda i: model.apply(v, i, inference=True)
    )(x))
    assert not calls
    np.testing.assert_array_equal(got, ref)
