import jax
import jax.numpy as jnp
import numpy as np
import pytest

from yogo_tpu.models.defns import MODELS, get_model_defn
from yogo_tpu.models.yogo import YOGO

CONV_STACKS = [n for n in MODELS if n != "convnext_small"]


def small_model(name="base_model", num_classes=4, hw=(64, 96)):
    return YOGO.create(hw, 0.0425, 0.0555, num_classes, model_version=name)


def test_registry_fallback_matches_reference():
    assert get_model_defn(None).__name__ == "base_model"
    assert get_model_defn("not_a_model").__name__ == "base_model"
    assert get_model_defn("silu_model").__name__ == "silu_model"
    assert len(MODELS) == 12


def test_base_model_grid_772_1032():
    m = YOGO.create((772, 1032), 0.0425, 0.0555, 7)
    assert m.grid == (129, 97)  # reference: docs/recipes.md Sx=129, Sy=97


@pytest.mark.parametrize("name", CONV_STACKS)
def test_all_conv_stacks_forward(name):
    m = small_model(name)
    v = m.init(jax.random.key(0))
    x = jnp.zeros((2, 1, 64, 96), jnp.uint8)
    out = m.apply(v, x, inference=True)
    Sx, Sy = m.grid
    assert out.shape == (2, 5 + 4, Sy, Sx)
    out = np.asarray(out)
    # decode invariants: sigmoid outputs in (0,1), softmax classes sum to 1
    assert (out[:, 4] > 0).all() and (out[:, 4] < 1).all()
    np.testing.assert_allclose(out[:, 5:].sum(axis=1), 1.0, rtol=1e-5)
    # w/h positive
    assert (out[:, 2] > 0).all() and (out[:, 3] > 0).all()


def test_grid_divides_by_8_for_base_family():
    for name in ["base_model", "silu_model", "double_filters", "half_filters"]:
        m = small_model(name, hw=(160, 256))
        assert m.grid == (256 // 8, 160 // 8)


def test_train_class_logits_not_softmaxed():
    m = small_model()
    v = m.init(jax.random.key(0))
    x = jnp.zeros((1, 1, 64, 96), jnp.float32)
    out_train = np.asarray(m.apply(v, x, inference=False))
    sums = out_train[:, 5:].sum(axis=1)
    assert not np.allclose(sums, 1.0)


def test_xy_decode_within_cell():
    m = small_model()
    v = m.init(jax.random.key(1))
    x = jnp.zeros((1, 1, 64, 96), jnp.float32)
    out = np.asarray(m.apply(v, x))
    Sx, Sy = m.grid
    xc, yc = out[0, 0], out[0, 1]
    # each cell's xc must lie within [Cx, Cx + 1/Sx]
    from yogo_tpu.ops.grid import cell_offsets

    cxs, cys = cell_offsets(Sx, Sy)
    assert (xc >= cxs).all() and (xc <= cxs + 1 / Sx + 1e-6).all()
    assert (yc >= cys).all() and (yc <= cys + 1 / Sy + 1e-6).all()


def test_resize_multipliers():
    m = small_model(hw=(64, 96))
    r = m.resize(32)
    assert r.img_size == (32, 96)
    assert r.height_multiplier == 2.0 and r.width_multiplier == 1.0
    Sx, Sy = r.grid
    assert (Sx, Sy) == (96 // 8, 32 // 8)
    # resize is relative to the *original* size even when chained
    r2 = r.resize(16)
    assert r2.height_multiplier == 4.0


def test_resize_scales_heights():
    m = small_model(hw=(64, 96))
    v = m.init(jax.random.key(0))
    r = m.resize(32)
    x_small = jnp.zeros((1, 1, 32, 96), jnp.float32)
    out = np.asarray(r.apply(v, x_small))
    m0 = small_model(hw=(64, 96))
    x_full = jnp.zeros((1, 1, 64, 96), jnp.float32)
    out_full = np.asarray(m0.apply(v, x_full))
    # predicted heights in the cropped model are 2x the raw decoded value
    np.testing.assert_allclose(
        out[0, 3].mean() / out_full[0, 3].mean(), 2.0, rtol=0.2
    )


def test_uint8_and_float_inputs_agree():
    m = small_model()
    v = m.init(jax.random.key(2))
    xu = jnp.asarray(np.random.default_rng(0).integers(0, 255, (1, 1, 64, 96), np.uint8))
    out_u = np.asarray(m.apply(v, xu))
    out_f = np.asarray(m.apply(v, xu.astype(jnp.float32)))
    np.testing.assert_allclose(out_u, out_f, atol=1e-6)


def test_unbatched_input_gets_batch_dim():
    m = small_model()
    v = m.init(jax.random.key(0))
    out = m.apply(v, jnp.zeros((1, 64, 96), jnp.float32))
    assert out.shape[0] == 1


def test_dropout_active_only_in_train():
    m = small_model()
    v = m.init(jax.random.key(0))
    x = jnp.asarray(
        np.random.default_rng(1).integers(0, 255, (1, 1, 64, 96), np.uint8)
    )
    o1 = np.asarray(m.apply(v, x))
    o2 = np.asarray(m.apply(v, x))
    np.testing.assert_array_equal(o1, o2)  # eval is deterministic
    ot, _ = m.apply(
        v, x, train=True, mutable=True, rngs={"dropout": jax.random.key(3)}
    )
    assert not np.allclose(np.asarray(ot), o1)


def test_convnext_small_forward():
    m = small_model("convnext_small", hw=(64, 96))
    assert m.grid == (96 // 8, 64 // 8)
    v = m.init(jax.random.key(0))
    out = m.apply(v, jnp.zeros((1, 1, 64, 96), jnp.float32), inference=True)
    assert out.shape == (1, 9, 8, 12)


def test_num_params_base_model():
    # reference base_model trainable params: computable from conv shapes
    m = small_model("base_model", num_classes=7, hw=(64, 96))
    v = m.init(jax.random.key(0))
    n = m.num_params(v)

    def conv(i, o, k, bias=True, bn=False):
        return i * o * k * k + (o if bias else 0) + (2 * o if bn else 0)

    expected = (
        conv(1, 16, 3, bias=False, bn=True)
        + conv(16, 32, 3)
        + conv(32, 64, 3)
        + conv(64, 128, 3)
        + conv(128, 128, 3, bias=False, bn=True)
        + conv(128, 128, 3, bias=True, bn=True)
        + conv(128, 128, 3)
        + conv(128, 12, 1)
    )
    assert n == expected


def test_param_and_grad_norm():
    m = small_model()
    v = m.init(jax.random.key(0))
    pn = m.param_norm(v["params"])
    assert pn > 0 and np.isfinite(pn)
    # matches a manual flat-vector norm
    flat = np.concatenate([np.asarray(p).ravel() for p in jax.tree.leaves(v["params"])])
    np.testing.assert_allclose(pn, np.linalg.norm(flat), rtol=1e-5)
    assert m.grad_norm is m.param_norm or m.grad_norm(v["params"]) == pn


def test_from_pth_classmethod(tmp_path):
    from yogo_tpu.utils.checkpoint import save_checkpoint

    m = small_model()
    v = m.init(jax.random.key(0))
    p = tmp_path / "m.ckpt"
    save_checkpoint(p, m, v, classes=["a", "b", "c", "d"])
    m2, v2, meta = type(m).from_pth(p)
    assert m2.grid == m.grid and meta["classes"] == ["a", "b", "c", "d"]


def test_space_to_depth_conv_equivalent():
    """SpaceToDepthConv (research artifact, default OFF - measured
    negative result on v5e, see its docstring) must stay mathematically
    equivalent to the strided conv and param-tree-identical."""
    import jax
    import jax.numpy as jnp

    from yogo_tpu.models.defns import get_model_defn
    from yogo_tpu.models.yogo import ConvStack

    blocks = get_model_defn("base_model")(3, False).blocks
    x = jnp.asarray(
        np.random.default_rng(0).normal(size=(2, 48, 64, 1)).astype(np.float32)
    )
    native = ConvStack(blocks=blocks, compute_dtype=jnp.float32, s2d=False)
    s2d = ConvStack(blocks=blocks, compute_dtype=jnp.float32, s2d=True)
    v = native.init({"params": jax.random.key(0)}, x, train=False)
    assert jax.tree_util.tree_structure(v) == jax.tree_util.tree_structure(
        s2d.init({"params": jax.random.key(0)}, x, train=False)
    )
    a = native.apply(v, x, train=False)
    b = s2d.apply(v, x, train=False)
    np.testing.assert_allclose(
        np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-5
    )
