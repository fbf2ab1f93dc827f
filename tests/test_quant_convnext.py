"""Int8 PTQ for the convnext family (ops/quant_convnext.py).

The conv-stack quant path is covered by tests/test_quant.py; this file
pins the convnext-specific pieces: the functional float twin must match
module.apply EXACTLY (it is the reference the calibration scales
describe), the site rule, the scale plumbing, and the int8 error bound
on decoded outputs."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from yogo_tpu.models.yogo import YOGO
from yogo_tpu.ops import quant_convnext as qc


@pytest.fixture(scope="module")
def setup():
    m = YOGO.create((64, 96), 0.0425, 0.0555, 4, model_version="convnext_small")
    v = m.init(jax.random.key(7))
    x = (
        np.random.default_rng(7)
        .integers(0, 256, (2, 1, 64, 96))
        .astype(np.uint8)
    )
    ref = np.asarray(m.apply(v, jnp.asarray(x), inference=True))
    return m, v, x, ref


def test_site_rule_convnext_small():
    sites = qc.quant_sites()
    # 3 downsamples + 2 pointwise per block * (3+3+27+3) blocks = 75 total;
    # the cin>=128 rule drops down1 (cin=96) and stage0's three pwconv1
    # (cin=96) -> 71
    assert len(sites) == 71
    keys = [k for k, _ in sites]
    assert "down1_conv" not in keys
    assert "stage0_block0/pwconv1" not in keys
    assert "stage0_block0/pwconv2" in keys  # cin = 4*96 = 384
    assert keys[-1] == "stage3_block2/pwconv2"
    assert all(c >= 128 for _, c in sites)
    # forward order is the scales-vector order: downsample precedes its stage
    assert keys.index("down2_conv") < keys.index("stage2_block0/pwconv1")


def test_float_twin_matches_module_exactly(setup):
    """float_forward is the calibration/dequant reference: it must be the
    SAME f32 program as ConvNeXtSmall.apply, not an approximation."""
    m, v, x, ref = setup
    xn = jnp.transpose(jnp.asarray(x, jnp.float32), (0, 2, 3, 1))
    raw = qc.float_forward(v["params"], xn)
    mine = np.asarray(m._decode_raw(raw, True))
    np.testing.assert_array_equal(ref, mine)


def test_quantized_forward_error_bound_and_determinism(setup):
    m, v, x, ref = setup
    qp = qc.quantize_convnext(m, v, [x])
    out1 = np.asarray(qc.quantized_convnext_forward(m, qp, jnp.asarray(x)))
    out2 = np.asarray(qc.quantized_convnext_forward(m, qp, jnp.asarray(x)))
    np.testing.assert_array_equal(out1, out2)
    assert out1.shape == ref.shape
    # int8 noise on decoded outputs stays small (values measured ~3e-3 on
    # this fixture; bound leaves ~3x headroom without hiding real breakage)
    assert np.max(np.abs(ref[:, 4] - out1[:, 4])) < 0.01  # objectness
    assert np.max(np.abs(ref[:, 5:] - out1[:, 5:])) < 0.01  # class probs
    assert np.max(np.abs(ref[:, :2] - out1[:, :2])) < 0.005  # centers
    # decode invariants survive quantization
    assert (out1[:, 2] > 0).all() and (out1[:, 3] > 0).all()
    np.testing.assert_allclose(out1[:, 5:].sum(axis=1), 1.0, rtol=1e-4)


def test_act_scales_roundtrip_and_validation(setup):
    """The multihost path: process 0 calibrates, others rebuild from the
    broadcast scales - both programs must be identical."""
    m, v, x, _ = setup
    qp = qc.quantize_convnext(m, v, [x])
    scales = np.asarray(qp["scales"])
    qp2 = qc.quantize_convnext(m, v, [], act_scales=scales)
    a = np.asarray(qc.quantized_convnext_forward(m, qp, jnp.asarray(x)))
    b = np.asarray(qc.quantized_convnext_forward(m, qp2, jnp.asarray(x)))
    np.testing.assert_array_equal(a, b)

    with pytest.raises(ValueError, match="one entry per quantized site"):
        qc.quantize_convnext(m, v, [], act_scales=scales[:-1])
    bad = scales.copy()
    bad[3] = 0.0
    with pytest.raises(ValueError, match="zero scale"):
        qc.quantize_convnext(m, v, [], act_scales=bad)
    with pytest.raises(ValueError, match="at least one batch"):
        qc.quantize_convnext(m, v, [])


def test_qp_is_arrays_only_and_int8(setup):
    """qp must survive device_put/replicate_to_mesh: array leaves only;
    site kernels actually int8; float tree excludes quantized kernels."""
    m, v, x, _ = setup
    qp = qc.quantize_convnext(m, v, [x])
    for leaf in jax.tree.leaves(qp):
        assert isinstance(leaf, jax.Array)
    assert qp["int8"]["stage3_block0/pwconv1"]["w8"].dtype == jnp.int8
    assert "pwconv1" not in qp["float"]["stage3_block0"]
    # non-quantized sites keep their float kernels
    assert qp["float"]["stage0_block0"]["pwconv1"]["kernel"].dtype == jnp.bfloat16
    assert len(qp["int8"]) == 71
    # per-output-channel deq vector: s_in * s_w[c]
    assert qp["int8"]["down2_conv"]["deq"].shape == (384,)


def test_conv_stack_rejected(setup):
    m2 = YOGO.create((64, 96), 0.0425, 0.0555, 4, model_version="base_model")
    with pytest.raises(NotImplementedError, match="convnext family only"):
        qc.quantize_convnext(m2, {"params": {}}, [])
