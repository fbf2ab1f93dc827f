"""Break the ONNX writer/interpreter circularity with torch.onnx.

Round 1's export gate verified the writer only through this repo's own
interpreter, so a shared writer+interpreter bug would pass (and one existed:
node attributes were written into NodeProto field 7 = `domain` instead of
field 5 = `attribute`). These tests validate both halves against an
independent producer:

  1. the interpreter reproduces a graph exported by torch.onnx.export of the
     reference YOGO (reference exporter call: yogo/utils/export_model.py:99-106)
     at the reference's own parity gate (rtol 1e-3 / atol 1e-5,
     yogo/utils/export_model.py:127-133),
  2. our writer's graph matches the torch-produced graph output-for-output
     when both carry the same weights,
  3. a direct regression test that writer-emitted Conv attributes are
     readable (i.e. live in the correct proto field).

torch.onnx's TorchScript exporter builds the proto in C++; the absent `onnx`
package is only needed for an onnxscript-function scan that plain conv
models never trigger, so that single hook is stubbed out.
"""

import io
import warnings

import numpy as np
import pytest

from tests.reference_helper import import_reference_model, reference_available

pytestmark = pytest.mark.skipif(
    not reference_available(), reason="reference repo or torch unavailable"
)

HW = (48, 64)
NUM_CLASSES = 3


@pytest.fixture(scope="module")
def torch():
    import torch

    torch.manual_seed(0)
    return torch


def torch_onnx_export_bytes(torch, net, example) -> bytes:
    """torch.onnx.export without the `onnx` package (see module docstring)."""
    from torch.onnx._internal.torchscript_exporter import onnx_proto_utils

    orig = onnx_proto_utils._add_onnxscript_fn
    onnx_proto_utils._add_onnxscript_fn = lambda proto, custom_opsets: proto
    try:
        buf = io.BytesIO()
        with warnings.catch_warnings():
            warnings.simplefilter("ignore")
            torch.onnx.export(
                net,
                example,
                buf,
                opset_version=17,
                do_constant_folding=True,
                input_names=["images"],
                output_names=["output"],
                dynamo=False,
            )
        return buf.getvalue()
    finally:
        onnx_proto_utils._add_onnxscript_fn = orig


# every conv-stack architecture (convnext_small needs timm on the torch
# side, which this env lacks)
CONV_STACK_VERSIONS = [
    "base_model",
    "silu_model",
    "double_filters",
    "triple_filters",
    "half_filters",
    "quarter_filters",
    "depth_ver_0",
    "depth_ver_1",
    "depth_ver_2",
    "depth_ver_3",
    "depth_ver_4",
]


@pytest.mark.parametrize("model_version", CONV_STACK_VERSIONS)
def test_interpreter_reproduces_torch_exported_graph(torch, model_version):
    ref_model_mod, ref_defns = import_reference_model()
    from yogo_tpu.utils.onnx_interp import run_model

    net = ref_model_mod.YOGO(
        img_size=HW,
        anchor_w=0.0425,
        anchor_h=0.0555,
        num_classes=NUM_CLASSES,
        inference=True,
        model_func=ref_defns.MODELS[model_version],
    ).eval()
    x = torch.rand(2, 1, *HW)
    model_bytes = torch_onnx_export_bytes(torch, net, x)

    with torch.no_grad():
        want = net(x).numpy()
    got = np.asarray(run_model(model_bytes, {"images": x.numpy()})[0])
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-5)


def test_writer_graph_matches_torch_graph(torch, tmp_path):
    """Same weights through both producers: our writer's graph must agree
    with the torch-exported graph (both executed by the interpreter)."""
    import jax

    ref_model_mod, ref_defns = import_reference_model()
    from yogo_tpu.models.yogo import YOGO
    from yogo_tpu.utils.export_model import build_onnx
    from yogo_tpu.utils.onnx_interp import run_model
    from yogo_tpu.utils.torch_bridge import state_dict_to_variables

    net = ref_model_mod.YOGO(
        img_size=HW,
        anchor_w=0.0425,
        anchor_h=0.0555,
        num_classes=NUM_CLASSES,
        inference=True,
        model_func=ref_defns.MODELS["base_model"],
    ).eval()
    ours = YOGO.create(HW, 0.0425, 0.0555, NUM_CLASSES)
    variables = state_dict_to_variables(net.state_dict(), ours.defn)

    torch_bytes = torch_onnx_export_bytes(torch, net, torch.rand(2, 1, *HW))
    our_bytes = build_onnx(ours, variables, batch_size=2)

    x = np.random.default_rng(3).integers(0, 255, (2, 1, *HW)).astype(np.uint8)
    out_torch_graph = np.asarray(
        run_model(torch_bytes, {"images": x.astype(np.float32)})[0]
    )
    out_our_graph = np.asarray(run_model(our_bytes, {"images": x})[0])
    np.testing.assert_allclose(
        out_our_graph, out_torch_graph, rtol=1e-3, atol=1e-5
    )
    # and both agree with the live jax forward
    live = np.asarray(ours.apply(variables, jax.numpy.asarray(x), inference=True))
    np.testing.assert_allclose(out_our_graph, live, rtol=1e-3, atol=1e-5)


def test_writer_emits_attributes_in_correct_proto_field():
    """Regression: NodeProto.attribute is field 5 (field 7 is `domain`).
    Round 1 wrote attrs into field 7; torch-produced graphs exposed the bug.
    A compliant parser must see the Conv strides on our writer's output."""
    import jax

    from yogo_tpu.models.yogo import YOGO
    from yogo_tpu.utils.export_model import build_onnx
    from yogo_tpu.utils.onnx_proto import parse_model

    ours = YOGO.create(HW, 0.0425, 0.0555, NUM_CLASSES)
    variables = ours.init(jax.random.key(0))
    m = parse_model(build_onnx(ours, variables))
    convs = [n for n in m["nodes"] if n["op_type"] == "Conv"]
    assert convs, "expected Conv nodes in the exported graph"
    strided = [n for n in convs if n["attrs"].get("strides") == [2, 2]]
    assert strided, "stride-2 convs must carry a readable strides attribute"
    for n in convs:
        assert "pads" in n["attrs"]


# ------------------------------------------ wire-format robustness (parser)
def test_parse_attribute_floats_nonpacked_and_empty():
    """protobuf parsers must accept repeated floats NON-PACKED (one fixed32
    record per element - legal, and some exporters emit it) and an absent
    field for an empty float list."""
    from yogo_tpu.utils import onnx_proto as op

    nonpacked = (
        op.enc_str(1, "scales")
        + op.enc_float(7, 1.5)
        + op.enc_float(7, 2.5)
        + op.enc_varint(20, op.ATTR_FLOATS)
    )
    name, vals = op.parse_attribute(nonpacked)
    assert name == "scales" and vals == [1.5, 2.5]

    empty = op.enc_str(1, "scales") + op.enc_varint(20, op.ATTR_FLOATS)
    name, vals = op.parse_attribute(empty)
    assert vals == []


def test_parse_tensor_int32_data_field():
    """TensorProto.int32_data (field 5) legally carries int32/int8/uint8/
    bool/float16 payloads; the parser must not fall through to an empty
    raw_data read."""
    import numpy as np

    from yogo_tpu.utils import onnx_proto as op

    # int32 tensor [[1, -2], [3, 4]] via non-packed int32_data
    body = (
        op.enc_packed_varints(1, [2, 2])  # dims
        + op.enc_varint(2, 6)  # INT32
        + op.enc_varint(5, 1)
        + op.enc_varint(5, (1 << 64) - 2)  # -2 as 10-byte varint
        + op.enc_varint(5, 3)
        + op.enc_varint(5, 4)
        + op.enc_str(8, "t")
    )
    name, arr = op.parse_tensor(body)
    assert name == "t" and arr.dtype == np.int32
    np.testing.assert_array_equal(arr, [[1, -2], [3, 4]])


def test_parse_tensor_missing_data_raises():
    from yogo_tpu.utils import onnx_proto as op

    body = op.enc_packed_varints(1, [2]) + op.enc_varint(2, 6) + op.enc_str(8, "t")
    with pytest.raises(ValueError, match="no supported data field"):
        op.parse_tensor(body)


# -------------------------------------------- interpreter op semantics
def test_interp_reshape_zero_copies_input_dim():
    """ONNX Reshape: a 0 target entry copies the input dim (allowzero=0
    default) - the form torch exporters emit for flatten-style reshapes."""
    import numpy as np

    from yogo_tpu.utils import onnx_proto as op
    from yogo_tpu.utils.onnx_interp import run_model

    nodes = [op.node("Reshape", ["x", "shape"], ["y"])]
    inits = [op.tensor_proto("shape", np.asarray([0, -1], np.int64))]
    g = op.graph(
        nodes,
        "t",
        [op.value_info("x", op.FLOAT, (2, 3, 4))],
        [op.value_info("y", op.FLOAT, (2, 12))],
        inits,
    )
    m = op.model(g)
    x = np.arange(24, dtype=np.float32).reshape(2, 3, 4)
    (y,) = run_model(m, {"x": x})
    assert y.shape == (2, 12)
    np.testing.assert_array_equal(y, x.reshape(2, 12))


def test_interp_split_uneven_last_chunk_smaller():
    """Equal-split with a non-divisible axis follows opset-18 semantics:
    ceil-sized chunks with a smaller final chunk (was: silent truncation)."""
    import numpy as np

    from yogo_tpu.utils import onnx_proto as op
    from yogo_tpu.utils.onnx_interp import run_model

    nodes = [op.node("Split", ["x"], ["a", "b", "c"], axis=0)]
    g = op.graph(
        nodes,
        "t",
        [op.value_info("x", op.FLOAT, (7, 2))],
        [
            op.value_info("a", op.FLOAT, (3, 2)),
            op.value_info("b", op.FLOAT, (3, 2)),
            op.value_info("c", op.FLOAT, (1, 2)),
        ],
        [],
    )
    m = op.model(g)
    x = np.arange(14, dtype=np.float32).reshape(7, 2)
    a, b, c = run_model(m, {"x": x})
    assert a.shape == (3, 2) and b.shape == (3, 2) and c.shape == (1, 2)
    np.testing.assert_array_equal(np.concatenate([a, b, c]), x)
