"""End-to-end inference + export tests (library surface: predict, writers)."""

import json

import jax
import numpy as np
import pytest
from PIL import Image

from yogo_tpu.models.defns import MODELS
from yogo_tpu.models.yogo import YOGO
from yogo_tpu.utils.checkpoint import save_checkpoint

CLASSES = ["healthy", "ring", "misc"]
HW = (48, 64)


@pytest.fixture(scope="module")
def ckpt_and_images(tmp_path_factory):
    root = tmp_path_factory.mktemp("infer")
    model = YOGO.create(HW, 0.15, 0.2, len(CLASSES), model_version="quarter_filters")
    variables = model.init(jax.random.key(0))
    ckpt = root / "model.ckpt"
    save_checkpoint(ckpt, model, variables, classes=CLASSES, model_name="m")

    img_dir = root / "imgs"
    img_dir.mkdir()
    rng = np.random.default_rng(0)
    for i in range(5):
        arr = np.full(HW, 220, np.uint8)
        arr[10:20, 20:32] = 40
        arr += rng.integers(0, 10, HW).astype(np.uint8)
        Image.fromarray(arr).save(img_dir / f"im{i}.png")
    return ckpt, img_dir, model, variables


def test_predict_counts_and_npy(ckpt_and_images, tmp_path):
    from yogo_tpu.infer import predict

    ckpt, img_dir, *_ = ckpt_and_images
    out_dir = tmp_path / "out"
    predict(
        ckpt,
        path_to_images=img_dir,
        output_dir=str(out_dir),
        save_npy=True,
        save_preds=True,
        count_predictions=True,
        batch_size=2,  # 5 images -> padded final batch
        obj_thresh=0.3,
        use_tqdm=False,
    )
    txts = sorted(out_dir.glob("*.txt"))
    assert len(txts) == 5
    npys = list(out_dir.glob("*.npy"))
    metas = list(out_dir.glob("*.json"))
    assert len(npys) == 1 and len(metas) == 1
    arr = np.load(npys[0])
    assert arr.shape[0] == 8 + len(CLASSES)
    meta = json.loads(metas[0].read_text())
    assert meta["obj_thresh"] == 0.3
    assert meta["vertical_crop_height_px"] == HW[0]


@pytest.mark.parametrize(
    "obj_thresh",
    [
        0.0,  # K-th candidate obj > 0 always: every image full-fetch falls back
        0.3,  # floor above this net's K-th candidate: pure scatter path
        0.99,  # scatter path with almost everything filtered
    ],
)
def test_predict_fetch_top_k_exact_equivalence(
    ckpt_and_images, tmp_path, capsys, obj_thresh
):
    """The candidate-fetch artifact path (--fetch-top-k) is bit-identical
    to full-tensor fetching at any threshold: complete candidate sets are
    scattered back to an equivalent grid, incomplete ones fall back to a
    full slice (ops/postprocess.py select_top_candidates)."""
    from yogo_tpu.infer import predict

    ckpt, img_dir, *_ = ckpt_and_images
    outs = {}
    counts = {}
    for name, k in (("full", 0), ("cand", 8)):  # grid is 6x8 = 48 cells > 8
        out_dir = tmp_path / name
        predict(
            ckpt,
            path_to_images=img_dir,
            output_dir=str(out_dir),
            save_npy=True,
            save_preds=True,
            count_predictions=True,
            batch_size=2,
            obj_thresh=obj_thresh,
            use_tqdm=False,
            fetch_top_k=k,
        )
        counts[name] = capsys.readouterr().out
        txts = {p.name: p.read_text() for p in out_dir.glob("*.txt")}
        assert len(txts) == 5
        npy = np.load(next(iter(out_dir.glob("*.npy"))))
        outs[name] = (txts, npy)
    assert outs["full"][0] == outs["cand"][0]
    np.testing.assert_array_equal(outs["full"][1], outs["cand"][1])
    assert counts["full"] == counts["cand"]


@pytest.mark.parametrize(
    "obj_thresh, expect_warning",
    [(0.0, True), (0.3, False)],  # forced fallback / pure scatter
)
def test_predict_fetch_top_k_fallback_warning(
    ckpt_and_images, tmp_path, obj_thresh, expect_warning
):
    """predict() surfaces a capacity diagnostic when >10% of images fall
    back to full-tensor fetches (serve's /metrics full_fetch_fallbacks
    analogue), and stays quiet on the pure scatter path."""
    import warnings as _warnings

    from yogo_tpu.infer import predict

    ckpt, img_dir, *_ = ckpt_and_images
    with _warnings.catch_warnings(record=True) as caught:
        _warnings.simplefilter("always")
        predict(
            ckpt,
            path_to_images=img_dir,
            output_dir=str(tmp_path / "out"),
            save_preds=True,
            batch_size=2,
            obj_thresh=obj_thresh,
            use_tqdm=False,
            fetch_top_k=8,
        )
    hits = [w for w in caught if "fetch-top-k" in str(w.message)]
    if expect_warning:
        (hit,) = hits
        assert "5/5 images" in str(hit.message)
    else:
        assert not hits


@pytest.mark.parametrize("obj_thresh", [0.0, 0.3])  # fallback / scatter
def test_predict_fetch_top_k_under_data_parallel(
    ckpt_and_images, tmp_path, obj_thresh
):
    """Candidate fetch composes with --data-parallel: the select runs on
    the batch-sharded output and the per-image fallback slice gathers
    across the mesh (GSPMD); artifacts match the mesh full fetch. (Both
    runs shard the forward: an untrained net's decode amplifies benign
    mesh-vs-single reduction-order noise through exp(tw) into huge w/h
    diffs, so single-vs-mesh raw outputs are never comparable - the
    round-5 gotcha.)"""
    from yogo_tpu.infer import predict

    ckpt, img_dir, *_ = ckpt_and_images
    txts = {}
    for name, kwargs in (
        ("full", dict(fetch_top_k=0, data_parallel=True)),
        ("cand", dict(fetch_top_k=8, data_parallel=True)),
    ):
        out_dir = tmp_path / name
        predict(
            ckpt,
            path_to_images=img_dir,
            output_dir=str(out_dir),
            save_preds=True,
            batch_size=4,
            obj_thresh=obj_thresh,
            use_tqdm=False,
            **kwargs,
        )
        txts[name] = {p.name: p.read_text() for p in out_dir.glob("*.txt")}
        assert len(txts[name]) == 5
    assert txts["full"] == txts["cand"]


def test_predict_full_predictions_shape(ckpt_and_images):
    from yogo_tpu.infer import predict

    ckpt, img_dir, model, variables = ckpt_and_images
    res = predict(
        ckpt,
        path_to_images=img_dir,
        batch_size=4,
        return_full_predictions=True,
        use_tqdm=False,
    )
    Sx, Sy = model.grid
    assert res.shape == (5, 5 + len(CLASSES), Sy, Sx)
    # padded tail batch must not corrupt results: forward each image alone
    import jax.numpy as jnp

    one = np.asarray(
        model.apply(
            variables,
            jnp.asarray(
                np.asarray(
                    Image.open(sorted(img_dir.glob("*.png"))[4]).convert("L")
                )[None, None]
            ),
            inference=True,
        )
    )
    np.testing.assert_allclose(res[4], one[0], rtol=1e-4, atol=1e-5)


def test_predict_data_parallel_matches_single_device(ckpt_and_images, capsys):
    """--data-parallel shards batches over all (8 virtual) devices via the
    training mesh (parallel/mesh.py); results must match single-device,
    including the fused count path with a rounded-up, masked batch."""
    from yogo_tpu.infer import predict

    ckpt, img_dir, *_ = ckpt_and_images
    kwargs = dict(
        path_to_images=img_dir, batch_size=3, obj_thresh=0.3, use_tqdm=False
    )
    single = predict(ckpt, return_full_predictions=True, **kwargs)
    multi = predict(
        ckpt, return_full_predictions=True, data_parallel=True, **kwargs
    )
    np.testing.assert_allclose(multi, single, rtol=1e-5, atol=1e-6)

    # fused on-device count: batch_size 3 rounds up to 8 (mesh size), the
    # 3 padding images of the final batch are excluded by image_mask
    predict(ckpt, count_predictions=True, data_parallel=True, **kwargs)
    out_dp = capsys.readouterr().out
    predict(ckpt, count_predictions=True, **kwargs)
    out_sd = capsys.readouterr().out
    assert out_dp == out_sd != ""


def test_predict_draw_boxes(ckpt_and_images, tmp_path):
    from yogo_tpu.infer import predict

    ckpt, img_dir, *_ = ckpt_and_images
    out_dir = tmp_path / "drawn"
    predict(
        ckpt,
        path_to_images=img_dir,
        output_dir=str(out_dir),
        draw_boxes=True,
        obj_thresh=0.3,
        use_tqdm=False,
    )
    assert len(list(out_dir.glob("*.png"))) == 5


def test_predict_crop_height(ckpt_and_images):
    from yogo_tpu.infer import predict

    ckpt, img_dir, model, _ = ckpt_and_images
    res = predict(
        ckpt,
        path_to_images=img_dir,
        vertical_crop_height=0.5,
        return_full_predictions=True,
        use_tqdm=False,
    )
    Sx, Sy = model.resize(HW[0] // 2).grid
    assert res.shape[2:] == (Sy, Sx)


def test_predict_validation_errors(ckpt_and_images):
    from yogo_tpu.infer import predict

    ckpt, img_dir, *_ = ckpt_and_images
    with pytest.raises(ValueError, match="cannot save predictions"):
        predict(ckpt, path_to_images=img_dir, save_preds=True, draw_boxes=True)
    with pytest.raises(ValueError, match="output_dir must not be None"):
        predict(ckpt, path_to_images=img_dir, save_preds=True)
    with pytest.raises(ValueError, match="expected 3 class names"):
        predict(ckpt, path_to_images=img_dir, class_names=["x"], use_tqdm=False)


# ------------------------------------------------------------------- export
def test_onnx_export_roundtrip_and_parity(ckpt_and_images, tmp_path):
    from yogo_tpu.utils.export_model import build_onnx, verify_onnx
    from yogo_tpu.utils.onnx_proto import parse_model

    _, _, model, variables = ckpt_and_images
    blob = build_onnx(model, variables)
    # wire-format roundtrip
    parsed = parse_model(blob)
    assert parsed["producer"] == "yogo_tpu"
    assert parsed["inputs"] == ["images"]
    assert parsed["outputs"] == ["preds"]
    assert any(n["op_type"] == "Conv" for n in parsed["nodes"])
    # BN folded: no BatchNormalization nodes
    assert not any(n["op_type"] == "BatchNormalization" for n in parsed["nodes"])
    # parity gate (rtol 1e-3 / atol 1e-5, reference export_model.py:127-133);
    # verify_onnx raises on mismatch (untrained nets emit exp() of large
    # logits, so the check is relative, matching the reference's allclose)
    verify_onnx(model, variables, blob)


def test_onnx_export_nonidentity_bn_stats(ckpt_and_images):
    """BN folding must survive trained (non-identity) running stats: with
    freshly-init stats (mean=0, var=1) any folding bug is invisible, which
    is exactly how the round-2 CLI-drive regression slipped past the suite
    (a TPU-side bf16 reference, fixed by pinning verify_onnx's reference
    forward to CPU). Perturb the stats like a trained net and require tight
    elementwise agreement, not just the relative gate."""
    import numpy as np

    from yogo_tpu.utils.export_model import build_onnx, verify_onnx

    _, _, model, variables = ckpt_and_images
    rng = np.random.default_rng(3)
    stats = jax.tree_util.tree_map(np.asarray, variables["batch_stats"])
    for leaf in stats.values():
        leaf["mean"] = rng.normal(0.0, 0.2, leaf["mean"].shape).astype(np.float32)
        leaf["var"] = rng.uniform(0.5, 2.0, leaf["var"].shape).astype(np.float32)
    # tame the head so w/h = anchor*exp(t) stays O(1): untrained weights fed
    # through perturbed-variance BN explode the exp channels otherwise,
    # and the relative gate is vacuous on huge values
    params = jax.tree_util.tree_map(np.asarray, variables["params"])
    head = sorted(k for k in params if k.startswith("conv"))[-1]
    params[head] = {k: v * 1e-3 for k, v in params[head].items()}
    perturbed = {"params": params, "batch_stats": stats}
    blob = build_onnx(model, perturbed)
    max_dev = verify_onnx(model, perturbed, blob)
    # decoded sigmoid/exp outputs of a small untrained net: interpreter and
    # jax should agree to f32 roundoff, far below the reference gate
    assert max_dev < 1e-2


def test_onnx_export_normalized_model(tmp_path):
    from yogo_tpu.utils.export_model import build_onnx, verify_onnx

    model = YOGO.create(
        HW, 0.15, 0.2, 3, model_version="quarter_filters", normalize_images=True
    )
    variables = model.init(jax.random.key(1))
    blob = build_onnx(model, variables)
    verify_onnx(model, variables, blob)


def test_onnx_export_silu_and_crop(tmp_path):
    from yogo_tpu.utils.export_model import build_onnx, verify_onnx

    model = YOGO.create(HW, 0.15, 0.2, 2, model_version="silu_model")
    variables = model.init(jax.random.key(2))
    cropped = model.resize(HW[0] // 2)
    blob = build_onnx(cropped, variables)
    verify_onnx(cropped, variables, blob)


def test_stablehlo_export(ckpt_and_images, tmp_path):
    from yogo_tpu.utils.export_model import export_stablehlo

    _, _, model, variables = ckpt_and_images
    target = tmp_path / "m.stablehlo"
    export_stablehlo(model, variables, target)
    assert target.stat().st_size > 1000
    # deserializes and runs
    from jax import export as jexport

    exported = jexport.deserialize(target.read_bytes())
    x = np.zeros((1, 1, *HW), np.uint8)
    out = exported.call(x)
    assert out.shape[1] == 5 + len(CLASSES)


def test_do_export_cli_writes_onnx(ckpt_and_images, tmp_path):
    from types import SimpleNamespace

    from yogo_tpu.utils.export_model import do_export

    ckpt, *_ = ckpt_and_images
    out = tmp_path / "exported"
    do_export(
        SimpleNamespace(
            input=str(ckpt),
            crop_height=None,
            output_filename=str(out),
            simplify=True,
            format="onnx",
        )
    )
    assert (tmp_path / "exported.onnx").exists()


def test_onnx_export_convnext(tmp_path):
    from yogo_tpu.utils.export_model import build_onnx, verify_onnx

    model = YOGO.create((32, 48), 0.15, 0.2, 2, model_version="convnext_small")
    variables = model.init(jax.random.key(3))
    blob = build_onnx(model, variables)
    verify_onnx(model, variables, blob)


def test_predict_tolerates_corrupt_image(ckpt_and_images, tmp_path):
    """A malformed image mid-directory warns and skips its batch instead of
    crashing (reference inference-loop behavior)."""
    import shutil
    import warnings as w

    from yogo_tpu.infer import predict

    ckpt, img_dir, *_ = ckpt_and_images
    broken_dir = tmp_path / "broken"
    shutil.copytree(img_dir, broken_dir)
    (broken_dir / "im2.png").write_bytes(b"this is not a png")
    with w.catch_warnings(record=True) as rec:
        w.simplefilter("always")
        res = predict(
            ckpt,
            path_to_images=broken_dir,
            batch_size=2,
            return_full_predictions=True,
            use_tqdm=False,
        )
    assert any("continuing" in str(r.message) for r in rec)
    # the unaffected batches still produced predictions
    assert res is not None and np.abs(res[0]).sum() > 0


def test_get_dataset_rgb_plumb(tmp_path):
    """predict() forwards the model's RGB setting into the image source:
    an RGB checkpoint needs (3, H, W) batches (previously get_dataset had
    no rgb parameter and always produced grayscale)."""
    from yogo_tpu.data.image_source import get_dataset

    img = np.zeros((10, 12, 3), np.uint8)
    img[..., 0] = 200  # red-ish so rgb vs gray differ
    Image.fromarray(img).save(tmp_path / "a.png")
    ds_rgb = get_dataset(path_to_images=tmp_path, rgb=True)
    arr, _ = ds_rgb[0]
    assert arr.shape == (3, 10, 12)
    ds_gray = get_dataset(path_to_images=tmp_path)
    arr, _ = ds_gray[0]
    assert arr.shape == (1, 10, 12)


def test_center_crop_torchvision_semantics():
    """center_crop matches torchvision CenterCrop EXACTLY: banker's-round
    window placement on odd differences (not floor), and symmetric
    zero-padding when the image is smaller than the target - the jitted
    forward needs the promised fixed shape either way."""
    from yogo_tpu.data.image_source import center_crop

    img = np.arange(5 * 7, dtype=np.uint8).reshape(1, 5, 7)
    # h=5->th=2: diff 3, torchvision top = int(round(1.5)) = 2 (banker's)
    out = center_crop(img, (2, 7))
    np.testing.assert_array_equal(out, img[:, 2:4])
    # even differences: plain center
    np.testing.assert_array_equal(center_crop(img, (3, 7)), img[:, 1:4])
    # crop LARGER than the image: zero-pad symmetrically (floor pre-pad,
    # remainder post-pad, per torchvision's padding_ltrb), full shape out
    out = center_crop(img, (8, 9))
    assert out.shape == (1, 8, 9)
    np.testing.assert_array_equal(out[:, 1:6, 1:8], img)
    assert out.sum() == img.sum()  # everything else is zero fill
    # mixed: pad width, crop height
    out = center_crop(img, (2, 9))
    assert out.shape == (1, 2, 9)
    np.testing.assert_array_equal(out[:, :, 1:8], img[:, 2:4])
    # None passes through untouched
    assert center_crop(img, None) is img


@pytest.mark.parametrize("version", sorted(MODELS))
def test_onnx_parity_every_architecture(version):
    """Writer + interpreter reproduce the jax forward for EVERY registered
    architecture (incl. the ConvTranspose-bearing convnext head) at the
    reference tolerance."""
    from yogo_tpu.utils.export_model import build_onnx, verify_onnx

    hw = (64, 96) if version == "convnext_small" else (32, 48)
    model = YOGO.create(hw, 0.1, 0.12, 3, model_version=version)
    variables = model.init(jax.random.key(5))
    blob = build_onnx(model, variables, batch_size=2)
    verify_onnx(model, variables, blob, batch_size=2, seed=5)


@pytest.mark.parametrize(
    "version", ["base_model", "depth_ver_2", "convnext_small"]
)
def test_stablehlo_roundtrip_architectures(version, tmp_path):
    """Serialized StableHLO deserializes and reproduces the jax forward for
    structurally distinct architectures (plain stack, deeper stack, the
    ConvTranspose-bearing convnext)."""
    from jax import export as jexport

    from yogo_tpu.utils.export_model import export_stablehlo

    hw = (64, 96) if version == "convnext_small" else (32, 48)
    model = YOGO.create(hw, 0.1, 0.12, 3, model_version=version)
    variables = model.init(jax.random.key(6))
    target = tmp_path / "m.stablehlo"
    export_stablehlo(model, variables, target, batch_size=2)

    exported = jexport.deserialize(target.read_bytes())
    x = np.random.default_rng(6).integers(
        0, 256, (2, model.input_channels, *hw)
    ).astype(np.uint8)
    got = np.asarray(exported.call(x))
    import jax.numpy as jnp

    want = np.asarray(model.apply(variables, jnp.asarray(x), inference=True))
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=1e-6)


def test_onnx_interp_slice_optional_inputs():
    """opset >= 10 Slice has OPTIONAL axes/steps inputs: torch and onnxsim
    emit 3-input Slices after folding, and absent optionals may arrive as
    '' placeholders - both forms must run (previously IndexError)."""
    from yogo_tpu.utils import onnx_proto as op
    from yogo_tpu.utils.onnx_interp import run_model

    x = np.arange(48, dtype=np.float32).reshape(4, 3, 4)
    inits = [
        op.tensor_proto("starts", np.array([1], np.int64)),
        op.tensor_proto("ends", np.array([3], np.int64)),
    ]
    for slice_inputs in (
        ["x", "starts", "ends"],
        ["x", "starts", "ends", "", ""],
    ):
        g = op.graph(
            [op.node("Slice", slice_inputs, ["y"])],
            "t",
            [op.value_info("x", 1, x.shape)],
            [op.value_info("y", 1, (2, 3, 4))],
            inits,
        )
        (out,) = run_model(op.model(g), {"x": x})
        np.testing.assert_array_equal(out, x[1:3])


def test_onnx_attribute_accepts_numpy_floats():
    """attribute() must take np.float32 the same as python float: emit
    paths routinely read scalars straight out of numpy arrays."""
    from yogo_tpu.utils import onnx_proto as op

    a = op.attribute("alpha", np.float32(0.1))
    b = op.attribute("alpha", 0.10000000149011612)  # f32(0.1) as py float
    assert a == b


def test_export_output_paths_keep_dotted_stems(tmp_path):
    """'best.v2.ckpt' must export to 'best.v2.onnx', not 'best.onnx'
    (Path.with_suffix truncates dotted stems, colliding v1/v2 exports)."""
    from types import SimpleNamespace

    from yogo_tpu.utils.export_model import do_export

    model = YOGO.create((48, 64), 0.1, 0.12, 2, model_version="quarter_filters")
    variables = model.init(jax.random.key(0))
    ckpt = tmp_path / "best.v2.ckpt"
    save_checkpoint(ckpt, model, variables, classes=["a", "b"])
    do_export(
        SimpleNamespace(
            input=str(ckpt), crop_height=None, output_filename=None,
            simplify=False, format="onnx",
        )
    )
    assert (tmp_path / "best.v2.onnx").exists()
    assert not (tmp_path / "best.onnx").exists()
    # an explicit filename that already carries the extension is untouched
    do_export(
        SimpleNamespace(
            input=str(ckpt), crop_height=None,
            output_filename=str(tmp_path / "explicit.onnx"),
            simplify=False, format="onnx",
        )
    )
    assert (tmp_path / "explicit.onnx").exists()
    assert not (tmp_path / "explicit.onnx.onnx").exists()


def test_onnx_export_unknown_activation_fails_fast():
    """A conv_stack spec with an activation the emitter lacks must raise
    NotImplementedError, not silently export a graph missing activations
    (which would only surface as an opaque parity-gate mismatch)."""
    import dataclasses

    from yogo_tpu.utils.export_model import _emit_conv_stack

    model = YOGO.create((48, 64), 0.1, 0.12, 2, model_version="quarter_filters")
    variables = model.init(jax.random.key(0))
    defn = model.defn
    blocks = tuple(
        dataclasses.replace(s, act="gelu") if i == 0 else s
        for i, s in enumerate(defn.blocks)
    )
    hacked = dataclasses.replace(defn, blocks=blocks)
    with pytest.raises(NotImplementedError, match="gelu"):
        _emit_conv_stack(
            [], [], "x", hacked,
            variables["params"], variables.get("batch_stats", {}),
        )
