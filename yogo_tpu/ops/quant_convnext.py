"""Post-training int8 quantization for the convnext family.

No reference analogue (czbiohub-sf/yogo runs ConvNeXt through timm in
f32/f16, yogo/model_defns.py:533-558); like ops/quant.py this is a
beyond-parity serving feature. ConvNeXt's FLOPs live almost entirely in
the pointwise Dense layers of each block (dim -> 4*dim -> dim, up to
768 -> 3072) and the stage downsample convs - exactly the big matmuls
the v5e MXU runs at 2x rate in s8 x s8 -> s32. Everything that is NOT a
wide matmul stays float:

  - the 7x7 depthwise convs (one tap-channel per group: no MXU
    contraction to speed up - they are VPU/HBM bound) run bf16,
  - LayerNorms and the GELU run f32 (XLA fuses the requant round/clip
    chain into them),
  - the patchify stem (C_in = 1 or 3), the 1x1 format head (C_out =
    5+C) and the stride-4 transpose upsample run bf16,
  - the residual stream carries `intermediate_dtype` between blocks.

Scheme (same symmetric PTQ as ops/quant.py):
  - Weights: per-output-channel symmetric int8 (quant.quantize_weights).
  - Activations: per-tensor symmetric int8, scale = absmax/127 from
    calibration batches, measured on the f32 functional forward at the
    exact tensor entering each quantized matmul.
  - Site rule: quantize a matmul iff its input width >= MIN_CIN (128) -
    the same measured payoff rule as ops/quant.py:default_skip_blocks
    (narrow contractions lose to the requant overhead on v5e). For
    convnext_small this keeps stage0's pwconv1 (cin=96) and the
    stage0->1 downsample (cin=96) in bf16 and quantizes the other 71
    matmuls.

There is no BatchNorm to fold: LayerNorm normalizes the activation
itself, so it cannot be folded into the preceding conv; it stays a
float op between int8 matmuls.

The quantized forward mirrors YOGO.apply(train=False, inference=...)
for the convnext family: same functional LayerNorm/GELU/residual math
as models/yogo.py:ConvNeXtBlock/ConvNeXtSmall, same decode
(models/yogo.py:decode_predictions), same (B, 5+C, Sy, Sx) output.
tests/test_quant_convnext.py pins the float functional twin against
module.apply and bounds the int8 error.
"""

from __future__ import annotations

from typing import Any, Dict, Iterable, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from yogo_tpu.ops.quant import quantize_weights

Array = jax.Array

_DN = ("NHWC", "HWIO", "NHWC")
_LN_EPS = 1e-6

# ConvNeXt-Small trunk shape (models/yogo.py:ConvNeXtSmall defaults)
DEPTHS = (3, 3, 27, 3)
DIMS = (96, 192, 384, 768)

# minimum matmul input width for int8 to pay on the v5e MXU; same rule,
# same measured basis as ops/quant.py:default_skip_blocks
MIN_CIN = 128


def quant_sites(
    depths: Tuple[int, ...] = DEPTHS,
    dims: Tuple[int, ...] = DIMS,
    min_cin: int = MIN_CIN,
) -> List[Tuple[str, int]]:
    """Ordered (site key, input width) for every int8 matmul, in forward
    order. The calibration taps, the scales vector, and the quantized
    forward all index sites by position in THIS list, so it is the single
    source of truth for what gets quantized."""
    sites: List[Tuple[str, int]] = []
    for s, (depth, dim) in enumerate(zip(depths, dims)):
        if s > 0:
            sites.append((f"down{s}_conv", dims[s - 1]))
        for b in range(depth):
            sites.append((f"stage{s}_block{b}/pwconv1", dim))
            sites.append((f"stage{s}_block{b}/pwconv2", 4 * dim))
    return [(k, c) for k, c in sites if c >= min_cin]


def _layer_norm(x: Array, scale, bias) -> Array:
    """f32 LayerNorm over the channel axis; flax's fast-variance formula
    (nn.LayerNorm with use_fast_variance=True, the module default)."""
    x = x.astype(jnp.float32)
    mean = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x), axis=-1, keepdims=True) - jnp.square(mean)
    y = (x - mean) * jax.lax.rsqrt(var + _LN_EPS)
    return y * jnp.asarray(scale, jnp.float32) + jnp.asarray(bias, jnp.float32)


def _forward(params: Dict[str, Any], x: Array, site, *, compute_dtype, res_dtype):
    """Functional twin of models/yogo.py:ConvNeXtSmall.__call__ (inference),
    with every int8-eligible matmul routed through `site`.

    site(key, h, kernel, bias, stride) -> f32 output; `stride` is None for
    a Dense (contraction over the last axis) and an int for a 2x2 VALID
    downsample conv. Float parts run in `compute_dtype`; the residual
    stream carries `res_dtype` between blocks.
    """

    def cast(w):
        return jnp.asarray(w, compute_dtype)

    p = params
    h = jax.lax.conv_general_dilated(
        x.astype(compute_dtype),
        cast(p["stem_conv"]["kernel"]),
        (4, 4),
        [(0, 0), (0, 0)],
        dimension_numbers=_DN,
        preferred_element_type=jnp.float32,
    ) + jnp.asarray(p["stem_conv"]["bias"], jnp.float32)
    h = _layer_norm(h, p["stem_norm"]["scale"], p["stem_norm"]["bias"])
    h = h.astype(res_dtype)

    for s, (depth, dim) in enumerate(zip(DEPTHS, DIMS)):
        if s > 0:
            n = p[f"down{s}_norm"]
            h = _layer_norm(h, n["scale"], n["bias"])
            c = p[f"down{s}_conv"]
            h = site(f"down{s}_conv", h, c["kernel"], c["bias"], 2)
            h = h.astype(res_dtype)
        for b in range(depth):
            blk = p[f"stage{s}_block{b}"]
            inp = h
            h = jax.lax.conv_general_dilated(
                h.astype(compute_dtype),
                cast(blk["dwconv"]["kernel"]),
                (1, 1),
                [(3, 3), (3, 3)],
                dimension_numbers=_DN,
                feature_group_count=dim,
                preferred_element_type=jnp.float32,
            ) + jnp.asarray(blk["dwconv"]["bias"], jnp.float32)
            h = _layer_norm(h, blk["norm"]["scale"], blk["norm"]["bias"])
            h = site(
                f"stage{s}_block{b}/pwconv1",
                h,
                blk["pwconv1"]["kernel"],
                blk["pwconv1"]["bias"],
                None,
            )
            h = jax.nn.gelu(h, approximate=False)
            h = site(
                f"stage{s}_block{b}/pwconv2",
                h,
                blk["pwconv2"]["kernel"],
                blk["pwconv2"]["bias"],
                None,
            )
            h = (
                inp.astype(jnp.float32)
                + jnp.asarray(blk["gamma"], jnp.float32) * h
            ).astype(res_dtype)

    # format head: 1x1 conv to 5+C, then stride-4 transpose upsample
    h = jax.lax.conv_general_dilated(
        h.astype(compute_dtype),
        cast(p["format_conv"]["kernel"]),
        (1, 1),
        [(0, 0), (0, 0)],
        dimension_numbers=_DN,
        preferred_element_type=jnp.float32,
    ) + jnp.asarray(p["format_conv"]["bias"], jnp.float32)
    h = jax.lax.conv_transpose(
        h.astype(compute_dtype),
        cast(p["format_up"]["kernel"]),
        (4, 4),
        "VALID",
        dimension_numbers=_DN,
        transpose_kernel=False,
        preferred_element_type=jnp.float32,
    ) + jnp.asarray(p["format_up"]["bias"], jnp.float32)
    return h


def _float_site(compute_dtype):
    """site() that runs the matmul in float (the functional reference)."""

    def site(key, h, kernel, bias, stride):
        h = h.astype(compute_dtype)
        w = jnp.asarray(kernel, compute_dtype)
        if stride is None:
            out = jax.lax.dot_general(
                h,
                w,
                (((h.ndim - 1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
        else:
            out = jax.lax.conv_general_dilated(
                h,
                w,
                (stride, stride),
                [(0, 0), (0, 0)],
                dimension_numbers=_DN,
                preferred_element_type=jnp.float32,
            )
        return out + jnp.asarray(bias, jnp.float32)

    return site


def float_forward(params: Dict[str, Any], x_f32: Array) -> Array:
    """f32 functional forward (the reference the calibration scales
    describe); pinned against module.apply in tests."""
    return _forward(
        params,
        x_f32,
        _float_site(jnp.float32),
        compute_dtype=jnp.float32,
        res_dtype=jnp.float32,
    )


def calibrate_act_scales(
    params: Dict[str, Any],
    calib_batches: Iterable[np.ndarray],
    min_cin: int = MIN_CIN,
) -> np.ndarray:
    """Per-site input absmax over the calibration set -> symmetric int8
    scales, one per quant_sites() entry (forward order). calib_batches
    yields NHWC float batches (uint8 images cast to f32, NOT normalized -
    matching YOGO.apply's input handling)."""
    sites = quant_sites(min_cin=min_cin)
    keys = [k for k, _ in sites]
    if not keys:  # degenerate min_cin: nothing to calibrate
        return np.zeros(0, np.float32)
    float_site = _float_site(jnp.float32)

    # weights as jit ARGUMENTS, not closure constants (ops/quant.py:153
    # rationale: closed-over literals never cache-hit and ship tens of MB
    # through the remote-compile relay)
    @jax.jit
    def site_maxes(x, p):
        taps: Dict[str, Array] = {}

        def site(key, h, kernel, bias, stride):
            if key in taps:
                raise ValueError(f"duplicate site {key}")
            taps[key] = jnp.max(jnp.abs(h.astype(jnp.float32)))
            return float_site(key, h, kernel, bias, stride)

        _forward(p, x, site, compute_dtype=jnp.float32, res_dtype=jnp.float32)
        return jnp.stack([taps[k] for k in keys])

    absmax = np.zeros(len(keys), np.float64)
    seen = 0
    for xb in calib_batches:
        x = jnp.asarray(np.asarray(xb, np.float32))
        absmax = np.maximum(absmax, np.asarray(site_maxes(x, params), np.float64))
        seen += 1
    if seen == 0:
        raise ValueError("calibration requires at least one batch")
    if not np.all(absmax > 0):
        dead = [keys[i] for i in np.nonzero(absmax == 0)[0]]
        raise ValueError(f"calibration produced a zero activation range: {dead}")
    return (absmax / 127.0).astype(np.float32)


def _tree_has(params: Dict[str, Any], key: str) -> bool:
    """True when the '/'-joined path resolves to a node with a kernel."""
    from collections.abc import Mapping

    node: Any = params
    for part in key.split("/"):
        if not isinstance(node, Mapping) or part not in node:
            return False
        node = node[part]
    return isinstance(node, Mapping) and "kernel" in node


def _quantize_site_weights(kernel: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    """Per-output-channel int8 for a site kernel: Dense (cin, cout) or conv
    HWIO; both reduce over everything but the last axis (reuses
    quant.quantize_weights via an HWIO view)."""
    w = np.asarray(kernel, np.float32)
    hwio = w[None, None] if w.ndim == 2 else w
    q, sw = quantize_weights(hwio)
    return q.reshape(w.shape), sw


def quantize_convnext(
    model,
    variables: Dict[str, Any],
    calib_batches: Iterable[Any],
    act_scales=None,
    min_cin: int = MIN_CIN,
) -> Dict[str, Any]:
    """Build the int8 parameter pytree for `quantized_convnext_forward`.

    model: a models.yogo.YOGO config with defn.family == "convnext";
    variables: its flax variables; calib_batches: iterable of input batches
    (any layout YOGO.apply takes). act_scales: precomputed per-site scales
    (the qp["scales"] layout, one per quant_sites() entry) - skips
    calibration; used by multi-host inference where process 0 calibrates
    and broadcasts (infer.py). Returns a plain-dict pytree: float parts in
    bf16 weights / f32 norm+bias tensors, int8 sites as
    {"w8", "deq" (= s_in * s_w[c]), "b"}.
    """
    if model.defn.family != "convnext":
        raise NotImplementedError(
            "quantize_convnext supports the convnext family only "
            f"(got {model.defn.family}); use quantize_conv_stack"
        )
    params = variables["params"]
    sites = quant_sites(min_cin=min_cin)
    keys = [k for k, _ in sites]

    # the functional twin hardcodes ConvNeXt-Small geometry (DEPTHS/DIMS):
    # a hypothetical second convnext variant would pass the family gate but
    # mis-walk the param tree - fail loudly here instead of deep in _lookup
    missing = [k for k in keys if not _tree_has(params, k)]
    if missing:
        raise NotImplementedError(
            "quantize_convnext is pinned to the ConvNeXt-Small geometry "
            f"(DEPTHS={DEPTHS}, DIMS={DIMS}); this model's params lack "
            f"site(s) {missing[:3]}{'...' if len(missing) > 3 else ''}"
        )

    if act_scales is not None:
        scales = np.asarray(act_scales, np.float32)
        if scales.shape != (len(keys),):
            raise ValueError(
                f"act_scales must have one entry per quantized site "
                f"(shape ({len(keys)},)); got {scales.shape}"
            )
        if not np.all(scales > 0):
            raise ValueError("act_scales has a zero scale for a quantized site")
    else:
        from yogo_tpu.ops.quant import to_nhwc_f32

        scales = calibrate_act_scales(
            params, (to_nhwc_f32(b) for b in calib_batches), min_cin=min_cin
        )

    def _lookup(key):
        node = params
        for part in key.split("/"):
            node = node[part]
        return node

    int8: Dict[str, Dict[str, Array]] = {}
    for i, key in enumerate(keys):
        leaf = _lookup(key)
        q, sw = _quantize_site_weights(leaf["kernel"])
        int8[key] = {
            "w8": jnp.asarray(q),
            "deq": jnp.asarray(scales[i] * sw, jnp.float32),
            "b": jnp.asarray(np.asarray(leaf["bias"], np.float32)),
        }

    # float remainder: bf16 kernels, f32 biases/norm/gamma; int8 site
    # kernels excluded (their weights live only in `int8`)
    def cast_float(path_key, node):
        out = {}
        for name, leaf in node.items():
            if isinstance(leaf, dict):
                child = f"{path_key}/{name}" if path_key else name
                if child in int8:
                    continue
                out[name] = cast_float(child, leaf)
            elif name == "kernel":
                out[name] = jnp.asarray(leaf, jnp.bfloat16)
            else:
                out[name] = jnp.asarray(np.asarray(leaf, np.float32))
        return out

    # NOTE: qp holds array leaves only (no static metadata), so it survives
    # device_put/replicate_to_mesh tree transforms; the forward recovers the
    # site order statically from quant_sites() + int8 membership
    return {
        "float": cast_float("", params),
        "int8": int8,
        "scales": jnp.asarray(scales, jnp.float32),
    }


def quantized_convnext_forward(
    model,
    qp: Dict[str, Any],
    x: Array,
    *,
    inference: bool = True,
    intermediate_dtype: Any = jnp.float32,
    decode: bool = True,
):
    """Int8 inference forward: raw input -> decoded (B, 5+C, Sy, Sx).

    Matches YOGO.apply(train=False, inference=inference) for convnext
    models, with the wide pointwise/downsample matmuls in s8 x s8 -> s32.
    Jittable; `model` and the site set are static. intermediate_dtype is
    the residual-stream dtype between blocks (bf16 halves its HBM
    traffic). decode=False returns the undecoded NHWC head logits (f32),
    the format_preds_batched_raw input contract."""
    int8 = qp["int8"]
    # forward-order index of each quantized site into qp["scales"]: the
    # full site enumeration is static, membership says which were kept
    # (works for any min_cin the qp was built with)
    keys = [k for k, _ in quant_sites(min_cin=0) if k in int8]
    if len(keys) != len(int8):
        raise ValueError("qp['int8'] has keys outside the known site set")
    idx = {k: i for i, k in enumerate(keys)}
    scales = qp["scales"]
    bf16_site = _float_site(jnp.bfloat16)

    x = model._to_nhwc(x)
    if not jnp.issubdtype(x.dtype, jnp.floating):
        x = x.astype(jnp.float32)

    def site(key, h, kernel, bias, stride):
        if key not in int8:
            return bf16_site(key, h, kernel, bias, stride)
        blk = int8[key]
        q = jnp.clip(
            jnp.round(h.astype(jnp.float32) / scales[idx[key]]), -127, 127
        ).astype(jnp.int8)
        if stride is None:
            acc = jax.lax.dot_general(
                q,
                blk["w8"],
                (((q.ndim - 1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32,
            )
        else:
            acc = jax.lax.conv_general_dilated(
                q,
                blk["w8"],
                (stride, stride),
                [(0, 0), (0, 0)],
                dimension_numbers=_DN,
                preferred_element_type=jnp.int32,
            )
        return acc.astype(jnp.float32) * blk["deq"] + blk["b"]

    # merge the int8 biases back for _forward's float-part traversal: the
    # site callback receives kernel/bias positionally from the float tree,
    # so int8 sites pass placeholders it never reads
    class _Missing(dict):
        def __missing__(self, k):
            return _MISSING_LEAF

    def with_placeholders(node, path_key=""):
        out = _Missing()
        for name, leaf in node.items():
            child = f"{path_key}/{name}" if path_key else name
            out[name] = (
                with_placeholders(leaf, child) if isinstance(leaf, dict) else leaf
            )
        return out

    raw = _forward(
        with_placeholders(qp["float"]),
        x,
        site,
        compute_dtype=jnp.bfloat16,
        res_dtype=intermediate_dtype,
    )
    raw = raw.astype(jnp.float32)
    if not decode:
        return raw
    return model._decode_raw(raw, inference)


# placeholder leaf for int8-site kernels/biases removed from the float
# tree; the quant site() never touches its positional kernel/bias args
_MISSING_LEAF = {"kernel": None, "bias": None}
