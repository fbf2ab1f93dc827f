"""Post-training int8 quantization for conv-stack models.

No reference analogue (czbiohub-sf/yogo is f32/f16 only); this is a
beyond-parity serving feature: the v5e MXU runs s8 x s8 -> s32 matmuls at
2x its bf16 rate, so the MXU-bound middle blocks of the backbone (b3..b6
of base_model carry ~60% of forward time, docs/perf-notes.md) can run in
int8 with f32 dequant/requant glue that XLA fuses into the convs.

Scheme (standard symmetric PTQ):
  - BatchNorm folded into conv weight/bias first (same fold math as the
    ONNX exporter, utils/export_model.py:_folded_conv_params).
  - Weights: per-output-channel symmetric int8, scale_w[c] = absmax_c/127.
  - Activations: per-tensor symmetric int8, scale from calibration
    (absmax of the f32 folded-forward activation entering each block,
    over user-supplied calibration batches).
  - Block 0 stays in bf16: its C_in is 1 (grayscale), it is HBM/layout
    bound, and the MXU gains nothing there. The decoded head output is
    f32 as in the float path.
  - Head conv (1x1, no activation) runs int8 with f32 dequant, no requant.

The quantized forward mirrors YOGO.apply(inference=...) semantics for the
conv_stack family: same decode (models/yogo.py:decode_predictions), same
output layout (B, 5+C, Sy, Sx). Dropout is inference-off; silu/leaky act
runs in f32 between dequant and requant (XLA fuses the chain).
"""

from __future__ import annotations

import warnings
from typing import Any, Dict, Iterable, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from yogo_tpu.models.defns import ConvSpec
from yogo_tpu.models.yogo import _activation

Array = jax.Array

_DN = ("NHWC", "HWIO", "NHWC")

# conv_stack activations this path is validated for; anything else (e.g.
# convnext's gelu) must fail loudly rather than silently diverge
_SUPPORTED_ACTS = (None, "leaky_relu", "silu")


def _act_fn(name):
    if name not in _SUPPORTED_ACTS:
        raise NotImplementedError(
            f"quantized path: unsupported activation {name}"
        )
    # same callable the float path uses (models/yogo.py:_activation), so
    # the two paths cannot drift
    return _activation(name)


def fold_block_params(
    conv: Dict[str, Any], bn_params, bn_stats, eps: float = 1e-5
) -> Tuple[np.ndarray, np.ndarray]:
    """HWIO kernel + optional BN -> HWIO weight and per-channel bias with BN
    folded (the NHWC twin of export_model._folded_conv_params, which emits
    OIHW for ONNX). The fold depends only on the tensors, not the ConvSpec."""
    w = np.asarray(conv["kernel"], np.float32)
    b = (
        np.asarray(conv["bias"], np.float32)
        if "bias" in conv
        else np.zeros(w.shape[-1], np.float32)
    )
    if bn_params is not None:
        scale = np.asarray(bn_params["scale"], np.float32)
        beta = np.asarray(bn_params["bias"], np.float32)
        mean = np.asarray(bn_stats["mean"], np.float32)
        var = np.asarray(bn_stats["var"], np.float32)
        k = scale / np.sqrt(var + eps)
        w = w * k[None, None, None, :]
        b = (b - mean) * k + beta
    return w, b


def fold_conv_stack(defn, variables) -> List[Tuple[ConvSpec, np.ndarray, np.ndarray]]:
    """All blocks of a conv_stack model as (spec, folded HWIO w, bias)."""
    if defn.family != "conv_stack":
        raise NotImplementedError(
            "int8 quantization via quantize_conv_stack supports the "
            f"conv_stack family only (got {defn.family}); for convnext "
            "use ops.quant_convnext.quantize_convnext"
        )
    params = variables["params"]
    stats = variables.get("batch_stats", {})
    out = []
    for i, s in enumerate(defn.blocks):
        if s.transpose:
            raise NotImplementedError("transpose conv in conv_stack defn")
        w, b = fold_block_params(
            params[f"conv{i}"], params.get(f"bn{i}"), stats.get(f"bn{i}")
        )
        out.append((s, w, b))
    return out


def to_nhwc_f32(xb) -> np.ndarray:
    """Calibration batch (NCHW, uint8 or float, optionally unbatched or
    single-channel-squeezed) -> NHWC f32, the layout the quantized forward
    consumes. Shared by both quant families (quant_convnext imports it)."""
    x = np.asarray(xb)
    if x.ndim == 2:
        x = x[None, None]
    elif x.ndim == 3:
        x = x[None]
    return np.transpose(x, (0, 2, 3, 1)).astype(np.float32)


def _conv(x, w, spec: ConvSpec, preferred):
    p = [(spec.padding, spec.padding), (spec.padding, spec.padding)]
    return jax.lax.conv_general_dilated(
        x,
        w,
        (spec.stride, spec.stride),
        p,
        dimension_numbers=_DN,
        preferred_element_type=preferred,
    )


def _block_inputs_and_output(folded, weights, biases, x: Array):
    """One f32 forward through the folded stack; returns (per-block input
    activations, final output). The single fold-forward loop that both
    folded_float_forward and calibrate_act_scales run (so the two cannot
    drift); under jit XLA reduces the unused activations away."""
    ins = []
    h = x
    for (spec, _, _), w, b in zip(folded, weights, biases):
        ins.append(h)
        h = _act_fn(spec.act)(_conv(h, w, spec, jnp.float32) + b)
    return ins, h


def folded_float_forward(folded, x_f32: Array, upto: int | None = None) -> Array:
    """f32 forward through the folded stack (the dequantized reference the
    calibration scales describe). `upto` stops BEFORE block `upto` and
    returns its input activation (this entry point is eager, so only the
    prefix actually runs)."""
    subset = folded if upto is None else folded[:upto]
    ws = [jnp.asarray(w) for _, w, _ in subset]
    bs = [jnp.asarray(b) for _, _, b in subset]
    _, out = _block_inputs_and_output(subset, ws, bs, x_f32)
    return out


def calibrate_act_scales(
    folded, calib_batches: Iterable[np.ndarray], first_quant_block: int = 1,
    consumed=None,
) -> np.ndarray:
    """Per-block input absmax over the calibration set -> symmetric int8
    scales. calib_batches yields NHWC float input batches (uint8 images cast
    to f32, NOT normalized - matching YOGO.apply's input handling,
    models/yogo.py:497-499). Returns scales[i] for blocks
    first_quant_block..N-1 (scale of the activation ENTERING block i).
    `consumed` (optional block-index set) restricts the zero-range check to
    scales the quantized program actually reads - a dead bf16-skipped
    block's zero absmax must not abort quantization."""
    n = len(folded)
    absmax = np.zeros(n, np.float64)
    specs_only = [(s, None, None) for s, _, _ in folded]

    # weights/biases are jit ARGUMENTS, not closure constants: closing over
    # them would bake tens of MB of literals into the executable (slow to
    # ship through the remote-compile relay, never cache-hits across calls)
    @jax.jit
    def block_maxes(x, ws, bs):
        ins, _ = _block_inputs_and_output(specs_only, ws, bs, x)
        return jnp.stack([jnp.max(jnp.abs(h)) for h in ins])

    ws = [jnp.asarray(w) for _, w, _ in folded]
    bs = [jnp.asarray(b) for _, _, b in folded]
    seen = 0
    for xb in calib_batches:
        x = jnp.asarray(np.asarray(xb, np.float32))
        absmax = np.maximum(
            absmax, np.asarray(block_maxes(x, ws, bs), np.float64)
        )
        seen += 1
    if seen == 0:
        raise ValueError("calibration requires at least one batch")
    bad = [
        i
        for i in range(first_quant_block, n)
        if (consumed is None or i in consumed) and absmax[i] <= 0
    ]
    if bad:
        raise ValueError(
            f"calibration produced a zero activation range entering "
            f"quantized block(s) {bad}"
        )
    return (absmax[first_quant_block:] / 127.0).astype(np.float32)


def quantize_weights(w: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    """HWIO f32 -> (int8 HWIO, per-out-channel scale). Symmetric, round-to-
    nearest-even (matches jnp.round on device)."""
    absmax = np.max(np.abs(w), axis=(0, 1, 2))
    sw = np.where(absmax > 0, absmax / 127.0, 1.0).astype(np.float32)
    q = np.clip(np.round(w / sw[None, None, None, :]), -127, 127).astype(np.int8)
    return q, sw


def default_skip_blocks(defn, input_channels: int = 1) -> Tuple[int, ...]:
    """Blocks kept in bf16 by default: int8 pays only where the conv is
    MXU-bound with wide input channels. Measured on v5e (tools/
    perf_quant_forward.py, base_model 772x1032 bs=512): quantizing every
    block = 5,815 img/s but skipping the cin<128 blocks = 6,429 img/s
    (vs 5,161 bf16) - the 64->128 block runs SLOWER in int8 standalone
    and the early low-channel blocks are HBM-bound, so requant there is
    pure overhead. Rule: skip block i (>0) iff its input channels < 128."""
    skip = []
    cin = input_channels
    for i, s in enumerate(defn.blocks):
        if i > 0 and cin < 128:
            skip.append(i)
        cin = s.out
    return tuple(skip)


def family_quant_forward(model):
    """The quantized-forward function for this model's family - signature
    `fwd(model, qp, x, *, inference=True, ...)` for both families."""
    if model.defn.family == "convnext":
        from yogo_tpu.ops.quant_convnext import quantized_convnext_forward

        return quantized_convnext_forward
    return quantized_forward


def family_quant_plan(model, variables):
    """The ONE place the int8 family dispatch lives - shared by
    `yogo infer --quantize`, `yogo serve --quantize`, and
    `yogo test --quantize` so the three entry points provably run the
    same program. Returns (build_qp, fwd_quant, n_scales, all_skip):

      build_qp(calib_batches, act_scales=None) -> qp pytree
      fwd_quant(model, qp, x, *, inference=True, ...) -> decoded preds
      n_scales: length of qp["scales"] (the multi-host broadcast layout)
      all_skip: True iff the program contains no int8 convs (conv stacks
          whose every block is below the int8 payoff width - calibration
          can be skipped entirely)

    Raises ValueError for a family with no int8 path.
    """
    if model.defn.family == "convnext":
        from yogo_tpu.ops.quant_convnext import quant_sites, quantize_convnext

        def build_qp(calib_batches, act_scales=None):
            return quantize_convnext(
                model, variables, calib_batches, act_scales=act_scales
            )

        # convnext always has wide matmuls to quantize
        return build_qp, family_quant_forward(model), len(quant_sites()), False
    if model.defn.family == "conv_stack":
        skip = default_skip_blocks(model.defn, model.input_channels)
        n_scales = len(model.defn.blocks) - 1

        def build_qp(calib_batches, act_scales=None):
            return quantize_conv_stack(
                model,
                variables,
                calib_batches,
                skip_blocks=skip,
                act_scales=act_scales,
            )

        return build_qp, quantized_forward, n_scales, len(skip) == n_scales
    raise ValueError(
        "--quantize supports conv-stack and convnext models only "
        f"(got {model.defn.family})"
    )


def quantize_conv_stack(
    model,
    variables,
    calib_batches: Iterable[Any],
    skip_blocks: Iterable[int] = (),
    act_scales=None,
) -> Dict[str, Any]:
    """Build the int8 parameter pytree for `quantized_forward`.

    model: a models.yogo.YOGO config; variables: its flax variables;
    calib_batches: iterable of input batches (any layout YOGO.apply takes;
    converted to NHWC f32 here). skip_blocks: defn block indices to keep in
    bf16 (int8 only pays on the MXU-bound shapes - tools/perf_int8_conv.py
    measured the 64->128 block SLOWER in int8 on v5e while the 128->128
    blocks run ~1.25x faster, so callers can pick per-block).
    act_scales: precomputed per-block activation scales (the qp["scales"]
    layout: one entry per block 1..N-1) - skips calibration entirely; used
    by multi-host inference, where process 0 calibrates and broadcasts so
    every process assembles an identical int8 program.
    Returns a plain-dict pytree (jit/device_put friendly).
    """
    skip = set(skip_blocks)
    if 0 in skip:
        raise ValueError("block 0 always runs bf16; skip_blocks indexes 1..N-1")
    folded = fold_conv_stack(model.defn, variables)
    valid = set(range(1, len(folded)))
    if not skip <= valid:
        raise ValueError(
            f"skip_blocks {sorted(skip - valid)} out of range; this "
            f"{len(folded)}-block model indexes 1..{len(folded) - 1}"
        )
    if act_scales is not None:
        scales = np.asarray(act_scales, np.float32)
        if scales.shape != (len(folded) - 1,):
            raise ValueError(
                f"act_scales must have one entry per block 1..{len(folded) - 1} "
                f"(shape ({len(folded) - 1},)); got {scales.shape}"
            )
        if skip != valid and not np.all(scales[~np.isin(
            np.arange(1, len(folded)), sorted(skip)
        )] > 0):
            raise ValueError("act_scales has a zero scale for a quantized block")
    elif skip == valid:
        # e.g. half/quarter_filters under the default cin>=128 rule: the
        # program is the BN-folded bf16 stack with NO int8 convs - valid,
        # but the caller should know "--quantize" is not serving int8 here.
        # No activation scale is ever consumed, so skip the calibration
        # forward entirely (it would burn a full f32 pass over the calib
        # batches and could spuriously raise on a zero activation range);
        # keep the scales layout identical to the calibrated path (one
        # entry per block 1..N-1, consumed as scales[i-1] for block i)
        warnings.warn(
            "every block is skipped (all input channels below the int8 "
            "payoff width): the quantized program contains no int8 convs "
            "and serves the BN-folded bf16 stack"
        )
        scales = np.zeros(len(folded) - 1, np.float32)
    else:
        scales = calibrate_act_scales(
            folded, (to_nhwc_f32(b) for b in calib_batches),
            first_quant_block=1,
            consumed=set(range(1, len(folded))) - set(skip),
        )

    spec0, w0, b0 = folded[0]
    qp: Dict[str, Any] = {
        "stem_w": jnp.asarray(w0, jnp.bfloat16),
        "stem_b": jnp.asarray(b0, jnp.float32),
        "blocks": [],
        # input scale of each quantized block, f32 scalar
        "scales": jnp.asarray(scales, jnp.float32),
    }
    for i in range(1, len(folded)):
        spec, w, b = folded[i]
        if i in skip:
            qp["blocks"].append(
                {"w": jnp.asarray(w, jnp.bfloat16), "b": jnp.asarray(b, jnp.float32)}
            )
            continue
        q, sw = quantize_weights(w)
        qp["blocks"].append(
            {
                # dequant factor: s_in * s_w[c]; bias stays separate so the
                # int32 accum dequantizes in one fused multiply-add
                "w8": jnp.asarray(q),
                "deq": jnp.asarray(scales[i - 1] * sw, jnp.float32),
                "b": jnp.asarray(b, jnp.float32),
            }
        )
    return qp


def quantized_forward(
    model,
    qp: Dict[str, Any],
    x: Array,
    *,
    inference: bool = True,
    intermediate_dtype: Any = jnp.float32,
    decode: bool = True,
):
    """Int8 inference forward: raw input -> decoded (B, 5+C, Sy, Sx).

    Matches YOGO.apply(train=False, inference=inference) for conv_stack
    models, with blocks 1..N-1 in s8 x s8 -> s32. Jittable; `model` and the
    block specs are static. intermediate_dtype is the dequantized
    activation dtype between blocks (bf16 halves the HBM traffic of the
    requant chain; the int8 rounding noise dominates either way).
    decode=False returns the undecoded NHWC head logits (f32), the
    format_preds_batched_raw input contract (same as YOGO.apply).
    """
    specs = model.defn.blocks
    x = model._to_nhwc(x)
    if not jnp.issubdtype(x.dtype, jnp.floating):
        x = x.astype(jnp.float32)

    # block 0 in bf16 (HBM-bound; C_in=1 gets no MXU benefit from int8)
    h = _conv(
        x.astype(jnp.bfloat16), qp["stem_w"], specs[0], jnp.float32
    ) + qp["stem_b"]
    h = _act_fn(specs[0].act)(h)

    scales = qp["scales"]
    for j, blk in enumerate(qp["blocks"]):
        spec = specs[1 + j]
        # the LAST block's output is the head logits the decode consumes:
        # keep it f32 regardless of intermediate_dtype (the knob trades
        # inter-block HBM traffic, which the final output has none of;
        # bf16 head logits would cost ~2 decimal digits of box precision)
        out_dtype = (
            jnp.float32 if j == len(qp["blocks"]) - 1 else intermediate_dtype
        )
        if "w8" not in blk:  # bf16 fallback block (skip_blocks)
            h = _conv(
                h.astype(jnp.bfloat16), blk["w"], spec, jnp.float32
            ) + blk["b"]
            h = _act_fn(spec.act)(h).astype(out_dtype)
            continue
        q = jnp.clip(
            jnp.round(h.astype(jnp.float32) / scales[j]), -127, 127
        ).astype(jnp.int8)
        acc = _conv(q, blk["w8"], spec, jnp.int32)
        h = acc.astype(jnp.float32) * blk["deq"] + blk["b"]
        h = _act_fn(spec.act)(h).astype(out_dtype)

    if not decode:
        return h
    return model._decode_raw(h, inference)
