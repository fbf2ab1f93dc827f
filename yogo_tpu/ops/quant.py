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
  - Per-input-channel equalization (smoothquant fold) before per-tensor
    activation quantization - trained stacks concentrate range in a few
    channels (see equalization_vectors).
  - The head conv stays bf16 under the default rule (its noise feeds the
    decode directly; see default_skip_blocks) but quantizes fine when a
    caller passes explicit skip_blocks without it.

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


# per-tensor activation range rule, applied per block AFTER equalization:
#
#     range = p99.5(|h|)  if absmax(|h|) > TAIL_RATIO * p99.5(|h|)
#             absmax(|h|) otherwise
#
# i.e. clip ONLY when the top 0.5% is an outlier regime far above the
# bulk. Both halves are measured (docs/perf-notes.md round 5):
#   - sparse production scenes (trained fullres base_model, product
#     surface): two of three quantized blocks have absmax 3.9x/6.1x their
#     p99.5; absmax scaling there starves the typical range (detection
#     counts [39,42,42,27] vs float [47,54,49,29]) while the conditional
#     clip restores [47,53,49,29].
#   - dense small scenes (trained half_filters, every backbone block
#     quantized): tails are mild (worst ratio 2.3), clipping REAL object
#     activations there flipped 13 classes; absmax keeps matched IoU
#     mean 0.985.
# Selection-by-local-MSE was tried and REJECTED: it picks near-absmax
# (the dense typical range dominates any per-block error norm) yet loses
# ~8 detections/image on sparse scenes - local error anti-correlates
# with end-task accuracy here.
ACT_CLIP_QUANTILE = 99.5
ACT_CLIP_TAIL_RATIO = 3.0


def calibrate_act_scales(
    folded, calib_batches: Iterable[np.ndarray], first_quant_block: int = 1,
    consumed=None, clip_quantile: float | None = None,
) -> np.ndarray:
    """Per-block input activation range over the calibration set ->
    symmetric int8 scales. calib_batches yields NHWC float input batches
    (uint8 images cast to f32, NOT normalized - matching YOGO.apply's
    input handling, models/yogo.py:497-499). Returns scales[i] for blocks
    first_quant_block..N-1 (scale of the activation ENTERING block i).
    `consumed` (optional block-index set) restricts the zero-range check to
    scales the quantized program actually reads - a dead bf16-skipped
    block's zero absmax must not abort quantization.

    clip_quantile=None (default) applies the measured tail-dominance rule
    (see ACT_CLIP_QUANTILE / ACT_CLIP_TAIL_RATIO above): clip to p99.5
    only where absmax exceeds 3x the bulk. A number forces that quantile
    for every block (100.0 = exact absmax). Quantiles are estimated on a
    <=1M-element stride subsample; across batches the chosen range is
    the max (conservative)."""
    n = len(folded)
    absmax = np.zeros(n, np.float64)
    specs_only = [(s, None, None) for s, _, _ in folded]

    def _range_of(h):
        a = jnp.abs(h)
        flat = a.ravel()
        step = max(1, flat.size // 1_000_000)
        v = flat[::step]
        if clip_quantile is None:
            am = jnp.max(v)
            p = jnp.percentile(v, ACT_CLIP_QUANTILE)
            return jnp.where(am > ACT_CLIP_TAIL_RATIO * p, p, am)
        if clip_quantile >= 100.0:
            return jnp.max(a)
        return jnp.percentile(v, clip_quantile)

    # weights/biases are jit ARGUMENTS, not closure constants: closing over
    # them would bake tens of MB of literals into the executable (slow to
    # ship through the remote-compile relay, never cache-hits across calls)
    @jax.jit
    def block_ranges(x, ws, bs):
        ins, _ = _block_inputs_and_output(specs_only, ws, bs, x)
        return jnp.stack([_range_of(h) for h in ins])

    ws = [jnp.asarray(w) for _, w, _ in folded]
    bs = [jnp.asarray(b) for _, _, b in folded]
    seen = 0
    for xb in calib_batches:
        x = jnp.asarray(np.asarray(xb, np.float32))
        absmax = np.maximum(
            absmax, np.asarray(block_ranges(x, ws, bs), np.float64)
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


# activations of trained conv stacks concentrate their range in a few
# channels (measured entering the fullres base_model's block 6: median
# per-channel range 0.45, max 13.1 - a 30x spread that per-tensor int8
# cannot cover; docs/perf-notes.md round 5). Equalization rescales each
# such input channel INTO the adjacent weights - function-preserving, no
# runtime ops - before per-tensor activation quantization.
_HOMOGENEOUS_ACTS = (None, "relu", "leaky_relu")


def equalization_layout(defn, input_channels, skip) -> List[Tuple[int, int]]:
    """[(block_index, cin), ...] for the blocks that receive equalization
    vectors - a pure function of (defn, input_channels, skip), so every
    host derives the identical broadcast payload layout."""
    cins, cin = [], input_channels
    for s in defn.blocks:
        cins.append(cin)
        cin = s.out
    return [
        (i, cins[i])
        for i in range(1, len(defn.blocks))
        if i not in set(skip)
        and defn.blocks[i - 1].act in _HOMOGENEOUS_ACTS
    ]


def equalization_vectors(
    folded, calib_batches: Iterable[np.ndarray], skip,
    clip_quantile: float = 99.9, alpha: float = 0.5,
) -> Dict[int, np.ndarray]:
    """SmoothQuant-style per-input-channel equalization scales for each
    quantized block whose preceding block ends in a positively homogeneous
    activation (leaky_relu/relu/identity - the rescale then commutes):

        s_c = m_act_c^alpha / m_w_c^(1-alpha)

    with m_act_c the per-channel activation range (clip_quantile of |h|)
    entering block i and m_w_c the absmax of W_i's input-channel slice.
    Dividing activation channel c by s_c and multiplying W_i[:, :, c, :]
    (plus the preceding block's output channel c) by it balances the two
    quantization error sources. Returns {block_index: s (cin,)} for the
    blocks where equalization applies."""
    n = len(folded)
    quant_idx = [
        i for i in range(1, n)
        if i not in skip and folded[i - 1][0].act in _HOMOGENEOUS_ACTS
    ]
    if not quant_idx:
        return {}
    specs_only = [(s, None, None) for s, _, _ in folded]

    @jax.jit
    def chan_ranges(x, ws, bs):
        ins, _ = _block_inputs_and_output(specs_only, ws, bs, x)
        out = []
        for i in quant_idx:
            a = jnp.abs(ins[i])
            flat = a.reshape(-1, a.shape[-1])
            step = max(1, flat.shape[0] // 200_000)
            out.append(jnp.percentile(flat[::step], clip_quantile, axis=0))
        return out

    ws = [jnp.asarray(w) for _, w, _ in folded]
    bs = [jnp.asarray(b) for _, _, b in folded]
    m_act: Dict[int, np.ndarray] = {}
    seen = 0
    for xb in calib_batches:
        x = jnp.asarray(np.asarray(xb, np.float32))
        for i, m in zip(quant_idx, chan_ranges(x, ws, bs)):
            cur = np.asarray(m, np.float64)
            m_act[i] = np.maximum(m_act.get(i, 0.0), cur)
        seen += 1
    if seen == 0:
        raise ValueError("calibration requires at least one batch")

    out: Dict[int, np.ndarray] = {}
    for i in quant_idx:
        w_i = folded[i][1]  # HWIO
        m_w = np.max(np.abs(w_i), axis=(0, 1, 3))  # per input channel
        ma = np.maximum(m_act[i], 1e-5)
        mw = np.maximum(m_w, 1e-5)
        s = (ma ** alpha) / (mw ** (1.0 - alpha))
        out[i] = np.clip(s, 1e-4, 1e4).astype(np.float32)
    return out


def apply_equalization(folded, eq: Dict[int, np.ndarray]) -> None:
    """Fold the equalization scales into the weights IN PLACE: for each
    (i, s), divide block i-1's output channels (weights + bias) by s and
    multiply block i's input channels by s. The network function is
    unchanged (the preceding activation is positively homogeneous); the
    activation entering block i shrinks per-channel by s."""
    for i, s in eq.items():
        spec_p, w_p, b_p = folded[i - 1]
        spec_i, w_i, b_i = folded[i]
        folded[i - 1] = (spec_p, w_p / s, b_p / s)
        folded[i] = (spec_i, w_i * s[None, None, :, None], b_i)


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
    pure overhead. Rule: skip block i (>0) iff its input channels < 128.

    The HEAD (last block) also stays bf16 (round 5): its 1x1 conv is ~1%
    of the backbone FLOPs, but its logits feed the decode's exp()/sigmoid
    directly, so int8 noise there turns straight into box error - keeping
    it float tightened trained-net matched-detection IoU from mean 0.911
    (60/178 pairs below 0.9) to 0.961 (4/176) at no measurable
    throughput cost (tests/test_golden_fullres_int8.py)."""
    skip = []
    cin = input_channels
    last = len(defn.blocks) - 1
    for i, s in enumerate(defn.blocks):
        if i > 0 and (cin < 128 or i == last):
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
        # broadcast payload: per-tensor scales + equalization vectors
        n_scales = (len(model.defn.blocks) - 1) + sum(
            c for _, c in equalization_layout(
                model.defn, model.input_channels, skip
            )
        )

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
    act_scales: precomputed calibration payload (the qp["scales"] layout:
    one per-tensor scale per block 1..N-1, then the concatenated
    equalization vectors in equalization_layout order) - skips
    calibration entirely; used by multi-host inference, where process 0
    calibrates and broadcasts so every process assembles an identical
    int8 program.
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
    eq_layout = equalization_layout(model.defn, model.input_channels, skip)
    n_payload = (len(folded) - 1) + sum(c for _, c in eq_layout)
    if act_scales is not None:
        payload = np.asarray(act_scales, np.float32)
        if payload.shape == (n_payload,):
            tensor_scales = payload[: len(folded) - 1]
            eq: Dict[int, np.ndarray] = {}
            off = len(folded) - 1
            for i, c in eq_layout:
                eq[i] = payload[off : off + c]
                off += c
            apply_equalization(folded, eq)
        elif payload.shape == (len(folded) - 1,):
            # legacy payload without equalization vectors (pre-round-5
            # broadcast): valid program, absmax-era accuracy
            tensor_scales = payload
        else:
            raise ValueError(
                f"act_scales must be the calibration payload (shape "
                f"({n_payload},): one scale per block 1..{len(folded) - 1} "
                f"+ equalization vectors); got {payload.shape}"
            )
        if skip != valid and not np.all(tensor_scales[~np.isin(
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
        tensor_scales = payload = np.zeros(len(folded) - 1, np.float32)
    else:
        # two passes over the calibration set: per-channel ranges drive the
        # equalization fold, then per-tensor scales are calibrated on the
        # EQUALIZED stack (materialize once; generators don't rewind)
        nhwc = [to_nhwc_f32(b) for b in calib_batches]
        eq = equalization_vectors(folded, nhwc, skip)
        apply_equalization(folded, eq)
        tensor_scales = calibrate_act_scales(
            folded, nhwc,
            first_quant_block=1,
            consumed=set(range(1, len(folded))) - set(skip),
        )
        # broadcastable payload: per-tensor scales first (the runtime
        # indexes only these), equalization vectors appended
        payload = np.concatenate(
            [np.asarray(tensor_scales, np.float32)]
            + [eq[i] for i, _ in eq_layout]
        ) if eq_layout else np.asarray(tensor_scales, np.float32)

    spec0, w0, b0 = folded[0]
    qp: Dict[str, Any] = {
        "stem_w": jnp.asarray(w0, jnp.bfloat16),
        "stem_b": jnp.asarray(b0, jnp.float32),
        "blocks": [],
        # calibration payload: input scale of each quantized block (the
        # f32 scalars the forward reads as scales[j]), then the folded
        # equalization vectors (broadcast-only tail; see act_scales doc)
        "scales": jnp.asarray(payload, jnp.float32),
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
                "deq": jnp.asarray(tensor_scales[i - 1] * sw, jnp.float32),
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
