"""TPU-native YOGO model.

Functional re-design of the reference model wrapper (reference:
yogo/model.py:13-313):
  - backbone: a single spec-driven flax module (NHWC layout - TPU's native
    conv layout - instead of torch's NCHW),
  - decode head: pure-jnp YOLO9000 "direct location prediction"
    (reference: yogo/model.py:267-313),
  - config (img size, anchors, multipliers, grid) lives in a frozen dataclass
    rather than torch buffers; checkpoints carry it as metadata.

The public prediction tensor keeps the reference layout (B, 5+C, Sy, Sx) with
channels [xc, yc, w, h, objectness, *classes], all in [0,1] image coords.
"""

from __future__ import annotations

from functools import partial
import dataclasses
from dataclasses import dataclass
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn
from jax.ad_checkpoint import checkpoint_name

from yogo_tpu.models.defns import ConvSpec, ModelDefn, get_model_defn
from yogo_tpu.ops.grid import WH_CLAMP, cell_offsets, grid_size  # noqa: F401
# WH_CLAMP re-exported for backward compatibility (utils.export_model)

Array = jax.Array



def kaiming_normal_fan_out(a: float = 0.01):
    """Kaiming-normal, fan_out mode, leaky-relu gain - matching the reference
    weight init (reference: yogo/model.py:79-87). For an HWIO conv kernel,
    fan_out = out_channels * kh * kw."""

    gain = float(np.sqrt(2.0 / (1.0 + a**2)))

    def init(key, shape, dtype=jnp.float32):
        kh, kw, _, out = shape
        std = gain / np.sqrt(out * kh * kw)
        return std * jax.random.normal(key, shape, dtype)

    return init


def _activation(name: Optional[str]):
    if name is None:
        return lambda x: x
    if name == "leaky_relu":
        return lambda x: jax.nn.leaky_relu(x, negative_slope=0.01)
    if name == "silu":
        return jax.nn.silu
    if name == "gelu":
        # exact erf GELU: torch/timm nn.GELU defaults to exact, and the
        # convnext .pth interop promises numeric parity with it
        # (jax.nn.gelu defaults to the tanh approximation)
        return partial(jax.nn.gelu, approximate=False)
    raise ValueError(f"unknown activation {name}")


class SpaceToDepthConv(nn.Module):
    """conv(k=3, s=2, pad=1) computed as conv(k=2, s=1, VALID) over the
    space-to-depth input (H/2, W/2, 4C) - mathematically identical (each
    2x2 output-window's 4x4 input region covers the 3x3 taps; the 7
    uncovered positions are zero).

    MEASURED NEGATIVE RESULT on v5e (round 4, docs/perf-notes.md): keep
    OFF. Standalone the rewrite looked 3.5-8.4x faster
    (tools/perf_s2d_conv.py), but that baseline was an argument-layout
    artifact - the IN-MODEL strided convs already run as fast as the
    rewrite's best case, and the pad+transpose relayout adds activation-
    sized HBM copies: whole-model forward 2,270 img/s vs 5,096 native at
    772x1032 (and OOMs at bs=512). Kept as a tested research artifact;
    YOGO_S2D=1 re-enables for future backends.

    Param-compatible with nn.Conv: declares the SAME "kernel" (3,3,C,K)
    [+ "bias" (K,)] and derives the (2,2,4C,K) compute kernel inside the
    forward, so checkpoints and bridges are untouched. Results differ
    from the strided conv only in f32-accumulation order.
    """

    features: int
    use_bias: bool
    compute_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> Array:
        b, h, w, c = x.shape
        kern = self.param(
            "kernel", kaiming_normal_fan_out(), (3, 3, c, self.features)
        )
        kpad = jnp.pad(kern, ((0, 1), (0, 1), (0, 0), (0, 0)))  # (4,4,C,K)
        # (di=2bi+pi, dj=2bj+pj) -> [bi, bj, (pi*2+pj)*C + c, K]
        k2 = (
            kpad.reshape(2, 2, 2, 2, c, self.features)
            .transpose(0, 2, 1, 3, 4, 5)
            .reshape(2, 2, 4 * c, self.features)
        )
        pad_h = 1 + (h % 2)  # top/left pad 1 (the conv's pad), then
        pad_w = 1 + (w % 2)  # zero-fill bottom/right to even dims
        xp = jnp.pad(x, ((0, 0), (1, pad_h), (1, pad_w), (0, 0)))
        hb, wb = xp.shape[1] // 2, xp.shape[2] // 2
        xb = (
            xp.reshape(b, hb, 2, wb, 2, c)
            .transpose(0, 1, 3, 2, 4, 5)
            .reshape(b, hb, wb, 4 * c)
        )
        y = jax.lax.conv_general_dilated(
            xb.astype(self.compute_dtype),
            k2.astype(self.compute_dtype),
            window_strides=(1, 1),
            padding="VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )  # (B, hb-1, wb-1, K) == the strided conv's output shape
        if self.use_bias:
            bias = self.param(
                "bias", nn.initializers.zeros, (self.features,)
            )
            y = y + bias.astype(y.dtype)
        return y


class ConvStack(nn.Module):
    """Spec-driven conv backbone (covers 11 of the 12 reference architectures).

    s2d=True computes interior stride-2 3x3 convs via SpaceToDepthConv
    (identical math, TPU-friendly shapes; see its docstring)."""

    blocks: Tuple[ConvSpec, ...]
    compute_dtype: Any = jnp.float32
    s2d: bool = False

    @nn.compact
    def __call__(
        self,
        x: Array,
        *,
        train: bool = False,
        bn_frozen: bool = False,
        start_block: int = 0,
    ) -> Array:
        """start_block > 0 skips the leading blocks - used when the fused
        Pallas stem (ops/pallas_stem.fused_stem_nchw) has already computed
        them; params of skipped blocks stay in the tree untouched."""
        for i, s in enumerate(self.blocks):
            if i < start_block:
                continue
            use_s2d = (
                self.s2d
                and not s.transpose
                and s.kernel == 3
                and s.stride == 2
                and s.padding == 1
                and x.shape[-1] >= 16  # stem stays native (C=1: no win)
            )
            if use_s2d:
                x = SpaceToDepthConv(
                    features=s.out,
                    use_bias=s.bias,
                    compute_dtype=self.compute_dtype,
                    name=f"conv{i}",
                )(x)
            else:
                conv_cls = nn.ConvTranspose if s.transpose else nn.Conv
                x = conv_cls(
                    features=s.out,
                    kernel_size=(s.kernel, s.kernel),
                    strides=(s.stride, s.stride),
                    padding=[(s.padding, s.padding), (s.padding, s.padding)],
                    use_bias=s.bias,
                    kernel_init=kaiming_normal_fan_out(),
                    bias_init=nn.initializers.zeros,
                    dtype=self.compute_dtype,
                    param_dtype=jnp.float32,
                    name=f"conv{i}",
                )(x)
            if s.bn:
                # bn_frozen: fine-tune BN-freeze - normalize with running
                # stats and never update them, even in training
                # (reference: yogo/model.py:67-70,89-92 `tuning=True`)
                x = nn.BatchNorm(
                    use_running_average=(not train) or bn_frozen,
                    momentum=0.9,
                    epsilon=1e-5,
                    dtype=self.compute_dtype,
                    param_dtype=jnp.float32,
                    name=f"bn{i}",
                )(x)
            x = _activation(s.act)(x)
            if s.dropout > 0:
                # Dropout2d semantics: drop whole channels per sample
                # (reference: yogo/model_defns.py Dropout2d blocks)
                x = nn.Dropout(
                    rate=s.dropout,
                    broadcast_dims=(1, 2),
                    deterministic=not train,
                    name=f"drop{i}",
                )(x)
            # no-op marker letting a surrounding jax.checkpoint save only
            # block-boundary activations (train.py remat="blocks"): bwd then
            # recomputes conv/bn/act intermediates instead of storing them
            x = checkpoint_name(x, "yogo_block")
        return x


class ConvNeXtBlock(nn.Module):
    dim: int
    compute_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> Array:
        inp = x
        x = nn.Conv(
            self.dim,
            (7, 7),
            padding=[(3, 3), (3, 3)],
            feature_group_count=self.dim,
            dtype=self.compute_dtype,
            param_dtype=jnp.float32,
            name="dwconv",
        )(x)
        x = nn.LayerNorm(epsilon=1e-6, param_dtype=jnp.float32, name="norm")(x)
        x = nn.Dense(4 * self.dim, dtype=self.compute_dtype, name="pwconv1")(x)
        # exact erf GELU (torch/timm default) - parity with imported .pth
        x = jax.nn.gelu(x, approximate=False)
        x = nn.Dense(self.dim, dtype=self.compute_dtype, name="pwconv2")(x)
        gamma = self.param(
            "gamma", nn.initializers.constant(1e-6), (self.dim,), jnp.float32
        )
        return inp + gamma * x


class ConvNeXtSmall(nn.Module):
    """Native flax ConvNeXt-Small trunk + YOGO format head
    (reference: yogo/model_defns.py:533-558, which uses timm)."""

    num_outputs: int  # 5 + num_classes
    compute_dtype: Any = jnp.float32
    depths: Tuple[int, ...] = (3, 3, 27, 3)
    dims: Tuple[int, ...] = (96, 192, 384, 768)

    @nn.compact
    def __call__(
        self, x: Array, *, train: bool = False, bn_frozen: bool = False
    ) -> Array:
        # bn_frozen is accepted for interface parity; ConvNeXt has no BN
        del bn_frozen
        # stem: patchify
        x = nn.Conv(
            self.dims[0],
            (4, 4),
            strides=(4, 4),
            padding="VALID",
            dtype=self.compute_dtype,
            param_dtype=jnp.float32,
            name="stem_conv",
        )(x)
        x = nn.LayerNorm(epsilon=1e-6, param_dtype=jnp.float32, name="stem_norm")(x)
        for stage, (depth, dim) in enumerate(zip(self.depths, self.dims)):
            if stage > 0:
                x = nn.LayerNorm(
                    epsilon=1e-6, param_dtype=jnp.float32, name=f"down{stage}_norm"
                )(x)
                x = nn.Conv(
                    dim,
                    (2, 2),
                    strides=(2, 2),
                    padding="VALID",
                    dtype=self.compute_dtype,
                    param_dtype=jnp.float32,
                    name=f"down{stage}_conv",
                )(x)
            for blk in range(depth):
                x = ConvNeXtBlock(
                    dim, self.compute_dtype, name=f"stage{stage}_block{blk}"
                )(x)
        # "format time!" head: 1x1 conv to 5+C then stride-4 transpose upsample
        x = nn.Conv(
            self.num_outputs,
            (1, 1),
            dtype=self.compute_dtype,
            param_dtype=jnp.float32,
            name="format_conv",
        )(x)
        x = nn.ConvTranspose(
            self.num_outputs,
            (4, 4),
            strides=(4, 4),
            padding="VALID",
            dtype=self.compute_dtype,
            param_dtype=jnp.float32,
            name="format_up",
        )(x)
        return x


def decode_predictions(
    raw: Array,
    cxs: Array,
    cys: Array,
    anchor_w: float,
    anchor_h: float,
    width_multiplier: float = 1.0,
    height_multiplier: float = 1.0,
    inference: bool = False,
) -> Array:
    """YOLO9000 direct-location decode (reference: yogo/model.py:277-313).

    raw: (B, Sy, Sx, 5+C) NHWC backbone output.
    Returns (B, Sy, Sx, 5+C): [xc, yc, w, h, objectness, *classes].
    Classes stay raw logits during training, softmax at inference.
    """
    raw = raw.astype(jnp.float32)
    Sy, Sx = raw.shape[1], raw.shape[2]
    tx, ty, tw, th, to = (raw[..., i] for i in range(5))
    cls = raw[..., 5:]

    xc = jax.nn.sigmoid(tx) * (1.0 / Sx) + cxs
    yc = jax.nn.sigmoid(ty) * (1.0 / Sy) + cys
    w = anchor_w * jnp.exp(jnp.minimum(tw, WH_CLAMP)) * width_multiplier
    h = anchor_h * jnp.exp(jnp.minimum(th, WH_CLAMP)) * height_multiplier
    obj = jax.nn.sigmoid(to)
    if inference:
        cls = jax.nn.softmax(cls, axis=-1)
    return jnp.concatenate(
        [jnp.stack([xc, yc, w, h, obj], axis=-1), cls], axis=-1
    )


@dataclass(frozen=True)
class YOGO:
    """Static model configuration + functional forward.

    Mirrors the reference YOGO wrapper's buffers (reference:
    yogo/model.py:35-65) as plain fields. `resize` reproduces
    `resize_model` (reference: yogo/model.py:236-265) functionally: a new
    config with recomputed grids and width/height multipliers.
    """

    img_size: Tuple[int, int]  # (H, W)
    anchor_w: float
    anchor_h: float
    num_classes: int
    is_rgb: bool = False
    normalize_images: bool = False
    clip_value: float = 1.0
    model_version: str = "base_model"
    height_multiplier: float = 1.0
    width_multiplier: float = 1.0
    compute_dtype: Any = jnp.float32

    # ------------------------------------------------------------------ setup
    @property
    def defn(self) -> ModelDefn:
        return get_model_defn(self.model_version)(self.num_classes, self.is_rgb)

    @property
    def input_channels(self) -> int:
        return 3 if self.is_rgb else 1

    @property
    def grid(self) -> Tuple[int, int]:
        """(Sx, Sy) for the current img_size."""
        h, w = self.img_size
        return grid_size(self.defn.blocks, h, w)

    @property
    def Sx(self) -> int:
        return self.grid[0]

    @property
    def Sy(self) -> int:
        return self.grid[1]

    def module(self) -> nn.Module:
        import os

        defn = self.defn
        if defn.family == "convnext":
            return ConvNeXtSmall(
                num_outputs=5 + self.num_classes, compute_dtype=self.compute_dtype
            )
        # YOGO_S2D=1 opts into the space-to-depth stride-2 conv
        # formulation - identical math but measured 2.2x SLOWER
        # whole-model on v5e (see SpaceToDepthConv: negative result,
        # default off). Read at TRACE time: flipping it after a function
        # was jitted does not retrace that function.
        return ConvStack(
            blocks=defn.blocks,
            compute_dtype=self.compute_dtype,
            s2d=os.environ.get("YOGO_S2D", "0") not in ("", "0"),
        )

    # ------------------------------------------------------------- param init
    def init(self, rng: jax.Array) -> Dict[str, Any]:
        h, w = self.img_size
        dummy = jnp.zeros((1, h, w, self.input_channels), jnp.float32)
        return self.module().init({"params": rng}, dummy, train=False)

    def num_params(self, variables: Dict[str, Any]) -> int:
        return sum(
            int(np.prod(p.shape)) for p in jax.tree.leaves(variables["params"])
        )

    @staticmethod
    def param_norm(params: Any) -> float:
        """Global L2 norm of a parameter pytree
        (reference: yogo/model.py:171-181)."""
        return float(
            jnp.sqrt(
                sum(jnp.sum(p.astype(jnp.float32) ** 2) for p in jax.tree.leaves(params))
            )
        )

    # same math applies to gradient pytrees (reference: yogo/model.py:157-169)
    grad_norm = param_norm

    # ------------------------------------------------------- pallas fast path
    def _stem_pallas_mode(self, x: Array, train: bool, mutable: bool):
        """Decide whether the fused Pallas stem kernel replaces block 0 for
        this forward. Returns None (use XLA), "compiled", or "interpret".

        Gated by YOGO_PALLAS_STEM: "0" (default - off: the axon dev harness
        crashes when a Mosaic kernel shares an executable with a large XLA
        graph, so the kernel must be dispatched standalone - see
        docs/perf-notes.md), "auto" (compiled on TPU only), "1" (force
        compiled), "interpret" (force interpreter, for CPU tests).
        Eligibility: inference on a conv_stack whose first block is the
        canonical 1->C conv3x3 s2 + BN + LeakyReLU with no dropout, bf16
        compute, raw uint8 input.
        """
        import os

        setting = os.environ.get("YOGO_PALLAS_STEM", "0")
        if setting == "0":
            return None
        if train or mutable:
            return None
        if self.defn.family != "conv_stack" or self.input_channels != 1:
            return None
        b0 = self.defn.blocks[0]
        # the kernel hardcodes pad-1 and folds ONLY BN into the taps: a
        # biased or differently-padded block 0 would silently compute wrong
        # activations if it slipped through this gate
        if not (
            b0.kernel == 3
            and b0.stride == 2
            and b0.padding == 1
            and not b0.bias
            and b0.bn
            and b0.act == "leaky_relu"
            and not b0.transpose
            and b0.dropout == 0
        ):
            return None
        if self.compute_dtype != jnp.bfloat16:
            return None
        if x.dtype != jnp.uint8:
            return None
        h, w = self.img_size
        if h % 2 or w % 2:
            return None
        if setting == "interpret":
            return "interpret"
        if setting == "1":
            return "compiled"
        return "compiled" if jax.default_backend() == "tpu" else None

    def _stem_kernel_params(
        self, variables: Dict[str, Any]
    ) -> Tuple[Array, Array]:
        """BN-folded block-0 weights for the fused Pallas stem; delegates to
        the single copy of the fold math (pallas_stem.fold_stem_params,
        eps matching ConvStack's BatchNorm)."""
        from yogo_tpu.ops.pallas_stem import fold_stem_params

        params = variables["params"]
        stats = variables.get("batch_stats", {})
        return fold_stem_params(
            params["conv0"]["kernel"],
            params["conv0"].get("bias"),
            bn_scale=params["bn0"]["scale"],
            bn_bias=params["bn0"]["bias"],
            bn_mean=stats["bn0"]["mean"],
            bn_var=stats["bn0"]["var"],
        )

    def _apply_pallas_stem(
        self, variables: Dict[str, Any], x_nhwc_u8: Array, interpret: bool
    ) -> Array:
        """Fused uint8 stem (conv0 + bn0 + leaky) via the Pallas kernel;
        returns the block-0 activation in NHWC bf16."""
        from yogo_tpu.ops.pallas_stem import fused_stem_nchw

        w9, bias = self._stem_kernel_params(variables)
        out_nchw = fused_stem_nchw(
            x_nhwc_u8[..., 0], w9, bias, interpret=interpret
        )
        return jnp.transpose(out_nchw, (0, 2, 3, 1))

    # ----------------------------------------------- split-dispatch pallas API
    def pallas_stem_forward(
        self, variables: Dict[str, Any], x: Array, *, interpret: bool = False
    ) -> Array:
        """Block 0 alone via the fused Pallas kernel, returning the kernel's
        native NCHW bf16 activation with NO trailing XLA ops. Jit this by
        itself: on the axon dev harness a Mosaic kernel is only stable when
        its executable is standalone (docs/perf-notes.md), so production
        callers pair one jit of this with one jit of forward_from_block1."""
        from yogo_tpu.ops.pallas_stem import fused_stem_nchw

        x = self._to_nhwc(x)
        w9, bias = self._stem_kernel_params(variables)
        return fused_stem_nchw(x[..., 0], w9, bias, interpret=interpret)

    def forward_from_block1(
        self,
        variables: Dict[str, Any],
        h_nchw: Array,
        *,
        inference: bool = False,
        tuning: bool = False,
    ) -> Array:
        """Blocks 1.. + decode from a block-0 activation in NCHW (the
        layout pallas_stem_forward emits). The second executable of the
        split-dispatch pallas path."""
        h = jnp.transpose(h_nchw, (0, 2, 3, 1)).astype(self.compute_dtype)
        raw = self.module().apply(
            variables, h, train=False, bn_frozen=tuning, start_block=1
        )
        return self._decode_raw(raw, inference)

    # ---------------------------------------------------------------- forward
    def _to_nhwc(self, x: Array) -> Array:
        """Accept reference-layout input: (B,C,H,W), (C,H,W) or (H,W);
        uint8 or float (reference: yogo/model.py:267-273). uint8 is kept
        as-is here so the fused stem can consume it raw; callers cast."""
        if x.ndim == 2:
            x = x[None, None]
        elif x.ndim == 3:
            x = x[None]
        return jnp.transpose(x, (0, 2, 3, 1))

    def apply(
        self,
        variables: Dict[str, Any],
        x: Array,
        *,
        train: bool = False,
        inference: bool = False,
        rngs: Optional[Dict[str, jax.Array]] = None,
        mutable: bool = False,
        channels_last: bool = False,
        tuning: bool = False,
        decode: bool = True,
    ):
        """Forward pass: raw input -> decoded (B, 5+C, Sy, Sx) predictions.

        With mutable=True (training) returns (preds, new_model_state).
        tuning=True freezes BatchNorm for fine-tuning: running stats are used
        for normalization and never updated (reference: yogo/model.py:67-70,
        loaded checkpoints are constructed with tuning=True at model.py:134).

        decode=False returns the UNDECODED NHWC head output
        (B, Sy, Sx, 5+C) in compute dtype - the input contract of
        ops.postprocess.format_preds_batched_raw, which decodes only the
        top-K surviving cells instead of the whole grid (the decoded path
        materializes sigmoid/exp/concat over every cell; `inference` is
        ignored since class softmax also moves after selection).
        """
        if not channels_last:
            x = self._to_nhwc(x)

        module = self.module()
        pallas_mode = self._stem_pallas_mode(x, train, mutable)
        if pallas_mode == "compiled" and isinstance(x, jax.core.Tracer):
            # under an outer jit/scan the pallas_call would be inlined into
            # one executable with the rest of the model - the topology that
            # crashes the axon TPU worker (docs/perf-notes.md). Jitted
            # callers must use the split-dispatch API instead
            # (pallas_stem_forward + forward_from_block1, as infer.py does).
            pallas_mode = None
        if pallas_mode is not None:
            # block 0 (conv+BN+leaky on raw uint8) runs as one fused Pallas
            # kernel; the flax stack continues from block 1
            h = self._apply_pallas_stem(
                variables, x, interpret=pallas_mode == "interpret"
            )
            raw = module.apply(
                variables,
                h.astype(self.compute_dtype),
                train=False,
                bn_frozen=tuning,
                start_block=1,
            )
        else:
            if not jnp.issubdtype(x.dtype, jnp.floating):
                x = x.astype(jnp.float32)
            x = x.astype(self.compute_dtype)
            if mutable:
                raw, new_state = module.apply(
                    variables,
                    x,
                    train=train,
                    bn_frozen=tuning,
                    rngs=rngs,
                    mutable=["batch_stats"],
                )
            else:
                raw = module.apply(
                    variables, x, train=train, bn_frozen=tuning, rngs=rngs
                )

        out = raw if not decode else self._decode_raw(raw, inference)
        if mutable:
            return out, new_state
        return out

    def _decode_raw(self, raw: Array, inference: bool) -> Array:
        """NHWC backbone logits -> decoded (B, 5+C, Sy, Sx) predictions."""
        Sx, Sy = self.grid
        cxs, cys = cell_offsets(Sx, Sy)
        out = decode_predictions(
            raw,
            jnp.asarray(cxs),
            jnp.asarray(cys),
            self.anchor_w,
            self.anchor_h,
            self.width_multiplier,
            self.height_multiplier,
            inference=inference,
        )
        return jnp.transpose(out, (0, 3, 1, 2))  # -> (B, 5+C, Sy, Sx)

    # ----------------------------------------------------------------- resize
    def resize(
        self, img_height: Optional[int] = None, img_width: Optional[int] = None
    ) -> "YOGO":
        """Fully-convolutional crop-resize (reference: yogo/model.py:236-265).

        Multipliers rescale predicted w/h back to original-image fractions;
        they compose with any existing resize by being computed against the
        un-multiplied original size.
        """
        org_h = self.img_size[0] * self.height_multiplier
        org_w = self.img_size[1] * self.width_multiplier
        new_h = int(img_height or self.img_size[0])
        new_w = int(img_width or self.img_size[1])
        return dataclasses.replace(
            self,
            img_size=(new_h, new_w),
            height_multiplier=float(org_h / new_h),
            width_multiplier=float(org_w / new_w),
        )

    def with_compute_dtype(self, dtype: Any) -> "YOGO":
        return dataclasses.replace(self, compute_dtype=dtype)

    # ----------------------------------------------------------- construction
    @classmethod
    def from_pth(cls, pth_path, inference: bool = False):
        """Load a reference-format .pth (or native .ckpt) checkpoint,
        mirroring the reference classmethod (reference: yogo/model.py:94-147).
        Returns (model_config, variables, meta).

        `inference` is accepted for signature parity only: the reference
        bakes inference mode into the constructed module, while here it is
        a per-apply() argument - pass apply(..., inference=True) instead."""
        del inference
        from yogo_tpu.utils.checkpoint import load_any

        return load_any(pth_path)

    @classmethod
    def create(
        cls,
        img_size: Tuple[int, int],
        anchor_w: float,
        anchor_h: float,
        num_classes: int,
        **kwargs,
    ) -> "YOGO":
        return cls(
            img_size=(int(img_size[0]), int(img_size[1])),
            anchor_w=float(anchor_w),
            anchor_h=float(anchor_h),
            num_classes=int(num_classes),
            **kwargs,
        )
