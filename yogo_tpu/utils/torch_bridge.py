"""Bidirectional bridge between reference .pth checkpoints and flax variables.

The reference stores a single torch.save dict with a model_state_dict whose
keys follow its nn.Sequential layout (reference: yogo/train.py:267-293,
yogo/model.py:94-147). This module maps those keys onto our spec-driven
ConvStack parameters so that:
  - reference-trained .pth files load directly into yogo_tpu (``load_pth``),
  - yogo_tpu checkpoints can be exported for the torch reference (``save_pth``).

torch is only needed when this module's functions are called (gated import).
"""

from __future__ import annotations

from pathlib import Path
from typing import Any, Dict, Tuple

import numpy as np

from yogo_tpu.models.defns import ModelDefn
from yogo_tpu.models.yogo import YOGO


def _require_torch():
    try:
        import torch  # noqa: F401

        return torch
    except ImportError as e:  # pragma: no cover
        raise ImportError(
            "torch is required for .pth interop; install torch or use the "
            "native yogo_tpu checkpoint format"
        ) from e


def _torch_key_layout(defn: ModelDefn):
    """Yield (block_index, spec, conv_key_prefix, bn_key_prefix|None).

    Reference layout: every block is nn.Sequential(conv, [bn], act, [drop])
    except the final bare 1x1 head conv (reference: yogo/model_defns.py:31-77).
    """
    for i, s in enumerate(defn.blocks):
        if i == defn.head_index:
            yield i, s, f"model.{i}", None
        else:
            bn = f"model.{i}.1" if s.bn else None
            yield i, s, f"model.{i}.0", bn


def _require_known_family(defn: ModelDefn) -> None:
    if defn.family not in ("conv_stack", "convnext"):
        raise NotImplementedError(
            f".pth interop is implemented for the conv_stack and convnext "
            f"families; '{defn.name}' is family '{defn.family}'"
        )


# --------------------------------------------------------------- convnext
#
# The reference builds convnext_small as
#   nn.Sequential(stem, stages) + add_module("format time!", head)
# from timm's ConvNeXt (reference: yogo/model_defns.py:533-558), so its
# state-dict keys follow timm's (>=0.6) module naming wrapped in the
# positional Sequential prefix:
#   model.0.0 / model.0.1                       stem conv + LayerNorm2d
#   model.1.{s}.downsample.{0,1}   (s=1..3)     LayerNorm2d + 2x2 conv
#   model.1.{s}.blocks.{b}.conv_dw|norm|mlp.fc1|mlp.fc2|gamma
#   model.format time!.0 / model.format time!.1  1x1 conv + ConvTranspose2d
#
# Tensor-layout transforms (each verified numerically against torch on CPU):
#   conv / depthwise conv  (O,I|1,kh,kw) <-> (kh,kw,I|1,O)   transpose 2310
#   linear                 (O,I)         <-> (I,O)           .T
#   conv-transpose         (I,O,kh,kw)   <-> (kh,kw,I,O) with SPATIAL FLIP
#     (torch ConvTranspose2d is the conv adjoint = correlation with the
#      flipped kernel; flax nn.ConvTranspose does not flip)

CONVNEXT_DEPTHS = (3, 3, 27, 3)


def _convnext_key_pairs():
    """Yield (flax_param_name, torch_key_prefix, kind) for ConvNeXt-Small.

    kind in {conv, dwconv, linear, norm, gamma, convT}; norm maps
    weight->scale; gamma is a bare parameter (no .weight suffix).
    """
    yield "stem_conv", "model.0.0", "conv"
    yield "stem_norm", "model.0.1", "norm"
    for s, depth in enumerate(CONVNEXT_DEPTHS):
        if s > 0:
            yield f"down{s}_norm", f"model.1.{s}.downsample.0", "norm"
            yield f"down{s}_conv", f"model.1.{s}.downsample.1", "conv"
        for b in range(depth):
            pfx = f"model.1.{s}.blocks.{b}"
            yield f"stage{s}_block{b}.dwconv", f"{pfx}.conv_dw", "dwconv"
            yield f"stage{s}_block{b}.norm", f"{pfx}.norm", "norm"
            yield f"stage{s}_block{b}.pwconv1", f"{pfx}.mlp.fc1", "linear"
            yield f"stage{s}_block{b}.pwconv2", f"{pfx}.mlp.fc2", "linear"
            yield f"stage{s}_block{b}.gamma", pfx, "gamma"
    yield "format_conv", "model.format time!.0", "conv"
    yield "format_up", "model.format time!.1", "convT"


def _tree_set(tree: Dict[str, Any], dotted: str, value: Any) -> None:
    parts = dotted.split(".")
    for p in parts[:-1]:
        tree = tree.setdefault(p, {})
    tree[parts[-1]] = value


def _tree_get(tree: Dict[str, Any], dotted: str) -> Any:
    for p in dotted.split("."):
        tree = tree[p]
    return tree


def _convnext_state_dict_to_params(
    state_dict: Dict[str, Any], np_of
) -> Dict[str, Any]:
    params: Dict[str, Any] = {}
    for flax_name, tkey, kind in _convnext_key_pairs():
        if kind == "gamma":
            _tree_set(params, flax_name, np_of(state_dict[f"{tkey}.gamma"]))
            continue
        w = np_of(state_dict[f"{tkey}.weight"])
        b = np_of(state_dict[f"{tkey}.bias"])
        if kind in ("conv", "dwconv"):
            _tree_set(params, f"{flax_name}.kernel", np.transpose(w, (2, 3, 1, 0)))
            _tree_set(params, f"{flax_name}.bias", b)
        elif kind == "linear":
            _tree_set(params, f"{flax_name}.kernel", np.transpose(w))
            _tree_set(params, f"{flax_name}.bias", b)
        elif kind == "norm":
            _tree_set(params, f"{flax_name}.scale", w)
            _tree_set(params, f"{flax_name}.bias", b)
        elif kind == "convT":
            _tree_set(
                params,
                f"{flax_name}.kernel",
                np.transpose(w[:, :, ::-1, ::-1], (2, 3, 0, 1)).copy(),
            )
            _tree_set(params, f"{flax_name}.bias", b)
    return params


def _convnext_params_to_state_dict(params: Dict[str, Any], t) -> Dict[str, Any]:
    sd: Dict[str, Any] = {}
    for flax_name, tkey, kind in _convnext_key_pairs():
        if kind == "gamma":
            sd[f"{tkey}.gamma"] = t(_tree_get(params, flax_name))
            continue
        if kind == "norm":
            sd[f"{tkey}.weight"] = t(_tree_get(params, f"{flax_name}.scale"))
        else:
            k = np.asarray(_tree_get(params, f"{flax_name}.kernel"))
            if kind in ("conv", "dwconv"):
                sd[f"{tkey}.weight"] = t(np.transpose(k, (3, 2, 0, 1)))
            elif kind == "linear":
                sd[f"{tkey}.weight"] = t(np.transpose(k))
            elif kind == "convT":
                sd[f"{tkey}.weight"] = t(
                    np.transpose(k, (2, 3, 0, 1))[:, :, ::-1, ::-1].copy()
                )
        sd[f"{tkey}.bias"] = t(_tree_get(params, f"{flax_name}.bias"))
    return sd


def state_dict_to_variables(
    state_dict: Dict[str, Any], defn: ModelDefn
) -> Dict[str, Any]:
    """torch state_dict -> flax {'params': ..., 'batch_stats': ...}.

    Conv weights transpose OIHW -> HWIO.
    """
    _require_known_family(defn)
    params: Dict[str, Any] = {}
    batch_stats: Dict[str, Any] = {}

    def np_of(t):
        # copy=True: torch's .numpy() returns a VIEW of the live parameter
        # buffer - without the copy, optimizer steps on a still-training
        # torch net would silently mutate the converted variables
        # (caught by tools/head_to_head.py's side-by-side training)
        return np.array(
            t.detach().cpu().numpy() if hasattr(t, "detach") else t, copy=True
        )

    if defn.family == "convnext":
        return {"params": _convnext_state_dict_to_params(state_dict, np_of)}

    for i, s, conv_key, bn_key in _torch_key_layout(defn):
        w = np_of(state_dict[f"{conv_key}.weight"])
        p = {"kernel": np.transpose(w, (2, 3, 1, 0))}
        if s.bias:
            p["bias"] = np_of(state_dict[f"{conv_key}.bias"])
        params[f"conv{i}"] = p
        if bn_key is not None:
            params[f"bn{i}"] = {
                "scale": np_of(state_dict[f"{bn_key}.weight"]),
                "bias": np_of(state_dict[f"{bn_key}.bias"]),
            }
            batch_stats[f"bn{i}"] = {
                "mean": np_of(state_dict[f"{bn_key}.running_mean"]),
                "var": np_of(state_dict[f"{bn_key}.running_var"]),
            }

    variables: Dict[str, Any] = {"params": params}
    if batch_stats:
        variables["batch_stats"] = batch_stats
    return variables


def variables_to_state_dict(
    variables: Dict[str, Any], model: YOGO
) -> Dict[str, Any]:
    """flax variables -> torch state_dict (including config buffers)."""
    torch = _require_torch()
    defn = model.defn
    _require_known_family(defn)
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})
    sd: Dict[str, Any] = {}

    def t(x):
        return torch.from_numpy(np.array(x, copy=True))

    if defn.family == "convnext":
        sd = _convnext_params_to_state_dict(params, t)
        _append_config_buffers(sd, model, t, torch)
        return sd

    for i, s, conv_key, bn_key in _torch_key_layout(defn):
        p = params[f"conv{i}"]
        sd[f"{conv_key}.weight"] = t(np.transpose(np.asarray(p["kernel"]), (3, 2, 0, 1)))
        if s.bias:
            sd[f"{conv_key}.bias"] = t(p["bias"])
        if bn_key is not None:
            bnp = params[f"bn{i}"]
            bns = batch_stats[f"bn{i}"]
            sd[f"{bn_key}.weight"] = t(bnp["scale"])
            sd[f"{bn_key}.bias"] = t(bnp["bias"])
            sd[f"{bn_key}.running_mean"] = t(bns["mean"])
            sd[f"{bn_key}.running_var"] = t(bns["var"])
            sd[f"{bn_key}.num_batches_tracked"] = torch.tensor(0, dtype=torch.long)

    _append_config_buffers(sd, model, t, torch)
    return sd


def _append_config_buffers(sd: Dict[str, Any], model: YOGO, t, torch) -> None:
    # config buffers (reference: yogo/model.py:35-65)
    from yogo_tpu.ops.grid import cell_offsets

    Sx, Sy = model.grid
    cxs, cys = cell_offsets(Sx, Sy)
    sd["img_size"] = torch.tensor(list(model.img_size))
    sd["anchor_w"] = torch.tensor(model.anchor_w)
    sd["anchor_h"] = torch.tensor(model.anchor_h)
    sd["num_classes"] = torch.tensor(model.num_classes)
    sd["clip_value"] = torch.tensor(model.clip_value)
    sd["is_rgb"] = torch.tensor(model.is_rgb)
    sd["normalize_images"] = torch.tensor(model.normalize_images)
    sd["_Cxs"] = t(cxs)
    sd["_Cys"] = t(cys)
    sd["height_multiplier"] = torch.tensor(model.height_multiplier)
    sd["width_multiplier"] = torch.tensor(model.width_multiplier)


def load_pth(pth_path) -> Tuple[YOGO, Dict[str, Any], Dict[str, Any]]:
    """Load a reference-format .pth checkpoint.

    Returns (model_config, variables, meta) where meta mirrors the reference's
    from_pth return dict (reference: yogo/model.py:94-147): step, class_names,
    normalize_images. Permissive of missing newer keys like the reference.
    (The reference's `inference` construction flag has no analogue: decode
    mode is a per-apply() argument here, not model state.)
    """
    torch = _require_torch()
    loaded = torch.load(str(Path(pth_path)), map_location="cpu", weights_only=False)

    sd = loaded["model_state_dict"]

    def buf(name, default):
        v = sd.get(name, None)
        if v is None:
            return default
        return v.item() if hasattr(v, "item") and v.numel() == 1 else v

    img_size = sd["img_size"]
    img_size = (int(img_size[0]), int(img_size[1]))
    normalize_images = bool(
        buf("normalize_images", loaded.get("normalize_images", False))
    )

    model = YOGO.create(
        img_size=img_size,
        anchor_w=float(sd["anchor_w"].item()),
        anchor_h=float(sd["anchor_h"].item()),
        num_classes=int(sd["num_classes"].item()),
        is_rgb=bool(buf("is_rgb", False)),
        normalize_images=normalize_images,
        clip_value=float(buf("clip_value", 1.0)),
        model_version=loaded.get("model_version", None) or "base_model",
        height_multiplier=float(buf("height_multiplier", 1.0)),
        width_multiplier=float(buf("width_multiplier", 1.0)),
    )
    variables = state_dict_to_variables(sd, model.defn)
    meta = {
        "step": loaded.get("step", 0),
        "class_names": loaded.get("class_names", loaded.get("classes", None)),
        "normalize_images": normalize_images,
        "epoch": loaded.get("epoch", 0),
        "model_name": loaded.get("model_name", None),
    }
    return model, variables, meta


def save_pth(
    path, model: YOGO, variables: Dict[str, Any], **metadata
) -> None:
    """Write a reference-compatible .pth checkpoint
    (schema: reference yogo/train.py:267-293)."""
    torch = _require_torch()
    classes = metadata.pop("classes", None)
    payload = {
        "epoch": metadata.pop("epoch", 0),
        "step": metadata.pop("step", 0),
        "normalize_images": model.normalize_images,
        "classes": classes,
        # the reference's checkpointer writes "classes" but its from_pth reads
        # "class_names" (reference: yogo/train.py:285 vs yogo/model.py:103);
        # write both so class names survive a round-trip through either reader
        "class_names": classes,
        "model_name": metadata.pop("model_name", None),
        "model_state_dict": variables_to_state_dict(variables, model),
        "optimizer_state_dict": metadata.pop("optimizer_state_dict", {}),
        "model_version": model.model_version,
        **metadata,
    }
    torch.save(payload, str(path))
