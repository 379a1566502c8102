"""Torch → Flax weight porting for the ResNet backbone.

Re-creates the reference's pretrained-weight loading path
(`e2edet/module/resnet.py:279-315` detectron2-style key remap +
`_load_state_dict` :393-421) for the Flax NHWC backbone:

- torchvision layout: conv weights (O, I, kH, kW) -> flax (kH, kW, I, O)
- BN buffers -> FrozenBatchNorm ``constants`` collection
- detectron2-style checkpoint keys remapped to torchvision naming first
"""

import re
from typing import Any, Dict, Tuple

import numpy as np


def _d2_to_torchvision_key(key: str) -> str:
    """Remap detectron2 resnet keys to torchvision naming (parity with
    reference `resnet.py:279-315`)."""
    k = key
    k = re.sub(r"^backbone\.bottom_up\.", "", k)
    k = re.sub(r"^stem\.conv1\.norm\.", "bn1.", k)
    k = re.sub(r"^stem\.conv1\.", "conv1.", k)
    k = re.sub(r"^res(\d+)", lambda m: f"layer{int(m.group(1)) - 1}", k)
    k = re.sub(r"\.shortcut\.norm\.", ".downsample.1.", k)
    k = re.sub(r"\.shortcut\.", ".downsample.0.", k)
    k = re.sub(r"\.conv(\d+)\.norm\.", r".bn\1.", k)
    return k


def port_resnet_state_dict(
    state_dict: Dict[str, Any],
) -> Tuple[Dict[str, Any], Dict[str, Any]]:
    """Convert a torchvision/detectron2 resnet state_dict into
    (params, constants) pytrees matching `ResNetBackbone`.

    Keys not belonging to the trunk (fc.*) are ignored.
    Returns nested dicts keyed like the Flax module tree:
      params:    {"conv1": {"kernel"}, "layer1_0": {"conv1": {"kernel"}, ...}}
      constants: {"bn1": {...}, "layer1_0": {"bn1": {...}, ...}}
    """
    params: Dict[str, Any] = {}
    constants: Dict[str, Any] = {}

    def as_np(v):
        try:
            return v.detach().cpu().numpy()
        except AttributeError:
            return np.asarray(v)

    def put(tree, path, value):
        node = tree
        for p in path[:-1]:
            node = node.setdefault(p, {})
        node[path[-1]] = value

    bn_fields = {
        "weight": "weight",
        "bias": "bias",
        "running_mean": "running_mean",
        "running_var": "running_var",
    }

    for raw_key, v in state_dict.items():
        key = _d2_to_torchvision_key(raw_key)
        if key.startswith("fc.") or key.endswith("num_batches_tracked"):
            continue
        parts = key.split(".")
        arr = as_np(v)

        if parts[0] == "conv1":
            put(params, ("conv1", "kernel"), np.transpose(arr, (2, 3, 1, 0)))
        elif parts[0] == "bn1":
            put(constants, ("bn1", bn_fields[parts[1]]), arr)
        elif parts[0].startswith("layer"):
            block = f"{parts[0]}_{parts[1]}"
            sub = parts[2]
            if sub.startswith("conv"):
                put(params, (block, sub, "kernel"), np.transpose(arr, (2, 3, 1, 0)))
            elif sub.startswith("bn"):
                put(constants, (block, sub, bn_fields[parts[3]]), arr)
            elif sub == "downsample":
                if parts[3] == "0":  # conv
                    put(params, (block, "downsample_conv", "kernel"),
                        np.transpose(arr, (2, 3, 1, 0)))
                else:  # bn
                    put(constants, (block, "downsample_bn", bn_fields[parts[4]]), arr)
        # anything else silently skipped (strict=False parity)

    return params, constants


def _linear(params, path, w, b=None):
    """torch nn.Linear (O, I) -> flax Dense kernel (I, O)."""
    _put(params, path + ("kernel",), np.transpose(np.asarray(w)))
    if b is not None:
        _put(params, path + ("bias",), np.asarray(b))


def _put(tree, path, value):
    node = tree
    for p in path[:-1]:
        node = node.setdefault(p, {})
    node[path[-1]] = np.asarray(value)


def port_boxer2d_state_dict(
    state_dict: Dict[str, Any],
    enc_layers: int,
) -> Tuple[Dict[str, Any], Dict[str, Any]]:
    """Convert a reference BoxeR-2D torch state_dict into (params, constants)
    pytrees matching `models.boxer2d.BoxeR2D`.

    Full-model equivalent of the reference's checkpoint loading
    (`e2edet/utils/checkpoint.py:19-33` `load_pretraind_state_dict`); key
    families and their flax targets:

      backbone.*                      -> params/constants backbone.trunk.*
      input_proj.{i}.{0,1}.*          -> input_proj{i}_conv / input_proj{i}_gn
      detector.* / enc_detector.*     -> detector.* / transformer.enc_detector.*
      transformer.encoder.layers.i.*  -> transformer.encoder_layers.* (STACKED
                                         leading layer axis - nn.scan layout)
      transformer.encoder.enc_linear  -> transformer.enc_linear/enc_norm
      transformer.decoder.layers.i.*  -> transformer.decoder_layer{i}.*
         .multihead_attn.*            ->   .cross_attn.* (box/instance attn)
         .self_attn.in_proj_*         ->   .self_attn.{query,key,value} (split)

    Layout rules: Linear (O, I) -> Dense kernel (I, O) transpose; Conv
    (O, I, kH, kW) -> (kH, kW, I, O); LayerNorm/GroupNorm weight -> scale.
    `kernel_indices` buffers are dropped (computed statically in flax).
    """

    def as_np(v):
        try:
            return v.detach().cpu().numpy()
        except AttributeError:
            return np.asarray(v)

    sd = {k: as_np(v) for k, v in state_dict.items()}
    # strip DDP prefix (parity `checkpoint.py:19-33`)
    sd = {(k[len("module."):] if k.startswith("module.") else k): v
          for k, v in sd.items()}

    params: Dict[str, Any] = {}
    constants: Dict[str, Any] = {}

    # ---- backbone -> trunk ----
    bb_sd = {k[len("backbone."):]: v for k, v in sd.items()
             if k.startswith("backbone.") and "position_encoding" not in k}
    bb_params, bb_constants = port_resnet_state_dict(bb_sd)
    params["backbone"] = {"trunk": bb_params}
    constants["backbone"] = {"trunk": bb_constants}

    def attn_block(dst_path, src):
        """Box/Instance attention module: linear_attn/linear_box (raw
        weight+bias parameters in torch) + value_proj/out_proj Linears."""
        _linear(params, dst_path + ("linear_attn",),
                src["linear_attn_weight"], src["linear_attn_bias"])
        _linear(params, dst_path + ("linear_box",),
                src["linear_box_weight"], src["linear_box_bias"])
        _linear(params, dst_path + ("value_proj",),
                src["value_proj.weight"], src["value_proj.bias"])
        _linear(params, dst_path + ("out_proj",),
                src["out_proj.weight"], src["out_proj.bias"])

    def norm(dst_path, prefix):
        _put(params, dst_path + ("scale",), sd[prefix + ".weight"])
        _put(params, dst_path + ("bias",), sd[prefix + ".bias"])

    def detector(dst_path, prefix):
        _linear(params, dst_path + ("class_embed",),
                sd[prefix + ".class_embed.weight"],
                sd[prefix + ".class_embed.bias"])
        j = 0
        while f"{prefix}.bbox_embed.layers.{j}.weight" in sd:
            _linear(params, dst_path + ("bbox_embed", f"layer{j}"),
                    sd[f"{prefix}.bbox_embed.layers.{j}.weight"],
                    sd[f"{prefix}.bbox_embed.layers.{j}.bias"])
            j += 1
        # mask head (SegmentMLP), use_mask checkpoints only. Torch structure
        # (reference `predictor.py:25-54`): layers.0.0 = ConvTranspose2d 2x2
        # upsample, layers.{1..n-1}.0 = hidden 1x1 Conv2d (+ReLU), layers.n =
        # output 1x1 Conv2d. Flax names: upsample / conv{i} / proj.
        mk = prefix + ".mask_embed.layers."
        layer_ids = sorted({int(k[len(mk):].split(".")[0])
                            for k in sd if k.startswith(mk)})
        for li in layer_ids:
            if li == 0:
                src, name = f"{mk}0.0", "upsample"
                # ConvTranspose2d (I, O, kH, kW) -> flax (kH, kW, I, O);
                # torch's ConvTranspose2d correlates with the kernel while
                # flax's ConvTranspose does NOT flip it — spatially reverse
                # kH/kW for equivalence (else each 2x2 output block is
                # mirrored, caught by the mask parity test)
                perm = (2, 3, 0, 1)
            elif li == layer_ids[-1]:
                src, name = f"{mk}{li}", "proj"
                # Conv2d (O, I, kH, kW) -> flax (kH, kW, I, O)
                perm = (2, 3, 1, 0)
            else:
                src, name = f"{mk}{li}.0", f"conv{li - 1}"
                perm = (2, 3, 1, 0)
            mpath = dst_path + ("mask_embed", name)
            w = np.transpose(sd[src + ".weight"], perm)
            if li == 0:
                w = w[::-1, ::-1]
            _put(params, mpath + ("kernel",), np.ascontiguousarray(w))
            _put(params, mpath + ("bias",), sd[src + ".bias"])

    # ---- input projections ----
    i = 0
    while f"input_proj.{i}.0.weight" in sd:
        _put(params, (f"input_proj{i}_conv", "kernel"),
             np.transpose(sd[f"input_proj.{i}.0.weight"], (2, 3, 1, 0)))
        _put(params, (f"input_proj{i}_conv", "bias"),
             sd[f"input_proj.{i}.0.bias"])
        _put(params, (f"input_proj{i}_gn", "scale"),
             sd[f"input_proj.{i}.1.weight"])
        _put(params, (f"input_proj{i}_gn", "bias"),
             sd[f"input_proj.{i}.1.bias"])
        i += 1

    # ---- detectors ----
    detector(("detector",), "detector")
    detector(("transformer", "enc_detector"), "enc_detector")

    # ---- encoder: stacked scan layout ----
    enc_stack: Dict[str, list] = {}

    def enc_collect(flax_rel: Tuple[str, ...], arr):
        enc_stack.setdefault(flax_rel, []).append(arr)

    for li in range(enc_layers):
        p = f"transformer.encoder.layers.{li}"
        sub = {k[len(p) + 1 + len("self_attn."):]: v for k, v in sd.items()
               if k.startswith(p + ".self_attn.")}
        # per-layer attn: collect transposed linears
        enc_collect(("self_attn", "linear_attn", "kernel"),
                    np.transpose(sub["linear_attn_weight"]))
        enc_collect(("self_attn", "linear_attn", "bias"),
                    sub["linear_attn_bias"])
        enc_collect(("self_attn", "linear_box", "kernel"),
                    np.transpose(sub["linear_box_weight"]))
        enc_collect(("self_attn", "linear_box", "bias"),
                    sub["linear_box_bias"])
        enc_collect(("self_attn", "value_proj", "kernel"),
                    np.transpose(sub["value_proj.weight"]))
        enc_collect(("self_attn", "value_proj", "bias"),
                    sub["value_proj.bias"])
        enc_collect(("self_attn", "out_proj", "kernel"),
                    np.transpose(sub["out_proj.weight"]))
        enc_collect(("self_attn", "out_proj", "bias"), sub["out_proj.bias"])
        for name in ("linear1", "linear2"):
            enc_collect((name, "kernel"),
                        np.transpose(sd[f"{p}.{name}.weight"]))
            enc_collect((name, "bias"), sd[f"{p}.{name}.bias"])
        for name in ("norm1", "norm2"):
            enc_collect((name, "scale"), sd[f"{p}.{name}.weight"])
            enc_collect((name, "bias"), sd[f"{p}.{name}.bias"])

    enc_tree: Dict[str, Any] = {}
    for rel, arrs in enc_stack.items():
        _put(enc_tree, rel, np.stack(arrs))
    params.setdefault("transformer", {})["encoder_layers"] = enc_tree

    if "transformer.encoder.enc_linear.0.weight" in sd:
        _linear(params, ("transformer", "enc_linear"),
                sd["transformer.encoder.enc_linear.0.weight"],
                sd["transformer.encoder.enc_linear.0.bias"])
        _put(params, ("transformer", "enc_norm", "scale"),
             sd["transformer.encoder.enc_linear.1.weight"])
        _put(params, ("transformer", "enc_norm", "bias"),
             sd["transformer.encoder.enc_linear.1.bias"])

    # ---- decoder (unrolled layers) ----
    li = 0
    while f"transformer.decoder.layers.{li}.norm1.weight" in sd:
        p = f"transformer.decoder.layers.{li}"
        dst = ("transformer", f"decoder_layer{li}")
        # dense self-attention: split fused in_proj into q/k/v
        w = sd[f"{p}.self_attn.in_proj_weight"]
        b = sd[f"{p}.self_attn.in_proj_bias"]
        d = w.shape[0] // 3
        for j, name in enumerate(("query", "key", "value")):
            _linear(params, dst + ("self_attn", name),
                    w[j * d:(j + 1) * d], b[j * d:(j + 1) * d])
        _linear(params, dst + ("self_attn", "out"),
                sd[f"{p}.self_attn.out_proj.weight"],
                sd[f"{p}.self_attn.out_proj.bias"])
        sub = {k[len(p) + 1 + len("multihead_attn."):]: v
               for k, v in sd.items() if k.startswith(p + ".multihead_attn.")}
        attn_block(dst + ("cross_attn",),
                   {k: v for k, v in sub.items()})
        for name in ("linear1", "linear2"):
            _linear(params, dst + (name,), sd[f"{p}.{name}.weight"],
                    sd[f"{p}.{name}.bias"])
        for name in ("norm1", "norm2", "norm3"):
            if f"{p}.{name}.weight" in sd:
                norm(dst + (name,), f"{p}.{name}")
        li += 1

    return params, constants


def apply_boxer2d_weights(variables, torch_state_dict, enc_layers: int):
    """Merge a full ported BoxeR-2D torch state_dict into a flax variables
    pytree. Raises on shape mismatches; entries absent from the flax tree
    are reported (returned) rather than silently dropped."""
    import jax.numpy as jnp

    ported_params, ported_constants = port_boxer2d_state_dict(
        torch_state_dict, enc_layers)

    unmatched = []

    def merge(dst, src, path=""):
        out = dict(dst)
        for k, v in src.items():
            if k not in dst:
                unmatched.append(path + k)
                continue
            if isinstance(v, dict):
                out[k] = merge(dst[k], v, path + k + "/")
            else:
                if tuple(dst[k].shape) != tuple(v.shape):
                    raise ValueError(
                        f"Shape mismatch at {path + k}: "
                        f"{dst[k].shape} vs {v.shape}")
                out[k] = jnp.asarray(v, dtype=dst[k].dtype)
        return out

    new_vars = dict(variables)
    new_vars["params"] = merge(variables["params"], ported_params)
    if "constants" in variables:
        new_vars["constants"] = merge(variables["constants"],
                                      ported_constants)
    return new_vars, unmatched


def load_torch_checkpoint(path: str) -> Dict[str, Any]:
    """Load a torch .pth checkpoint to a flat numpy state dict (CPU only)."""
    import torch

    obj = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(obj, dict) and "state_dict" in obj:
        obj = obj["state_dict"]
    if isinstance(obj, dict) and "model" in obj and isinstance(obj["model"], dict):
        obj = obj["model"]
    return {k: v for k, v in obj.items()}


def apply_backbone_weights(variables, torch_state_dict):
    """Merge ported resnet weights into a BackBone variables pytree.

    variables: {"params": {"trunk": ...}, "constants": {"trunk": ...}}
    Unmatched model entries keep their initialized values; shape mismatches
    raise.
    """
    import jax.numpy as jnp

    ported_params, ported_constants = port_resnet_state_dict(torch_state_dict)

    def merge(dst, src, path=""):
        out = dict(dst)
        for k, v in src.items():
            if k not in dst:
                continue
            if isinstance(v, dict):
                out[k] = merge(dst[k], v, path + k + "/")
            else:
                if tuple(dst[k].shape) != tuple(v.shape):
                    raise ValueError(
                        f"Shape mismatch at {path + k}: "
                        f"{dst[k].shape} vs {v.shape}"
                    )
                out[k] = jnp.asarray(v, dtype=dst[k].dtype)
        return out

    new_vars = dict(variables)
    new_vars["params"] = dict(new_vars["params"])
    new_vars["constants"] = dict(new_vars["constants"])
    new_vars["params"]["trunk"] = merge(
        variables["params"]["trunk"], ported_params
    )
    new_vars["constants"]["trunk"] = merge(
        variables["constants"]["trunk"], ported_constants
    )
    return new_vars
