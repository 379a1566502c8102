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
