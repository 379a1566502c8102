"""ResNet backbone (Flax, NHWC) with frozen batch-norm.

Parity targets: reference `e2edet/module/resnet.py` — FrozenBatchNorm2d
(:46-95), Bottleneck with `stride_in_1x1` option (:98-157), BackBone returning
per-layer (feature, interpolated mask) + position encodings (:365-391),
resnet50/101(±dc5) variants (:430-485).

TPU-first design:
- NHWC layout throughout (XLA TPU's native conv layout).
- FrozenBN folded into a single scale/bias affine. Its statistics live in a
  separate Flax collection ``constants`` so they are never touched by the
  optimizer (the reference registers them as buffers).
- Torchvision weight porting handled by `boxer_tpu/utils/torch_port.py`.
"""

from typing import Any, List, Optional, Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp

from boxer_tpu.nn.position_encoding import build_position_encoding


def interpolate_mask_nearest(mask, size: Tuple[int, int]):
    """Torch `F.interpolate(mode='nearest')` parity for bool masks.

    mask: (B, H, W) -> (B, size[0], size[1]), src index = floor(dst * in/out).
    """
    b, h, w = mask.shape
    oh, ow = size
    rows = jnp.floor(jnp.arange(oh) * (h / oh)).astype(jnp.int32)
    cols = jnp.floor(jnp.arange(ow) * (w / ow)).astype(jnp.int32)
    return mask[:, rows][:, :, cols]


class FrozenBatchNorm(nn.Module):
    """Affine with fixed statistics; `y = x * scale + bias` where
    scale = w / sqrt(var + eps), bias = b - mean * scale.
    Stats live in the ``constants`` collection (non-trainable)."""

    features: int
    eps: float = 1e-5
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        w = self.variable("constants", "weight", nn.initializers.ones, None,
                          (self.features,)).value
        b = self.variable("constants", "bias", nn.initializers.zeros, None,
                          (self.features,)).value
        rm = self.variable("constants", "running_mean", nn.initializers.zeros,
                           None, (self.features,)).value
        rv = self.variable("constants", "running_var", nn.initializers.ones,
                           None, (self.features,)).value
        scale = w * jnp.reciprocal(jnp.sqrt(rv + self.eps))
        bias = b - rm * scale
        return x * scale.astype(x.dtype) + bias.astype(x.dtype)


class Bottleneck(nn.Module):
    planes: int
    stride: int = 1
    dilation: int = 1
    has_downsample: bool = False
    stride_in_1x1: bool = False
    dtype: Any = jnp.float32

    expansion = 4

    @nn.compact
    def __call__(self, x):
        width = self.planes
        s1, s3 = (self.stride, 1) if self.stride_in_1x1 else (1, self.stride)

        out = nn.Conv(width, (1, 1), strides=(s1, s1), use_bias=False,
                      dtype=self.dtype, name="conv1")(x)
        out = FrozenBatchNorm(width, name="bn1")(out)
        out = nn.relu(out)

        out = nn.Conv(width, (3, 3), strides=(s3, s3),
                      kernel_dilation=(self.dilation, self.dilation),
                      padding=[(self.dilation,) * 2, (self.dilation,) * 2],
                      use_bias=False, dtype=self.dtype, name="conv2")(out)
        out = FrozenBatchNorm(width, name="bn2")(out)
        out = nn.relu(out)

        out = nn.Conv(width * self.expansion, (1, 1), use_bias=False,
                      dtype=self.dtype, name="conv3")(out)
        out = FrozenBatchNorm(width * self.expansion, name="bn3")(out)

        if self.has_downsample:
            identity = nn.Conv(width * self.expansion, (1, 1),
                               strides=(self.stride, self.stride),
                               use_bias=False, dtype=self.dtype,
                               name="downsample_conv")(x)
            identity = FrozenBatchNorm(width * self.expansion,
                                       name="downsample_bn")(identity)
        else:
            identity = x
        return nn.relu(out + identity)


class ResNetBackbone(nn.Module):
    """Torchvision-compatible ResNet trunk returning intermediate layers.

    layers: block counts, e.g. (3, 4, 6, 3) for R50.
    return_layers: subset of {"layer1".."layer4"} to emit (sorted order).
    replace_stride_with_dilation: per-layer2..4 flags (dc5 variants).
    """

    layers: Sequence[int] = (3, 4, 6, 3)
    return_layers: Sequence[str] = ("layer2", "layer3", "layer4")
    replace_stride_with_dilation: Sequence[bool] = (False, False, False)
    stride_in_1x1: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, mask: Optional[jnp.ndarray] = None):
        x = nn.Conv(64, (7, 7), strides=(2, 2), padding=[(3, 3), (3, 3)],
                    use_bias=False, dtype=self.dtype, name="conv1")(x)
        x = FrozenBatchNorm(64, name="bn1")(x)
        x = nn.relu(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)])

        outs: List[Tuple[jnp.ndarray, Optional[jnp.ndarray]]] = []
        planes = 64
        dilation = 1
        ret = set(self.return_layers)
        for stage_idx, blocks in enumerate(self.layers):
            layer_name = f"layer{stage_idx + 1}"
            stride = 1 if stage_idx == 0 else 2
            if stage_idx > 0 and self.replace_stride_with_dilation[stage_idx - 1]:
                dilation *= stride
                stride = 1
            for block_idx in range(blocks):
                x = Bottleneck(
                    planes=planes,
                    stride=stride if block_idx == 0 else 1,
                    dilation=dilation,
                    has_downsample=(block_idx == 0),
                    stride_in_1x1=self.stride_in_1x1,
                    dtype=self.dtype,
                    name=f"{layer_name}_{block_idx}",
                )(x)
            planes *= 2
            if layer_name in ret:
                if mask is not None:
                    m = interpolate_mask_nearest(mask, x.shape[1:3])
                else:
                    m = None
                outs.append((x, m))
        return outs


class BackBone(nn.Module):
    """ResNet trunk + per-level position encodings.

    Mirrors reference `BackBone._forward_impl` (`resnet.py:365-391`): returns
    [(feature NHWC, mask)], [pos NHWC].
    """

    arch: str = "resnet50"
    return_layers: Sequence[str] = ("layer2", "layer3", "layer4")
    position_encoding: Optional[str] = "fixed_box"
    hidden_dim: int = 256
    ref_size: int = 4
    dtype: Any = jnp.float32

    @property
    def num_channels(self) -> List[int]:
        channels = {"layer1": 256, "layer2": 512, "layer3": 1024, "layer4": 2048}
        return [channels[l] for l in sorted(self.return_layers)]

    @nn.compact
    def __call__(self, x, mask: Optional[jnp.ndarray] = None):
        layers, dilation = _arch_spec(self.arch)
        trunk = ResNetBackbone(
            layers=layers,
            return_layers=tuple(sorted(self.return_layers)),
            replace_stride_with_dilation=dilation,
            dtype=self.dtype,
            name="trunk",
        )
        outs = trunk(x, mask)

        pos = []
        if self.position_encoding is not None:
            pe = build_position_encoding(self.position_encoding, self.hidden_dim)
            for feat, m in outs:
                pos.append(pe(feat, m, self.ref_size).astype(feat.dtype))
        else:
            pos = [None] * len(outs)
        return outs, pos


def _arch_spec(arch: str):
    if arch in ("resnet50", "resnet50_dc5"):
        layers = (3, 4, 6, 3)
    elif arch in ("resnet101", "resnet101_dc5"):
        layers = (3, 4, 23, 3)
    elif arch == "resnet10":
        # one bottleneck per stage: same structure/channel widths as R50,
        # 4x fewer conv blocks. Test/dryrun-only (cuts XLA:CPU compile of
        # the sharded dryrun train step; no reference counterpart).
        layers = (1, 1, 1, 1)
    else:
        raise ValueError(f"Unknown resnet arch: {arch}")
    dilation = (False, False, arch.endswith("_dc5"))
    return layers, dilation


def build_resnet(config, dtype=jnp.float32) -> BackBone:
    """Config-surface parity with reference `build_resnet` (`resnet.py:430-485`)."""
    params = config["params"]
    return BackBone(
        arch=config["type"],
        return_layers=tuple(params.get("return_interm_layers") or ("layer4",)),
        position_encoding=params.get("position_encoding"),
        hidden_dim=params["hidden_dim"],
        ref_size=params.get("ref_size", 4),
        dtype=dtype,
    )
