"""3D (BEV) backbone: PillarFeatureNet → scatter → ConvNet neck.

Parity targets: reference `e2edet/module/backbone3d.py` — ConvNet
(3×3 conv stages with stride/filters config, :8-81), Backbone3d
(reader→extractor→neck + per-level position encodings, :85-135),
build_backbone3d (:138-167).
"""

from typing import Any, Optional, Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp

from boxer_tpu.nn.point_pillar import PillarFeatureNet, PointPillarsScatter
from boxer_tpu.nn.position_encoding import build_position_encoding


class ConvNet(nn.Module):
    num_layers: Sequence[int] = (2, 3, 3)
    ds_strides: Sequence[int] = (1, 2, 2)
    ds_filters: Sequence[int] = (256, 512, 1024)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        outs = []
        for i, (n, s, f) in enumerate(
                zip(self.num_layers, self.ds_strides, self.ds_filters)):
            for j in range(n):
                stride = s if j == 0 else 1
                x = nn.Conv(f, (3, 3), strides=(stride, stride),
                            padding=[(1, 1), (1, 1)], use_bias=False,
                            kernel_init=nn.initializers.he_normal(),
                            dtype=self.dtype, name=f"stage{i}_conv{j}")(x)
                x = nn.GroupNorm(num_groups=32, dtype=self.dtype,
                                 name=f"stage{i}_norm{j}")(x)
                x = nn.relu(x)
            outs.append((x, None))
        return outs


class Backbone3d(nn.Module):
    hidden_dim: int = 256
    reader_cfg: dict = None
    extractor_cfg: dict = None
    neck_cfg: dict = None
    ref_size: int = 4
    position_encoding: Optional[str] = "fixed_box"
    return_layers: int = 2
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, voxels, coordinates, num_points_per_voxel,
                 batch_size: int, input_shape: Tuple[int, int]):
        reader = PillarFeatureNet(dtype=self.dtype, name="reader",
                                  **(self.reader_cfg or {}))
        extractor = PointPillarsScatter(**(self.extractor_cfg or {}))

        feats = reader(voxels, num_points_per_voxel, coordinates)
        canvas = extractor(feats, coordinates, batch_size, input_shape)

        if self.neck_cfg is not None:
            neck = ConvNet(dtype=self.dtype, name="neck", **self.neck_cfg)
            outs = neck(canvas)
        else:
            outs = [(canvas, None)]

        outs = outs[-self.return_layers:]
        pos = []
        if self.position_encoding is not None:
            pe = build_position_encoding(self.position_encoding,
                                         self.hidden_dim)
            for x, mask in outs:
                pos.append(pe(x, mask, self.ref_size).astype(x.dtype))
        else:
            pos = [None] * len(outs)
        return outs, pos


def build_backbone3d(config, dtype=jnp.float32) -> Backbone3d:
    params = config["params"]
    assert config["type"] == "pointpillar", config["type"]
    neck = params.get("neck")
    neck_cfg = None
    if neck is not None:
        neck_cfg = {
            "num_layers": tuple(neck["num_layers"]),
            "ds_strides": tuple(neck["ds_strides"]),
            "ds_filters": tuple(neck["ds_filters"]),
        }
    reader = params.get("reader", {})
    reader_cfg = {
        "num_input_features": reader.get("num_input_features", 5),
        "num_filters": tuple(reader.get("num_filters", (64,))),
        "voxel_size": tuple(reader.get("voxel_size", (0.32, 0.32, 6.0))),
        "pc_range": tuple(reader.get("pc_range",
                                     (-74.88, -74.88, -2, 74.88, 74.88, 4))),
    }
    extractor = params.get("extractor", {})
    return Backbone3d(
        hidden_dim=params["hidden_dim"],
        reader_cfg=reader_cfg,
        extractor_cfg={"num_input_features":
                       extractor.get("num_input_features", 64)},
        neck_cfg=neck_cfg,
        ref_size=params.get("ref_size", 4),
        position_encoding=params.get("position_encoding"),
        return_layers=params.get("return_layers", 2),
        dtype=dtype,
    )
