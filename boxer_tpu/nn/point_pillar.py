"""PointPillars: pillar feature net + dense BEV scatter.

Parity targets: reference `e2edet/module/point_pillar.py` —
PillarFeatureNet feature decoration (cluster-center + pillar-center offsets,
:179-224), PFNLayer linear+norm+ReLU+max (:70-126), PointPillarsScatter
sparse→dense canvas (:8-67).

TPU-first design: fixed-capacity voxel tensors (V, P, F) with per-voxel point
counts (the host voxelizer emits fixed shapes); the scatter is one
`.at[].set` with batch-flattened linear indices instead of a per-sample
Python loop (XLA scatter). Norm layer is GroupNorm by default (the
reference's SyncBN alternative, `point_pillar.py:93-94`); BatchNorm stats
would require a mutable collection and is config-gated.
"""

from typing import Any, Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp


class PFNLayer(nn.Module):
    out_channels: int
    last_layer: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, point_mask):
        """x: (V, P, C); point_mask: (V, P) bool."""
        out = self.out_channels if self.last_layer else self.out_channels // 2
        h = nn.Dense(out, use_bias=False,
                     kernel_init=nn.initializers.xavier_uniform(),
                     dtype=self.dtype, name="linear")(x)
        h = nn.GroupNorm(num_groups=min(32, out), dtype=self.dtype,
                         name="norm")(h)
        h = nn.relu(h)
        h = jnp.where(point_mask[..., None], h, -1e9)
        h_max = h.max(axis=1, keepdims=True)
        if self.last_layer:
            return h_max
        h = jnp.where(point_mask[..., None], h, 0.0)
        h_rep = jnp.broadcast_to(h_max, h.shape)
        return jnp.concatenate([h, h_rep], axis=-1)


class PillarFeatureNet(nn.Module):
    num_input_features: int = 4
    num_filters: Sequence[int] = (64,)
    with_distance: bool = False
    voxel_size: Sequence[float] = (0.2, 0.2, 4)
    pc_range: Sequence[float] = (0, -40, -3, 70.4, 40, 1)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, features, num_voxels, coors):
        """features: (V, P, F); num_voxels: (V,) points per pillar;
        coors: (V, 4) [b, z, y, x]. Returns (V, num_filters[-1])."""
        v, p, f = features.shape
        denom = jnp.clip(num_voxels.astype(features.dtype), 1.0, None)
        points_mean = (features[:, :, :3].sum(axis=1, keepdims=True)
                       / denom[:, None, None])
        f_cluster = features[:, :, :3] - points_mean

        vx, vy = self.voxel_size[0], self.voxel_size[1]
        x_offset = vx / 2 + self.pc_range[0]
        y_offset = vy / 2 + self.pc_range[1]
        fx = features[:, :, 0] - (
            coors[:, 3].astype(features.dtype)[:, None] * vx + x_offset)
        fy = features[:, :, 1] - (
            coors[:, 2].astype(features.dtype)[:, None] * vy + y_offset)
        f_center = jnp.stack([fx, fy], axis=-1)

        feats = [features, f_cluster, f_center]
        if self.with_distance:
            feats.append(jnp.linalg.norm(features[:, :, :3], axis=-1,
                                         keepdims=True))
        x = jnp.concatenate(feats, axis=-1)

        point_mask = (jnp.arange(p)[None, :]
                      < num_voxels[:, None]).astype(bool)
        x = jnp.where(point_mask[..., None], x, 0.0)

        n = len(self.num_filters)
        for i, out in enumerate(self.num_filters):
            x = PFNLayer(out, last_layer=(i == n - 1), dtype=self.dtype,
                         name=f"pfn{i}")(x, point_mask)
        return x.squeeze(1)


class PointPillarsScatter(nn.Module):
    num_input_features: int = 64

    def __call__(self, voxel_features, coords, batch_size: int,
                 input_shape: Tuple[int, int]):
        """voxel_features: (V, C); coords: (V, 4) [b, z, y, x] with b = -1 for
        padding voxels; input_shape: static (nx, ny).
        Returns dense canvas (B, ny, nx, C) NHWC."""
        nx, ny = int(input_shape[0]), int(input_shape[1])
        c = voxel_features.shape[-1]
        total = batch_size * ny * nx

        b = coords[:, 0]
        lin = b * (ny * nx) + coords[:, 2] * nx + coords[:, 3]
        lin = jnp.where(b >= 0, lin, total)  # padding -> dropped
        canvas = jnp.zeros((total + 1, c), voxel_features.dtype)
        canvas = canvas.at[lin].set(voxel_features, mode="drop")
        return canvas[:total].reshape(batch_size, ny, nx, c)
