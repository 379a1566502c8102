"""Point-cloud voxelization (host-side).

TPU-native replacement for the reference's numba JIT voxelizers
(`e2edet/utils/det3d/general.py:259-432` `_points_to_voxel_reverse_kernel` /
`points_to_voxel`): a *vectorized numpy* implementation (no per-point Python
loop) that preserves the reference's semantics:

- points map to voxels by floor((p - range_min) / voxel_size)
- out-of-range points dropped
- voxel order = order of first point arrival (reference iterates points in
  order and appends new voxels)
- at most `max_points` per voxel (first arrivals kept), at most `max_voxels`
  voxels (later voxels dropped)
- `reverse=True` emits coordinates as (z, y, x)

A C++ native variant lives in `boxer_tpu/native/` (same contract, used when
built — this numpy path is the portable fallback and the test oracle).
"""

from typing import Tuple

import numpy as np


def points_to_voxel(points: np.ndarray, voxel_size, pc_range,
                    max_points: int = 35, reverse: bool = True,
                    max_voxels: int = 20000
                    ) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """points: (N, F>=3). Returns (voxels (V, max_points, F),
    coords (V, 3) int32 [z,y,x] if reverse, num_points_per_voxel (V,))."""
    voxel_size = np.asarray(voxel_size, np.float32)
    pc_range = np.asarray(pc_range, np.float32)
    grid = np.round((pc_range[3:] - pc_range[:3]) / voxel_size).astype(np.int64)

    coor = np.floor(
        (points[:, :3] - pc_range[:3]) / voxel_size).astype(np.int64)
    in_range = ((coor >= 0) & (coor < grid)).all(axis=1)
    pts = points[in_range]
    coor = coor[in_range]

    if len(pts) == 0:
        f = points.shape[1]
        return (np.zeros((0, max_points, f), points.dtype),
                np.zeros((0, 3), np.int32), np.zeros((0,), np.int32))

    # linear voxel id per point
    lin = (coor[:, 2] * grid[1] + coor[:, 1]) * grid[0] + coor[:, 0]

    # first-arrival voxel ordering: stable unique
    uniq, first_idx, inverse = np.unique(lin, return_index=True,
                                         return_inverse=True)
    order = np.argsort(first_idx, kind="stable")  # voxel ids by first arrival
    rank_of_uniq = np.empty_like(order)
    rank_of_uniq[order] = np.arange(len(order))
    voxel_rank = rank_of_uniq[inverse]  # per-point voxel index (arrival order)

    keep_voxel = voxel_rank < max_voxels

    # per-point slot within its voxel (arrival order within voxel)
    sort_key = np.argsort(voxel_rank, kind="stable")
    sorted_rank = voxel_rank[sort_key]
    # position within each group
    group_start = np.searchsorted(sorted_rank, np.arange(sorted_rank.max() + 1))
    slot_sorted = np.arange(len(sorted_rank)) - group_start[sorted_rank]
    slot = np.empty_like(slot_sorted)
    slot[sort_key] = slot_sorted

    keep = keep_voxel & (slot < max_points)
    v = min(int(voxel_rank.max()) + 1, max_voxels)

    f = pts.shape[1]
    voxels = np.zeros((v, max_points, f), points.dtype)
    voxels[voxel_rank[keep], slot[keep]] = pts[keep]

    num_points = np.zeros((v,), np.int32)
    np.add.at(num_points, voxel_rank[keep], 1)

    # coords of each kept voxel (from its first point)
    first_point_idx = np.zeros((v,), np.int64)
    first_point_idx[voxel_rank[keep]] = 0  # init
    # first arrival index per voxel: use first_idx mapping
    arrival_idx = first_idx[order][:v]
    vc = coor[arrival_idx]
    coords = (vc[:, [2, 1, 0]] if reverse else vc).astype(np.int32)

    return voxels, coords, num_points


def pad_voxels(voxels, coords, num_points, batch_idx: int, max_voxels: int):
    """Pad to fixed (max_voxels, ...) capacity with batch-prefixed coords
    (b, z, y, x); padding rows get b = -1 (dropped by the scatter).

    Fixed shapes are what makes the TPU path compile once (the reference
    concatenates ragged voxel sets per batch, `collate_fn.py:115-168`)."""
    v, p, f = voxels.shape
    out_v = np.zeros((max_voxels, p, f), voxels.dtype)
    out_c = np.full((max_voxels, 4), -1, np.int32)
    out_n = np.zeros((max_voxels,), np.int32)
    n = min(v, max_voxels)
    out_v[:n] = voxels[:n]
    out_c[:n, 0] = batch_idx
    out_c[:n, 1:] = coords[:n]
    out_n[:n] = num_points[:n]
    return out_v, out_c, out_n
