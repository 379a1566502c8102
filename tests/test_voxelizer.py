"""Voxelizer correctness: vectorized numpy vs a naive loop oracle vs the
native C++ implementation; 3D transforms sanity; collision test."""

import numpy as np
import pytest

from boxer_tpu.dataset.processor.voxelizer import points_to_voxel


def naive_points_to_voxel(points, voxel_size, pc_range, max_points,
                          max_voxels):
    """Direct per-point loop mirroring the reference algorithm semantics."""
    voxel_size = np.asarray(voxel_size, np.float32)
    pc_range = np.asarray(pc_range, np.float32)
    grid = np.round((pc_range[3:] - pc_range[:3]) / voxel_size).astype(np.int64)

    voxel_of = {}
    voxels, coords, counts = [], [], []
    for pt in points:
        c = np.floor((pt[:3] - pc_range[:3]) / voxel_size).astype(np.int64)
        if (c < 0).any() or (c >= grid).any():
            continue
        key = tuple(c)
        if key not in voxel_of:
            if len(voxels) >= max_voxels:
                continue
            voxel_of[key] = len(voxels)
            voxels.append(np.zeros((max_points, points.shape[1]), points.dtype))
            coords.append(c[[2, 1, 0]])
            counts.append(0)
        v = voxel_of[key]
        if counts[v] < max_points:
            voxels[v][counts[v]] = pt
            counts[v] += 1
    if not voxels:
        return (np.zeros((0, max_points, points.shape[1]), points.dtype),
                np.zeros((0, 3), np.int32), np.zeros((0,), np.int32))
    return (np.stack(voxels), np.stack(coords).astype(np.int32),
            np.asarray(counts, np.int32))


VOXEL_SIZE = (0.32, 0.32, 6.0)
PC_RANGE = (-5.12, -5.12, -3.0, 5.12, 5.12, 3.0)


@pytest.mark.parametrize("seed", [0, 1, 2])
@pytest.mark.parametrize("max_points,max_voxels", [(5, 1000), (3, 50)])
def test_numpy_matches_naive(seed, max_points, max_voxels):
    rng = np.random.RandomState(seed)
    pts = rng.uniform(-6, 6, (2000, 5)).astype(np.float32)

    v1, c1, n1 = points_to_voxel(pts, VOXEL_SIZE, PC_RANGE,
                                 max_points=max_points, max_voxels=max_voxels)
    v2, c2, n2 = naive_points_to_voxel(pts, VOXEL_SIZE, PC_RANGE,
                                       max_points, max_voxels)
    np.testing.assert_array_equal(c1, c2)
    np.testing.assert_array_equal(n1, n2)
    np.testing.assert_allclose(v1, v2)


def test_native_matches_numpy():
    from boxer_tpu import native

    if not native.ensure_built():
        pytest.skip("native library not built")
    rng = np.random.RandomState(3)
    pts = rng.uniform(-6, 6, (5000, 5)).astype(np.float32)
    v1, c1, n1 = points_to_voxel(pts, VOXEL_SIZE, PC_RANGE, max_points=8,
                                 max_voxels=2000)
    out = native.points_to_voxel_native(pts, VOXEL_SIZE, PC_RANGE,
                                        max_points=8, max_voxels=2000)
    v2, c2, n2 = out
    np.testing.assert_array_equal(c1, c2)
    np.testing.assert_array_equal(n1, n2)
    np.testing.assert_allclose(v1, v2)


def test_native_collision_matches_numpy():
    from boxer_tpu import native
    from boxer_tpu.dataset.helper.database_sampler import box_collision_test

    if not native.ensure_built():
        pytest.skip("native library not built")
    rng = np.random.RandomState(0)
    boxes = np.concatenate([
        rng.uniform(-10, 10, (12, 2)), rng.uniform(-1, 1, (12, 1)),
        rng.uniform(1, 4, (12, 3)), rng.uniform(-np.pi, np.pi, (12, 1)),
    ], axis=1).astype(np.float32)
    qboxes = np.concatenate([
        rng.uniform(-10, 10, (9, 2)), rng.uniform(-1, 1, (9, 1)),
        rng.uniform(1, 4, (9, 3)), rng.uniform(-np.pi, np.pi, (9, 1)),
    ], axis=1).astype(np.float32)
    ours = box_collision_test(boxes, qboxes)
    theirs = native.box_collision_test_native(boxes, qboxes)
    np.testing.assert_array_equal(ours, theirs)


def test_native_rle_matches_numpy():
    from boxer_tpu import native
    from boxer_tpu.utils.rle import mask_to_rle_counts

    if not native.ensure_built():
        pytest.skip("native library not built")
    rng = np.random.RandomState(1)
    mask = rng.rand(37, 53) > 0.6
    assert native.mask_to_rle_counts_native(mask) == mask_to_rle_counts(mask)


def test_3d_transform_roundtrip():
    from boxer_tpu.dataset.processor.transforms_3d import (
        global_rotation, normalize3d)

    rng = np.random.RandomState(0)
    pts = rng.uniform(-50, 50, (100, 5)).astype(np.float32)
    boxes = np.concatenate([
        rng.uniform(-50, 50, (5, 2)), rng.uniform(-1, 3, (5, 1)),
        rng.uniform(1, 5, (5, 3)), rng.uniform(-np.pi, np.pi, (5, 1)),
    ], axis=1).astype(np.float32)
    sample = {"points": pts}
    target = {"boxes": boxes, "labels": np.arange(5)}

    s2, t2 = global_rotation(sample, target, rng, rotation=0.5)
    # rotation preserves distances from origin (xy-plane)
    np.testing.assert_allclose(
        np.linalg.norm(pts[:, :2], axis=1),
        np.linalg.norm(s2["points"][:, :2], axis=1), rtol=1e-5)

    _, t3 = normalize3d(s2, t2, np.asarray(
        [-75, -75, -3, 75, 75, 5], np.float32), "sigmoid")
    assert t3["boxes"].shape[1] == 7
    assert (t3["boxes"] >= 0).all() and (t3["boxes"] <= 1).all()


def test_multi_sweep_reading(tmp_path):
    """read_points_with_sweeps: ego-motion transform + time-lag column."""
    import os

    from boxer_tpu.dataset.waymo import read_points_with_sweeps

    rng = np.random.RandomState(0)
    key_pts = rng.rand(10, 5).astype(np.float32)
    sweep_pts = rng.rand(6, 5).astype(np.float32)
    np.savez(tmp_path / "key.npz", points=key_pts)
    np.savez(tmp_path / "sweep.npz", points=sweep_pts)

    # pure-translation transform
    tm = np.eye(4, dtype=np.float32)
    tm[:3, 3] = [1.0, -2.0, 0.5]
    info = {
        "path": str(tmp_path / "key.npz"),
        "sweeps": [{"path": str(tmp_path / "sweep.npz"),
                    "transform_matrix": tm, "time_lag": 0.1}],
    }
    out = read_points_with_sweeps(info, str(tmp_path), nsweeps=2)
    assert out.shape == (16, 6)  # 5 features + time lag
    np.testing.assert_allclose(out[:10, :5], key_pts, rtol=1e-6)
    np.testing.assert_allclose(out[:10, 5], 0.0)
    np.testing.assert_allclose(out[10:, :3],
                               sweep_pts[:, :3] + tm[:3, 3], rtol=1e-5)
    np.testing.assert_allclose(out[10:, 5], 0.1, rtol=1e-6)

    # nsweeps=1 ignores sweeps and keeps raw features
    out1 = read_points_with_sweeps(info, str(tmp_path), nsweeps=1)
    assert out1.shape == (10, 5)
