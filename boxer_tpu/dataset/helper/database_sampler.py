"""GT-database augmentation sampler.

Parity target: reference `e2edet/dataset/helper/database_sampler.py:111-226`
(class-balanced sampling of cropped GT objects + BEV collision rejection)
and the numba `box_collision_test` (`det3d/general.py:586`) — here a
vectorized numpy separating-axis test over rotated BEV rectangles.
"""

import os
import pickle
from typing import Dict, List, Optional

import numpy as np


def _bev_corners(boxes: np.ndarray) -> np.ndarray:
    """boxes (N, 7+) [x,y,z,l,w,h,...,rad] -> BEV corners (N, 4, 2)."""
    n = len(boxes)
    if n == 0:
        return np.zeros((0, 4, 2), np.float32)
    l = boxes[:, 3] / 2
    w = boxes[:, 4] / 2
    rad = boxes[:, -1]
    template = np.array([[1, 1], [1, -1], [-1, -1], [-1, 1]], np.float32)
    corners = template[None] * np.stack([l, w], axis=-1)[:, None, :]
    c, s = np.cos(rad), np.sin(rad)
    rot = np.stack([np.stack([c, s], -1), np.stack([-s, c], -1)], axis=-2)
    corners = np.einsum("nij,njk->nik", corners, rot)
    return corners + boxes[:, None, :2]


def box_collision_test(boxes: np.ndarray, qboxes: np.ndarray) -> np.ndarray:
    """(N, M) bool: rotated-BEV-rectangle overlap via SAT over both boxes'
    edge normals. Parity target: `det3d/general.py:586` (numba polygon test)."""
    n, m = len(boxes), len(qboxes)
    if n == 0 or m == 0:
        return np.zeros((n, m), bool)
    c1 = _bev_corners(boxes)   # (N, 4, 2)
    c2 = _bev_corners(qboxes)  # (M, 4, 2)

    def axes(corners):
        edges = np.roll(corners, -1, axis=1) - corners  # (K, 4, 2)
        normals = np.stack([-edges[..., 1], edges[..., 0]], axis=-1)
        norm = np.linalg.norm(normals, axis=-1, keepdims=True)
        return normals / np.maximum(norm, 1e-9)

    a1 = axes(c1)  # (N, 4, 2)
    a2 = axes(c2)  # (M, 4, 2)

    # project both corner sets on each axis set
    def separated(axes_k, axes_owner_is_first):
        # axes_k: (K, 4, 2) with K = N or M
        # proj1: (N, M, 4axes, 4corners)
        if axes_owner_is_first:
            ax = a1[:, None]              # (N, 1, 4, 2)
        else:
            ax = a2[None, :]              # (1, M, 4, 2)
        p1 = np.einsum("nmax,ncx->nmac", ax + np.zeros((n, m, 4, 2)), c1)
        p2 = np.einsum("nmax,mcx->nmac", ax + np.zeros((n, m, 4, 2)), c2)
        sep = (p1.max(-1) < p2.min(-1)) | (p2.max(-1) < p1.min(-1))
        return sep.any(-1)  # separated on any axis

    return ~(separated(a1, True) | separated(a2, False))


class BatchSampler:
    """Shuffled epoch-cycling sampler over one class's db infos
    (parity: reference `database_sampler.py:14-58`)."""

    def __init__(self, sampled_list: List, rng: Optional[np.random.RandomState] = None):
        self._sampled_list = sampled_list
        self._indices = np.arange(len(sampled_list))
        self._idx = 0
        self._len = len(sampled_list)

    def sample(self, num: int, rng: np.random.RandomState) -> List:
        if self._idx == 0 or self._idx + num >= self._len:
            rng.shuffle(self._indices)
            self._idx = 0
        ret = self._indices[self._idx:self._idx + num]
        self._idx += num
        return [self._sampled_list[i] for i in ret]


class DataBaseSampler:
    def __init__(self, db_infos: Dict, groups: List[Dict],
                 min_points: int = 0, difficulty: int = -1, rate: float = 1.0):
        # filter by min points / difficulty (reference :74-99)
        for name, infos in list(db_infos.items()):
            kept = [i for i in infos
                    if i.get("num_points_in_gt", min_points) >= min_points
                    and (difficulty < 0 or i.get("difficulty", 0) >= difficulty)]
            db_infos[name] = kept
        self.db_infos = db_infos
        self.rate = rate
        self.groups = groups  # list of {class_name: max_count}
        self.samplers = {name: BatchSampler(infos)
                         for name, infos in db_infos.items()
                         if len(infos) > 0}

    def sample_all(self, root_path: str, gt_boxes: np.ndarray,
                   gt_names: np.ndarray, num_point_features: int,
                   rng: np.random.RandomState) -> Optional[Dict]:
        sampled_boxes, sampled_names, sampled_infos = [], [], []
        for group in self.groups:
            for name, max_count in dict(group).items():
                if name not in self.samplers:
                    continue
                existing = int((gt_names == name).sum())
                num = int(self.rate * max(0, max_count - existing))
                if num <= 0:
                    continue
                infos = self.samplers[name].sample(num, rng)
                for info in infos:
                    sampled_infos.append(info)
                    sampled_boxes.append(np.asarray(info["box3d_lidar"],
                                                    np.float32))
                    sampled_names.append(name)
        if not sampled_boxes:
            return None
        sampled_boxes = np.stack(sampled_boxes)

        # BEV collision rejection against existing + already-accepted boxes
        keep = []
        pool = gt_boxes[:, :].astype(np.float32) if len(gt_boxes) else \
            np.zeros((0, sampled_boxes.shape[1]), np.float32)
        for i in range(len(sampled_boxes)):
            cand = sampled_boxes[i:i + 1]
            if pool.shape[0] and box_collision_test(cand, pool).any():
                continue
            keep.append(i)
            pool = np.concatenate([pool, cand], axis=0)
        if not keep:
            return None

        points_list = []
        boxes_out, names_out = [], []
        for i in keep:
            info = sampled_infos[i]
            pts_path = info["path"]
            if not os.path.isabs(pts_path):
                pts_path = os.path.join(root_path, pts_path)
            try:
                if pts_path.endswith(".npz"):
                    pts = np.load(pts_path)["points"].astype(np.float32)
                else:
                    pts = np.fromfile(pts_path, np.float32).reshape(
                        -1, num_point_features)
            except (FileNotFoundError, ValueError):
                continue
            # object points stored relative to box center
            box = sampled_boxes[i]
            pts = pts.copy()
            pts[:, :3] += box[:3]
            points_list.append(pts)
            boxes_out.append(box)
            names_out.append(sampled_names[i])
        if not points_list:
            return None
        return {
            "gt_boxes": np.stack(boxes_out),
            "gt_names": np.asarray(names_out),
            "points": np.concatenate(points_list, axis=0),
        }
