"""3D box utilities in jax.numpy.

Parity targets: reference `e2edet/utils/det3d/box_ops.py` —
box_cxcyczlwh_to_xyxyxy (:7-18), axis-aligned generalized_box3d_iou
(no rotation in GIoU, :52-64), rotate_points_along_z (:67-89),
boxes_to_corners_3d (:92-128), limit_period (:148-172).
Broadcasting over leading dims; pairwise variants take (..., N, 6)/(..., M, 6).
"""

import math

import jax.numpy as jnp


def box_cxcyczlwh_to_xyxyxy(x):
    c = x[..., :3]
    d = x[..., 3:6]
    return jnp.concatenate([c - 0.5 * d, c + 0.5 * d], axis=-1)


def box_vol_wo_angle(boxes):
    return (
        (boxes[..., 3] - boxes[..., 0])
        * (boxes[..., 4] - boxes[..., 1])
        * (boxes[..., 5] - boxes[..., 2])
    )


def box_iou_wo_angle(boxes1, boxes2):
    """Pairwise axis-aligned 3D IoU. boxes (..., N, 6) x (..., M, 6)."""
    vol1 = box_vol_wo_angle(boxes1)
    vol2 = box_vol_wo_angle(boxes2)
    ltb = jnp.maximum(boxes1[..., :, None, :3], boxes2[..., None, :, :3])
    rbf = jnp.minimum(boxes1[..., :, None, 3:], boxes2[..., None, :, 3:])
    lwh = jnp.clip(rbf - ltb, 0.0, None)
    inter = lwh[..., 0] * lwh[..., 1] * lwh[..., 2]
    union = vol1[..., :, None] + vol2[..., None, :] - inter
    return inter / jnp.clip(union, 1e-9, None), union


def generalized_box3d_iou(boxes1, boxes2):
    """Pairwise axis-aligned 3D GIoU (reference `det3d/box_ops.py:52-64` —
    deliberately ignores rotation, matching the reference)."""
    iou, union = box_iou_wo_angle(boxes1, boxes2)
    ltb = jnp.minimum(boxes1[..., :, None, :3], boxes2[..., None, :, :3])
    rbf = jnp.maximum(boxes1[..., :, None, 3:], boxes2[..., None, :, 3:])
    whl = jnp.clip(rbf - ltb, 0.0, None)
    vol = whl[..., 0] * whl[..., 1] * whl[..., 2]
    return iou - (vol - union) / jnp.clip(vol, 1e-9, None)


def elementwise_generalized_box3d_iou(boxes1, boxes2):
    """GIoU of aligned pairs; both (..., 6)."""
    vol1 = box_vol_wo_angle(boxes1)
    vol2 = box_vol_wo_angle(boxes2)
    ltb = jnp.maximum(boxes1[..., :3], boxes2[..., :3])
    rbf = jnp.minimum(boxes1[..., 3:], boxes2[..., 3:])
    lwh = jnp.clip(rbf - ltb, 0.0, None)
    inter = lwh[..., 0] * lwh[..., 1] * lwh[..., 2]
    union = vol1 + vol2 - inter
    iou = inter / jnp.clip(union, 1e-9, None)

    ltb_h = jnp.minimum(boxes1[..., :3], boxes2[..., :3])
    rbf_h = jnp.maximum(boxes1[..., 3:], boxes2[..., 3:])
    whl = jnp.clip(rbf_h - ltb_h, 0.0, None)
    vol = whl[..., 0] * whl[..., 1] * whl[..., 2]
    return iou - (vol - union) / jnp.clip(vol, 1e-9, None)


def rotate_points_along_z(points, angle):
    """points (N, P, 3+F); angle (N,). Parity `det3d/box_ops.py:67-89`."""
    cosa = jnp.cos(angle)
    sina = jnp.sin(angle)
    zeros = jnp.zeros_like(angle)
    ones = jnp.ones_like(angle)
    rot = jnp.stack(
        [cosa, sina, zeros, -sina, cosa, zeros, zeros, zeros, ones], axis=1
    ).reshape(-1, 3, 3)
    rotated = jnp.matmul(points[..., :3], rot)
    return jnp.concatenate([rotated, points[..., 3:]], axis=-1)


def boxes_to_corners_3d(boxes3d):
    """boxes3d (N, 7) [cx,cy,cz,l,w,h,rad] -> corners (N, 8, 3).
    Parity `det3d/box_ops.py:92-128`."""
    template = jnp.array(
        [
            [1, -1, -1], [1, 1, -1], [-1, 1, -1], [-1, -1, -1],
            [1, -1, 1], [1, 1, 1], [-1, 1, 1], [-1, -1, 1],
        ],
        dtype=jnp.float32,
    ) / 2.0
    corners = boxes3d[:, None, 3:6] * template[None]  # (N, 8, 3)
    corners = rotate_points_along_z(corners, boxes3d[:, 6])
    return corners + boxes3d[:, None, :3]


def mask_boxes_outside_range(boxes, limit_range):
    """boxes (N, 7+); limit_range [x0,y0,z0,x1,y1,z1]. Returns bool (N,)
    keeping boxes whose center is inside (reference `det3d/box_ops.py:131-145`)."""
    c = boxes[:, :3]
    lo = jnp.asarray(limit_range[:3])
    hi = jnp.asarray(limit_range[3:6])
    return ((c >= lo) & (c <= hi)).all(-1)


def limit_period(val, offset: float = 0.5, period: float = math.pi):
    """Wrap angle into [-offset*period, (1-offset)*period).
    Parity `det3d/box_ops.py:148-172`."""
    return val - jnp.floor(val / period + offset) * period
