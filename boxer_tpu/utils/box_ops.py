"""2D box utilities in jax.numpy.

Functional parity targets: reference `e2edet/utils/box_ops.py` (cxcywh/xyxy
conversions, generalized IoU `box_ops.py:54-75`, masks_to_boxes). All functions
are fixed-shape, jit-friendly, and broadcast over leading dims.
"""

import jax.numpy as jnp


def box_cxcywh_to_xyxy(boxes):
    cx, cy, w, h = jnp.split(boxes, 4, axis=-1)
    return jnp.concatenate(
        [cx - 0.5 * w, cy - 0.5 * h, cx + 0.5 * w, cy + 0.5 * h], axis=-1
    )


def box_xyxy_to_cxcywh(boxes):
    x0, y0, x1, y1 = jnp.split(boxes, 4, axis=-1)
    return jnp.concatenate(
        [(x0 + x1) / 2, (y0 + y1) / 2, x1 - x0, y1 - y0], axis=-1
    )


def box_area(boxes):
    """Area of xyxy boxes; shape (..., 4) -> (...,)."""
    return (boxes[..., 2] - boxes[..., 0]) * (boxes[..., 3] - boxes[..., 1])


def box_iou(boxes1, boxes2):
    """Pairwise IoU of xyxy boxes.

    boxes1: (..., N, 4); boxes2: (..., M, 4) -> iou (..., N, M), union (..., N, M)
    """
    area1 = box_area(boxes1)
    area2 = box_area(boxes2)

    lt = jnp.maximum(boxes1[..., :, None, :2], boxes2[..., None, :, :2])
    rb = jnp.minimum(boxes1[..., :, None, 2:], boxes2[..., None, :, 2:])

    wh = jnp.clip(rb - lt, 0.0, None)
    inter = wh[..., 0] * wh[..., 1]
    union = area1[..., :, None] + area2[..., None, :] - inter
    iou = inter / jnp.clip(union, 1e-9, None)
    return iou, union


def generalized_box_iou(boxes1, boxes2):
    """Pairwise GIoU (https://giou.stanford.edu/) of xyxy boxes.

    Parity: reference `box_ops.py:54-75`. Degenerate boxes are tolerated by
    clamping rather than asserting (fixed-shape masked pipelines may carry
    padding boxes).
    """
    iou, union = box_iou(boxes1, boxes2)

    lt = jnp.minimum(boxes1[..., :, None, :2], boxes2[..., None, :, :2])
    rb = jnp.maximum(boxes1[..., :, None, 2:], boxes2[..., None, :, 2:])

    wh = jnp.clip(rb - lt, 0.0, None)
    area = wh[..., 0] * wh[..., 1]
    return iou - (area - union) / jnp.clip(area, 1e-9, None)


def elementwise_box_iou(boxes1, boxes2):
    """IoU of aligned box pairs; both (..., 4) xyxy -> (...,)."""
    area1 = box_area(boxes1)
    area2 = box_area(boxes2)
    lt = jnp.maximum(boxes1[..., :2], boxes2[..., :2])
    rb = jnp.minimum(boxes1[..., 2:], boxes2[..., 2:])
    wh = jnp.clip(rb - lt, 0.0, None)
    inter = wh[..., 0] * wh[..., 1]
    union = area1 + area2 - inter
    return inter / jnp.clip(union, 1e-9, None), union


def elementwise_generalized_box_iou(boxes1, boxes2):
    """GIoU of aligned box pairs; both (..., 4) xyxy -> (...,)."""
    iou, union = elementwise_box_iou(boxes1, boxes2)
    lt = jnp.minimum(boxes1[..., :2], boxes2[..., :2])
    rb = jnp.maximum(boxes1[..., 2:], boxes2[..., 2:])
    wh = jnp.clip(rb - lt, 0.0, None)
    area = wh[..., 0] * wh[..., 1]
    return iou - (area - union) / jnp.clip(area, 1e-9, None)


def masks_to_boxes(masks):
    """Bounding xyxy boxes of binary masks (N, H, W) -> (N, 4).

    Empty masks produce zero boxes (parity with reference masks_to_boxes).
    """
    n, h, w = masks.shape
    ys = jnp.arange(h, dtype=jnp.float32)[None, :, None]
    xs = jnp.arange(w, dtype=jnp.float32)[None, None, :]
    big = 1e8

    m = masks.astype(jnp.float32)
    any_mask = m.sum(axis=(1, 2)) > 0

    x_min = jnp.where(m > 0, xs, big).min(axis=(1, 2))
    x_max = jnp.where(m > 0, xs, -big).max(axis=(1, 2)) + 1
    y_min = jnp.where(m > 0, ys, big).min(axis=(1, 2))
    y_max = jnp.where(m > 0, ys, -big).max(axis=(1, 2)) + 1

    boxes = jnp.stack([x_min, y_min, x_max, y_max], axis=-1)
    return jnp.where(any_mask[:, None], boxes, jnp.zeros_like(boxes))
