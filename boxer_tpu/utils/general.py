"""General jnp model utilities.

Parity targets in the reference `e2edet/utils/general.py`:
- inverse_sigmoid (`general.py:22-26`)
- get_proposal_pos_embed (`general.py:29-49`)
- flatten_with_shape / view_with_shape / split_with_shape (`general.py:249-353`)
- extract_grid / paste_grid (`general.py:165-246`)

TPU-first design notes:
- Multi-level feature maps are NHWC (XLA's preferred conv layout).
- Level spatial shapes are *static python tuples*, not device tensors: under
  jit every shape is known at trace time, which removes the reference's
  int64 `spatial_shapes`/`level_start_index` device tensors entirely.
- Bilinear sampling reproduces `F.grid_sample(align_corners=False,
  padding_mode='zeros')` semantics exactly (validated against torch in tests).
"""

import math
from typing import List, Sequence, Tuple

import jax.numpy as jnp


def inverse_sigmoid(x, eps: float = 1e-5):
    x = jnp.clip(x, 0.0, 1.0)
    x1 = jnp.clip(x, eps, None)
    x2 = jnp.clip(1.0 - x, eps, None)
    return jnp.log(x1 / x2)


def get_proposal_pos_embed(proposals, hidden_dim: int):
    """Sine embedding of normalized box coordinates.

    proposals: (..., K); returns (..., hidden_dim) where hidden_dim % K == 0.
    Parity: reference `general.py:29-49`.
    """
    k = proposals.shape[-1]
    assert hidden_dim % k == 0
    num_pos_feats = hidden_dim // k
    temperature = 10000.0
    scale = 2.0 * math.pi

    dim_t = jnp.arange(num_pos_feats, dtype=jnp.float32)
    dim_t = temperature ** (2.0 * jnp.floor(dim_t / 2.0) / num_pos_feats)
    pos = proposals[..., None] * scale / dim_t  # (..., K, F)
    pos = jnp.stack([jnp.sin(pos[..., 0::2]), jnp.cos(pos[..., 1::2])], axis=-1)
    pos = pos.reshape(*pos.shape[:-3], k, num_pos_feats)
    return pos.reshape(*pos.shape[:-2], hidden_dim).astype(proposals.dtype)


# ---------------------------------------------------------------------------
# Multi-level <-> flat sequence
# ---------------------------------------------------------------------------

Shapes = Tuple[Tuple[int, int], ...]


def flatten_with_shape(tensor_list: Sequence[jnp.ndarray], mask_list):
    """[(B,Hi,Wi,C)] -> (B, S, C); masks [(B,Hi,Wi)] -> (B, S); static shapes.

    Parity: reference `general.py:249-286` (which returns a device tensor of
    shapes; here shapes are a static tuple).
    """
    shapes: Shapes = tuple((t.shape[1], t.shape[2]) for t in tensor_list)
    flat = jnp.concatenate(
        [t.reshape(t.shape[0], -1, t.shape[-1]) for t in tensor_list], axis=1
    )
    if mask_list is not None and mask_list[0] is not None:
        mask = jnp.concatenate([m.reshape(m.shape[0], -1) for m in mask_list], axis=1)
    else:
        mask = None
    return flat, mask, shapes


def level_sizes(shapes: Shapes) -> List[int]:
    return [h * w for h, w in shapes]


def level_start_index(shapes: Shapes) -> List[int]:
    starts, acc = [], 0
    for h, w in shapes:
        starts.append(acc)
        acc += h * w
    return starts


def split_with_shape(flat, mask, shapes: Shapes):
    """(B,S,C) -> [(B,Hi*Wi,C)]; parity reference `general.py:327-353`."""
    sizes = level_sizes(shapes)
    idx = [0]
    for s in sizes:
        idx.append(idx[-1] + s)
    tensors = (
        [flat[:, idx[i] : idx[i + 1]] for i in range(len(sizes))]
        if flat is not None
        else None
    )
    masks = (
        [mask[:, idx[i] : idx[i + 1]] for i in range(len(sizes))]
        if mask is not None
        else None
    )
    return tensors, masks


def view_with_shape(flat, mask, shapes: Shapes):
    """(B,S,C) -> [(B,Hi,Wi,C)]; parity reference `general.py:289-324`."""
    tensors, masks = split_with_shape(flat, mask, shapes)
    out_t = (
        [
            t.reshape(t.shape[0], h, w, t.shape[-1])
            for t, (h, w) in zip(tensors, shapes)
        ]
        if tensors is not None
        else None
    )
    out_m = (
        [m.reshape(m.shape[0], h, w) for m, (h, w) in zip(masks, shapes)]
        if masks is not None
        else None
    )
    return out_t, out_m


# ---------------------------------------------------------------------------
# Bilinear sampling (grid_sample parity)
# ---------------------------------------------------------------------------

def grid_sample_nhwc(img, grid):
    """Bilinear sample with torch `F.grid_sample(align_corners=False,
    padding_mode='zeros')` semantics.

    img:  (B, H, W, C)
    grid: (B, ..., 2) normalized to [-1, 1], last dim (x, y)
    returns (B, ..., C)
    """
    b, h, w, c = img.shape
    out_shape = grid.shape[:-1] + (c,)
    g = grid.reshape(b, -1, 2)

    x = (g[..., 0] + 1.0) * (w / 2.0) - 0.5
    y = (g[..., 1] + 1.0) * (h / 2.0) - 0.5
    return _bilinear_gather(img, x, y).reshape(out_shape)


def bilinear_sample_norm01(img, loc):
    """Sample at locations normalized to [0, 1] with the reference kernel's
    convention `x_im = loc_x * W - 0.5` (reference `box_attn_kernel.cuh:325-326`),
    zero padding outside.

    img: (B, H, W, C); loc: (B, ..., 2) in [0,1]; returns (B, ..., C).
    """
    b, h, w, c = img.shape
    out_shape = loc.shape[:-1] + (c,)
    g = loc.reshape(b, -1, 2)
    x = g[..., 0] * w - 0.5
    y = g[..., 1] * h - 0.5
    return _bilinear_gather(img, x, y).reshape(out_shape)


def _bilinear_gather(img, x, y):
    """Core zero-padded bilinear gather. img (B,H,W,C); x,y (B,N) pixel coords."""
    b, h, w, c = img.shape

    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    lx = (x - x0).astype(img.dtype)[..., None]
    ly = (y - y0).astype(img.dtype)[..., None]
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)

    flat = img.reshape(b, h * w, c)

    def tap(xi, yi):
        valid = (xi >= 0) & (xi < w) & (yi >= 0) & (yi < h)
        idx = jnp.clip(yi, 0, h - 1) * w + jnp.clip(xi, 0, w - 1)
        vals = jnp.take_along_axis(flat, idx[..., None], axis=1)
        return jnp.where(valid[..., None], vals, 0.0)

    v00 = tap(x0i, y0i)
    v01 = tap(x0i + 1, y0i)
    v10 = tap(x0i, y0i + 1)
    v11 = tap(x0i + 1, y0i + 1)

    top = v00 * (1.0 - lx) + v01 * lx
    bot = v10 * (1.0 - lx) + v11 * lx
    return top * (1.0 - ly) + bot * ly


# ---------------------------------------------------------------------------
# RoI grid extraction / pasting (mask path)
# ---------------------------------------------------------------------------

def extract_grid(x, x_mask, boxes, grid_size: int = 15, align_corners: bool = False,
                 roi_align: bool = False):
    """Sample a grid_size×grid_size RoI from each box.

    x: (B, H, W, C) NHWC (reference is NCHW, `general.py:165-220`)
    x_mask: (B, H, W) bool padding mask or None
    boxes: (B, L, 4) normalized cxcywh
    returns (B, L, grid_size, grid_size, C)
    """
    from boxer_tpu.utils.box_ops import box_cxcywh_to_xyxy

    b, l = boxes.shape[:2]
    gs = grid_size * 2 if roi_align else grid_size

    if align_corners:
        indices = jnp.arange(gs, dtype=jnp.float32)
        step = 1.0 / (gs - 1)
    else:
        indices = 0.5 + jnp.arange(gs, dtype=jnp.float32)
        step = 1.0 / gs
    gy, gx = jnp.meshgrid(indices, indices, indexing="ij")
    grid_indices = jnp.stack([gx, gy], axis=-1)  # (gs, gs, 2)

    boxes = box_cxcywh_to_xyxy(boxes)
    if x_mask is not None:
        not_mask = ~x_mask
        size_h = not_mask[:, :, 0].sum(axis=1).astype(jnp.float32)
        size_w = not_mask[:, 0, :].sum(axis=1).astype(jnp.float32)
        h, w = x.shape[1:3]
        ratio = jnp.stack(
            [size_w / w, size_h / h, size_w / w, size_h / h], axis=-1
        )
        boxes = boxes * ratio[:, None, :]

    b1 = boxes[..., None, None, :2]  # (B, L, 1, 1, 2)
    b2 = boxes[..., None, None, 2:]
    grid = grid_indices * step * (b2 - b1) + b1  # (B, L, gs, gs, 2) in [0,1]
    grid = grid * 2.0 - 1.0

    out = grid_sample_nhwc(x, grid)  # (B, L, gs, gs, C)

    if roi_align:
        out = out.reshape(b, l, grid_size, 2, grid_size, 2, -1)
        out = out.max(axis=5).max(axis=3)
    return out


def paste_grid(seg_mask, boxes, x_size: Tuple[int, int]):
    """Paste per-query masks back into image space.

    seg_mask: (L, s, s); boxes: (L, 4) xyxy *pixel* coords; x_size: (H, W).
    returns (L, H, W). Parity: reference `general.py:223-246`.
    """
    l = boxes.shape[0]
    h, w = x_size

    x1, y1, x2, y2 = [boxes[:, i][:, None, None] for i in range(4)]
    img_x = jnp.arange(w, dtype=jnp.float32)[None, None, :] + 0.5
    img_y = jnp.arange(h, dtype=jnp.float32)[None, :, None] + 0.5

    gx = (img_x - x1) / jnp.clip(x2 - x1, 1e-6, None) * 2.0 - 1.0
    gy = (img_y - y1) / jnp.clip(y2 - y1, 1e-6, None) * 2.0 - 1.0
    gx = jnp.broadcast_to(gx, (l, h, w))
    gy = jnp.broadcast_to(gy, (l, h, w))
    grid = jnp.stack([gx, gy], axis=-1)  # (L, H, W, 2)

    img = grid_sample_nhwc(seg_mask[..., None], grid)  # (L, H, W, 1)
    return img[..., 0]
