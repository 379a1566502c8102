"""Position encodings (sine / box-sine).

Parity targets: reference `e2edet/module/position_encoding.py`
(`FixedPositionEmbedding` :18-67, `FixedBoxEmbedding` :70-113,
`build_position_encoding` :116-126). Pure functions over NHWC features —
no learned state, so no need for Flax modules.
"""

import math
from typing import Optional

import jax.numpy as jnp

from boxer_tpu.utils.general import get_proposal_pos_embed


def fixed_position_embedding(x, mask: Optional[jnp.ndarray], num_pos_feats: int,
                             temperature: float = 10000.0, normalize: bool = True,
                             scale: Optional[float] = None):
    """Standard DETR sine embedding, mask-aware cumsum normalized.

    x: (B, H, W, C) NHWC; mask: (B, H, W) bool (True = padding) or None.
    returns (B, H, W, 2*num_pos_feats).
    """
    b, h, w, _ = x.shape
    if scale is None:
        scale = 2.0 * math.pi

    if mask is not None:
        not_mask = (~mask).astype(jnp.float32)
        y_embed = jnp.cumsum(not_mask, axis=1)
        x_embed = jnp.cumsum(not_mask, axis=2)
    else:
        y_embed = jnp.broadcast_to(
            jnp.arange(1, h + 1, dtype=jnp.float32)[None, :, None], (b, h, w)
        )
        x_embed = jnp.broadcast_to(
            jnp.arange(1, w + 1, dtype=jnp.float32)[None, None, :], (b, h, w)
        )

    if normalize:
        eps = 1e-6
        y_embed = (y_embed - 0.5) / (y_embed[:, -1:, :] + eps) * scale
        x_embed = (x_embed - 0.5) / (x_embed[:, :, -1:] + eps) * scale

    dim_t = jnp.arange(num_pos_feats, dtype=jnp.float32)
    dim_t = temperature ** (2.0 * jnp.floor(dim_t / 2.0) / num_pos_feats)

    pos_x = x_embed[..., None] / dim_t
    pos_y = y_embed[..., None] / dim_t
    pos_x = jnp.stack(
        [jnp.sin(pos_x[..., 0::2]), jnp.cos(pos_x[..., 1::2])], axis=-1
    ).reshape(b, h, w, num_pos_feats)
    pos_y = jnp.stack(
        [jnp.sin(pos_y[..., 0::2]), jnp.cos(pos_y[..., 1::2])], axis=-1
    ).reshape(b, h, w, num_pos_feats)
    # reference order: x first (`position_encoding.py:65` cat((pos_x, pos_y)))
    return jnp.concatenate([pos_x, pos_y], axis=-1)


def fixed_box_embedding(x, mask: Optional[jnp.ndarray], hidden_dim: int,
                        ref_size: int = 4):
    """Box-shaped PE: sine embed of (center, ref_size/feature_size).

    Matches the reference `FixedBoxEmbedding` (`position_encoding.py:70-113`):
    per-pixel centers from mask-aware normalized coords, size channel from
    ref_size / valid feature extent.

    x: (B, H, W, C); mask: (B, H, W) bool or None.
    returns (B, H, W, hidden_dim).
    """
    b, h, w, _ = x.shape
    eps = 1e-6

    if mask is not None:
        not_mask = (~mask).astype(jnp.float32)
        y_embed = jnp.cumsum(not_mask, axis=1)
        x_embed = jnp.cumsum(not_mask, axis=2)
        size_h = not_mask[:, :, 0].sum(axis=-1)
        size_w = not_mask[:, 0, :].sum(axis=-1)
    else:
        y_embed = jnp.broadcast_to(
            jnp.arange(1, h + 1, dtype=jnp.float32)[None, :, None], (b, h, w)
        )
        x_embed = jnp.broadcast_to(
            jnp.arange(1, w + 1, dtype=jnp.float32)[None, None, :], (b, h, w)
        )
        size_h = jnp.full((b,), float(h))
        size_w = jnp.full((b,), float(w))

    y_embed = (y_embed - 0.5) / (y_embed[:, -1:, :] + eps)
    x_embed = (x_embed - 0.5) / (x_embed[:, :, -1:] + eps)

    h_embed = jnp.broadcast_to((ref_size / size_h)[:, None, None], (b, h, w))
    w_embed = jnp.broadcast_to((ref_size / size_w)[:, None, None], (b, h, w))

    # reference sums TWO 2-var embeddings (hidden_dim/2 feats per variable),
    # NOT one joint 4-var embedding (`position_encoding.py:108-111`:
    # box = pos_embed(center) + pos_embed(size))
    center = jnp.stack([x_embed, y_embed], axis=-1)
    size = jnp.stack([w_embed, h_embed], axis=-1)
    return (get_proposal_pos_embed(center, hidden_dim)
            + get_proposal_pos_embed(size, hidden_dim))


def build_position_encoding(kind: str, hidden_dim: int):
    """Dispatch parity with reference `build_position_encoding` (:116-126)."""
    if kind == "fixed":
        n = hidden_dim // 2

        def fn(x, mask, ref_size=None):
            return fixed_position_embedding(x, mask, n)

        return fn
    if kind == "fixed_box":

        def fn(x, mask, ref_size=4):
            return fixed_box_embedding(x, mask, hidden_dim, ref_size)

        return fn
    raise ValueError(f"Unknown position encoding type: {kind}")
