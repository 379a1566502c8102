"""Dense multi-head attention over the Pallas flash kernel.

Drop-in for the decoder self-attention / DETR dense attention call sites
(reference nn.MultiheadAttention, `box_transformer.py:417-424`): q/k/v/out
projections + fused online-softmax core (`boxer_tpu/ops/pallas/flash_attention`).
Attention-probability dropout is not supported by the fused core (all
shipped configs use dropout 0 there); residual dropout stays in the layers.
"""

from typing import Any, Optional

import flax.linen as nn
import jax.numpy as jnp

from boxer_tpu.ops.pallas.flash_attention import NEG_INF, attention


class PallasMultiHeadAttention(nn.Module):
    num_heads: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, inputs_q, inputs_k, inputs_v,
                 key_padding_mask: Optional[jnp.ndarray] = None):
        """inputs_*: (B, L, C); key_padding_mask: (B, Lkv) bool, True=masked.
        Returns (B, Lq, C)."""
        b, lq, c = inputs_q.shape
        lkv = inputs_k.shape[1]
        h = self.num_heads
        d = c // h
        assert c % h == 0

        q = nn.Dense(c, dtype=self.dtype, name="query")(inputs_q)
        k = nn.Dense(c, dtype=self.dtype, name="key")(inputs_k)
        v = nn.Dense(c, dtype=self.dtype, name="value")(inputs_v)

        def split(x, l):
            return x.reshape(b, l, h, d).transpose(0, 2, 1, 3).reshape(
                b * h, l, d)

        mask = None
        if key_padding_mask is not None:
            mask = jnp.where(key_padding_mask, NEG_INF, 0.0).astype(jnp.float32)
            mask = jnp.repeat(mask, h, axis=0)

        out = attention(split(q, lq), split(k, lkv), split(v, lkv), mask)
        out = out.reshape(b, h, lq, d).transpose(0, 2, 1, 3).reshape(b, lq, c)
        return nn.Dense(c, dtype=self.dtype, name="out")(out)
