"""Vanilla DETR transformer (encoder/decoder with dense attention).

Parity target: reference `e2edet/module/transformer.py` — pre/post-norm
encoder/decoder layers, learned-query decoder returning all intermediate
states, and the `build_transformer` type dispatch (:375-420).
"""

from typing import Any, Optional

import flax.linen as nn
import jax.numpy as jnp


class TransformerEncoderLayer(nn.Module):
    d_model: int
    nhead: int
    dim_feedforward: int
    dropout: float
    normalize_before: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, src, pos, src_key_padding_mask, train: bool):
        drop = lambda x: nn.Dropout(self.dropout, deterministic=not train)(x)
        norm1 = nn.LayerNorm(dtype=self.dtype, name="norm1")
        norm2 = nn.LayerNorm(dtype=self.dtype, name="norm2")

        def attn_block(x):
            q = k = x if pos is None else x + pos
            mask = None
            if src_key_padding_mask is not None:
                mask = ~src_key_padding_mask[:, None, None, :]
            return nn.MultiHeadDotProductAttention(
                num_heads=self.nhead, dtype=self.dtype,
                dropout_rate=self.dropout, deterministic=not train,
                name="self_attn")(inputs_q=q, inputs_k=k, inputs_v=x,
                                  mask=mask)

        def ffn_block(x):
            h = nn.Dense(self.dim_feedforward, dtype=self.dtype,
                         name="linear1")(x)
            h = drop(nn.relu(h))
            return nn.Dense(self.d_model, dtype=self.dtype, name="linear2")(h)

        if self.normalize_before:
            src = src + drop(attn_block(norm1(src)))
            src = src + drop(ffn_block(norm2(src)))
        else:
            src = norm1(src + drop(attn_block(src)))
            src = norm2(src + drop(ffn_block(src)))
        return src


class TransformerDecoderLayer(nn.Module):
    d_model: int
    nhead: int
    dim_feedforward: int
    dropout: float
    normalize_before: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, tgt, memory, query_pos, pos, memory_key_padding_mask,
                 train: bool):
        drop = lambda x: nn.Dropout(self.dropout, deterministic=not train)(x)
        norm1 = nn.LayerNorm(dtype=self.dtype, name="norm1")
        norm2 = nn.LayerNorm(dtype=self.dtype, name="norm2")
        norm3 = nn.LayerNorm(dtype=self.dtype, name="norm3")

        def self_block(x):
            q = k = x if query_pos is None else x + query_pos
            return nn.MultiHeadDotProductAttention(
                num_heads=self.nhead, dtype=self.dtype,
                dropout_rate=self.dropout, deterministic=not train,
                name="self_attn")(inputs_q=q, inputs_k=k, inputs_v=x)

        def cross_block(x):
            q = x if query_pos is None else x + query_pos
            k = memory if pos is None else memory + pos
            mask = None
            if memory_key_padding_mask is not None:
                mask = ~memory_key_padding_mask[:, None, None, :]
            return nn.MultiHeadDotProductAttention(
                num_heads=self.nhead, dtype=self.dtype,
                dropout_rate=self.dropout, deterministic=not train,
                name="cross_attn")(inputs_q=q, inputs_k=k, inputs_v=memory,
                                   mask=mask)

        def ffn_block(x):
            h = nn.Dense(self.dim_feedforward, dtype=self.dtype,
                         name="linear1")(x)
            h = drop(nn.relu(h))
            return nn.Dense(self.d_model, dtype=self.dtype, name="linear2")(h)

        if self.normalize_before:
            tgt = tgt + drop(self_block(norm1(tgt)))
            tgt = tgt + drop(cross_block(norm2(tgt)))
            tgt = tgt + drop(ffn_block(norm3(tgt)))
        else:
            tgt = norm1(tgt + drop(self_block(tgt)))
            tgt = norm2(tgt + drop(cross_block(tgt)))
            tgt = norm3(tgt + drop(ffn_block(tgt)))
        return tgt


class Transformer(nn.Module):
    """DETR transformer: flattened single-level memory, learned queries,
    stacked intermediate decoder states (nl, B, NQ, C)."""

    d_model: int = 256
    nhead: int = 8
    num_encoder_layers: int = 6
    num_decoder_layers: int = 6
    dim_feedforward: int = 2048
    dropout: float = 0.1
    normalize_before: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, src, mask, query_embed, pos, train: bool = True,
                 inference: bool = False):
        """src: (B, H, W, C); mask: (B, H, W) or None; query_embed: (NQ, C);
        pos: (B, H, W, C)."""
        b, h, w, c = src.shape
        src = src.reshape(b, h * w, c)
        pos = pos.reshape(b, h * w, c)
        key_mask = None
        if mask is not None:
            key_mask = ~mask.reshape(b, h * w)  # True = keep

        out = src
        for i in range(self.num_encoder_layers):
            out = TransformerEncoderLayer(
                self.d_model, self.nhead, self.dim_feedforward, self.dropout,
                self.normalize_before, dtype=self.dtype,
                name=f"encoder_layer{i}")(out, pos, key_mask, train)
        if self.normalize_before:
            out = nn.LayerNorm(dtype=self.dtype, name="encoder_norm")(out)

        nq = query_embed.shape[0]
        query_pos = jnp.broadcast_to(query_embed[None], (b, nq, c))
        tgt = jnp.zeros((b, nq, c), dtype=out.dtype)

        decoder_norm = nn.LayerNorm(dtype=self.dtype, name="decoder_norm")
        inter = []
        for i in range(self.num_decoder_layers):
            tgt = TransformerDecoderLayer(
                self.d_model, self.nhead, self.dim_feedforward, self.dropout,
                self.normalize_before, dtype=self.dtype,
                name=f"decoder_layer{i}")(
                tgt, out, query_pos, pos, key_mask, train)
            # DETR applies the shared final norm to every intermediate state
            inter.append(decoder_norm(tgt))

        if inference:
            return inter[-1][None]
        return jnp.stack(inter)
