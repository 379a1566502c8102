"""Box3dTransformer: rotation-aware box-attention encoder/decoder over BEV.

Parity targets: reference `e2edet/module/box3d_transformer.py` —
_create_ref_windows with 8 per-cell anchors (3 angles ×2 + 2 sizes, :62-109),
encoder with MultiDetector3d top-k proposal selection over l·num_references
(:148-206), decoder (MHA self-attn + rotated Box3dAttention, :269-322);
query pos = sine(center)+sine(size)+sine(rad) (:183-186).

The per-cell anchors ride the *head* dimension of Box3dAttention (8 anchors
= 8 heads), exactly as the reference's 4-dim ref_windows path does.
"""

import math
from typing import Any, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from boxer_tpu.nn.attention import Box3dAttention
from boxer_tpu.nn.predictor import MultiDetector3d, NEG_INF
from boxer_tpu.utils.general import (
    flatten_with_shape,
    get_proposal_pos_embed,
    inverse_sigmoid,
)


def normalize_period(x, offset: float, period: float):
    return (x + offset * period) / period


def create_ref_windows_3d(tensor_list, ref_size: int):
    """(B, S, 8, 5) per-cell anchors: (cx, cy, w, h, normalized angle).
    Angle set: 3 orientations ×2 + 2 (reference `box3d_transformer.py:63-75`)."""
    angle_ratio = jnp.array(
        [0, 2 * math.pi / 3, -2 * math.pi / 3,
         0, 2 * math.pi / 3, -2 * math.pi / 3,
         0, 2 * math.pi / 2], jnp.float32)
    angle_ratio = normalize_period(angle_ratio, 0.5, 2 * math.pi)

    ref_windows = []
    for t in tensor_list:
        b, h, w, _ = t.shape
        y = (jnp.arange(h, dtype=jnp.float32) + 0.5) / h
        x = (jnp.arange(w, dtype=jnp.float32) + 0.5) / w
        yy, xx = jnp.meshgrid(y, x, indexing="ij")

        n_anchor = angle_ratio.shape[0]
        xx = jnp.broadcast_to(xx[None, :, :, None], (b, h, w, n_anchor))
        yy = jnp.broadcast_to(yy[None, :, :, None], (b, h, w, n_anchor))
        ww = jnp.full((b, h, w, n_anchor), ref_size / w, jnp.float32)
        hh = jnp.full((b, h, w, n_anchor), ref_size / h, jnp.float32)
        aa = jnp.broadcast_to(angle_ratio[None, None, None, :],
                              (b, h, w, n_anchor))

        ref = jnp.stack([xx, yy, ww, hh, aa], axis=-1)
        ref_windows.append(ref.reshape(b, h * w, n_anchor, 5))
    return jnp.concatenate(ref_windows, axis=1)


class Box3dEncoderLayer(nn.Module):
    d_model: int
    nhead: int
    nlevel: int
    dim_feedforward: int
    dropout: float
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, src, pos, v_shape, ref_windows, train: bool):
        drop = lambda x: nn.Dropout(self.dropout, deterministic=not train)(x)
        q = src if pos is None else src + pos
        src2, _ = Box3dAttention(self.d_model, self.nlevel, self.nhead,
                                 with_rotation=False, dtype=self.dtype,
                                 name="self_attn")(
            q, src, v_shape, None, None, ref_windows)
        src = nn.LayerNorm(dtype=self.dtype, name="norm1")(src + drop(src2))
        h = nn.Dense(self.dim_feedforward, dtype=self.dtype, name="linear1")(src)
        h = nn.Dense(self.d_model, dtype=self.dtype, name="linear2")(
            drop(nn.relu(h)))
        return nn.LayerNorm(dtype=self.dtype, name="norm2")(src + drop(h))


class Box3dDecoderLayer(nn.Module):
    d_model: int
    nhead: int
    nlevel: int
    dim_feedforward: int
    dropout: float
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, tgt, query_pos, memory, v_shape, ref_windows,
                 train: bool):
        drop = lambda x: nn.Dropout(self.dropout, deterministic=not train)(x)
        q = k = tgt if query_pos is None else tgt + query_pos
        if self.dropout == 0.0:
            from boxer_tpu.nn.dense_attention import PallasMultiHeadAttention

            tgt2 = PallasMultiHeadAttention(
                num_heads=self.nhead, dtype=self.dtype, name="self_attn",
            )(q, k, tgt)
        else:
            tgt2 = nn.MultiHeadDotProductAttention(
                num_heads=self.nhead, dtype=self.dtype,
                dropout_rate=self.dropout, deterministic=not train,
                name="self_attn")(inputs_q=q, inputs_k=k, inputs_v=tgt)
        tgt = nn.LayerNorm(dtype=self.dtype, name="norm1")(tgt + drop(tgt2))

        q2 = tgt if query_pos is None else tgt + query_pos
        tgt2, _ = Box3dAttention(self.d_model, self.nlevel, self.nhead,
                                 with_rotation=True, dtype=self.dtype,
                                 name="cross_attn")(
            q2, memory, v_shape, None, None, ref_windows)
        tgt = nn.LayerNorm(dtype=self.dtype, name="norm2")(tgt + drop(tgt2))

        h = nn.Dense(self.dim_feedforward, dtype=self.dtype, name="linear1")(tgt)
        h = nn.Dense(self.d_model, dtype=self.dtype, name="linear2")(
            drop(nn.relu(h)))
        return nn.LayerNorm(dtype=self.dtype, name="norm3")(tgt + drop(h))


class Box3dTransformer(nn.Module):
    d_model: int = 256
    nhead: int = 8
    nlevel: int = 2
    num_encoder_layers: int = 2
    num_decoder_layers: int = 2
    dim_feedforward: int = 1024
    dropout: float = 0.1
    num_queries: int = 300
    num_classes_enc: int = 1
    num_references: int = 3
    ref_size: int = 4
    dtype: Any = jnp.float32

    def setup(self):
        self.encoder_layers = [
            Box3dEncoderLayer(self.d_model, self.nhead, self.nlevel,
                              self.dim_feedforward, self.dropout,
                              dtype=self.dtype, name=f"encoder_layer{i}")
            for i in range(self.num_encoder_layers)
        ]
        self.decoder_layers = [
            Box3dDecoderLayer(self.d_model, self.nhead, self.nlevel,
                              self.dim_feedforward, self.dropout,
                              dtype=self.dtype, name=f"decoder_layer{i}")
            for i in range(self.num_decoder_layers)
        ]
        # shared enc proposal head (MultiDetector3d, reference boxer3d.py:25)
        self.enc_detector = MultiDetector3d(
            self.d_model, self.num_classes_enc, self.num_references,
            aux_loss=False, dtype=self.dtype, name="enc_detector")
        self.enc_linear = nn.Dense(self.d_model, dtype=self.dtype,
                                   name="enc_linear")
        self.enc_norm = nn.LayerNorm(dtype=self.dtype, name="enc_norm")

    def _get_enc_proposals(self, output, ref_windows):
        """Top-k over l*num_references proposals (reference
        `box3d_transformer.py:148-194`)."""
        b, l = output.shape[:2]
        r = self.num_references
        ref = ref_windows[..., :r, :]  # (B, L, R, 5)

        tmp = self.enc_detector.bbox_embed(output).astype(jnp.float32)
        tmp = tmp.reshape(b, l, r, 7)
        tmp_box, tmp_height = tmp[..., :5], tmp[..., 5:]
        tmp_box = tmp_box + inverse_sigmoid(ref.astype(jnp.float32))
        out_ref = nn.sigmoid(jnp.concatenate([tmp_box, tmp_height], -1))
        out_ref = out_ref.reshape(b, l * r, 7)

        valid = ((ref[..., :2] > 0.001) & (ref[..., :2] < 0.999)).all(-1)
        logits = self.enc_detector.class_embed(output).reshape(
            b, l, r, -1)[..., 0]
        logits = jnp.where(valid, logits.astype(jnp.float32), NEG_INF)
        logits = logits.reshape(b, l * r)
        _, indexes = jax.lax.top_k(logits, self.num_queries)

        out_ref = jnp.take_along_axis(out_ref, indexes[..., None], axis=1)
        out_ref = jax.lax.stop_gradient(out_ref)

        pos = get_proposal_pos_embed(out_ref[..., :2], self.d_model)
        size = get_proposal_pos_embed(out_ref[..., 2:4], self.d_model)
        rad = get_proposal_pos_embed(
            jnp.concatenate([out_ref[..., 4:5], out_ref[..., 4:5]], -1),
            self.d_model)
        out_pos = (pos + size + rad).astype(output.dtype)

        emb_idx = indexes // r
        out_embed = jnp.take_along_axis(output, emb_idx[..., None], axis=1)
        out_embed = self.enc_norm(
            self.enc_linear(jax.lax.stop_gradient(out_embed)))
        return out_embed, out_ref, out_pos

    def compute_enc_outputs(self, src_embed, src_ref_windows):
        return [self.enc_detector(src_embed[None], src_ref_windows)]

    def __call__(self, srcs: Sequence[jnp.ndarray], pos_list,
                 train: bool = True, inference: bool = False):
        src_ref_windows = create_ref_windows_3d(srcs, self.ref_size)
        src, _, v_shape = flatten_with_shape(srcs, None)
        src_pos = jnp.concatenate(
            [p.reshape(p.shape[0], -1, p.shape[-1]) for p in pos_list], axis=1)

        output = src
        for layer in self.encoder_layers:
            output = layer(output, src_pos, v_shape, src_ref_windows, train)

        dec_embed, dec_ref_windows, dec_pos = self._get_enc_proposals(
            output, src_ref_windows)

        tgt = dec_embed
        inter = []
        for layer in self.decoder_layers:
            tgt = layer(tgt, dec_pos, output, v_shape,
                        dec_ref_windows[..., :5], train)
            inter.append(tgt)

        hs = inter[-1][None] if inference else jnp.stack(inter)
        enc_outputs = None
        if not inference:
            enc_outputs = self.compute_enc_outputs(output, src_ref_windows)
        return hs, dec_ref_windows, output, src_ref_windows, enc_outputs
