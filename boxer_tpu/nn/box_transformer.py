"""BoxTransformer (2D): box-attention encoder/decoder.

Parity targets: reference `e2edet/module/box_transformer.py` —
_create_ref_windows (:70-116), _create_valid_ratios (:118-138), encoder with
top-k proposal selection (:200-259), decoder with MHA self-attn +
Box/Instance cross-attn and roi residual modes v1/v2 (:262-465).

Design notes (TPU-first):
- The encoder (the hot path: 6 identical layers over ~20k tokens) is a
  `nn.scan` over one layer — XLA compiles ONE layer body instead of six
  (≈6× lower compile time, identical math; params get a leading layer axis).
- `inference` is an explicit flag: inference returns only the last decoder
  layer (leading nl dim of 1) and skips the mask RoI except in the last layer.
- The encoder-proposal head (`enc_detector` in the reference, shared between
  proposal selection and the `enc_outputs` auxiliary loss head,
  `boxer2d.py:81` / `box_transformer.py:211`) lives inside this module so
  weight sharing is structural; `compute_enc_outputs` re-uses it.
- All shapes static; top-k proposal gather is a fixed-size `lax.top_k`.
"""

from typing import Any, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from boxer_tpu.nn.attention import BoxAttention, InstanceAttention
from boxer_tpu.nn.predictor import Detector, NEG_INF

def _enc_unroll() -> int:
    """lax.scan unroll factor for the encoder layer stack. 1 (default) keeps
    the compact while-loop (fast compile); the full layer count trades
    compile time for scheduling freedom. Env knob BOXER_ENC_UNROLL for perf
    experiments."""
    import os

    return int(os.environ.get("BOXER_ENC_UNROLL", "1"))


from boxer_tpu.utils.general import (
    flatten_with_shape,
    get_proposal_pos_embed,
    inverse_sigmoid,
)

Shapes = Tuple[Tuple[int, int], ...]


def create_ref_windows_2d(tensor_list, mask_list, ref_size: int):
    """Per-pixel reference boxes across levels (reference
    `box_transformer.py:70-116`). NHWC features.

    returns (B, S, 4) normalized cxcywh.
    """
    eps = 1e-6
    ref_windows = []
    for i, tensor in enumerate(tensor_list):
        b, h, w, _ = tensor.shape
        if mask_list is not None and mask_list[i] is not None:
            not_mask = (~mask_list[i]).astype(jnp.float32)
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

        y_c = (y_embed - 0.5) / (y_embed[:, -1:, :] + eps)
        x_c = (x_embed - 0.5) / (x_embed[:, :, -1:] + eps)
        center = jnp.stack([x_c, y_c], axis=-1).reshape(b, h * w, 2)

        h_embed = ref_size / size_h
        w_embed = ref_size / size_w
        size = jnp.stack([w_embed, h_embed], axis=-1)[:, None, :]
        size = jnp.broadcast_to(size, center.shape)

        ref_windows.append(jnp.concatenate([center, size], axis=-1))
    return jnp.concatenate(ref_windows, axis=1)


def create_valid_ratios(mask_list):
    """(B, L, 2) per-level [ratio_w, ratio_h]; None if no masks
    (reference `box_transformer.py:118-138`)."""
    if mask_list is None or mask_list[0] is None:
        return None
    ratios = []
    for mask in mask_list:
        not_mask = ~mask
        h, w = mask.shape[1:3]
        size_h = not_mask[:, :, 0].sum(axis=-1).astype(jnp.float32)
        size_w = not_mask[:, 0, :].sum(axis=-1).astype(jnp.float32)
        ratios.append(jnp.stack([size_w / w, size_h / h], axis=-1))
    return jnp.stack(ratios, axis=1)  # (B, L, 2)


class EncoderLayer(nn.Module):
    """One box-attention encoder layer, shaped for nn.scan:
    carry = src; broadcast inputs = (pos, src_mask, valid_ratios, ref)."""

    d_model: int
    nhead: int
    nlevel: int
    dim_feedforward: int
    dropout: float
    v_shape: Shapes
    deterministic: bool = True
    fold_taps: Any = None   # True on the inference path (fwd-only fold win)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, src, pos, src_mask, valid_ratios, ref_windows):
        det = self.deterministic
        q = src if pos is None else src + pos
        src2, _ = BoxAttention(self.d_model, self.nlevel, self.nhead,
                               dtype=self.dtype, name="self_attn")(
            q, src, self.v_shape, src_mask, valid_ratios, ref_windows,
            fold_taps=self.fold_taps)
        src = src + nn.Dropout(self.dropout, deterministic=det)(src2)
        src = nn.LayerNorm(dtype=self.dtype, name="norm1")(src)

        src2 = nn.Dense(self.dim_feedforward, dtype=self.dtype, name="linear1")(src)
        src2 = nn.Dropout(self.dropout, deterministic=det)(nn.relu(src2))
        src2 = nn.Dense(self.d_model, dtype=self.dtype, name="linear2")(src2)
        src = src + nn.Dropout(self.dropout, deterministic=det)(src2)
        src = nn.LayerNorm(dtype=self.dtype, name="norm2")(src)
        return src, None


class DecoderLayer(nn.Module):
    """Decoder layer (setup-style so the RoI tail is a second method).

    emit_roi: False (no RoI), True (full RoI, train path), or "defer" —
    the dual-output sampling still runs (tgt is bitwise-identical to the
    True path) but the expensive per-query RoI tail (out_proj, norms, FFN)
    is NOT applied; instead the raw RoI and the residual carriers are
    returned so `decode_roi` can run them on the top-k selected queries
    only (inference fast path; see BoxTransformer `postprocess`).
    """

    d_model: int
    nhead: int
    nlevel: int
    dim_feedforward: int
    dropout: float
    use_mask: bool
    residual_mode: str = "v1"
    dtype: Any = jnp.float32

    def setup(self):
        assert self.residual_mode in ("v1", "v2")
        if self.dropout == 0.0:
            # fused Pallas flash core (attention-prob dropout unused at 0)
            from boxer_tpu.nn.dense_attention import PallasMultiHeadAttention

            self.self_attn = PallasMultiHeadAttention(
                num_heads=self.nhead, dtype=self.dtype)
        else:
            self.self_attn = nn.MultiHeadDotProductAttention(
                num_heads=self.nhead, dtype=self.dtype,
                dropout_rate=self.dropout)
        if self.use_mask:
            self.cross_attn = InstanceAttention(
                self.d_model, self.nlevel, self.nhead, kernel_size=14,
                dtype=self.dtype)
        else:
            self.cross_attn = BoxAttention(
                self.d_model, self.nlevel, self.nhead, dtype=self.dtype)
        self.norm1 = nn.LayerNorm(dtype=self.dtype)
        self.norm2 = nn.LayerNorm(dtype=self.dtype)
        self.norm3 = nn.LayerNorm(dtype=self.dtype)
        self.linear1 = nn.Dense(self.dim_feedforward, dtype=self.dtype)
        self.linear2 = nn.Dense(self.d_model, dtype=self.dtype)
        self.drop_mod = nn.Dropout(self.dropout)

    def __call__(self, tgt, query_pos, memory, v_shape, memory_mask,
                 valid_ratios, ref_windows, train: bool, emit_roi,
                 fold_taps=None):
        drop = lambda x: self.drop_mod(x, deterministic=not train)
        defer = emit_roi == "defer"

        q = k = tgt if query_pos is None else tgt + query_pos
        if self.dropout == 0.0:
            tgt2 = self.self_attn(q, k, tgt)
        else:
            tgt2 = self.self_attn(inputs_q=q, inputs_k=k, inputs_v=tgt,
                                  deterministic=not train)
        tgt = tgt + drop(tgt2)
        tgt = self.norm1(tgt)

        roi = None
        q2 = tgt if query_pos is None else tgt + query_pos
        if self.use_mask:
            tgt2, roi, _ = self.cross_attn(
                q2, memory, v_shape, memory_mask, valid_ratios, ref_windows,
                train=bool(emit_roi), raw_roi=defer)
        else:
            tgt2, _ = self.cross_attn(
                q2, memory, v_shape, memory_mask, valid_ratios, ref_windows,
                fold_taps=fold_taps)

        tgt = tgt + drop(tgt2)
        tgt = self.norm2(tgt)
        tgt_norm2 = tgt
        if roi is not None and not defer:
            roi = tgt[:, :, None, None, :] + drop(roi)
            roi = self.norm2(roi)

        tgt2 = self.linear2(drop(nn.relu(self.linear1(tgt))))
        tgt = tgt + drop(tgt2)
        tgt = self.norm3(tgt)
        if roi is not None and not defer:
            if self.residual_mode == "v1":
                roi2 = self.linear2(drop(nn.relu(self.linear1(roi))))
                roi = roi + drop(roi2)
            else:  # v2
                roi = tgt[:, :, None, None, :] + drop(roi)
            roi = self.norm3(roi)
        if defer:
            # raw RoI + the residual carriers decode_roi needs
            return tgt, (roi, tgt_norm2, tgt)
        return tgt, roi

    def decode_roi(self, mask_out_sel, tgt_norm2_sel, tgt_final_sel):
        """RoI tail on a selected-query subset (inference, no dropout).

        mask_out_sel: (B, K, k, k, H*Ch) raw RoI rows gathered at the top-k
        queries; tgt_norm2_sel / tgt_final_sel: (B, K, C) the same layer's
        post-norm2 / final outputs at those queries. Runs exactly the ops the
        emit_roi=True path runs after the sampling — per-query ops, so the
        subset result is bitwise the full result gathered at the subset.
        """
        roi = self.cross_attn.project_roi(mask_out_sel)
        roi = tgt_norm2_sel[:, :, None, None, :] + roi
        roi = self.norm2(roi)
        if self.residual_mode == "v1":
            roi = roi + self.linear2(nn.relu(self.linear1(roi)))
        else:  # v2
            roi = tgt_final_sel[:, :, None, None, :] + roi
        return self.norm3(roi)


class BoxTransformer(nn.Module):
    d_model: int = 256
    nhead: int = 8
    nlevel: int = 4
    num_encoder_layers: int = 6
    num_decoder_layers: int = 6
    dim_feedforward: int = 1024
    dropout: float = 0.1
    num_queries: int = 300
    use_mask: bool = False
    ref_size: int = 4
    residual_mode: str = "v1"
    # rematerialize encoder layers in backward: trades ~1 extra forward per
    # layer for O(1) activation memory across the 20k-token encoder
    # (jax.checkpoint; essential at batch 16 on a 16GB chip)
    remat: bool = True
    # shard the flattened token axis over the `sp` mesh axis (SURVEY §5
    # long-context design addition; requires a mesh context at trace time)
    seq_shard: bool = False
    dtype: Any = jnp.float32

    def _get_enc_proposals(self, enc_detector, enc_linear, enc_norm,
                           output, src_mask, ref_windows):
        """Top-num_queries proposal selection (reference
        `box_transformer.py:200-230`)."""
        valid = ((ref_windows[..., :2] > 0.01)
                 & (ref_windows[..., :2] < 0.99)).all(-1)
        if src_mask is not None:
            mask = src_mask | (~valid)
        else:
            mask = ~valid

        out_logits = enc_detector.class_embed(output)[..., 0]
        out_logits = jnp.where(mask, NEG_INF, out_logits.astype(jnp.float32))
        _, indexes = jax.lax.top_k(out_logits, self.num_queries)  # (B, nq)

        gather = lambda arr: jnp.take_along_axis(
            arr, indexes[..., None], axis=1)
        output_embed = gather(output)
        out_embed = enc_norm(enc_linear(jax.lax.stop_gradient(output_embed)))

        ref = gather(ref_windows)
        tmp_ref = enc_detector.bbox_embed(output_embed).astype(jnp.float32)
        tmp_ref = tmp_ref + inverse_sigmoid(ref)
        out_ref_windows = jax.lax.stop_gradient(nn.sigmoid(tmp_ref))

        pos = get_proposal_pos_embed(out_ref_windows[..., :2], self.d_model)
        size = get_proposal_pos_embed(out_ref_windows[..., 2:], self.d_model)
        return out_embed, out_ref_windows, (pos + size).astype(output.dtype)

    def _compute_enc_outputs(self, enc_detector, src_embed, src_ref_windows,
                             src_mask):
        """Encoder auxiliary head over all source tokens (train only;
        reference `boxer2d.py:151-170`)."""
        valid = ((src_ref_windows[..., :2] > 0.01)
                 & (src_ref_windows[..., :2] < 0.99)).all(-1)
        mask = (src_mask | (~valid)) if src_mask is not None else (~valid)
        src_embed = jnp.where(mask[..., None], 0.0, src_embed)
        src_ref = jnp.where(mask[..., None], 0.0, src_ref_windows)
        enc_out = enc_detector(src_embed[None], src_ref[None],
                               x_mask=mask[None])
        return [{"pred_logits": enc_out["pred_logits"],
                 "pred_boxes": enc_out["pred_boxes"]}]

    def _decode_topk_masks(self, detector, last_layer, deferred, tgt,
                           dec_ref_windows, postprocess: dict):
        """Deferred mask decode: detector logits/boxes on all queries, top-k
        selection, then the RoI tail + mask head + paste on the selected
        subset only. Output-identical to full-RoI + `coco_postprocess`
        (the tail ops are per-query). Reference semantics: select-then-paste
        in `e2edet/dataset/coco.py:126-160`."""
        from boxer_tpu.evaluate.postprocess import paste_and_rescore, select_topk

        mask_out_raw, tgt_norm2, tgt_final = deferred
        det_out = detector(tgt[None], dec_ref_windows, roi=None,
                           defer_mask=True)
        logits = det_out["pred_logits"]                        # (B, NQ, C)
        boxes = det_out["pred_boxes"]

        scores, labels, q, xy = select_topk(
            logits, boxes, canvas_hw=postprocess["canvas_hw"],
            topk=postprocess.get("topk", 100),
            scale=postprocess.get("scale"))

        gather_q = lambda x: jnp.take_along_axis(
            x, q.reshape(q.shape + (1,) * (x.ndim - 2)), axis=1)
        roi = last_layer.decode_roi(
            gather_q(mask_out_raw), gather_q(tgt_norm2), gather_q(tgt_final))
        # mask_v1: per-query class channel at the argmax of the FULL class
        # row (not the top-k label) — parity with Detector/mask_embed
        top = jnp.argmax(gather_q(logits), axis=-1)            # (B, K)
        mask_logits = detector.mask_embed(roi[None], select=top.reshape(-1))[0]

        scores, masks = paste_and_rescore(
            scores, mask_logits, xy, postprocess["canvas_hw"])
        return {"scores": scores, "labels": labels, "boxes": xy,
                "masks": masks}

    @nn.compact
    def __call__(self, srcs: Sequence[jnp.ndarray], masks, pos_list,
                 train: bool = True, inference: bool = False,
                 detector=None, postprocess: Optional[dict] = None):
        """srcs: list of (B, Hi, Wi, C); masks: list of (B, Hi, Wi) or [None];
        pos_list: list of (B, Hi, Wi, C).

        returns (hs, roi, dec_ref_windows, out_embed(src), src_ref_windows,
                 src_mask, v_shape, enc_outputs)

        Deferred top-k mask decode (inference + use_mask only): when
        `postprocess` (dict with canvas_hw/topk[/scale]) and the bound
        `detector` module are given, the last decoder layer's RoI tail is
        run only on the top-k selected queries (`DecoderLayer.decode_roi`),
        and the return value is instead the fully postprocessed result dict
        (scores/labels/boxes/masks) — numerically identical to running the
        full RoI path + `coco_postprocess`, but skipping ~2/3 of the mask
        tail (the reference computes all-query masks then selects,
        `e2edet/dataset/coco.py:126-160`).
        """
        defer_mask = postprocess is not None and self.use_mask and inference
        assert not (postprocess is not None) or inference, \
            "postprocess is an inference-only fast path"
        assert not defer_mask or detector is not None
        # the deferred tail runs no dropout; with train=True and dropout>0
        # the main path would, silently breaking output-identity
        assert not defer_mask or not train or self.dropout == 0.0, \
            "deferred mask decode requires train=False (or dropout == 0)"
        if masks is not None and masks[0] is None:
            masks = None

        src_ref_windows = create_ref_windows_2d(srcs, masks, self.ref_size)
        valid_ratios = create_valid_ratios(masks)
        src, src_mask, v_shape = flatten_with_shape(srcs, masks)

        src_pos = jnp.concatenate(
            [p.reshape(p.shape[0], -1, p.shape[-1]) for p in pos_list], axis=1
        )

        if self.seq_shard:
            from boxer_tpu.parallel.sharding import seq_constraint

            src = seq_constraint(src)
            src_pos = seq_constraint(src_pos)
            if src_mask is not None:
                src_mask = seq_constraint(src_mask)

        # ---- encoder: nn.scan over one compiled (optionally remat) layer ----
        # remat with a names policy: the raw box-attention sampling output
        # ('box_attn_sample', tagged in nn/attention.py) is SAVED, so the
        # backward recompute skips the encoder-scale quad-table gathers +
        # corner combines whose only consumer it is (trace-measured ~0.45
        # ms/layer of pure fetch cost x6 layers); everything else is
        # recomputed as before. Memory: +10.3 MB/layer at 800x1216 bs=1.
        body = (nn.remat(
            EncoderLayer,
            policy=jax.checkpoint_policies.save_only_these_names(
                "box_attn_sample"))
            if self.remat else EncoderLayer)
        ScannedEncoder = nn.scan(
            body,
            variable_axes={"params": 0},
            split_rngs={"params": True, "dropout": True},
            in_axes=nn.broadcast,
            length=self.num_encoder_layers,
            unroll=_enc_unroll(),
        )
        output, _ = ScannedEncoder(
            self.d_model, self.nhead, self.nlevel, self.dim_feedforward,
            self.dropout, v_shape=v_shape, deterministic=not train,
            fold_taps=True if inference else None,
            dtype=self.dtype, name="encoder_layers",
        )(src, src_pos, src_mask, valid_ratios, src_ref_windows)

        if self.seq_shard:
            output = seq_constraint(output)

        # shared enc-proposal head
        enc_detector = Detector(self.d_model, 1, aux_loss=False,
                                use_focal=True, dtype=self.dtype,
                                name="enc_detector")
        enc_linear = nn.Dense(self.d_model, dtype=self.dtype, name="enc_linear")
        enc_norm = nn.LayerNorm(dtype=self.dtype, name="enc_norm")

        dec_embed, dec_ref_windows, dec_pos = self._get_enc_proposals(
            enc_detector, enc_linear, enc_norm, output, src_mask,
            src_ref_windows)

        # ---- decoder (unrolled: tiny query set, per-layer roi logic) ----
        tgt = dec_embed
        inter, inter_roi = [], []
        n_dec = self.num_decoder_layers
        # remat mask-decoder layers at train time: each layer's live RoI
        # activations are (B, LQ, 14, 14, C) ~115 MB/image in bf16 — without
        # remat the 6-layer segm train step needs 30.5G HBM at bs=4
        # (static_argnums: self=0; v_shape/train/emit_roi/fold_taps static)
        layer_cls = DecoderLayer
        if self.remat and self.use_mask and train:
            # same names policy as the encoder: save the raw instance/box
            # sampling outputs (~30 MB/layer bf16 at bs=1) so the backward
            # recompute skips the 470k-row folded gathers + combines; the
            # RoI-tail intermediates (the remat's reason to exist) are
            # still recomputed
            layer_cls = nn.remat(
                DecoderLayer, static_argnums=(4, 8, 9, 10),
                policy=jax.checkpoint_policies.save_only_these_names(
                    "box_attn_sample", "instance_attn_sample"))
        last_layer = None
        deferred = None
        for i in range(n_dec):
            is_last = i == n_dec - 1
            emit_roi = self.use_mask and (not inference or is_last)
            if emit_roi and defer_mask:
                emit_roi = "defer"
            layer = layer_cls(
                self.d_model, self.nhead, self.nlevel, self.dim_feedforward,
                self.dropout, self.use_mask, self.residual_mode,
                dtype=self.dtype, name=f"decoder_layer{i}",
            )
            tgt, roi = layer(
                tgt, dec_pos, output, v_shape, src_mask, valid_ratios,
                dec_ref_windows, train, emit_roi,
                True if inference else None)
            if is_last:
                last_layer = layer
                if emit_roi == "defer":
                    deferred, roi = roi, None
            inter.append(tgt)
            inter_roi.append(roi)

        if defer_mask:
            return self._decode_topk_masks(
                detector, last_layer, deferred, inter[-1], dec_ref_windows,
                postprocess)

        if inference:
            hs = inter[-1][None]
            roi = inter_roi[-1][None] if self.use_mask else None
        else:
            hs = jnp.stack(inter)
            roi = jnp.stack(inter_roi) if self.use_mask else None

        enc_outputs = None
        if not inference:
            enc_outputs = self._compute_enc_outputs(
                enc_detector, output, src_ref_windows, src_mask)

        return (hs, roi, dec_ref_windows, output, src_ref_windows, src_mask,
                v_shape, enc_outputs)
