"""BoxeR-2D: COCO detection + instance segmentation model.

Parity target: reference `e2edet/model/boxer2d.py` — ResNet backbone +
per-level input projections (1×1 conv + GroupNorm, stride-2 3×3 conv for
extra levels, :59-78), BoxTransformer, decoder Detector head (+ encoder
`enc_outputs` auxiliary head at train time, :151-170).

JAX design: a single Flax module; train/inference are explicit flags; the
loss lives in `boxer_tpu.criterion` (reference attaches it to the model,
`base_model.py:89-90` — functionally identical).
"""

from typing import Any, Optional

import flax.linen as nn
import jax.numpy as jnp

from boxer_tpu.models import register_model
from boxer_tpu.nn.box_transformer import BoxTransformer
from boxer_tpu.nn.predictor import Detector
from boxer_tpu.nn.resnet import BackBone, interpolate_mask_nearest


@register_model("boxer2d")
class BoxeR2D(nn.Module):
    num_classes: int = 91
    hidden_dim: int = 256
    nhead: int = 8
    num_level: int = 4
    enc_layers: int = 6
    dec_layers: int = 6
    dim_feedforward: int = 1024
    dropout: float = 0.0
    num_queries: int = 300
    aux_loss: bool = True
    use_mask: bool = False
    ref_size: int = 4
    residual_mode: str = "v1"
    backbone_arch: str = "resnet50"
    position_encoding: str = "fixed_box"
    seq_shard: bool = False
    dtype: Any = jnp.float32

    @classmethod
    def from_config(cls, config, num_classes: int, dtype=jnp.float32,
                    seq_shard: bool = False):
        t = config["transformer"]["params"]
        bb = config["backbone"]
        return cls(
            seq_shard=seq_shard,
            num_classes=num_classes,
            hidden_dim=config["hidden_dim"],
            nhead=t["nhead"],
            num_level=t["nlevel"],
            enc_layers=t["enc_layers"],
            dec_layers=t["dec_layers"],
            dim_feedforward=t["dim_feedforward"],
            dropout=t["dropout"],
            num_queries=t["num_queries"],
            aux_loss=config["aux_loss"],
            use_mask=config["use_mask"],
            ref_size=config["ref_size"],
            residual_mode=t.get("residual_mode", "v1"),
            backbone_arch=bb["type"],
            position_encoding=bb["params"].get("position_encoding", "fixed_box"),
            dtype=dtype,
        )

    def setup(self):
        self.backbone = BackBone(
            arch=self.backbone_arch,
            return_layers=("layer2", "layer3", "layer4"),
            position_encoding=self.position_encoding,
            hidden_dim=self.hidden_dim,
            ref_size=self.ref_size,
            dtype=self.dtype,
            name="backbone",
        )
        num_backbone_outs = len(self.backbone.return_layers)
        projs = []
        for i in range(self.num_level):
            if i < num_backbone_outs:
                projs.append(
                    (nn.Conv(self.hidden_dim, (1, 1),
                             kernel_init=nn.initializers.xavier_uniform(),
                             dtype=self.dtype, name=f"input_proj{i}_conv"),
                     nn.GroupNorm(num_groups=32, dtype=self.dtype,
                                  name=f"input_proj{i}_gn"))
                )
            else:
                projs.append(
                    (nn.Conv(self.hidden_dim, (3, 3), strides=(2, 2),
                             padding=[(1, 1), (1, 1)],
                             kernel_init=nn.initializers.xavier_uniform(),
                             dtype=self.dtype, name=f"input_proj{i}_conv"),
                     nn.GroupNorm(num_groups=32, dtype=self.dtype,
                                  name=f"input_proj{i}_gn"))
                )
        self.input_proj = projs

        self.transformer = BoxTransformer(
            d_model=self.hidden_dim,
            nhead=self.nhead,
            nlevel=self.num_level,
            num_encoder_layers=self.enc_layers,
            num_decoder_layers=self.dec_layers,
            dim_feedforward=self.dim_feedforward,
            dropout=self.dropout,
            num_queries=self.num_queries,
            use_mask=self.use_mask,
            ref_size=self.ref_size,
            residual_mode=self.residual_mode,
            seq_shard=self.seq_shard,
            dtype=self.dtype,
            name="transformer",
        )
        dec_mask_mode = "mask_v1" if self.use_mask else "none"
        self.detector = Detector(
            self.hidden_dim, self.num_classes, self.aux_loss, use_focal=True,
            mask_mode=dec_mask_mode, dtype=self.dtype, name="detector",
        )

    def __call__(self, image, mask: Optional[jnp.ndarray] = None,
                 train: bool = True, inference: bool = False,
                 postprocess: Optional[dict] = None):
        """image: (B, H, W, 3) NHWC normalized; mask: (B, H, W) bool padding
        mask (True = padded) or None.

        returns dict: pred_logits (B, nq, C), pred_boxes (B, nq, 4)
        [+ pred_masks], aux_outputs, enc_outputs (train only).

        postprocess (inference + use_mask only): dict with canvas_hw,
        topk[, scale] — runs the deferred top-k mask decode and returns the
        postprocessed {scores, labels, boxes, masks} dict directly (the mask
        RoI tail is computed only for the selected queries; numerically
        identical to full forward + `coco_postprocess`).
        """
        outs, pos = self.backbone(image, mask)

        features, masks, pos_encodings = [], [], []
        for i, (src, m) in enumerate(outs):
            conv, norm = self.input_proj[i]
            features.append(norm(conv(src)))
            masks.append(m)
            pos_encodings.append(pos[i])

        idx = len(features)
        pe = None
        if self.backbone.position_encoding is not None:
            from boxer_tpu.nn.position_encoding import build_position_encoding

            pe = build_position_encoding(
                self.backbone.position_encoding, self.hidden_dim)

        last_raw = outs[-1][0]
        for i in range(idx, self.num_level):
            conv, norm = self.input_proj[i]
            if i == idx:
                feat = norm(conv(last_raw))
            else:
                feat = norm(conv(nn.relu(features[-1])))
            m = None
            if mask is not None:
                m = interpolate_mask_nearest(mask, feat.shape[1:3])
            if pe is not None:
                pos_encodings.append(pe(feat, m, self.ref_size).astype(feat.dtype))
            else:
                pos_encodings.append(None)
            features.append(feat)
            masks.append(m)

        if postprocess is not None:
            assert inference, "postprocess is an inference-only fast path"
            if self.use_mask:
                return self.transformer(
                    features, masks, pos_encodings, train=train,
                    inference=True, detector=self.detector,
                    postprocess=postprocess)
            # detection-only: full forward then on-device top-k postprocess,
            # so callers get the same {scores, labels, boxes} schema either
            # way instead of a silently different raw dict.
            from boxer_tpu.evaluate.postprocess import coco_postprocess

            (hs, roi, dec_ref_windows, *_rest) = self.transformer(
                features, masks, pos_encodings, train=train, inference=True)
            out = self.detector(hs, dec_ref_windows)
            return coco_postprocess(
                out["pred_logits"], out["pred_boxes"], None,
                canvas_hw=postprocess["canvas_hw"],
                topk=postprocess.get("topk", 100),
                scale=postprocess.get("scale"))

        (hs, roi, dec_ref_windows, src_embed, src_ref_windows, src_mask,
         v_shape, enc_outputs) = self.transformer(
            features, masks, pos_encodings, train=train, inference=inference)

        if self.use_mask:
            out = self.detector(hs, dec_ref_windows, roi=roi)
        else:
            out = self.detector(hs, dec_ref_windows)

        if not inference and enc_outputs is not None:
            out["enc_outputs"] = enc_outputs
        return out
