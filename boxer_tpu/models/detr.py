"""DETR baseline model.

Parity target: reference `e2edet/model/detr.py:17-56` — single-level C5
feature, learned query embeddings, vanilla transformer, softmax class head
(num_classes + 1 with background).
"""

from typing import Any, Optional

import flax.linen as nn
import jax.numpy as jnp

from boxer_tpu.models import register_model
from boxer_tpu.nn.predictor import MLP
from boxer_tpu.nn.resnet import BackBone
from boxer_tpu.nn.transformer import Transformer
from boxer_tpu.utils.general import inverse_sigmoid


@register_model("detr")
class DETR(nn.Module):
    num_classes: int = 91
    hidden_dim: int = 256
    nhead: int = 8
    enc_layers: int = 6
    dec_layers: int = 6
    dim_feedforward: int = 2048
    dropout: float = 0.1
    num_queries: int = 100
    aux_loss: bool = True
    backbone_arch: str = "resnet50"
    dtype: Any = jnp.float32

    @classmethod
    def from_config(cls, config, num_classes: int, dtype=jnp.float32):
        t = config["transformer"]["params"]
        return cls(
            num_classes=num_classes,
            hidden_dim=config["hidden_dim"],
            nhead=t["nhead"],
            enc_layers=t["enc_layers"],
            dec_layers=t["dec_layers"],
            dim_feedforward=t["dim_feedforward"],
            dropout=t["dropout"],
            num_queries=t["num_queries"],
            aux_loss=config["aux_loss"],
            backbone_arch=config["backbone"]["type"],
            dtype=dtype,
        )

    def setup(self):
        self.backbone = BackBone(
            arch=self.backbone_arch,
            return_layers=("layer4",),
            position_encoding="fixed",
            hidden_dim=self.hidden_dim,
            dtype=self.dtype,
            name="backbone",
        )
        self.input_proj = nn.Conv(self.hidden_dim, (1, 1), dtype=self.dtype,
                                  name="input_proj")
        self.query_embed = self.param(
            "query_embed", nn.initializers.normal(1.0),
            (self.num_queries, self.hidden_dim))
        self.transformer = Transformer(
            d_model=self.hidden_dim, nhead=self.nhead,
            num_encoder_layers=self.enc_layers,
            num_decoder_layers=self.dec_layers,
            dim_feedforward=self.dim_feedforward, dropout=self.dropout,
            dtype=self.dtype, name="transformer")
        self.class_embed = nn.Dense(self.num_classes + 1, dtype=self.dtype,
                                    name="class_embed")
        self.bbox_embed = MLP(self.hidden_dim, 4, 3, dtype=self.dtype,
                              name="bbox_embed")

    def __call__(self, image, mask: Optional[jnp.ndarray] = None,
                 train: bool = True, inference: bool = False):
        outs, pos = self.backbone(image, mask)
        (feat, feat_mask) = outs[-1]
        src = self.input_proj(feat)

        hs = self.transformer(src, feat_mask, self.query_embed, pos[-1],
                              train=train, inference=inference)

        outputs_class = self.class_embed(hs)
        outputs_coord = nn.sigmoid(
            self.bbox_embed(hs).astype(jnp.float32))

        out = {"pred_logits": outputs_class[-1],
               "pred_boxes": outputs_coord[-1]}
        if self.aux_loss and not inference:
            out["aux_outputs"] = [
                {"pred_logits": outputs_class[i],
                 "pred_boxes": outputs_coord[i]}
                for i in range(hs.shape[0] - 1)
            ]
        return out
