"""Prediction heads.

Parity targets: reference `e2edet/module/predictor.py` — MLP (:8-22),
SegmentMLP mask head (:25-54), Detector (:57-152), Detector3d (:155-186),
MultiDetector3d (:189-248).

Conventions: decoder states are stacked over aux layers with a leading
``nl`` dim: x (nl, B, L, C); ref_windows (B, L, 4) broadcast over nl.
Outputs are dicts {"pred_logits", "pred_boxes"[, "pred_masks"]} for the last
layer plus "aux_outputs" list for the others.
"""

import math
from typing import Any, Optional

import flax.linen as nn
import jax.numpy as jnp

from boxer_tpu.utils.general import inverse_sigmoid

NEG_INF = -65504.0  # largest finite fp16-representable magnitude (reference parity)


def _permute_7dof(coord):
    """Reorder raw head outputs (x,y,l,w,rad,z,h) -> (x,y,z,l,w,h,rad) with
    static slices (a fancy-index permutation would lower to a slow TPU
    gather). Parity: reference dim permute `predictor.py:166,224`."""
    return jnp.concatenate(
        [coord[..., 0:2], coord[..., 5:6], coord[..., 2:4],
         coord[..., 6:7], coord[..., 4:5]], axis=-1)


def prior_prob_bias_init(prior_prob: float = 0.01):
    """Focal-loss class bias init (reference `boxer2d.py:83-99`)."""
    bias_value = -math.log((1 - prior_prob) / prior_prob)

    def init(key, shape, dtype=jnp.float32):
        return jnp.full(shape, bias_value, dtype)

    return init


class MLP(nn.Module):
    """ReLU MLP; parity `predictor.py:8-22`."""

    hidden_dim: int
    output_dim: int
    num_layers: int
    dtype: Any = jnp.float32
    last_kernel_init: Any = None
    last_bias_init: Any = None

    @nn.compact
    def __call__(self, x):
        for i in range(self.num_layers - 1):
            x = nn.relu(nn.Dense(self.hidden_dim, dtype=self.dtype,
                                 name=f"layer{i}")(x))
        kinit = self.last_kernel_init or nn.initializers.lecun_normal()
        binit = self.last_bias_init or nn.initializers.zeros
        return nn.Dense(self.output_dim, dtype=self.dtype,
                        kernel_init=kinit, bias_init=binit,
                        name=f"layer{self.num_layers - 1}")(x)


class _SelectableConv1x1(nn.Module):
    """1×1 conv whose output channel can be selected per sample.

    Param tree is identical to ``nn.Conv(features, (1, 1))`` — kernel
    (1, 1, C, out) + bias (out,) — so checkpoints and the torch port are
    unaffected. With ``select`` (N,) int per-sample channel indices, only the
    selected column of the kernel is applied: ``out[n] = h[n] · K[:, sel[n]]
    + b[sel[n]]``, algebraically equal to computing all channels and
    gathering, without materializing the (N, 2s, 2s, out) tensor (the
    reference materializes + gathers, `predictor.py:92-101`).
    """

    features: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, h, select=None):
        c = h.shape[-1]
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (1, 1, c, self.features))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        kernel = kernel.astype(self.dtype)
        bias = bias.astype(self.dtype)
        if select is None:
            return jnp.einsum("nxyc,cf->nxyf", h, kernel[0, 0]) + bias
        w_sel = jnp.take(kernel[0, 0].T, select, axis=0)      # (N, C)
        b_sel = jnp.take(bias, select, axis=0)                # (N,)
        out = jnp.einsum("nxyc,nc->nxy", h, w_sel)
        return out + b_sel[:, None, None]


class SegmentMLP(nn.Module):
    """Mask head: 2× upsample (ConvTranspose 2×2/2) + 1×1 convs.

    Input x: (nl, B, L, s, s, C) -> (nl, B, L, out, 2s, 2s), or
    (nl, B, L, 2s, 2s) when ``select`` (nl*B*L,) picks one output channel
    per query. Parity `predictor.py:25-54`.
    """

    hidden_dim: int
    output_dim: int
    num_layers: int = 2
    kernel_size: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, select=None):
        n, b, l, s, _, c = x.shape
        h = x.reshape(n * b * l, s, s, c)
        h = nn.ConvTranspose(self.hidden_dim, (2, 2), strides=(2, 2),
                             dtype=self.dtype, name="upsample")(h)
        h = nn.relu(h)
        for i in range(self.num_layers - 1):
            h = nn.Conv(self.hidden_dim, (self.kernel_size, self.kernel_size),
                        padding=self.kernel_size // 2, dtype=self.dtype,
                        name=f"conv{i}")(h)
            h = nn.relu(h)
        h = _SelectableConv1x1(self.output_dim, dtype=self.dtype,
                               name="proj")(h, select=select)
        if select is not None:
            return h.reshape(n, b, l, 2 * s, 2 * s)
        # (N*B*L, 2s, 2s, out) -> (nl, B, L, out, 2s, 2s)
        h = h.transpose(0, 3, 1, 2).reshape(n, b, l, self.output_dim, 2 * s, 2 * s)
        return h


class Detector(nn.Module):
    """Class + box (+ mask) head with box refinement.

    use_focal: class head has num_classes outputs (no background) with
    prior-prob bias; otherwise num_classes + 1.
    mask_mode: none | mask_v1 (per-class masks gathered at argmax) | mask_v2
    (class-agnostic). Parity `predictor.py:57-152`.
    """

    hidden_dim: int
    num_classes: int
    aux_loss: bool
    use_focal: bool = True
    mask_mode: str = "none"
    dtype: Any = jnp.float32

    def setup(self):
        assert self.mask_mode in ("none", "mask_v1", "mask_v2")
        out_cls = self.num_classes if self.use_focal else self.num_classes + 1
        bias_init = (prior_prob_bias_init() if self.use_focal
                     else nn.initializers.zeros)
        self.class_embed = nn.Dense(out_cls, dtype=self.dtype,
                                    bias_init=bias_init, name="class_embed")
        self.bbox_embed = MLP(self.hidden_dim, 4, 3, dtype=self.dtype,
                              last_kernel_init=nn.initializers.zeros,
                              last_bias_init=nn.initializers.zeros,
                              name="bbox_embed")
        if self.mask_mode == "mask_v1":
            self.mask_embed = SegmentMLP(self.hidden_dim, self.num_classes, 2,
                                         dtype=self.dtype, name="mask_embed")
        elif self.mask_mode == "mask_v2":
            self.mask_embed = SegmentMLP(self.hidden_dim, 1, 2,
                                         dtype=self.dtype, name="mask_embed")

    def __call__(self, x, ref_windows=None, roi=None, x_mask=None,
                 defer_mask: bool = False):
        """x: (nl, B, L, C); ref_windows (B, L, 4) or (nl, B, L, 4);
        roi: (nl, B, L, s, s, C) when mask_mode != none; x_mask: (nl, B, L).

        defer_mask: the caller runs mask_embed itself on a selected-query
        RoI subset, so roi=None is expected; any other caller that drops
        roi with a mask head configured is an error."""
        outputs_class = self.class_embed(x)
        outputs_coord = self.bbox_embed(x).astype(jnp.float32)

        outputs_mask = None
        if roi is None and self.mask_mode != "none":
            # deferred top-k mask decode: boxes/logits only; the caller runs
            # mask_embed itself on the selected-query RoI subset
            assert defer_mask, (
                "roi is required with mask_mode != 'none' unless "
                "defer_mask=True (deferred top-k mask decode)")
        elif self.mask_mode == "mask_v1":
            assert roi is not None
            # per-query selected column of the proj kernel == the reference's
            # materialize-all-classes + gather-at-argmax (`predictor.py:92-101`)
            top = jnp.argmax(outputs_class, axis=-1)  # (nl,B,L)
            outputs_mask = self.mask_embed(roi, select=top.reshape(-1))
        elif self.mask_mode == "mask_v2":
            assert roi is not None
            outputs_mask = self.mask_embed(roi).squeeze(3)

        if ref_windows is not None:
            assert ref_windows.shape[-1] == 4
            outputs_coord = outputs_coord + inverse_sigmoid(
                ref_windows.astype(jnp.float32)
            )

        if x_mask is not None:
            outputs_class = jnp.where(x_mask[..., None], NEG_INF, outputs_class)
            outputs_coord = jnp.where(x_mask[..., None], NEG_INF, outputs_coord)
        outputs_coord = nn.sigmoid(outputs_coord)

        out = {"pred_logits": outputs_class[-1], "pred_boxes": outputs_coord[-1]}
        if outputs_mask is not None:
            out["pred_masks"] = outputs_mask[-1]

        if self.aux_loss:
            aux = []
            for i in range(x.shape[0] - 1):
                a = {"pred_logits": outputs_class[i],
                     "pred_boxes": outputs_coord[i]}
                if outputs_mask is not None:
                    a["pred_masks"] = outputs_mask[i]
                aux.append(a)
            out["aux_outputs"] = aux
        return out


class Detector3d(nn.Module):
    """7-DoF box head; dims permuted [cx,cy,l,w,cz,h,rad]→canonical order
    (reference `predictor.py:163-176`)."""

    hidden_dim: int
    num_classes: int
    aux_loss: bool
    dtype: Any = jnp.float32

    def setup(self):
        self.class_embed = nn.Dense(self.num_classes, dtype=self.dtype,
                                    bias_init=prior_prob_bias_init(),
                                    name="class_embed")
        self.bbox_embed = MLP(self.hidden_dim, 7, 3, dtype=self.dtype,
                              last_kernel_init=nn.initializers.zeros,
                              last_bias_init=nn.initializers.zeros,
                              name="bbox_embed")

    def __call__(self, x, ref_windows=None, x_mask=None):
        outputs_class = self.class_embed(x)
        outputs_coord = self.bbox_embed(x).astype(jnp.float32)
        outputs_coord = outputs_coord + inverse_sigmoid(
            ref_windows.astype(jnp.float32)
        )
        outputs_coord = nn.sigmoid(_permute_7dof(outputs_coord))

        if x_mask is not None:
            outputs_class = jnp.where(x_mask[..., None], NEG_INF, outputs_class)
            outputs_coord = jnp.where(x_mask[..., None], 0.0, outputs_coord)

        out = {"pred_logits": outputs_class[-1], "pred_boxes": outputs_coord[-1]}
        if self.aux_loss:
            out["aux_outputs"] = [
                {"pred_logits": outputs_class[i], "pred_boxes": outputs_coord[i]}
                for i in range(x.shape[0] - 1)
            ]
        return out


class MultiDetector3d(nn.Module):
    """Per-cell multi-reference head for 3D encoder proposals
    (reference `predictor.py:189-248`)."""

    hidden_dim: int
    num_classes: int
    num_references: int
    aux_loss: bool
    dtype: Any = jnp.float32

    def setup(self):
        self.class_embed = nn.Dense(
            self.num_references * self.num_classes, dtype=self.dtype,
            bias_init=prior_prob_bias_init(), name="class_embed")
        self.bbox_embed = MLP(self.hidden_dim, self.num_references * 7, 3,
                              dtype=self.dtype,
                              last_kernel_init=nn.initializers.zeros,
                              last_bias_init=nn.initializers.zeros,
                              name="bbox_embed")

    def __call__(self, x, ref_windows=None, x_mask=None):
        """x: (nl, B, L, C); ref_windows: (B, L, R, 5) normalized
        (cx, cy, l, w, rad); returns logits/boxes flattened over L*R."""
        nl, b, l = x.shape[:3]
        r = self.num_references
        ref = ref_windows[..., :r, :]

        valid = ((ref[..., :2] > 0.001) & (ref[..., :2] < 0.999)).all(-1)
        if x_mask is None:
            mask = ~valid
        else:
            mask = x_mask[..., None] | (~valid)

        outputs_class = self.class_embed(x).reshape(nl, b, l, r, -1)
        outputs_coord = self.bbox_embed(x).astype(jnp.float32).reshape(
            nl, b, l, r, 7)

        assert ref.shape[-1] == 5
        box, height = outputs_coord[..., :5], outputs_coord[..., 5:]
        box = box + inverse_sigmoid(ref.astype(jnp.float32))
        outputs_coord = jnp.concatenate([box, height], axis=-1)
        outputs_coord = _permute_7dof(outputs_coord)

        outputs_class = jnp.where(mask[..., None], NEG_INF, outputs_class)
        outputs_coord = jnp.where(mask[..., None], NEG_INF, outputs_coord)

        outputs_class = outputs_class.reshape(nl, b, l * r, -1)
        outputs_coord = nn.sigmoid(outputs_coord.reshape(nl, b, l * r, 7))

        out = {"pred_logits": outputs_class[-1], "pred_boxes": outputs_coord[-1]}
        if self.aux_loss:
            out["aux_outputs"] = [
                {"pred_logits": outputs_class[i], "pred_boxes": outputs_coord[i]}
                for i in range(nl - 1)
            ]
        return out
