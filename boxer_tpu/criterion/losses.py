"""Set-prediction losses (fixed-shape, masked).

Parity targets: reference `e2edet/criterion/losses.py` —
sigmoid_focal_loss (:88-113), dice_loss (:116-133), LabelLoss (:153-192),
FocalLabelLoss (:195-240), BoxesLoss (:243-269), Boxes3DLoss (:272-304),
MaskLoss (:307-333), composite Boxer2DLoss (:418-537) with enc (binary
labels) + aux losses, DETRLoss (:336-415), Boxer3DLoss (:540-637).

Fixed-shape design: targets are padded to NT boxes with a `valid` mask;
matching returns `query_idx (B, NT)` from the on-device Hungarian; every loss
is a masked sum / num_boxes. The reference's on-the-fly 28×28 GT instance-mask
extraction (`losses.py:509-519`) moves to the host input pipeline (it is a
pure no-grad function of GT masks+boxes) — see dataset/coco.py.
"""

from typing import Dict, List, Optional

import jax
import jax.numpy as jnp

from boxer_tpu.nn.matcher import build_matcher
from boxer_tpu.utils.box_ops import (
    box_cxcywh_to_xyxy,
    elementwise_generalized_box_iou,
)
from boxer_tpu.utils.registry import LOSS_REGISTRY


def sigmoid_focal_loss(inputs, targets, num_boxes, alpha: float = 0.25,
                       gamma: float = 2.0, mask=None):
    """Parity `losses.py:88-113`; `mask` restricts the sum (padding)."""
    inputs = inputs.astype(jnp.float32)
    targets = targets.astype(jnp.float32)
    prob = jax.nn.sigmoid(inputs)
    ce = _bce_with_logits(inputs, targets)
    p_t = prob * targets + (1 - prob) * (1 - targets)
    loss = ce * ((1 - p_t) ** gamma)
    if alpha >= 0:
        alpha_t = alpha * targets + (1 - alpha) * (1 - targets)
        loss = alpha_t * loss
    if mask is not None:
        loss = jnp.where(mask, loss, 0.0)
    return loss.sum() / num_boxes


def _bce_with_logits(logits, targets):
    """Numerically-stable binary cross entropy with logits."""
    return jnp.maximum(logits, 0) - logits * targets + jnp.log1p(
        jnp.exp(-jnp.abs(logits))
    )


def dice_loss(inputs, targets, num_boxes, valid=None):
    """Parity `losses.py:116-133`; inputs/targets (N, ...), flattened per row."""
    inputs = jax.nn.sigmoid(inputs.astype(jnp.float32))
    inputs = inputs.reshape(inputs.shape[0], -1)
    targets = targets.astype(jnp.float32).reshape(targets.shape[0], -1)
    numerator = 2 * (inputs * targets).sum(1)
    denominator = inputs.sum(-1) + targets.sum(-1)
    loss = 1 - (numerator + 1) / (denominator + 1)
    if valid is not None:
        loss = jnp.where(valid, loss, 0.0)
    return loss.sum() / num_boxes


def _gather_queries(arr, query_idx):
    """arr (B, NQ, ...) gathered at query_idx (B, NT) -> (B, NT, ...)."""
    idx = query_idx.reshape(query_idx.shape + (1,) * (arr.ndim - 2))
    idx = jnp.broadcast_to(idx, query_idx.shape + arr.shape[2:])
    return jnp.take_along_axis(arr, idx, axis=1)


def focal_label_loss(outputs, targets, query_idx, valid, num_boxes,
                     num_classes: int, focal_alpha: float = 0.25):
    """FocalLabelLoss parity (`losses.py:195-240`): one-hot targets over all
    queries; matched queries carry the GT class."""
    logits = outputs["pred_logits"].astype(jnp.float32)  # (B, NQ, C)
    b, nq, c = logits.shape

    # scatter matched labels into a (B, NQ) class map (num_classes = no-object)
    labels = jnp.where(valid, targets["labels"], num_classes)
    scatter_idx = jnp.where(valid, query_idx, nq)  # nq -> dropped
    target_classes = jnp.full((b, nq), num_classes, jnp.int32)
    target_classes = jax.vmap(
        lambda tc, qi, lab: tc.at[qi].set(lab, mode="drop")
    )(target_classes, scatter_idx, labels)

    onehot = jax.nn.one_hot(target_classes, num_classes, dtype=jnp.float32)
    return {"loss_ce": sigmoid_focal_loss(logits, onehot, num_boxes,
                                          alpha=focal_alpha, gamma=2.0)}


def label_loss_ce(outputs, targets, query_idx, valid, num_boxes,
                  num_classes: int, eos_coef: float, iter_per_update: int = 1):
    """LabelLoss (softmax CE with eos down-weighting) parity
    (`losses.py:153-192`). Logits have num_classes+1 columns."""
    logits = outputs["pred_logits"].astype(jnp.float32)
    b, nq, _ = logits.shape

    labels = jnp.where(valid, targets["labels"], num_classes)
    scatter_idx = jnp.where(valid, query_idx, nq)
    target_classes = jnp.full((b, nq), num_classes, jnp.int32)
    target_classes = jax.vmap(
        lambda tc, qi, lab: tc.at[qi].set(lab, mode="drop")
    )(target_classes, scatter_idx, labels)

    log_prob = jax.nn.log_softmax(logits, axis=-1)
    nll = -jnp.take_along_axis(log_prob, target_classes[..., None], axis=-1)[..., 0]
    weights = jnp.where(target_classes == num_classes, eos_coef, 1.0)
    loss = (nll * weights).sum() / weights.sum()
    return {"loss_ce": loss / iter_per_update}


def boxes_loss(outputs, targets, query_idx, valid, num_boxes):
    """BoxesLoss parity (`losses.py:243-269`): masked L1 + GIoU / num_boxes."""
    src_boxes = _gather_queries(
        outputs["pred_boxes"].astype(jnp.float32), query_idx
    )  # (B, NT, 4)
    tgt_boxes = targets["boxes"].astype(jnp.float32)

    l1 = jnp.abs(src_boxes - tgt_boxes).sum(-1)
    giou = 1.0 - elementwise_generalized_box_iou(
        box_cxcywh_to_xyxy(src_boxes), box_cxcywh_to_xyxy(tgt_boxes)
    )
    vf = valid.astype(jnp.float32)
    return {
        "loss_bbox": (l1 * vf).sum() / num_boxes,
        "loss_giou": (giou * vf).sum() / num_boxes,
    }


def boxes3d_loss(outputs, targets, query_idx, valid, num_boxes):
    """Boxes3DLoss parity (`losses.py:272-304`): 6-dim L1+GIoU + rad L1."""
    from boxer_tpu.utils.box3d_ops import (
        box_cxcyczlwh_to_xyxyxy,
        elementwise_generalized_box3d_iou,
    )

    src = _gather_queries(outputs["pred_boxes"].astype(jnp.float32), query_idx)
    tgt = targets["boxes"].astype(jnp.float32)
    src_boxes, src_rads = src[..., :6], src[..., 6:]
    tgt_boxes, tgt_rads = tgt[..., :6], tgt[..., 6:]

    l1 = jnp.abs(src_boxes - tgt_boxes).sum(-1)
    rad = jnp.abs(src_rads - tgt_rads).sum(-1)
    giou = 1.0 - elementwise_generalized_box3d_iou(
        box_cxcyczlwh_to_xyxyxy(src_boxes), box_cxcyczlwh_to_xyxyxy(tgt_boxes)
    )
    vf = valid.astype(jnp.float32)
    return {
        "loss_bbox": (l1 * vf).sum() / num_boxes,
        "loss_giou": (giou * vf).sum() / num_boxes,
        "loss_rad": (rad * vf).sum() / num_boxes,
    }


def mask_loss(outputs, targets, query_idx, valid, num_boxes, mask_size: int = 28):
    """MaskLoss parity (`losses.py:307-333`): focal/mask_size² + dice over
    box-cropped GT masks. Targets carry precomputed `instance_masks`
    (B, NT, mask_size, mask_size) from the input pipeline."""
    src_masks = _gather_queries(outputs["pred_masks"], query_idx)
    tgt_masks = targets["instance_masks"]

    b, nt = valid.shape
    src_flat = src_masks.reshape(b * nt, -1)
    tgt_flat = tgt_masks.reshape(b * nt, -1)
    vflat = valid.reshape(b * nt)

    focal = sigmoid_focal_loss(
        src_flat, tgt_flat, num_boxes, mask=vflat[:, None]
    ) / (mask_size ** 2)
    dice = dice_loss(src_flat, tgt_flat, num_boxes, valid=vflat)
    return {"loss_mask": focal, "loss_dice": dice}


# ---------------------------------------------------------------------------
# Composite criteria
# ---------------------------------------------------------------------------

def match_layers(matcher, output_list, targets):
    """Hungarian-match a LIST of per-layer output dicts in ONE matcher call.

    The reference matches each decoder layer's outputs separately
    (`e2edet/criterion/losses.py:507-527` aux loop); a naive port runs one
    serial `lax.while_loop` JV solve per layer (~3.2 ms each at decoder
    scale, ~22 ms/step for 6 aux + final, trace-measured). Stacking the
    layers into the matcher's batch dimension runs every solve inside one
    vmapped while-loop whose trip count is the max over instances — total
    cost of roughly a single solve. Per-layer results are identical (the
    matcher is elementwise in its batch dim).

    Returns (query_idx list, valid list), one entry per output dict.
    """
    if len(output_list) == 1:
        qi, valid = matcher(output_list[0], targets)
        return [qi], [valid]
    nl = len(output_list)
    b, nt = targets["valid"].shape

    def stack(key):
        x = jnp.stack([o[key] for o in output_list])
        return x.reshape((nl * b,) + x.shape[2:])

    stacked = {"pred_logits": stack("pred_logits"),
               "pred_boxes": stack("pred_boxes")}
    tile = lambda v: jnp.tile(v, (nl,) + (1,) * (v.ndim - 1))
    tiled = {"labels": tile(targets["labels"]),
             "boxes": tile(targets["boxes"]),
             "valid": tile(targets["valid"])}
    qi, valid = matcher(stacked, tiled)
    qi = qi.reshape(nl, b, nt)
    valid = valid.reshape(nl, b, nt)
    return [qi[i] for i in range(nl)], [valid[i] for i in range(nl)]


def register_loss(name):
    return LOSS_REGISTRY.register(name)


class BaseCriterion:
    """Shared machinery: per-output matching + loss evaluation."""

    def __init__(self, num_classes, matcher, weight_dict, losses,
                 iter_per_update=1):
        self.num_classes = num_classes
        self.matcher = matcher
        self.weight_dict = weight_dict
        self.losses = losses
        self.iter_per_update = iter_per_update

    @staticmethod
    def compute_num_boxes(targets):
        """Global target count, clamp >= 1. Under jit with the batch sharded
        over the data axis, jnp.sum is already a global reduction — the
        reference's explicit all_reduce + /world_size normalization
        (`losses.py:474-485`) collapses to this.
        """
        return jnp.clip(targets["valid"].astype(jnp.float32).sum(), 1.0, None)

    def expanded_weight_dict(self, num_aux: int, num_enc: int = 0) -> Dict[str, float]:
        """Weight dict expansion with `_i` / `_enc_i` suffixes (reference
        `base_model.py:92-106`)."""
        out = dict(self.weight_dict)
        for i in range(num_aux):
            out.update({f"{k}_{i}": v for k, v in self.weight_dict.items()})
        for i in range(num_enc):
            out.update({f"{k}_enc_{i}": v for k, v in self.weight_dict.items()})
        return out


@register_loss("boxer2d")
class Boxer2DCriterion(BaseCriterion):
    """Boxer2DLoss parity (`losses.py:418-537`)."""

    def __init__(self, num_classes, matcher, weight_dict, losses,
                 iter_per_update=1, mask_size: int = 28):
        super().__init__(num_classes, matcher, weight_dict, losses,
                         iter_per_update)
        self.mask_size = mask_size

    def _eval_losses(self, outputs, targets, query_idx, valid, num_boxes,
                     n_classes, with_masks):
        out = {}
        for loss in self.losses:
            if loss == "boxes":
                out.update(boxes_loss(outputs, targets, query_idx, valid,
                                      num_boxes))
            elif loss == "focal_labels":
                out.update(focal_label_loss(outputs, targets, query_idx, valid,
                                            num_boxes, n_classes))
            elif loss == "masks":
                if with_masks and "pred_masks" in outputs:
                    out.update(mask_loss(outputs, targets, query_idx, valid,
                                         num_boxes, self.mask_size))
            else:
                raise ValueError(f"Unsupported boxer2d loss: {loss}")
        return out

    def __call__(self, outputs, targets, num_boxes=None):
        """outputs: model dict; targets: padded {labels, boxes, valid
        [, instance_masks]}. num_boxes: optional precomputed global mean count
        (pass the all-device value for gradient-accumulation parity)."""
        if num_boxes is None:
            num_boxes = self.compute_num_boxes(targets)

        losses = {}

        if "enc_outputs" in outputs and outputs["enc_outputs"] is not None:
            bin_targets = dict(targets)
            bin_targets["labels"] = jnp.zeros_like(targets["labels"])
            for i, enc_out in enumerate(outputs["enc_outputs"]):
                qi, valid = self.matcher(enc_out, bin_targets)
                l_dict = self._eval_losses(enc_out, bin_targets, qi, valid,
                                           num_boxes, 1, with_masks=False)
                losses.update({f"{k}_enc_{i}": v for k, v in l_dict.items()})

        final = {k: v for k, v in outputs.items()
                 if k not in ("aux_outputs", "enc_outputs")}
        layer_outputs = list(outputs.get("aux_outputs") or []) + [final]
        qis, valids = match_layers(self.matcher, layer_outputs, targets)
        for i, aux in enumerate(layer_outputs[:-1]):
            l_dict = self._eval_losses(aux, targets, qis[i], valids[i],
                                       num_boxes, self.num_classes,
                                       with_masks=True)
            losses.update({f"{k}_{i}": v for k, v in l_dict.items()})
        qi, valid = qis[-1], valids[-1]
        losses.update(self._eval_losses(final, targets, qi, valid, num_boxes,
                                        self.num_classes, with_masks=True))
        # expose final matching for metrics
        losses["_query_idx"] = qi
        losses["_valid"] = valid
        return losses


@register_loss("detr")
class DETRCriterion(BaseCriterion):
    """DETRLoss parity (`losses.py:336-415`): softmax CE labels + boxes."""

    def __init__(self, num_classes, matcher, weight_dict, losses, eos_coef,
                 iter_per_update=1):
        super().__init__(num_classes, matcher, weight_dict, losses,
                         iter_per_update)
        self.eos_coef = eos_coef

    def _eval_losses(self, outputs, targets, query_idx, valid, num_boxes):
        out = {}
        for loss in self.losses:
            if loss == "boxes":
                out.update(boxes_loss(outputs, targets, query_idx, valid,
                                      num_boxes))
            elif loss == "labels":
                out.update(label_loss_ce(outputs, targets, query_idx, valid,
                                         num_boxes, self.num_classes,
                                         self.eos_coef, self.iter_per_update))
            else:
                raise ValueError(f"Unsupported detr loss: {loss}")
        return out

    def __call__(self, outputs, targets, num_boxes=None):
        if num_boxes is None:
            num_boxes = self.compute_num_boxes(targets)
        losses = {}
        final = {k: v for k, v in outputs.items() if k != "aux_outputs"}
        layer_outputs = list(outputs.get("aux_outputs") or []) + [final]
        qis, valids = match_layers(self.matcher, layer_outputs, targets)
        for i, aux in enumerate(layer_outputs[:-1]):
            l_dict = self._eval_losses(aux, targets, qis[i], valids[i],
                                       num_boxes)
            losses.update({f"{k}_{i}": v for k, v in l_dict.items()})
        qi, valid = qis[-1], valids[-1]
        losses.update(self._eval_losses(final, targets, qi, valid, num_boxes))
        losses["_query_idx"] = qi
        losses["_valid"] = valid
        return losses


@register_loss("boxer3d")
class Boxer3DCriterion(BaseCriterion):
    """Boxer3DLoss parity (`losses.py:540-637`)."""

    def _eval_losses(self, outputs, targets, query_idx, valid, num_boxes,
                     n_classes):
        out = {}
        for loss in self.losses:
            if loss == "boxes":
                out.update(boxes3d_loss(outputs, targets, query_idx, valid,
                                        num_boxes))
            elif loss == "focal_labels":
                out.update(focal_label_loss(outputs, targets, query_idx, valid,
                                            num_boxes, n_classes))
            else:
                raise ValueError(f"Unsupported boxer3d loss: {loss}")
        return out

    def __call__(self, outputs, targets, num_boxes=None):
        if num_boxes is None:
            num_boxes = self.compute_num_boxes(targets)
        losses = {}
        if "enc_outputs" in outputs and outputs["enc_outputs"] is not None:
            bin_targets = dict(targets)
            bin_targets["labels"] = jnp.zeros_like(targets["labels"])
            for i, enc_out in enumerate(outputs["enc_outputs"]):
                qi, valid = self.matcher(enc_out, bin_targets)
                l_dict = self._eval_losses(enc_out, bin_targets, qi, valid,
                                           num_boxes, 1)
                losses.update({f"{k}_enc_{i}": v for k, v in l_dict.items()})
        final = {k: v for k, v in outputs.items()
                 if k not in ("aux_outputs", "enc_outputs")}
        layer_outputs = list(outputs.get("aux_outputs") or []) + [final]
        qis, valids = match_layers(self.matcher, layer_outputs, targets)
        for i, aux in enumerate(layer_outputs[:-1]):
            l_dict = self._eval_losses(aux, targets, qis[i], valids[i],
                                       num_boxes, self.num_classes)
            losses.update({f"{k}_{i}": v for k, v in l_dict.items()})
        qi, valid = qis[-1], valids[-1]
        losses.update(self._eval_losses(final, targets, qi, valid, num_boxes,
                                        self.num_classes))
        losses["_query_idx"] = qi
        losses["_valid"] = valid
        return losses


def build_loss(loss_config, num_classes: int, iter_per_update: int = 1):
    """Parity: reference `build_loss` (`losses.py:17-74`) incl. weight-dict
    construction."""
    loss_type = loss_config["type"]
    params = loss_config["params"]
    weight_dict = {
        "loss_ce": params["class_loss_coef"],
        "loss_bbox": params["bbox_loss_coef"],
        "loss_giou": params["giou_loss_coef"],
    }
    matcher = build_matcher(params["matcher"])

    if loss_type == "detr":
        return DETRCriterion(
            num_classes, matcher, weight_dict, ["boxes", "labels"],
            eos_coef=params["eos_coef"], iter_per_update=iter_per_update)
    if loss_type == "boxer2d":
        losses = ["boxes", "focal_labels"]
        if params.get("use_mask"):
            weight_dict["loss_mask"] = params["mask_loss_coef"]
            weight_dict["loss_dice"] = params["dice_loss_coef"]
            losses.append("masks")
        return Boxer2DCriterion(num_classes, matcher, weight_dict, losses,
                                iter_per_update=iter_per_update)
    if loss_type == "boxer3d":
        weight_dict["loss_rad"] = params["rad_loss_coef"]
        return Boxer3DCriterion(num_classes, matcher, weight_dict,
                                ["boxes", "focal_labels"],
                                iter_per_update=iter_per_update)
    raise ValueError(f"Unsupported loss type: {loss_type}")


def weighted_total(losses: Dict[str, jnp.ndarray],
                   weight_dict: Dict[str, float]):
    """Weighted sum of matching loss terms (reference `base_model.py:113-161`).

    Returns (total, stats) where stats carries scaled + unscaled values."""
    total = 0.0
    stats = {}
    for k, v in losses.items():
        if k.startswith("_"):
            continue
        base = _base_key(k)
        w = weight_dict.get(base)
        if w is None:
            continue
        total = total + w * v
        stats[k] = v
    return total, stats


def _base_key(key: str) -> str:
    """loss_ce_enc_0 -> loss_ce; loss_bbox_3 -> loss_bbox."""
    parts = key.split("_")
    while parts and (parts[-1].isdigit() or parts[-1] == "enc"):
        parts.pop()
    return "_".join(parts)
