"""Hungarian matching, fully on-device and jittable.

Replaces the reference's per-step scipy `linear_sum_assignment` on CPU
(`e2edet/module/matcher.py:132-137`, an implicit device→host sync every
training step) with an exact Jonker-Volgenant-style shortest-augmenting-path
solver expressed in `lax.while_loop`/`fori_loop`. It is vmapped over
(batch × decoder-layer) so **all** matching problems of a train step run in
one lockstep batched solve on the TPU.

Cost parity (reference `matcher.py:55-144`):
  focal: cost = w_cls*(pos_cost - neg_cost)[q, label_t] + w_l1*||b_q - b_t||_1
               + w_giou*(-GIoU)
  softmax: cost_class = -softmax(logits)[q, label_t]

Padding: invalid targets get a constant-zero cost row. Constant rows can take
any leftover column without affecting the optimum of the valid sub-assignment
(queries >= targets always holds), so valid matches equal scipy's exactly
(verified in tests/test_matcher.py).
"""

import functools
from typing import Tuple

import jax
import jax.numpy as jnp

from boxer_tpu.utils.box_ops import box_cxcywh_to_xyxy, generalized_box_iou

BIG = 1e9


@functools.partial(jax.jit, static_argnames=())
def _hungarian_single(cost: jnp.ndarray) -> jnp.ndarray:
    """Solve min-cost assignment for one (n_rows, n_cols) matrix, n_rows <= n_cols.

    Returns col4row (n_rows,) int32: the column assigned to each row.
    Shortest augmenting path with dual potentials (O(n_rows * n_cols^2) worst
    case; column operations vectorize on the VPU).
    """
    n, m = cost.shape
    cost = cost.astype(jnp.float32)

    # 1-indexed over columns; col 0 is the virtual start column.
    # p[j] = row assigned to column j (-1 = free); u, v duals.
    u0 = jnp.zeros((n,), jnp.float32)
    v0 = jnp.zeros((m + 1,), jnp.float32)
    p0 = jnp.full((m + 1,), -1, jnp.int32)

    def outer(i, carry):
        u, v, p = carry
        p = p.at[0].set(i)

        minv = jnp.full((m + 1,), BIG, jnp.float32).at[0].set(-BIG)
        way = jnp.zeros((m + 1,), jnp.int32)
        used = jnp.zeros((m + 1,), bool)
        j0 = jnp.int32(0)

        def cond(state):
            _, _, _, _, j0, _, p = state
            return p[j0] != -1

        def body(state):
            minv, way, used, v, j0, u, p = state
            used = used.at[j0].set(True)
            i0 = p[j0]

            cur = cost[i0, :] - u[i0] - v[1:]  # (m,)
            cur = jnp.where(used[1:], BIG, cur)
            better = cur < minv[1:]
            minv = minv.at[1:].set(jnp.where(better, cur, minv[1:]))
            way = way.at[1:].set(jnp.where(better, j0, way[1:]))

            masked = jnp.where(used[1:], BIG, minv[1:])
            j1 = jnp.argmin(masked).astype(jnp.int32) + 1
            delta = masked[j1 - 1]

            # dual update: rows of used columns += delta, their v -= delta;
            # unused columns' reduced costs shrink by delta.
            row_idx = jnp.where(used, p, n)  # n = out-of-bounds -> dropped
            row_mask = jnp.zeros((n,), bool).at[row_idx].set(True, mode="drop")
            u = jnp.where(row_mask, u + delta, u)
            v = jnp.where(used, v - delta, v)
            minv = jnp.where(used, minv, minv - delta)
            return minv, way, used, v, j1, u, p

        minv, way, used, v, j0, u, p = jax.lax.while_loop(
            cond, body, (minv, way, used, v, j0, u, p)
        )

        # augment: walk back along `way`, shifting assignments
        def aug_cond(state):
            j0, _ = state
            return j0 != 0

        def aug_body(state):
            j0, p = state
            j1 = way[j0]
            p = p.at[j0].set(p[j1])
            return j1, p

        _, p = jax.lax.while_loop(aug_cond, aug_body, (j0, p))
        return u, v, p

    _, _, p = jax.lax.fori_loop(0, n, outer, (u0, v0, p0))

    # invert: col4row[r] = j such that p[j+1] == r (0-indexed real columns)
    cols = jnp.arange(m, dtype=jnp.int32)
    row_idx = jnp.where(p[1:] >= 0, p[1:], n)  # n -> dropped
    col4row = jnp.zeros((n,), jnp.int32).at[row_idx].set(cols, mode="drop")
    return col4row


def hungarian(cost: jnp.ndarray, row_valid: jnp.ndarray) -> jnp.ndarray:
    """Batched assignment. cost: (..., NT, NQ); row_valid: (..., NT) bool.

    Invalid rows are replaced by constant zeros (assignment of valid rows is
    then exact). Returns col4row (..., NT) int32; entries for invalid rows are
    arbitrary valid column indices and must be masked by the caller.

    Column pruning (exact): when NQ >> NT the solver first restricts each
    problem to the union of every row's NT cheapest columns. This preserves
    the optimum: if an optimal assignment used a column outside row i's
    NT-best, row i has NT cheaper columns of which at most NT-1 are taken, so
    swapping to a free cheaper one never increases the total (classic
    exchange argument). Duplicated candidates are disarmed with a +BIG cost
    so no original column can be assigned twice. This turns the encoder-scale
    matching (NT=20, NQ~20k: measured 55 ms/step of augmenting-path
    while-loops) into a (NT, NT^2) solve (~1 ms).
    """
    cost = jnp.where(row_valid[..., None], cost, 0.0)
    batch_shape = cost.shape[:-2]
    flat = cost.reshape((-1,) + cost.shape[-2:])
    nt, nq = flat.shape[-2:]

    if nq > 4 * nt:
        k = min(nt, nq)
        _, idx = jax.lax.top_k(-flat, k)              # (B, NT, k) cheapest
        cand = jnp.sort(idx.reshape(flat.shape[0], nt * k), axis=-1)
        dup = jnp.concatenate(
            [jnp.zeros_like(cand[:, :1], bool),
             cand[:, 1:] == cand[:, :-1]], axis=-1)   # (B, NT*k)
        sub = jnp.take_along_axis(flat, cand[:, None, :], axis=-1)
        sub = jnp.where(dup[:, None, :], BIG, sub)
        out_sub = jax.vmap(_hungarian_single)(sub)
        out = jnp.take_along_axis(cand, out_sub, axis=-1)
    else:
        out = jax.vmap(_hungarian_single)(flat)
    return out.reshape(batch_shape + (cost.shape[-2],))


# ---------------------------------------------------------------------------
# Cost construction
# ---------------------------------------------------------------------------

def _focal_class_cost(out_prob, tgt_labels, alpha=0.25, gamma=2.0):
    """out_prob: (B, NQ, C) sigmoid probs; tgt_labels: (B, NT) int.
    Returns (B, NQ, NT). Parity `matcher.py:105-113`."""
    neg = (1 - alpha) * (out_prob ** gamma) * (-jnp.log(1 - out_prob + 1e-8))
    pos = alpha * ((1 - out_prob) ** gamma) * (-jnp.log(out_prob + 1e-8))
    labels = jnp.clip(tgt_labels, 0, out_prob.shape[-1] - 1)
    pos_t = jnp.take_along_axis(pos, labels[:, None, :], axis=2)
    neg_t = jnp.take_along_axis(neg, labels[:, None, :], axis=2)
    return pos_t - neg_t


def _softmax_class_cost(out_logits, tgt_labels):
    prob = jax.nn.softmax(out_logits, axis=-1)
    labels = jnp.clip(tgt_labels, 0, prob.shape[-1] - 1)
    return -jnp.take_along_axis(prob, labels[:, None, :], axis=2)


class HungarianMatcher:
    """2D matcher. Parity: reference `HungarianMatcher` (`matcher.py:23-149`).

    __call__(outputs, targets) -> (query_idx (B, NT) int32, valid (B, NT) bool)
    where outputs = {"pred_logits" (B,NQ,C), "pred_boxes" (B,NQ,4)} and
    targets = {"labels" (B,NT), "boxes" (B,NT,4) cxcywh, "valid" (B,NT)}.
    """

    def __init__(self, cost_class=1.0, cost_bbox=1.0, cost_giou=1.0,
                 focal_label=False):
        assert cost_class != 0 or cost_bbox != 0 or cost_giou != 0
        self.cost_class = cost_class
        self.cost_bbox = cost_bbox
        self.cost_giou = cost_giou
        self.focal_label = focal_label

    def cost_matrix(self, outputs, targets):
        logits = outputs["pred_logits"].astype(jnp.float32)
        out_bbox = outputs["pred_boxes"].astype(jnp.float32)
        tgt_labels = targets["labels"]
        tgt_bbox = targets["boxes"].astype(jnp.float32)

        if self.focal_label:
            cost_class = _focal_class_cost(jax.nn.sigmoid(logits), tgt_labels)
        else:
            cost_class = _softmax_class_cost(logits, tgt_labels)

        cost_bbox = jnp.abs(
            out_bbox[:, :, None, :] - tgt_bbox[:, None, :, :]
        ).sum(-1)
        cost_giou = -generalized_box_iou(
            box_cxcywh_to_xyxy(out_bbox), box_cxcywh_to_xyxy(tgt_bbox)
        )
        c = (self.cost_bbox * cost_bbox + self.cost_class * cost_class
             + self.cost_giou * cost_giou)
        return c  # (B, NQ, NT)

    def __call__(self, outputs, targets) -> Tuple[jnp.ndarray, jnp.ndarray]:
        c = self.cost_matrix(outputs, targets)
        valid = targets["valid"]
        col4row = hungarian(jnp.swapaxes(c, -1, -2), valid)
        return col4row, valid


class HungarianMatcher3d:
    """3D matcher with rad cost. Parity: reference `HungarianMatcher3d`
    (`matcher.py:152-246`). Boxes are 8-dim: 6 geom + 2 rad."""

    def __init__(self, cost_class=1.0, cost_bbox=1.0, cost_giou=1.0,
                 cost_rad=1.0):
        self.cost_class = cost_class
        self.cost_bbox = cost_bbox
        self.cost_giou = cost_giou
        self.cost_rad = cost_rad

    def cost_matrix(self, outputs, targets):
        from boxer_tpu.utils.box3d_ops import (
            box_cxcyczlwh_to_xyxyxy,
            generalized_box3d_iou,
        )

        prob = jax.nn.sigmoid(outputs["pred_logits"].astype(jnp.float32))
        out_bbox = outputs["pred_boxes"][..., :6].astype(jnp.float32)
        out_rad = outputs["pred_boxes"][..., 6:].astype(jnp.float32)
        tgt_labels = targets["labels"]
        tgt_bbox = targets["boxes"][..., :6].astype(jnp.float32)
        tgt_rad = targets["boxes"][..., 6:].astype(jnp.float32)

        cost_class = _focal_class_cost(prob, tgt_labels)
        cost_bbox = jnp.abs(
            out_bbox[:, :, None, :] - tgt_bbox[:, None, :, :]
        ).sum(-1)
        cost_rad = jnp.abs(
            out_rad[:, :, None, :] - tgt_rad[:, None, :, :]
        ).sum(-1)
        cost_giou = -generalized_box3d_iou(
            box_cxcyczlwh_to_xyxyxy(out_bbox),
            box_cxcyczlwh_to_xyxyxy(tgt_bbox),
        )
        return (self.cost_bbox * cost_bbox + self.cost_class * cost_class
                + self.cost_giou * cost_giou + self.cost_rad * cost_rad)

    def __call__(self, outputs, targets):
        c = self.cost_matrix(outputs, targets)
        valid = targets["valid"]
        col4row = hungarian(jnp.swapaxes(c, -1, -2), valid)
        return col4row, valid


def build_matcher(config):
    """Dispatch parity with reference `build_matcher` (`matcher.py:249-270`)."""
    matcher_type = config["type"]
    params = config["params"]
    if matcher_type == "hungarian":
        return HungarianMatcher(
            cost_class=params["class_weight"],
            cost_bbox=params["bbox_weight"],
            cost_giou=params["giou_weight"],
            focal_label=params.get("focal_label", False),
        )
    if matcher_type == "hungarian3d":
        return HungarianMatcher3d(
            cost_class=params["class_weight"],
            cost_bbox=params["bbox_weight"],
            cost_giou=params["giou_weight"],
            cost_rad=params["rad_weight"],
        )
    raise ValueError(f"Unknown matcher type: {matcher_type}")
