"""Build the GT-crop database for DataBaseSampler augmentation.

Parity target: reference `tools/preprocess/create_gt_database.py` (396 LoC):
crops each annotated object's points (box frame, centered) into per-object
files + a db-info pkl grouped by class.

Usage:
  python tools/preprocess/create_gt_database.py --root <processed_root> \
      --info infos/infos_train.pkl --out gt_database
"""

import argparse
import os
import pickle

import numpy as np


def points_in_box(points, box):
    """Axis-align points into the box frame; return mask + centered points."""
    import math

    c, s = math.cos(-box[-1]), math.sin(-box[-1])
    local = points[:, :3] - box[:3]
    x = local[:, 0] * c - local[:, 1] * s
    y = local[:, 0] * s + local[:, 1] * c
    z = local[:, 2]
    keep = ((np.abs(x) <= box[3] / 2) & (np.abs(y) <= box[4] / 2)
            & (np.abs(z) <= box[5] / 2))
    out = points[keep].copy()
    out[:, :3] -= box[:3]
    return keep, out


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--root", required=True)
    parser.add_argument("--info", required=True)
    parser.add_argument("--out", default="gt_database")
    args = parser.parse_args()

    from boxer_tpu.dataset.waymo import read_lidar_points

    with open(os.path.join(args.root, args.info), "rb") as f:
        infos = pickle.load(f)

    out_dir = os.path.join(args.root, args.out)
    os.makedirs(out_dir, exist_ok=True)
    db = {}
    for info in infos:
        path = info["path"]
        if not os.path.isabs(path):
            path = os.path.join(args.root, path)
        points = read_lidar_points(path)
        for gi, (box, name) in enumerate(zip(info["gt_boxes"],
                                             info["gt_names"])):
            box7 = np.concatenate([box[:6], box[-1:]])
            _, obj_points = points_in_box(points, box7)
            if len(obj_points) == 0:
                continue
            rel = f"{args.out}/{info['token']}_{gi}_{name}.npz"
            np.savez(os.path.join(args.root, rel), points=obj_points)
            db.setdefault(str(name), []).append({
                "name": str(name),
                "path": rel,
                "box3d_lidar": box7.astype(np.float32),
                "num_points_in_gt": int(len(obj_points)),
                "difficulty": int(info.get("difficulty", [0] * (gi + 1))[gi]),
            })
    out = os.path.join(args.root, "infos",
                       "dbinfos_" + os.path.basename(args.info))
    with open(out, "wb") as f:
        pickle.dump(db, f)
    print({k: len(v) for k, v in db.items()}, "->", out)


if __name__ == "__main__":
    main()
