"""Waymo TFRecord -> per-frame pkl + infos pkl converter.

Parity target: reference `tools/preprocess/waymo_converter.py:20-47`
(multiprocessing pool over TFRecords). Produces:
  <out>/lidars/seq_{i}_frame_{j}.pkl    — decoded frame (see waymo_decoder)
  <out>/infos/infos_{split}.pkl         — list of per-frame info dicts

Usage:
  python tools/preprocess/waymo_converter.py --records 'waymo/*.tfrecord' \
      --out waymo_processed --split train [--workers 8]
"""

import argparse
import glob
import os
import pickle
from multiprocessing import Pool

import numpy as np


def veh_pos_to_transform(veh_pos):
    """4x4 vehicle->global pose -> (global_from_car, car_from_global).

    Pure-numpy equivalent of the reference's quaternion round trip
    (`tools/preprocess/create_gt_database.py:15-51`): the inverse of a rigid
    transform [R|t] is [R^T | -R^T t]."""
    veh_pos = np.asarray(veh_pos, np.float64).reshape(4, 4)
    rot = veh_pos[:3, :3]
    trans = veh_pos[:3, 3]
    global_from_car = np.eye(4)
    global_from_car[:3, :3] = rot
    global_from_car[:3, 3] = trans
    car_from_global = np.eye(4)
    car_from_global[:3, :3] = rot.T
    car_from_global[:3, 3] = -rot.T @ trans
    return global_from_car, car_from_global


def fill_sweep_infos(seq_infos, nsweeps):
    """Attach per-frame `sweeps` lists to one sequence's ordered infos.

    Each info needs `veh_to_global` (flat 16) and `timestamp` (seconds), as
    written by waymo_decoder. For frame i, sweeps are the nsweeps-1 prior
    frames with `transform_matrix = ref_from_global @ global_from_sweep`
    (prior-sweep vehicle frame -> key-frame vehicle frame) and
    `time_lag = t_ref - t_sweep` — exactly the reference info pipeline
    (`tools/preprocess/create_gt_database.py:54-120`); consumed by
    `boxer_tpu.dataset.waymo.read_points_with_sweeps`. When no prior frame
    exists, the key frame itself is used with transform_matrix=None /
    time_lag=0, padding by repetition like the reference."""
    for i, info in enumerate(seq_infos):
        _, ref_from_global = veh_pos_to_transform(info["veh_to_global"])
        ref_time = info["timestamp"]
        sweeps = []
        prev = i
        while len(sweeps) < nsweeps - 1:
            if prev <= 0:
                if not sweeps:
                    sweeps.append({"path": info["path"],
                                   "token": info["token"],
                                   "transform_matrix": None,
                                   "time_lag": 0.0})
                else:
                    sweeps.append(sweeps[-1])
            else:
                prev -= 1
                curr = seq_infos[prev]
                global_from_car, _ = veh_pos_to_transform(
                    curr["veh_to_global"])
                tm = ref_from_global @ global_from_car
                sweeps.append({"path": curr["path"],
                               "token": curr["token"],
                               "transform_matrix": tm,
                               "time_lag": ref_time - curr["timestamp"]})
        info["sweeps"] = sweeps
    return seq_infos


def convert_one(args):
    path, out_dir, seq_idx, nsweeps = args
    import tensorflow as tf
    from waymo_open_dataset import dataset_pb2

    from waymo_decoder import decode_annotations, decode_frame

    infos = []
    dataset = tf.data.TFRecordDataset(path, compression_type="")
    for j, data in enumerate(dataset):
        frame = dataset_pb2.Frame()
        frame.ParseFromString(bytearray(data.numpy()))
        rec = decode_frame(frame)
        anno = decode_annotations(frame)

        rel = f"lidars/seq_{seq_idx}_frame_{j}.pkl"
        with open(os.path.join(out_dir, rel), "wb") as f:
            pickle.dump(rec, f)
        infos.append({
            "token": rec["frame_name"],
            "path": rel,
            "anno_path": rel,
            "sweeps": [],
            **anno,
        })
    # one TFRecord == one driving sequence: frames are consecutive, so the
    # multi-sweep ego-motion infos can be assembled right here
    return fill_sweep_infos(infos, nsweeps)


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--records", required=True)
    parser.add_argument("--out", required=True)
    parser.add_argument("--split", default="train")
    parser.add_argument("--workers", type=int, default=8)
    parser.add_argument("--nsweeps", type=int, default=1,
                        help="sweeps per sample (key frame + nsweeps-1 "
                             "prior frames with ego-motion transforms)")
    args = parser.parse_args()

    paths = sorted(glob.glob(args.records))
    os.makedirs(os.path.join(args.out, "lidars"), exist_ok=True)
    os.makedirs(os.path.join(args.out, "infos"), exist_ok=True)

    with Pool(args.workers) as pool:
        all_infos = pool.map(
            convert_one,
            [(p, args.out, i, args.nsweeps) for i, p in enumerate(paths)])
    infos = [x for part in all_infos for x in part]
    out = os.path.join(args.out, "infos", f"infos_{args.split}.pkl")
    with open(out, "wb") as f:
        pickle.dump(infos, f)
    print(f"wrote {len(infos)} frames -> {out}")


if __name__ == "__main__":
    main()
