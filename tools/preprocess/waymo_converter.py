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


def convert_one(args):
    path, out_dir, seq_idx = args
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
    return infos


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--records", required=True)
    parser.add_argument("--out", required=True)
    parser.add_argument("--split", default="train")
    parser.add_argument("--workers", type=int, default=8)
    args = parser.parse_args()

    paths = sorted(glob.glob(args.records))
    os.makedirs(os.path.join(args.out, "lidars"), exist_ok=True)
    os.makedirs(os.path.join(args.out, "infos"), exist_ok=True)

    with Pool(args.workers) as pool:
        all_infos = pool.map(
            convert_one,
            [(p, args.out, i) for i, p in enumerate(paths)])
    infos = [x for part in all_infos for x in part]
    out = os.path.join(args.out, "infos", f"infos_{args.split}.pkl")
    with open(out, "wb") as f:
        pickle.dump(infos, f)
    print(f"wrote {len(infos)} frames -> {out}")


if __name__ == "__main__":
    main()
