"""Waymo TFRecord frame decoding.

Parity target: reference `tools/preprocess/waymo_decoder.py` (216 LoC):
decodes a `waymo_open_dataset` Frame proto into the per-frame pkl the
training pipeline consumes ({lidars: {points_xyz, points_feature},
scene_name, frame_name, gt_boxes, gt_names, difficulty, num_points_in_gt}).

Requires tensorflow + waymo_open_dataset (not bundled in the TPU image);
import is deferred so the rest of the framework never touches TF.
"""

import numpy as np


def decode_frame(frame):
    """frame: waymo_open_dataset.dataset_pb2.Frame -> dict."""
    from waymo_open_dataset.utils import frame_utils

    (range_images, camera_projections, _, range_image_top_pose) = (
        frame_utils.parse_range_image_and_camera_projection(frame))
    points, cp_points = frame_utils.convert_range_image_to_point_cloud(
        frame, range_images, camera_projections, range_image_top_pose,
        keep_polar_features=True)
    # columns: range, intensity, elongation, x, y, z
    points_all = np.concatenate(points, axis=0)
    points_xyz = points_all[:, 3:6].astype(np.float32)
    points_feature = points_all[:, 1:3].astype(np.float32)  # intensity, elong

    return {
        "scene_name": frame.context.name,
        "frame_name": "{}_{}_{}".format(
            frame.context.name, frame.timestamp_micros,
            frame.context.stats.time_of_day),
        "lidars": {
            "points_xyz": points_xyz,
            "points_feature": points_feature,
        },
    }


def decode_annotations(frame):
    """Frame labels -> gt arrays (boxes (N, 9) incl. velocity+heading)."""
    boxes, names, difficulty, num_points = [], [], [], []
    type_map = {1: "VEHICLE", 2: "PEDESTRIAN", 3: "SIGN", 4: "CYCLIST"}
    for label in frame.laser_labels:
        b = label.box
        boxes.append([b.center_x, b.center_y, b.center_z,
                      b.length, b.width, b.height,
                      label.metadata.speed_x if label.metadata else 0.0,
                      label.metadata.speed_y if label.metadata else 0.0,
                      b.heading])
        names.append(type_map.get(label.type, "UNKNOWN"))
        difficulty.append(label.detection_difficulty_level)
        num_points.append(label.num_lidar_points_in_box)
    return {
        "gt_boxes": np.asarray(boxes, np.float32).reshape(-1, 9),
        "gt_names": np.asarray(names),
        "difficulty": np.asarray(difficulty, np.int8),
        "num_points_in_gt": np.asarray(num_points, np.int64),
    }
