"""Convert raw Waymo Open Dataset TFRecords into the converted form
WaymoPCDataset consumes (reference: tools/create_waymo_infos.py — the
reference has the same external waymo-open-dataset dependency for this
step; training/eval never touch TFRecords).

    python tools/create_waymo_infos.py --raw_dir waymo/tfrecords \
        --out_dir datasets/waymo --mode train

Produces {out_dir}/{mode}_infos.pkl + {out_dir}/points/*.npy
(layout documented in paddle3d_tpu/datasets/waymo/waymo_det.py).

`--validate` checks an already-converted tree instead (no TF needed).
"""
import argparse
import os
import pickle
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

CLASS_MAP = {1: 0, 2: 1, 4: 2}  # waymo TYPE_VEHICLE/PEDESTRIAN/CYCLIST


def parse_args():
    p = argparse.ArgumentParser()
    p.add_argument("--raw_dir", type=str, default=None)
    p.add_argument("--out_dir", type=str, required=True)
    p.add_argument("--mode", type=str, default="train")
    p.add_argument("--validate", action="store_true",
                   help="only validate an existing converted tree")
    return p.parse_args()


def validate(out_dir, mode):
    path = os.path.join(out_dir, "{}_infos.pkl".format(mode))
    with open(path, "rb") as f:
        infos = pickle.load(f)
    assert isinstance(infos, list) and infos, "empty infos"
    for info in infos[:10]:
        for key in ("lidar_file", "boxes", "labels", "num_points_in_gt",
                    "frame_id"):
            assert key in info, "missing key {}".format(key)
        pts_path = os.path.join(out_dir, info["lidar_file"])
        assert os.path.exists(pts_path), pts_path
        boxes = np.asarray(info["boxes"])
        assert boxes.ndim == 2 and boxes.shape[1] == 7
    print("OK: {} frames in {}".format(len(infos), path))


def convert(raw_dir, out_dir, mode):
    try:
        import tensorflow as tf
        from waymo_open_dataset import dataset_pb2
        from waymo_open_dataset.utils import frame_utils
    except ImportError as e:  # same external dependency as the reference
        raise SystemExit(
            "waymo-open-dataset + tensorflow are required for TFRecord "
            "conversion (install on a conversion machine): {}".format(e))

    os.makedirs(os.path.join(out_dir, "points"), exist_ok=True)
    infos = []
    records = sorted(
        os.path.join(raw_dir, f) for f in os.listdir(raw_dir)
        if f.endswith(".tfrecord"))
    for rec in records:
        for data in tf.data.TFRecordDataset(rec, compression_type=""):
            frame = dataset_pb2.Frame()
            frame.ParseFromString(bytearray(data.numpy()))
            (range_images, camera_projections, _, range_image_top_pose) = \
                frame_utils.parse_range_image_and_camera_projection(frame)
            points, _ = frame_utils.convert_range_image_to_point_cloud(
                frame, range_images, camera_projections,
                range_image_top_pose)
            pts = np.concatenate(points, axis=0).astype(np.float32)
            # x, y, z (+ zero intensity placeholder to make [N, 4])
            if pts.shape[1] == 3:
                pts = np.hstack(
                    [pts, np.zeros((len(pts), 1), np.float32)])
            frame_id = "{}_{}".format(frame.context.name,
                                      frame.timestamp_micros)
            rel = os.path.join("points", frame_id + ".npy")
            np.save(os.path.join(out_dir, rel), pts)

            boxes, labels, n_pts = [], [], []
            for lab in frame.laser_labels:
                if lab.type not in CLASS_MAP:
                    continue
                b = lab.box
                boxes.append([b.center_x, b.center_y,
                              b.center_z - b.height / 2.0,  # bottom z
                              b.width, b.length, b.height, b.heading])
                labels.append(CLASS_MAP[lab.type])
                n_pts.append(lab.num_lidar_points_in_box)
            infos.append(dict(
                lidar_file=rel,
                boxes=np.asarray(boxes, np.float32).reshape(-1, 7),
                labels=np.asarray(labels, np.int32),
                num_points_in_gt=np.asarray(n_pts, np.int32),
                frame_id=frame_id))
    with open(os.path.join(out_dir, "{}_infos.pkl".format(mode)),
              "wb") as f:
        pickle.dump(infos, f)
    print("converted {} frames".format(len(infos)))


if __name__ == "__main__":
    args = parse_args()
    if args.validate:
        validate(args.out_dir, args.mode)
    else:
        convert(args.raw_dir, args.out_dir, args.mode)
