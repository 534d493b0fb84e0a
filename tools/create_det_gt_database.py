"""Build the GT-paste database (reference: tools/create_det_gt_database.py +
paddle3d/datasets/generate_gt_database.py:204).

Crops per-object point clouds from a dataset and writes
    {save_dir}/bins/*.bin  (points relative to each box center)
    {save_dir}/anno_info_{mode}.pkl  ({class_name: [annos]})
consumed by the SamplingDatabase transform.
"""
import argparse
import os
import pickle
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def parse_args():
    parser = argparse.ArgumentParser()
    parser.add_argument("--config", dest="cfg", required=True)
    parser.add_argument("--save_dir", required=True)
    parser.add_argument("--mode", default="train")
    return parser.parse_args()


def main(args):
    from paddle3d_tpu.apis import Config
    from paddle3d_tpu.geometries import points_in_rbbox_bev
    from paddle3d_tpu.utils.logger import logger

    cfg = Config(path=args.cfg)
    dataset = cfg.train_dataset
    bin_dir = os.path.join(args.save_dir, "bins")
    os.makedirs(bin_dir, exist_ok=True)

    database = {}
    for i in range(len(dataset)):
        sample = dataset[i]
        if sample.bboxes_3d is None or len(sample.bboxes_3d) == 0:
            continue
        points = np.asarray(sample.data)
        boxes = np.asarray(sample.bboxes_3d)
        labels = np.asarray(sample.labels)
        diffs = getattr(sample, "difficulties", None)
        in_box = points_in_rbbox_bev(points, boxes,
                                     origin=sample.bboxes_3d.origin)
        for j, (box, label) in enumerate(zip(boxes, labels)):
            obj_pts = points[in_box[:, j]]
            if len(obj_pts) == 0:
                continue
            rel = obj_pts.copy()
            rel[:, :3] -= box[:3]
            cls_name = dataset.class_names[int(label)]
            fname = "bins/{}_{}_{}.bin".format(
                str(sample.meta.get("id")).replace("/", "_"), j, cls_name)
            rel.astype(np.float32).tofile(os.path.join(args.save_dir,
                                                       fname))
            database.setdefault(cls_name, []).append({
                "lidar_file": fname,
                "lidar_dim": rel.shape[1],
                "box3d": box[:7].tolist(),
                "num_points_in_box": int(len(obj_pts)),
                "difficulty": int(diffs[j]) if diffs is not None else 0,
                "points_relative": True,
            })
        if (i + 1) % 100 == 0:
            logger.info("processed {}/{}".format(i + 1, len(dataset)))

    anno_path = os.path.join(args.save_dir,
                             "anno_info_{}.pkl".format(args.mode))
    with open(anno_path, "wb") as f:
        pickle.dump(database, f)
    logger.info("Wrote {} classes, {} objects -> {}".format(
        len(database), sum(len(v) for v in database.values()), anno_path))


if __name__ == "__main__":
    main(parse_args())
