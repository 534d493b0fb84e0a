"""Create BEVFormer temporal info files (reference:
tools/create_bevformer_nus_infos.py — per-sample pkl infos with prev/next
linkage and can-bus signals for the temporal queue).

    python tools/create_bevformer_nus_infos.py --dataset_root datasets/nuscenes \
        [--version v1.0-trainval] [--save_path nuscenes_bevformer_infos.pkl]

Each info carries: token, scene_token, prev/next tokens, lidar_path,
timestamp, per-camera (filename, lidar2img, lidar2cam), and the 18-dim
can_bus delta signal used for prev-BEV ego-motion alignment
(models/detection/bevformer/bevformer.py)."""
import argparse
import os
import pickle
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def parse_args():
    p = argparse.ArgumentParser()
    p.add_argument("--dataset_root", required=True)
    p.add_argument("--version", default="v1.0-trainval")
    p.add_argument("--mode", default="train")
    p.add_argument("--save_path", default=None)
    p.add_argument("--cameras", nargs="*", default=None)
    p.add_argument("--image_size", type=int, nargs=2, default=(320, 800))
    return p.parse_args()


def main():
    args = parse_args()
    from paddle3d_tpu.datasets.nuscenes import NuscenesMVDataset
    from paddle3d_tpu.utils.logger import logger
    from paddle3d_tpu.utils.transform3d import invert_transform

    ds = NuscenesMVDataset(
        dataset_root=args.dataset_root, version=args.version,
        mode=args.mode, image_size=tuple(args.image_size),
        cameras=args.cameras)

    infos = []
    for token in ds.sample_tokens:
        rec = ds.sample[token]
        lidar_sd = ds.lidar_sd(token)
        lidar_from_global = invert_transform(ds._sd_transforms(lidar_sd))
        cams = {}
        for cam in ds.cameras:
            sd = ds.sample_data[rec["data"][cam]]
            cam_from_lidar = (invert_transform(ds._sd_transforms(sd)) @
                              invert_transform(lidar_from_global))
            cams[cam] = {
                "data_path": sd["filename"],
                "lidar2cam": cam_from_lidar.astype(np.float32),
            }
        infos.append({
            "token": token,
            "scene_token": rec["scene_token"],
            "prev": rec.get("prev", ""),
            "next": rec.get("next", ""),
            "timestamp": rec["timestamp"],
            "lidar_path": lidar_sd["filename"],
            "cams": cams,
            "can_bus": ds._can_bus(token),
        })

    save_path = args.save_path or os.path.join(
        args.dataset_root,
        "nuscenes_bevformer_infos_{}.pkl".format(args.mode))
    with open(save_path, "wb") as f:
        pickle.dump({"infos": infos, "metadata": {
            "version": args.version}}, f)
    logger.info("Wrote {} temporal infos to {}".format(len(infos),
                                                       save_path))


if __name__ == "__main__":
    main()
