"""Create CADDN KITTI info files (reference: tools/creat_caddn_kitti_infos.py
— yes, the reference misspells 'create'; the filename is kept for CLI
parity). Writes kitti_infos_{split}.pkl with per-frame image shape, calib
matrices and annotations — the cacheable metadata KittiDepthDataset
otherwise derives from raw files.

    python tools/creat_caddn_kitti_infos.py --dataset_root datasets/KITTI \
        [--splits train val]
"""
import argparse
import os
import pickle
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def parse_args():
    p = argparse.ArgumentParser()
    p.add_argument("--dataset_root", required=True)
    p.add_argument("--splits", nargs="*", default=["train", "val"])
    return p.parse_args()


def main():
    args = parse_args()
    from PIL import Image

    from paddle3d_tpu.datasets.kitti import KittiDepthDataset
    from paddle3d_tpu.utils.logger import logger

    for split in args.splits:
        ds = KittiDepthDataset(dataset_root=args.dataset_root, mode=split,
                               class_names=["Car", "Cyclist", "Pedestrian"])
        infos = []
        for idx in ds.ids:
            calib = ds.load_calib(idx)
            with Image.open(ds.image_path(idx)) as im:
                shape = np.array([im.height, im.width], np.int32)
            info = {
                "image": {"image_idx": idx, "image_shape": shape,
                          "image_path": ds.image_path(idx)},
                "point_cloud": {"velodyne_path": ds.velodyne_path(idx)},
                "calib": {"P2": calib.P2, "R0_rect": calib.R0,
                          "Tr_velo_to_cam": calib.V2C},
            }
            try:
                info["annos"] = ds.load_anno(idx)
            except FileNotFoundError:
                pass
            infos.append(info)
        out = os.path.join(args.dataset_root,
                           "kitti_infos_{}.pkl".format(split))
        with open(out, "wb") as f:
            pickle.dump(infos, f)
        logger.info("Wrote {} infos to {}".format(len(infos), out))


if __name__ == "__main__":
    main()
