"""Create PETRv2-BEVseg ground-truth BEV map masks (reference:
tools/create_petr_nus_infos.py — the reference rasterizes nuScenes map
layers into per-sample npz files that LoadMapsFromFiles reads,
transforms/reader.py:715).

    python tools/create_petr_nus_infos.py --dataset_root datasets/nuscenes \
        [--version v1.0-trainval] [--save_dir maps_bev] [--bev_size 256] \
        [--bev_range 102.4]

Per key frame writes `<save_dir>/<sample_token>.npz` with arr_0
[bev_size, bev_size, 3] binary masks, ego-centered and ego-aligned:
  0: drivable area — cropped from the nuScenes map PNG bitmask
     (maps/<map_token>.png, 0.1 m/px) when present, else zeros;
  1: lane — from the map expansion rasters if a maps/lane_<token>.png
     exists (the expansion pack is optional), else zeros;
  2: vehicle occupancy — gt vehicle boxes rasterized in the ego frame.
"""
import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def parse_args():
    p = argparse.ArgumentParser()
    p.add_argument("--dataset_root", required=True)
    p.add_argument("--version", default="v1.0-trainval")
    p.add_argument("--save_dir", default=None,
                   help="default <dataset_root>/maps_bev")
    p.add_argument("--bev_size", type=int, default=256)
    p.add_argument("--bev_range", type=float, default=102.4,
                   help="meters covered by the full BEV window")
    return p.parse_args()


def rasterize_boxes(boxes, bev_size, bev_range):
    """[N, 7] ego-frame boxes -> [bev, bev] occupancy mask."""
    mask = np.zeros((bev_size, bev_size), np.float32)
    res = bev_range / bev_size
    half = bev_range / 2
    yy, xx = np.meshgrid(np.arange(bev_size), np.arange(bev_size),
                         indexing="ij")
    wx = xx * res - half + res / 2
    wy = yy * res - half + res / 2
    for b in boxes:
        cx, cy, w, l, yaw = b[0], b[1], b[3], b[4], b[6]
        c, s = np.cos(-yaw), np.sin(-yaw)
        lx = c * (wx - cx) - s * (wy - cy)
        ly = s * (wx - cx) + c * (wy - cy)
        inside = (np.abs(lx) <= l / 2) & (np.abs(ly) <= w / 2)
        mask[inside] = 1.0
    return mask


def crop_map(png, ego_xy, ego_yaw, bev_size, bev_range):
    """Rotated ego-centered crop of a global 0.1 m/px map bitmask."""
    res_map = 0.1
    res = bev_range / bev_size
    h, w = png.shape[:2]
    yy, xx = np.meshgrid(np.arange(bev_size), np.arange(bev_size),
                         indexing="ij")
    half = bev_range / 2
    lx = xx * res - half + res / 2
    ly = yy * res - half + res / 2
    c, s = np.cos(ego_yaw), np.sin(ego_yaw)
    gx = ego_xy[0] + c * lx - s * ly
    gy = ego_xy[1] + s * lx + c * ly
    px = np.clip((gx / res_map).astype(np.int64), 0, w - 1)
    # nuScenes map PNG row 0 = max y
    py = np.clip(h - 1 - (gy / res_map).astype(np.int64), 0, h - 1)
    ok = (gx >= 0) & (gx < w * res_map) & (gy >= 0) & (gy < h * res_map)
    vals = png[py, px]
    if vals.ndim == 3:
        vals = vals[..., 0]
    return np.where(ok, (vals > 0).astype(np.float32), 0.)


def main():
    args = parse_args()
    from PIL import Image

    from paddle3d_tpu.datasets.nuscenes import NuscenesPCDataset
    from paddle3d_tpu.utils.logger import logger
    from paddle3d_tpu.utils.transform3d import quat_yaw

    save_dir = args.save_dir or os.path.join(args.dataset_root, "maps_bev")
    os.makedirs(save_dir, exist_ok=True)

    ds = NuscenesPCDataset(dataset_root=args.dataset_root,
                           version=args.version, mode="train", max_sweeps=0)

    # map table: log -> map png (optional — zeros when absent)
    map_by_log = {}
    map_path = os.path.join(args.dataset_root, args.version, "map.json")
    if os.path.exists(map_path):
        with open(map_path) as f:
            for row in json.load(f):
                for log_tok in row.get("log_tokens", []):
                    map_by_log[log_tok] = row.get("filename")
    log_by_scene = {}
    scene_path = os.path.join(args.dataset_root, args.version, "scene.json")
    if os.path.exists(scene_path):
        with open(scene_path) as f:
            for row in json.load(f):
                log_by_scene[row["token"]] = row.get("log_token")

    png_cache = {}
    vehicle_classes = ("car", "truck", "bus", "trailer",
                       "construction_vehicle")
    n_done = 0
    for token in ds.sample_tokens:
        sd = ds.lidar_sd(token)
        ep = ds.ego_pose[sd["ego_pose_token"]]
        ego_xy = np.asarray(ep["translation"][:2])
        ego_yaw = quat_yaw(np.asarray(ep["rotation"]))

        layers = np.zeros((args.bev_size, args.bev_size, 3), np.float32)
        scene_tok = ds.sample[token]["scene_token"]
        map_file = map_by_log.get(log_by_scene.get(scene_tok))
        if map_file:
            fp = os.path.join(args.dataset_root, map_file)
            if os.path.exists(fp):
                if fp not in png_cache:
                    png_cache[fp] = np.asarray(Image.open(fp))
                layers[..., 0] = crop_map(png_cache[fp], ego_xy, ego_yaw,
                                          args.bev_size, args.bev_range)
            lane_fp = fp.replace(".png", "_lane.png")
            if os.path.exists(lane_fp):
                if lane_fp not in png_cache:
                    png_cache[lane_fp] = np.asarray(Image.open(lane_fp))
                layers[..., 1] = crop_map(png_cache[lane_fp], ego_xy,
                                          ego_yaw, args.bev_size,
                                          args.bev_range)

        boxes, labels, names, npts, attrs = ds.annotations(token)
        keep = np.array([nm in vehicle_classes for nm in names], bool)
        if keep.any():
            layers[..., 2] = rasterize_boxes(boxes[keep], args.bev_size,
                                             args.bev_range)

        np.savez_compressed(os.path.join(save_dir, token + ".npz"), layers)
        n_done += 1
    logger.info("Wrote {} BEV map masks to {}".format(n_done, save_dir))


if __name__ == "__main__":
    main()
