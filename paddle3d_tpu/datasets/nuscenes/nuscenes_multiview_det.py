"""nuScenes multi-view dataset (reference:
paddle3d/datasets/nuscenes/nuscenes_multiview_det.py:51 NuscenesMVDataset).

Emits the 6 camera images + per-camera lidar2img / img2lidar transforms and
lidar-frame gt for PETR/BEVFormer/BEVDet-style models. Fixed-shape collate:
images [B, N_cam, H, W, 3], matrices [B, N_cam, 4, 4].
"""
import os
from typing import List

import numpy as np
from PIL import Image

from ...apis import manager
from ...sample import Sample
from ...utils.transform3d import invert_transform, make_transform
from .nuscenes_det import NuscenesDetDataset
from .nuscenes_metric import NuScenesMetric

__all__ = ["NuscenesMVDataset", "NuscenesMVSegDataset",
           "NuScenesSegMetric"]

CAMERA_CHANNELS = [
    "CAM_FRONT", "CAM_FRONT_RIGHT", "CAM_FRONT_LEFT", "CAM_BACK",
    "CAM_BACK_LEFT", "CAM_BACK_RIGHT"
]


@manager.DATASETS.add_component
class NuscenesMVDataset(NuscenesDetDataset):
    max_gt_boxes = 128

    def __init__(self, dataset_root: str, version: str = "v1.0-mini",
                 mode: str = "train", class_names: List[str] = None,
                 transforms=None, image_size=(320, 800),
                 cameras: List[str] = None, bevdet_format: bool = False,
                 adjacent=False, with_depth: bool = False):
        """`bevdet_format` additionally emits the BEVDet camera-matrix
        contract (rots/trans/cam2imgs/post_rots/post_trans/bda — reference
        transforms/bevdet_reader.py:116 PrepareImageInputs); `adjacent`
        (bool or int frame count, reference multi_adj_frame_id_cfg) adds
        previous frames' images with cam->CURRENT-lidar matrices
        (ego-motion pre-composed, so the model needs no feature shift —
        reference bevdet4d.py / LoadMultiViewImageFromMultiSweepsFiles);
        `with_depth` rasterizes the key-frame LiDAR scan into per-camera
        sparse depth maps `gt_depth` [N, H, W] (reference
        transforms/bevdet_reader.py:12 PointToMultiViewDepth)."""
        super().__init__(dataset_root, version, mode, class_names,
                         transforms, max_sweeps=0)
        self.image_size = tuple(image_size)  # (H, W)
        self.cameras = cameras or CAMERA_CHANNELS
        self.bevdet_format = bevdet_format
        self.num_adj = int(adjacent)
        self.adjacent = self.num_adj > 0
        self.with_depth = with_depth

    def _load_views(self, rec, lidar_from_global):
        """One frame's camera views. Returns images + per-camera matrices;
        `lidar_from_global` fixes the TARGET lidar frame, so passing the
        key frame's transform with an ADJACENT frame's record yields
        cam->key-lidar matrices with ego motion composed in."""
        imgs, lidar2imgs, img2lidars, lidar2cams = [], [], [], []
        rots, trans, cam2imgs, post_rots = [], [], [], []
        h_out, w_out = self.image_size
        for cam in self.cameras:
            sd = self.sample_data[rec["data"][cam]]
            cs = self.calibrated_sensor[sd["calibrated_sensor_token"]]
            with Image.open(os.path.join(self.dataset_root,
                                         sd["filename"])) as im:
                w0, h0 = im.size
                imgs.append(
                    np.asarray(im.convert("RGB").resize((w_out, h_out)),
                               np.float32))
            cam_from_lidar = (
                invert_transform(self._sd_transforms(sd)) @
                invert_transform(lidar_from_global))
            k = np.eye(4, dtype=np.float64)
            intr = np.asarray(cs["camera_intrinsic"], np.float64)
            # rescale intrinsics to the resized image, normalized to [0,1]
            sx, sy = 1.0 / w0, 1.0 / h0
            k[0, :3] = intr[0] * sx
            k[1, :3] = intr[1] * sy
            k[2, 2] = 1.0
            lidar2img = k @ cam_from_lidar
            lidar2imgs.append(lidar2img.astype(np.float32))
            lidar2cams.append(cam_from_lidar.astype(np.float32))
            img2lidars.append(
                np.linalg.inv(lidar2img).astype(np.float32))
            # BEVDet contract: pixel intrinsics + cam->lidar rot/trans,
            # resize folded into post_rot
            lidar_from_cam = np.linalg.inv(cam_from_lidar)
            rots.append(lidar_from_cam[:3, :3].astype(np.float32))
            trans.append(lidar_from_cam[:3, 3].astype(np.float32))
            cam2imgs.append(intr.astype(np.float32))
            pr = np.diag([w_out / w0, h_out / h0, 1.0]).astype(np.float32)
            post_rots.append(pr)
        return (np.stack(imgs), np.stack(lidar2imgs), np.stack(img2lidars),
                np.stack(rots), np.stack(trans), np.stack(cam2imgs),
                np.stack(post_rots), np.stack(lidar2cams))

    def _depth_maps(self, lidar_sd: dict, lidar2imgs) -> np.ndarray:
        """Key-frame LiDAR points -> per-camera sparse depth maps [N,H,W]
        (min depth per pixel, 0 = no return) — reference
        transforms/bevdet_reader.py:12 PointToMultiViewDepth."""
        h, w = self.image_size
        pts = np.fromfile(
            os.path.join(self.dataset_root, lidar_sd["filename"]),
            np.float32).reshape(-1, 5)[:, :3]
        hom = np.concatenate(
            [pts, np.ones((len(pts), 1), np.float32)], axis=1)
        out = np.zeros((len(lidar2imgs), h, w), np.float32)
        for i, l2i in enumerate(lidar2imgs):
            proj = hom @ l2i.T  # normalized [0,1] image coords * depth
            d = proj[:, 2]
            keep = d > 1.0
            u = (proj[:, 0] / np.maximum(d, 1e-6) * w).astype(np.int64)
            v = (proj[:, 1] / np.maximum(d, 1e-6) * h).astype(np.int64)
            keep &= (u >= 0) & (u < w) & (v >= 0) & (v < h)
            u, v, d = u[keep], v[keep], d[keep]
            # min-depth per pixel: sort descending so the smallest writes last
            order = np.argsort(-d)
            out[i, v[order], u[order]] = d[order]
        return out

    def _can_bus(self, token: str) -> np.ndarray:
        """18-dim can-bus delta signal (reference: nuscenes_multiview_det
        can_bus + bevformer.py:243-255 delta patching, done data-side here):
        [0:3] = ego translation delta to the previous key frame (global
        frame), [3:7] = ego rotation quat, [-2] = ego yaw (rad),
        [-1] = yaw delta to the previous key frame (rad)."""
        from ...utils.transform3d import quat_yaw
        sd = self.lidar_sd(token)
        ep = self.ego_pose[sd["ego_pose_token"]]
        pos = np.asarray(ep["translation"], np.float64)
        quat = np.asarray(ep["rotation"], np.float64)
        yaw = quat_yaw(quat)
        rec = self.sample[token]
        can = np.zeros(18, np.float32)
        can[3:7] = quat
        can[-2] = yaw
        if rec.get("prev"):
            psd = self.lidar_sd(rec["prev"])
            pep = self.ego_pose[psd["ego_pose_token"]]
            can[0:3] = pos - np.asarray(pep["translation"], np.float64)
            dyaw = yaw - quat_yaw(np.asarray(pep["rotation"], np.float64))
            can[-1] = np.arctan2(np.sin(dyaw), np.cos(dyaw))
        return can

    def __getitem__(self, index: int) -> Sample:
        token = self.sample_tokens[index]
        rec = self.sample[token]
        lidar_sd = self.lidar_sd(token)
        lidar_from_global = invert_transform(self._sd_transforms(lidar_sd))

        (imgs, lidar2imgs, img2lidars, rots, trans, cam2imgs,
         post_rots, lidar2cams) = self._load_views(rec, lidar_from_global)

        sample = Sample(path=lidar_sd["filename"], modality="multiview")
        sample.meta.id = token
        sample.img = imgs
        sample.meta.lidar2imgs = lidar2imgs
        sample.meta.img2lidars = img2lidars
        sample.meta.lidar2cams = lidar2cams
        sample.meta.can_bus = self._can_bus(token)
        if self.bevdet_format:
            sample.meta.rots = rots
            sample.meta.trans = trans
            sample.meta.cam2imgs = cam2imgs
            sample.meta.post_rots = post_rots
        if self.adjacent:
            imgs_f, rots_f, trans_f = [], [], []
            cur = rec
            for _ in range(self.num_adj):
                prev_tok = cur.get("prev")
                cur = self.sample[prev_tok] if prev_tok else cur
                (img_adj, _, _, rots_adj, trans_adj, _, _,
                 _) = self._load_views(cur, lidar_from_global)
                imgs_f.append(img_adj)
                rots_f.append(rots_adj)
                trans_f.append(trans_adj)
            if self.num_adj == 1:  # back-compat: no frame axis
                sample.img_adj = imgs_f[0]
                sample.meta.rots_adj = rots_f[0]
                sample.meta.trans_adj = trans_f[0]
            else:
                sample.img_adj = np.stack(imgs_f)
                sample.meta.rots_adj = np.stack(rots_f)
                sample.meta.trans_adj = np.stack(trans_f)
        if self.with_depth:
            sample.meta.gt_depth = self._depth_maps(lidar_sd, lidar2imgs)

        if not self.is_test_mode:
            boxes, labels, names, num_pts, attrs = self.annotations(token)
            sample.bboxes_3d = boxes  # [G, 9] incl. velocities
            sample.labels = labels
        if self.transforms is not None:
            sample = self.transforms(sample)
        return sample

    def collate_fn(self, samples: List[Sample]):
        b = len(samples)
        g = self.max_gt_boxes
        gt_boxes = np.zeros((b, g, 9), np.float32)
        gt_labels = np.full((b, g), -1, np.int32)
        for i, s in enumerate(samples):
            if s.bboxes_3d is not None and len(s.bboxes_3d):
                n = min(len(s.bboxes_3d), g)
                gt_boxes[i, :n] = np.asarray(s.bboxes_3d)[:n]
                gt_labels[i, :n] = np.asarray(s.labels)[:n]
        batch = {
            "img": np.stack([s.img for s in samples]) / 255.0,
            "lidar2imgs": np.stack([s.meta.lidar2imgs for s in samples]),
            "img2lidars": np.stack([s.meta.img2lidars for s in samples]),
            "lidar2cams": np.stack([s.meta.lidar2cams for s in samples]),
            "can_bus": np.stack([s.meta.can_bus for s in samples]),
            "gt_boxes": gt_boxes,
            "gt_labels": gt_labels,
        }
        if self.bevdet_format:
            batch["rots"] = np.stack([s.meta.rots for s in samples])
            batch["trans"] = np.stack([s.meta.trans for s in samples])
            batch["cam2imgs"] = np.stack(
                [s.meta.cam2imgs for s in samples])
            batch["post_rots"] = np.stack(
                [s.meta.post_rots for s in samples])
            batch["post_trans"] = np.zeros(
                (b, len(self.cameras), 3), np.float32)
            batch["bda"] = np.broadcast_to(
                np.eye(3, dtype=np.float32), (b, 3, 3)).copy()
        if self.adjacent:
            batch["img_adj"] = np.stack(
                [s.img_adj for s in samples]) / 255.0
            batch["rots_adj"] = np.stack(
                [s.meta.rots_adj for s in samples])
            batch["trans_adj"] = np.stack(
                [s.meta.trans_adj for s in samples])
        if self.with_depth:
            batch["gt_depth"] = np.stack(
                [s.meta.gt_depth for s in samples])
        metas = [{"path": s.path, "id": s.meta.get("id")} for s in samples]
        return batch, metas

    @property
    def metric(self) -> NuScenesMetric:
        return NuScenesMetric(self)


@manager.DATASETS.add_component
class NuscenesMVSegDataset(NuscenesMVDataset):
    """Multi-view detection + BEV segmentation gt (reference:
    nuscenes_multiview_det.py:798 NuscenesMVSegDataset): each key frame has a
    precomputed BEV map-mask npz (drivable/lane/vehicle, produced by
    tools/create_petr_nus_infos.py) living under `maps_root/<token>.npz`;
    collate adds gt_semantic_map [B, H, W, C]."""

    def __init__(self, dataset_root: str, version: str = "v1.0-mini",
                 mode: str = "train", class_names: List[str] = None,
                 transforms=None, image_size=(320, 800),
                 cameras: List[str] = None, maps_root: str = None,
                 map_classes: int = 3):
        super().__init__(dataset_root, version=version, mode=mode,
                         class_names=class_names, transforms=transforms,
                         image_size=image_size, cameras=cameras)
        self.maps_root = maps_root or os.path.join(dataset_root, "maps_bev")
        self.map_classes = int(map_classes)

    def __getitem__(self, index: int) -> Sample:
        token = self.sample_tokens[index]
        # attach the map path BEFORE the transform pipeline runs so
        # LoadMapsFromFiles can pick it up
        transforms, self.transforms = self.transforms, None
        try:
            sample = super().__getitem__(index)
        finally:
            self.transforms = transforms
        sample.meta.map_filename = os.path.join(self.maps_root,
                                                "{}.npz".format(token))
        if self.transforms is not None:
            sample = self.transforms(sample)
        return sample

    def collate_fn(self, samples: List[Sample]):
        batch, metas = super().collate_fn(samples)
        if getattr(samples[0], "gt_semantic_map", None) is not None:
            batch["gt_semantic_map"] = np.stack(
                [s.gt_semantic_map for s in samples])
        return batch, metas

    @property
    def metric(self) -> "NuScenesSegMetric":
        return NuScenesSegMetric(self)


class NuScenesSegMetric(NuScenesMetric):
    """Detection metric + per-class BEV IoU (reference:
    nuscenes_metric.py:179 NuScenesSegMetric): predictions carry
    pred_semantic_map probabilities; IoU at 0.5 vs the gt npz masks."""

    SEG_CLASSES = ("drive", "lane", "vehicle")

    def __init__(self, dataset, class_names=None):
        super().__init__(dataset, class_names)
        self._inter = np.zeros(dataset.map_classes, np.float64)
        self._union = np.zeros(dataset.map_classes, np.float64)

    def update(self, predictions, ground_truths=None):
        super().update(predictions, ground_truths)
        for pred in predictions:
            probs = getattr(pred, "pred_semantic_map", None)
            if probs is None:
                continue
            token = pred.meta.get("id")
            gt = np.load(os.path.join(
                self.dataset.maps_root,
                "{}.npz".format(token)))["arr_0"] > 0.5
            hit = np.asarray(probs) > 0.5
            for c in range(gt.shape[-1]):
                self._inter[c] += np.sum(hit[..., c] & gt[..., c])
                self._union[c] += np.sum(hit[..., c] | gt[..., c])

    def compute(self, verbose: bool = False) -> dict:
        out = super().compute(verbose)
        for c in range(len(self._inter)):
            name = (self.SEG_CLASSES[c]
                    if c < len(self.SEG_CLASSES) else str(c))
            out["IoU_{}".format(name)] = float(
                self._inter[c] / max(self._union[c], 1.0))
        return out
