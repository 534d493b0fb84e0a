"""Ray datasets (reference: pprndr/data — the Blender-synthetic NeRF format
plus a hermetic procedural fixture the reference lacks)."""
import json
import os
from typing import List

import numpy as np
from PIL import Image

from ..apis import manager
from ..datasets.base import BaseDataset, MetricABC
from ..sample import Sample

__all__ = ["BlenderSyntheticDataset", "SyntheticSphereRaysDataset",
           "PSNRMetric"]


class PSNRMetric(MetricABC):
    """Mean PSNR over rendered ray batches (reference: pprndr metrics)."""

    def __init__(self, dataset):
        self.dataset = dataset
        self._sq = 0.0
        self._n = 0

    def update(self, predictions: List[Sample], ground_truths=None):
        for pred in predictions:
            idx = pred.meta.get("id")
            gt = self.dataset.gt_rgb(idx)
            p = np.asarray(pred.data).reshape(gt.shape)
            self._sq += float(np.mean((p - gt) ** 2))
            self._n += 1

    def compute(self, verbose: bool = False) -> dict:
        mse = self._sq / max(self._n, 1)
        return {"psnr": float(-10.0 * np.log10(max(mse, 1e-10))),
                "mse": mse}


def _rays_from_pose(c2w, h, w, focal):
    i, j = np.meshgrid(np.arange(w, dtype=np.float32),
                       np.arange(h, dtype=np.float32), indexing="xy")
    dirs = np.stack([(i - w * .5 + .5) / focal,
                     -(j - h * .5 + .5) / focal,
                     -np.ones_like(i)], axis=-1)
    rays_d = dirs @ c2w[:3, :3].T
    rays_d /= np.linalg.norm(rays_d, axis=-1, keepdims=True)
    rays_o = np.broadcast_to(c2w[:3, 3], rays_d.shape)
    return rays_o.reshape(-1, 3), rays_d.reshape(-1, 3)


@manager.DATASETS.add_component
class BlenderSyntheticDataset(BaseDataset):
    """NeRF Blender-synthetic scenes (transforms_{split}.json + PNGs —
    the standard nerf_synthetic layout the reference consumes)."""

    def __init__(self, dataset_root: str, mode: str = "train",
                 rays_per_batch: int = 1024, half_res: bool = True,
                 white_background: bool = True, seed: int = 0):
        self.dataset_root = dataset_root
        self.mode = mode
        self.rays_per_batch = rays_per_batch
        self.seed = seed
        split = {"train": "train", "val": "val", "test": "test"}[mode]
        with open(os.path.join(dataset_root,
                               "transforms_{}.json".format(split))) as f:
            meta = json.load(f)
        imgs, poses = [], []
        for fr in meta["frames"]:
            p = os.path.join(dataset_root, fr["file_path"] + ".png")
            with Image.open(p) as im:
                if half_res:
                    im = im.resize((im.width // 2, im.height // 2))
                arr = np.asarray(im, np.float32) / 255.0
            if arr.shape[-1] == 4:  # alpha-composite
                rgb, a = arr[..., :3], arr[..., 3:]
                arr = rgb * a + (1.0 - a) if white_background else rgb * a
            imgs.append(arr)
            poses.append(np.asarray(fr["transform_matrix"], np.float32))
        self.images = np.stack(imgs)
        self.poses = np.stack(poses)
        n, h, w, _ = self.images.shape
        self.focal = 0.5 * w / np.tan(0.5 * meta["camera_angle_x"])
        self.h, self.w = h, w
        ro, rd, rgb = [], [], []
        for k in range(n):
            o, d = _rays_from_pose(self.poses[k], h, w, self.focal)
            ro.append(o)
            rd.append(d)
            rgb.append(self.images[k].reshape(-1, 3))
        self.rays_o = np.concatenate(ro)
        self.rays_d = np.concatenate(rd)
        self.rgb = np.concatenate(rgb)

    def __len__(self):
        return max(1, len(self.rays_o) // self.rays_per_batch)

    def __getitem__(self, index: int) -> Sample:
        rng = np.random.default_rng(self.seed * 100003 + index)
        sel = rng.integers(0, len(self.rays_o), self.rays_per_batch)
        s = Sample(path="rays://{}".format(index), modality="image")
        s.meta.id = index
        s.rays_o = self.rays_o[sel].astype(np.float32)
        s.rays_d = self.rays_d[sel].astype(np.float32)
        s.rgb = self.rgb[sel].astype(np.float32)
        return s

    def gt_rgb(self, index: int):
        rng = np.random.default_rng(self.seed * 100003 + index)
        sel = rng.integers(0, len(self.rays_o), self.rays_per_batch)
        return self.rgb[sel].astype(np.float32)

    def collate_fn(self, samples: List[Sample]):
        # per-sample leading dim [B, R, 3] so the generic Trainer batch
        # slicing/padding works; models flatten internally
        batch = {
            "rays_o": np.stack([s.rays_o for s in samples]),
            "rays_d": np.stack([s.rays_d for s in samples]),
            "rgb": np.stack([s.rgb for s in samples]),
        }
        metas = [{"path": s.path, "id": s.meta.get("id")} for s in samples]
        return batch, metas

    @property
    def metric(self) -> PSNRMetric:
        return PSNRMetric(self)


@manager.DATASETS.add_component
class SyntheticSphereRaysDataset(BaseDataset):
    """Hermetic procedural scene: a diffuse colored sphere at the origin on
    a white background, rays from random viewpoints on a shell — exact
    analytic rgb per ray so rendering tests need no data on disk."""

    def __init__(self, num_batches: int = 64, rays_per_batch: int = 512,
                 radius: float = 0.6, camera_distance: float = 3.5,
                 mode: str = "train", seed: int = 0):
        self.num_batches = num_batches
        self.rays_per_batch = rays_per_batch
        self.radius = radius
        self.cam_dist = camera_distance
        self.mode = mode
        self.seed = seed

    def __len__(self):
        return self.num_batches

    def _gen(self, index: int):
        rng = np.random.default_rng(self.seed * 7919 + index +
                                    (0 if self.mode == "train" else 10**6))
        r = self.rays_per_batch
        # camera on a shell, looking at the origin with jitter
        theta = rng.uniform(0, 2 * np.pi, r)
        phi = rng.uniform(0.3, np.pi - 0.3, r)
        origins = self.cam_dist * np.stack(
            [np.sin(phi) * np.cos(theta), np.sin(phi) * np.sin(theta),
             np.cos(phi)], axis=-1)
        target = rng.uniform(-0.3, 0.3, (r, 3))
        dirs = target - origins
        dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)

        # analytic ray-sphere intersection + diffuse normal shading
        b = np.sum(origins * dirs, axis=-1)
        c = np.sum(origins ** 2, axis=-1) - self.radius ** 2
        disc = b * b - c
        hit = disc > 0
        t0 = -b - np.sqrt(np.maximum(disc, 0))
        pt = origins + dirs * t0[:, None]
        normal = pt / max(self.radius, 1e-6)
        base = np.clip(normal * 0.5 + 0.5, 0, 1)  # normal-colored sphere
        rgb = np.where(hit[:, None], base, 1.0).astype(np.float32)
        return (origins.astype(np.float32), dirs.astype(np.float32), rgb)

    def __getitem__(self, index: int) -> Sample:
        o, d, rgb = self._gen(index)
        s = Sample(path="sphere://{}".format(index), modality="image")
        s.meta.id = index
        s.rays_o, s.rays_d, s.rgb = o, d, rgb
        return s

    def gt_rgb(self, index: int):
        return self._gen(index)[2]

    collate_fn = BlenderSyntheticDataset.collate_fn

    @property
    def metric(self) -> PSNRMetric:
        return PSNRMetric(self)
