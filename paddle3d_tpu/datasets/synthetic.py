"""Synthetic LiDAR detection dataset.

A deterministic procedurally-generated dataset so tests / CI / benches need
no real KITTI on disk (the capability gap called out in SURVEY.md §4: the
reference's dataset tests require ../../datasets/KITTI). Scenes contain
random boxes with points sampled on them plus ground clutter; the metric is
a simple mean-center-distance / recall so the full train→eval→metric loop is
exercisable hermetically.
"""
from typing import List

import numpy as np

from ..apis import manager
from ..geometries import BBoxes3D, CoordMode
from ..sample import Sample
from .base import BaseDataset, MetricABC

__all__ = ["SyntheticDataset", "SyntheticMetric"]


@manager.DATASETS.add_component
class SyntheticDataset(BaseDataset):
    def __init__(self,
                 num_samples: int = 64,
                 num_points: int = 2048,
                 max_boxes: int = 6,
                 point_cloud_range=(0., -20., -2., 40., 20., 2.),
                 class_sizes=((1.6, 3.9, 1.56),),
                 mode: str = "train",
                 seed: int = 0):
        self.num_samples = num_samples
        self.num_points = num_points
        self.max_boxes = max_boxes
        self.pc_range = np.asarray(point_cloud_range, np.float32)
        self.class_sizes = np.asarray(class_sizes, np.float32)
        self.mode = mode
        self.seed = seed
        self.max_points = num_points
        self.max_gt_boxes = max_boxes

    def __len__(self):
        return self.num_samples

    def _gen(self, index: int):
        rng = np.random.default_rng(self.seed * 100003 + index)
        n_boxes = int(rng.integers(1, self.max_boxes + 1))
        cls = rng.integers(0, len(self.class_sizes), n_boxes)
        sizes = self.class_sizes[cls]
        lo, hi = self.pc_range[:3], self.pc_range[3:]
        centers = rng.uniform(lo[:2] + 4, hi[:2] - 4, (n_boxes, 2))
        z = np.full((n_boxes, 1), float(lo[2]) + 0.2)
        yaw = rng.uniform(-np.pi, np.pi, (n_boxes, 1))
        boxes = np.concatenate([centers, z, sizes, yaw],
                               axis=1).astype(np.float32)

        pts = []
        per_box = self.num_points // (2 * max(n_boxes, 1))
        for b in boxes:
            local = rng.uniform([-.5, -.5, 0.], [.5, .5, 1.],
                                (per_box, 3)) * [b[3], b[4], b[5]]
            c, s = np.cos(b[6]), np.sin(b[6])
            xy = local[:, :2] @ np.array([[c, s], [-s, c]], np.float32)
            p = np.concatenate(
                [xy + b[:2], local[:, 2:3] + b[2],
                 rng.uniform(0, 1, (per_box, 1))], axis=1)
            pts.append(p)
        n_bg = self.num_points - per_box * n_boxes
        bg = np.concatenate([
            rng.uniform(lo, hi, (n_bg, 3)),
            rng.uniform(0, 1, (n_bg, 1))
        ], axis=1)
        pts.append(bg)
        points = np.concatenate(pts).astype(np.float32)
        return points, boxes, cls.astype(np.int32)

    def __getitem__(self, index: int) -> Sample:
        points, boxes, labels = self._gen(index)
        sample = Sample(path="synthetic://{}".format(index), modality="lidar")
        sample.data = points
        sample.bboxes_3d = BBoxes3D(
            boxes, coordmode=CoordMode.KittiLidar, origin=[.5, .5, 0.])
        sample.labels = labels
        sample.meta.id = index
        return sample

    @property
    def metric(self) -> "SyntheticMetric":
        return SyntheticMetric(self)


class SyntheticMetric(MetricABC):
    """Center-distance recall/precision at 2m — enough signal for smoke
    training runs without a full AP implementation."""

    def __init__(self, dataset: SyntheticDataset, dist_thresh: float = 2.0):
        self.dataset = dataset
        self.dist_thresh = dist_thresh
        self._tp = 0
        self._n_gt = 0
        self._n_pred = 0

    def update(self, predictions: List[Sample], ground_truths=None):
        for pred in predictions:
            idx = pred.meta.get("id")
            _, gt_boxes, _ = self.dataset._gen(idx)
            self._n_gt += len(gt_boxes)
            if pred.bboxes_3d is None or len(pred.bboxes_3d) == 0:
                continue
            pb = np.asarray(pred.bboxes_3d)
            self._n_pred += len(pb)
            if len(gt_boxes) == 0:
                continue
            d = np.linalg.norm(
                pb[:, None, :2] - gt_boxes[None, :, :2], axis=-1)
            matched = np.zeros(len(gt_boxes), bool)
            for row in np.argsort(d.min(axis=1)):
                j = int(np.argmin(np.where(matched, np.inf, d[row])))
                if not matched[j] and d[row, j] < self.dist_thresh:
                    matched[j] = True
            self._tp += int(matched.sum())

    def compute(self, verbose: bool = False) -> dict:
        recall = self._tp / max(self._n_gt, 1)
        precision = self._tp / max(self._n_pred, 1)
        return {"recall@2m": recall, "precision@2m": precision}
