"""ModelNet40 classification dataset + accuracy metric
(reference: paddle3d/datasets/modelnet40/modelnet40_cls.py:30).

Layout: {root}/{split}/{class_name}/*.npy, each [N, 3] float32; class list
from sorted directory names. Also supports a single .npz with
points/labels arrays.
"""
import os
from typing import List

import numpy as np

from ...apis import manager
from ...sample import Sample
from ..base import BaseDataset, MetricABC

__all__ = ["ModelNet40", "AccuracyMetric"]


@manager.DATASETS.add_component
class ModelNet40(BaseDataset):
    def __init__(self, dataset_root: str, num_points: int = 1024,
                 mode: str = "train", transforms=None):
        self.dataset_root = dataset_root
        self.num_points = num_points
        self.mode = mode
        self.transforms = transforms

        npz = os.path.join(dataset_root, "{}.npz".format(mode))
        if os.path.exists(npz):
            data = np.load(npz)
            self.points = data["points"]
            self.labels = data["labels"]
            self.class_names = [str(c) for c in data.get(
                "class_names", range(int(self.labels.max()) + 1))]
        else:
            split_dir = os.path.join(dataset_root, mode)
            self.class_names = sorted(os.listdir(split_dir))
            files, labels = [], []
            for ci, cname in enumerate(self.class_names):
                cdir = os.path.join(split_dir, cname)
                for f in sorted(os.listdir(cdir)):
                    files.append(os.path.join(cdir, f))
                    labels.append(ci)
            self.files = files
            self.labels = np.asarray(labels, np.int64)
            self.points = None

    def __len__(self):
        return (len(self.labels) if self.points is None
                else self.points.shape[0])

    def __getitem__(self, index: int) -> Sample:
        if self.points is not None:
            pts = np.asarray(self.points[index], np.float32)
        else:
            pts = np.load(self.files[index]).astype(np.float32)
        n = pts.shape[0]
        if n >= self.num_points:
            idx = np.random.choice(n, self.num_points, replace=False) \
                if self.is_train_mode else np.arange(self.num_points)
        else:
            idx = np.random.choice(n, self.num_points, replace=True)
        sample = Sample(path=None, modality="lidar")
        sample.data = pts[idx, :3]
        sample.labels = int(self.labels[index])
        sample.meta.id = index
        if self.transforms is not None:
            sample = self.transforms(sample)
        return sample

    def collate_fn(self, samples: List[Sample]):
        batch = {
            "data": np.stack([s.data for s in samples]),
            "labels": np.asarray([s.labels for s in samples], np.int32),
        }
        metas = [{"id": s.meta.get("id"), "label": s.labels}
                 for s in samples]
        return batch, metas

    @property
    def metric(self) -> "AccuracyMetric":
        return AccuracyMetric()


class AccuracyMetric(MetricABC):
    def __init__(self):
        self.correct = 0
        self.total = 0

    def update(self, predictions: List[Sample], ground_truths=None):
        for pred in predictions:
            self.correct += int(pred.labels == pred.meta.get("label"))
            self.total += 1

    def compute(self, verbose: bool = False) -> dict:
        return {"acc": self.correct / max(self.total, 1)}
