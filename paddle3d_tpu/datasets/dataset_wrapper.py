"""Class-balanced group sampling wrapper (reference:
paddle3d/datasets/dataset_wrapper.py:22 CBGSDataset — the CBGS resampling
from "Class-balanced Grouping and Sampling for Point Cloud 3D Object
Detection": each class gets an equal share of the epoch by duplicating
frames that contain rare classes).

The wrapped dataset must expose `frame_labels(index) -> np.ndarray` of
integer class ids for the frame's boxes (cheap, annotation-only — no point
cloud IO); NuscenesPCDataset and KittiPCDataset implement it.
"""
import numpy as np

from ..apis import manager
from .base import BaseDataset

__all__ = ["CBGSDataset"]


@manager.DATASETS.add_component
class CBGSDataset(BaseDataset):
    def __init__(self, dataset):
        self.dataset = dataset
        self.mode = dataset.mode
        self._indices = self._resample()

    def _resample(self):
        n_cls = len(self.dataset.class_names)
        per_class = [[] for _ in range(n_cls)]
        for i in range(len(self.dataset)):
            labels = np.asarray(self.dataset.frame_labels(i))
            for c in np.unique(labels):
                if 0 <= c < n_cls:
                    per_class[int(c)].append(i)
        total = sum(len(v) for v in per_class)
        n_active = sum(1 for v in per_class if v)
        if total == 0 or n_active == 0:
            return list(range(len(self.dataset)))
        # equal share per class actually present — never shrinks the epoch
        # below the most common class's frame count
        target = max(total / n_active,
                     max(len(v) for v in per_class if v))
        out = []
        rng = np.random.RandomState(0)
        for frames in per_class:
            if not frames:
                continue
            ratio = target / len(frames)
            reps = int(np.floor(ratio))
            out.extend(frames * max(reps, 0))
            frac = ratio - reps
            k = int(round(frac * len(frames)))
            if k > 0:
                out.extend(rng.choice(frames, k, replace=False).tolist())
        rng.shuffle(out)
        return out

    def __len__(self):
        return len(self._indices)

    def __getitem__(self, index):
        return self.dataset[self._indices[index]]

    def frame_labels(self, index):
        return self.dataset.frame_labels(self._indices[index])

    def collate_fn(self, samples):
        return self.dataset.collate_fn(samples)

    @property
    def class_names(self):
        return self.dataset.class_names

    @property
    def metric(self):
        return self.dataset.metric

    def __getattr__(self, name):
        # delegate capacities (max_points, point_dim, ...) to the inner set
        return getattr(self.dataset, name)
