"""Normalization transforms (reference: paddle3d/transforms/normalize.py:28,65)."""
from typing import Sequence

import numpy as np

from ..apis import manager
from ..sample import Sample
from .base import TransformABC

__all__ = ["Normalize", "NormalizeRangeImage"]


@manager.TRANSFORMS.add_component
class Normalize(TransformABC):
    def __init__(self, mean: Sequence[float], std: Sequence[float]):
        self.mean = np.asarray(mean, np.float32)
        self.std = np.asarray(std, np.float32)
        if (self.std == 0).any():
            raise ValueError("std must be non-zero")

    def __call__(self, sample: Sample) -> Sample:
        img = np.asarray(sample.data, np.float32)
        if img.max() > 1.0 + 1e-6:
            img = img / 255.0
        sample.data = (img - self.mean) / self.std
        return sample


@manager.TRANSFORMS.add_component
class NormalizeRangeImage(TransformABC):
    def __init__(self, mean: Sequence[float], std: Sequence[float]):
        self.mean = np.asarray(mean, np.float32).reshape(-1, 1, 1)
        self.std = np.asarray(std, np.float32).reshape(-1, 1, 1)

    def __call__(self, sample: Sample) -> Sample:
        data = np.asarray(sample.data, np.float32)
        sample.data = (data - self.mean) / self.std
        if getattr(sample, "proj_mask", None) is not None:
            sample.data = sample.data * sample.proj_mask
        return sample
