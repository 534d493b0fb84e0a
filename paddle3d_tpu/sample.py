"""Sample record passed through datasets/transforms/models.

Re-design of the reference's dict-record Sample/SampleMeta
(reference: paddle3d/sample.py:28,52). Host-side only: fields are numpy
arrays / python scalars; the collate function turns batches of Samples into
fixed-shape numpy dicts for the jitted device step.
"""
import collections.abc
from typing import Optional

import numpy as np

__all__ = ["Sample", "SampleMeta"]

_MODALITIES = ("image", "lidar", "radar", "multimodal", "multiview")


class _EasyDict(dict):
    """Dict with attribute access (the reference Sample is such a record)."""

    def __getattr__(self, key):
        try:
            return self[key]
        except KeyError:
            raise AttributeError(key)

    def __setattr__(self, key, value):
        self[key] = value

    def __delattr__(self, key):
        try:
            del self[key]
        except KeyError:
            raise AttributeError(key)

    def copy(self):
        new = self.__class__.__new__(self.__class__)
        dict.update(new, self)
        return new


class SampleMeta(_EasyDict):
    """Per-sample metadata (reference: sample.py:28)."""

    # Known keys kept for parity; arbitrary keys are allowed.
    KNOWN_KEYS = [
        "camera_intrinsic", "image_reverse", "image_difference", "id",
        "time_lag", "ray_translation", "ray_rotation", "img2lidar"
    ]

    def __init__(self, **kwargs):
        super().__init__()
        for k, v in kwargs.items():
            self[k] = v


class Sample(_EasyDict):
    """One example flowing through the pipeline (reference: sample.py:52).

    Fields:
        path: source file path.
        modality: one of image/lidar/radar/multimodal/multiview.
        data: the payload (image ndarray, PointCloud, list of images, ...).
        bboxes_2d / bboxes_3d: geometry structures.
        labels: int array of category ids.
        sweeps / attrs / calibs: auxiliary per-dataset info.
        meta: SampleMeta.
    """

    def __init__(self, path: Optional[str], modality: str):
        super().__init__()
        if modality not in _MODALITIES:
            raise ValueError("modality must be one of {}, got {}".format(
                _MODALITIES, modality))
        self.meta = SampleMeta(id=None)
        self.path = path
        self.data = None
        self.modality = modality.lower()
        self.bboxes_2d = None
        self.bboxes_3d = None
        self.labels = None
        self.sweeps = []
        self.attrs = None
        self.calibs = None
