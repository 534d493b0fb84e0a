"""Transform framework (reference: paddle3d/transforms/base.py:24,32)."""
import abc

import numpy as np

from ..apis import manager
from ..sample import Sample

__all__ = ["TransformABC", "Compose"]


class TransformABC(abc.ABC):
    @abc.abstractmethod
    def __call__(self, sample: Sample) -> Sample:
        ...


@manager.TRANSFORMS.add_component
class Compose(TransformABC):
    def __init__(self, transforms):
        if not isinstance(transforms, list):
            raise TypeError("The transforms must be a list!")
        self.transforms = transforms

    def __call__(self, sample: Sample) -> Sample:
        for t in self.transforms:
            sample = t(sample)
        # NOTE: unlike the reference (base.py:47-55) images stay HWC — the
        # TPU compute path is NHWC end to end, so no CHW transpose here.
        return sample
