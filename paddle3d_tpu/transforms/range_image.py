"""SemanticKITTI range-image projection
(reference: paddle3d/transforms/reader.py:260 LoadSemanticKITTIRange).

Spherical projection of a velodyne scan to a [H, W] range image with
(range, x, y, z, remission) channels, depth-ordered so the nearest return
wins each pixel.
"""
import numpy as np

from ..apis import manager
from ..sample import Sample
from .base import TransformABC

__all__ = ["LoadSemanticKITTIRange"]


@manager.TRANSFORMS.add_component
class LoadSemanticKITTIRange(TransformABC):
    def __init__(self, project_label: bool = True, proj_H: int = 64,
                 proj_W: int = 2048, fov_up: float = 3.0,
                 fov_down: float = -25.0):
        self.proj_H = proj_H
        self.proj_W = proj_W
        self.fov_up = fov_up * np.pi / 180
        self.fov_down = fov_down * np.pi / 180
        self.fov = abs(self.fov_up) + abs(self.fov_down)
        self.project_label = project_label

    def __call__(self, sample: Sample) -> Sample:
        raw = np.fromfile(sample.path, np.float32).reshape(-1, 4)
        points, remission = raw[:, :3], raw[:, 3]
        depth = np.linalg.norm(points, axis=1)
        yaw = -np.arctan2(points[:, 1], points[:, 0])
        pitch = np.arcsin(points[:, 2] / np.maximum(depth, 1e-6))

        px = 0.5 * (yaw / np.pi + 1.0) * self.proj_W
        py = (1.0 - (pitch + abs(self.fov_down)) / self.fov) * self.proj_H
        px = np.clip(np.floor(px), 0, self.proj_W - 1).astype(np.int32)
        py = np.clip(np.floor(py), 0, self.proj_H - 1).astype(np.int32)
        sample.proj_x = px.copy()
        sample.proj_y = py.copy()

        order = np.argsort(depth)[::-1]  # far first; near overwrites
        img = np.full((self.proj_H, self.proj_W, 5), -1, np.float32)
        img[py[order], px[order], 0] = depth[order]
        img[py[order], px[order], 1:4] = points[order]
        img[py[order], px[order], 4] = remission[order]
        mask = img[..., 0] > 0
        sample.data = img
        sample.proj_mask = mask

        labels = getattr(sample, "labels", None)
        if labels is not None and self.project_label:
            lab_img = np.zeros((self.proj_H, self.proj_W), np.int32)
            lab_img[py[order], px[order]] = labels[order]
            sample.proj_labels = lab_img
        return sample
