"""PointPillarsScatter middle encoder
(reference: paddle3d/models/middle_encoders/pillar_scatter.py:34).

Thin nnx wrapper over the batched ops.pillar_scatter (one vmapped scatter
instead of the reference's per-sample python loop). Output is NHWC.
"""
import numpy as np
from flax import nnx

from ...apis import manager
from ...ops import pillar_scatter

__all__ = ["PointPillarsScatter"]


@manager.MIDDLE_ENCODERS.add_component
class PointPillarsScatter(nnx.Module):
    #: BEV-plane downsampling vs. the voxel grid (dense scatter keeps it).
    bev_stride = 1

    def __init__(self, in_channels, voxel_size, point_cloud_range):
        self.in_channels = in_channels
        pc_range = np.array(point_cloud_range, dtype=np.float32)
        vsize = np.array(voxel_size, dtype=np.float32)
        grid = np.round((pc_range[3:] - pc_range[:3]) / vsize).astype(np.int64)
        self.nx = int(grid[0])
        self.ny = int(grid[1])

    def __call__(self, voxel_features, coords, voxel_mask):
        """[B,V,C] features + [B,V,3] (z,y,x) coords + [B,V] mask ->
        [B, ny, nx, C] canvas."""
        return pillar_scatter(voxel_features, coords, voxel_mask, self.ny,
                              self.nx)
