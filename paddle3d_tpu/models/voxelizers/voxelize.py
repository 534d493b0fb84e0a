"""HardVoxelizer module (reference: paddle3d/models/voxelizers/voxelize.py:27).

Wraps ops.hard_voxelize over a batch with train/eval capacity selection.
Batched layout [B, V, ...] with masks replaces the reference's ragged concat
+ batch-index column.
"""
from typing import Sequence, Union

from flax import nnx

from ...apis import manager
from ...ops.voxelize import hard_voxelize_batch

__all__ = ["HardVoxelizer"]


@manager.VOXELIZERS.add_component
class HardVoxelizer(nnx.Module):
    def __init__(self, voxel_size: Sequence[float],
                 point_cloud_range: Sequence[float],
                 max_num_points_in_voxel: int,
                 max_num_voxels: Union[int, Sequence[int]]):
        self.voxel_size = list(map(float, voxel_size))
        self.point_cloud_range = list(map(float, point_cloud_range))
        self.max_num_points_in_voxel = int(max_num_points_in_voxel)
        if isinstance(max_num_voxels, (tuple, list)):
            self.max_num_voxels = [int(v) for v in max_num_voxels]
        else:
            self.max_num_voxels = [int(max_num_voxels), int(max_num_voxels)]

    def max_num_voxels_for(self, training: bool) -> int:
        return self.max_num_voxels[0 if training else 1]

    def __call__(self, points, training: bool = True):
        """points [B, N, C] (NaN padded) ->
        voxels [B,V,P,C], coords [B,V,3] (z,y,x), num_points [B,V],
        mask [B,V]."""
        max_voxels = self.max_num_voxels[0 if training else 1]
        return hard_voxelize_batch(points, self.voxel_size,
                                   self.point_cloud_range,
                                   self.max_num_points_in_voxel, max_voxels)
