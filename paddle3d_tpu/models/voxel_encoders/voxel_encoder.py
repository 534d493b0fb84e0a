"""Simple voxel feature encoders
(reference: paddle3d/models/voxel_encoders/voxel_encoder.py:44 VoxelMean,
:142 HardVFE).
"""
from typing import Sequence

import jax.numpy as jnp
from flax import nnx

from ...apis import manager
from ..layers.layer_libs import LinearBN1DReLU
from .pillar_encoder import get_paddings_indicator

__all__ = ["VoxelMean", "HardVFE"]


@manager.VOXEL_ENCODERS.add_component
class VoxelMean(nnx.Module):
    """Mean of the points in each voxel (no parameters)."""

    def __init__(self, in_channels: int = 4):
        self.in_channels = in_channels

    def __call__(self, voxels, num_points, coords):
        """[B,V,P,C] -> [B,V,C]."""
        mask = get_paddings_indicator(num_points, voxels.shape[2])
        total = jnp.sum(
            voxels[..., :self.in_channels] *
            mask[..., None].astype(voxels.dtype), axis=2)
        denom = jnp.maximum(num_points, 1).astype(voxels.dtype)[..., None]
        return total / denom


@manager.VOXEL_ENCODERS.add_component
class HardVFE(nnx.Module):
    """VFE with point decoration + MLP + masked max (reference: :142)."""

    def __init__(self,
                 in_channels: int = 4,
                 feat_channels: Sequence[int] = (64,),
                 with_cluster_center: bool = True,
                 with_voxel_center: bool = True,
                 with_distance: bool = False,
                 voxel_size=(0.2, 0.2, 4),
                 point_cloud_range=(0, -40, -3, 70.4, 40, 1),
                 rngs: nnx.Rngs = None):
        rngs = rngs if rngs is not None else nnx.Rngs(0)
        self.in_channels = in_channels
        self.with_cluster_center = with_cluster_center
        self.with_voxel_center = with_voxel_center
        self.with_distance = with_distance
        self.vx, self.vy, self.vz = map(float, voxel_size[:3])
        self.x_off = self.vx / 2 + float(point_cloud_range[0])
        self.y_off = self.vy / 2 + float(point_cloud_range[1])
        self.z_off = self.vz / 2 + float(point_cloud_range[2])

        aug = in_channels
        if with_cluster_center:
            aug += 3
        if with_voxel_center:
            aug += 3
        if with_distance:
            aug += 1
        channels = [aug] + list(feat_channels)
        self.mlps = nnx.List([
            LinearBN1DReLU(channels[i], channels[i + 1], rngs=rngs)
            for i in range(len(channels) - 1)
        ])
        self.out_channels = channels[-1]

    def __call__(self, voxels, num_points, coords):
        mask = get_paddings_indicator(num_points, voxels.shape[2])
        fmask = mask[..., None].astype(voxels.dtype)
        feats = [voxels]
        if self.with_cluster_center:
            denom = jnp.maximum(num_points, 1).astype(
                voxels.dtype)[..., None, None]
            mean = jnp.sum(voxels[..., :3] * fmask, axis=2,
                           keepdims=True) / denom
            feats.append(voxels[..., :3] - mean)
        if self.with_voxel_center:
            cx = coords[..., 2].astype(voxels.dtype) * self.vx + self.x_off
            cy = coords[..., 1].astype(voxels.dtype) * self.vy + self.y_off
            cz = coords[..., 0].astype(voxels.dtype) * self.vz + self.z_off
            center = jnp.stack([cx, cy, cz], axis=-1)[:, :, None, :]
            feats.append(voxels[..., :3] - center)
        if self.with_distance:
            feats.append(jnp.linalg.norm(voxels[..., :3], axis=-1,
                                         keepdims=True))
        x = jnp.concatenate(feats, axis=-1) * fmask
        for mlp in self.mlps:
            x = mlp(x)
        x = jnp.where(mask[..., None], x, -1e9)
        out = jnp.max(x, axis=2)
        return jnp.where(jnp.any(mask, axis=2)[..., None], out, 0.)
