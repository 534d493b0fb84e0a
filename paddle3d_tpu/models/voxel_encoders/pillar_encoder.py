"""Pillar feature net (reference: paddle3d/models/voxel_encoders/pillar_encoder.py:64,109).

TPU-native: operates on batched fixed-capacity voxels [B, V, P, C] produced by
ops.voxelize (vs. the reference's ragged concat layout), decorates points with
cluster/center offsets, and runs PFN layers with a masked max — one fused XLA
program, no per-sample loops.
"""
from typing import Sequence

import jax.numpy as jnp
from flax import nnx

from ...apis import manager
from ..layers.layer_libs import LinearBN1DReLU

__all__ = ["PillarFeatureNet", "get_paddings_indicator"]


def get_paddings_indicator(num_points: jnp.ndarray, max_num: int) -> jnp.ndarray:
    """[..., V] counts -> [..., V, max_num] bool validity mask
    (reference: voxel_encoders/voxel_encoder.py get_paddings_indicator)."""
    idx = jnp.arange(max_num, dtype=num_points.dtype)
    return idx[None, :] < num_points[..., None]


class PFNLayer(nnx.Module):
    """Linear -> BN -> ReLU -> masked max over points
    (reference: pillar_encoder.py:64; the awkward argmax/index_sample dance
    there exists only to mimic paddle max-gradient semantics — jax's max
    gradient is already well-defined, so a plain masked max suffices)."""

    def __init__(self, in_channels: int, out_channels: int, *, last_layer: bool,
                 rngs: nnx.Rngs):
        self.last_vfe = last_layer
        if not last_layer:
            out_channels = out_channels // 2
        self.units = out_channels
        self.mlp = LinearBN1DReLU(in_channels, out_channels, rngs=rngs)

    def __call__(self, x: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
        # x: [B, V, P, C], mask: [B, V, P]
        x = self.mlp(x)
        neg = jnp.full_like(x, -1e9)
        x_max = jnp.max(jnp.where(mask[..., None], x, neg), axis=2)
        x_max = jnp.where(jnp.any(mask, axis=2)[..., None], x_max, 0.)
        if self.last_vfe:
            return x_max
        rep = jnp.broadcast_to(x_max[:, :, None, :], x.shape[:3] + (self.units,))
        return jnp.concatenate([x, rep], axis=-1)


@manager.VOXEL_ENCODERS.add_component
class PillarFeatureNet(nnx.Module):
    def __init__(self,
                 in_channels: int = 4,
                 feat_channels: Sequence[int] = (64, ),
                 with_distance: bool = False,
                 max_num_points_in_voxel: int = 20,
                 voxel_size: Sequence[float] = (0.2, 0.2, 4),
                 point_cloud_range: Sequence[float] = (0, -40, -3, 70.4, 40, 1),
                 legacy: bool = True,
                 rngs: nnx.Rngs = None):
        rngs = rngs if rngs is not None else nnx.Rngs(0)
        self.in_channels = in_channels
        self.with_distance = with_distance
        self.max_num_points_in_voxel = max_num_points_in_voxel
        self.legacy = legacy
        aug_channels = in_channels + 5  # +3 cluster offset, +2 center offset
        if with_distance:
            aug_channels += 1
        channels = [aug_channels] + list(feat_channels)
        self.pfn_layers = nnx.List([
            PFNLayer(
                channels[i], channels[i + 1],
                last_layer=(i == len(channels) - 2), rngs=rngs)
            for i in range(len(channels) - 1)
        ])
        self.vx, self.vy = float(voxel_size[0]), float(voxel_size[1])
        self.x_offset = self.vx / 2 + float(point_cloud_range[0])
        self.y_offset = self.vy / 2 + float(point_cloud_range[1])
        self.voxel_size = list(map(float, voxel_size))
        self.point_cloud_range = list(map(float, point_cloud_range))
        self.out_channels = channels[-1]

    def __call__(self, voxels: jnp.ndarray, num_points: jnp.ndarray,
                 coords: jnp.ndarray) -> jnp.ndarray:
        """voxels [B,V,P,C], num_points [B,V], coords [B,V,3] (z,y,x)
        -> pillar features [B, V, out_channels]."""
        mask = get_paddings_indicator(num_points,
                                      self.max_num_points_in_voxel)  # [B,V,P]
        fmask = mask[..., None].astype(voxels.dtype)
        xyz = voxels[..., :3] * fmask

        feats = [voxels]
        # offset from the pillar's point centroid
        denom = jnp.maximum(num_points, 1).astype(voxels.dtype)[..., None, None]
        mean = jnp.sum(xyz, axis=2, keepdims=True) / denom
        feats.append(voxels[..., :3] - mean)

        # offset from the pillar's geometric center; coords are (z, y, x)
        cx = coords[..., 2].astype(voxels.dtype) * self.vx + self.x_offset
        cy = coords[..., 1].astype(voxels.dtype) * self.vy + self.y_offset
        f_center = jnp.stack(
            [voxels[..., 0] - cx[..., None], voxels[..., 1] - cy[..., None]],
            axis=-1)
        feats.append(f_center)

        if self.with_distance:
            feats.append(
                jnp.linalg.norm(voxels[..., :3], axis=-1, keepdims=True))

        x = jnp.concatenate(feats, axis=-1) * fmask
        for pfn in self.pfn_layers:
            x = pfn(x, mask)
        return x  # [B, V, out_channels]
