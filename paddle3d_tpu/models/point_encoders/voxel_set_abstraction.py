"""Voxel Set Abstraction (PV-RCNN's keypoint encoder)
(reference: paddle3d/models/point_encoders/voxel_set_abstraction.py:113 —
FPS keypoints :215, BEV bilinear interpolation :180, multi-source
aggregation).

Keypoints are FPS-sampled from the raw cloud; features are gathered from
(a) raw points, (b) the dense BEV map via bilinear interpolation — fixed
capacities, vmapped over the batch.
"""
from typing import Sequence

import jax
import jax.numpy as jnp
from flax import nnx

from ...apis import manager
from ...ops.pallas.ball_query import ball_query_batched
from ...ops.pallas.fps import farthest_point_sample_batched
from ..common.pointnet2_modules import PointMLP

__all__ = ["VoxelSetAbstraction"]


def bev_bilinear(bev: jnp.ndarray, xy: jnp.ndarray, pc_range, voxel_size,
                 stride: int) -> jnp.ndarray:
    """bev [H, W, C]; xy [K, 2] world coords -> [K, C]."""
    h, w, c = bev.shape
    fx = (xy[:, 0] - pc_range[0]) / (voxel_size[0] * stride) - 0.5
    fy = (xy[:, 1] - pc_range[1]) / (voxel_size[1] * stride) - 0.5
    x0 = jnp.floor(fx).astype(jnp.int32)
    y0 = jnp.floor(fy).astype(jnp.int32)
    tx = fx - x0
    ty = fy - y0

    def tap(xi, yi):
        inb = (xi >= 0) & (xi < w) & (yi >= 0) & (yi < h)
        v = bev[jnp.clip(yi, 0, h - 1), jnp.clip(xi, 0, w - 1)]
        return jnp.where(inb[:, None], v, 0.)

    v = (tap(x0, y0) * ((1 - tx) * (1 - ty))[:, None] +
         tap(x0 + 1, y0) * (tx * (1 - ty))[:, None] +
         tap(x0, y0 + 1) * ((1 - tx) * ty)[:, None] +
         tap(x0 + 1, y0 + 1) * (tx * ty)[:, None])
    return v


@manager.POINT_ENCODERS.add_component
class VoxelSetAbstraction(nnx.Module):
    def __init__(self,
                 num_keypoints: int = 2048,
                 bev_channels: int = 256,
                 bev_stride: int = 8,
                 point_cloud_range: Sequence[float] = (0, -40, -3, 70.4, 40,
                                                       1),
                 voxel_size: Sequence[float] = (0.05, 0.05, 0.1),
                 raw_mlps: Sequence[int] = (16, 16),
                 raw_radius: float = 0.8,
                 raw_nsample: int = 16,
                 stage_channels: Sequence[int] = (),
                 stage_mlps: Sequence[int] = (16, 16),
                 stage_radii: Sequence[float] = (0.8, 1.6, 3.2, 6.4),
                 stage_nsample: int = 16,
                 out_channels: int = 128,
                 model_cfg: dict = None,
                 num_bev_features: int = None,
                 num_rawpoint_features: int = None,
                 rngs: nnx.Rngs = None):
        """`stage_channels` enables multi-level sparse-conv aggregation
        (reference: voxel_set_abstraction.py:113 x_conv1..4 sources): one
        ball-query + shared MLP per sparse stage, grouping stage voxel
        centers around each keypoint.

        `model_cfg` accepts the reference's nested OpenPCDet-style spec
        (configs/pv_rcnn/pv_rcnn_005voxel_kitti.yml:84 — sa_layer with
        per-source mlps/pool_radius/nsample) and maps it onto the flat
        arguments: per-stage MLP widths and the LAST (largest) radius of
        each source's radius list; stage input channels follow the spec's
        MLP widths, which mirror the sparse backbone's stage widths."""
        if model_cfg is not None:
            m = dict(model_cfg)
            num_keypoints = int(m.get("num_keypoints", num_keypoints))
            out_channels = int(m.get("out_channels", out_channels))
            if num_bev_features is not None:
                bev_channels = int(num_bev_features)
            sa = m.get("sa_layer", {})
            if "raw_points" in sa:
                raw_mlps = list(sa["raw_points"]["mlps"][0])
                raw_radius = float(sa["raw_points"]["pool_radius"][-1])
                raw_nsample = int(sa["raw_points"]["nsample"][-1])
            convs = sorted(k for k in sa if k.startswith("x_conv"))
            if convs:
                stage_channels = [int(sa[k]["mlps"][0][0]) for k in convs]
                stage_radii = [float(sa[k]["pool_radius"][-1])
                               for k in convs]
                stage_mlps = [list(sa[k]["mlps"][0]) for k in convs]
                stage_nsample = int(sa[convs[-1]]["nsample"][-1])
        rngs = rngs if rngs is not None else nnx.Rngs(0)
        self.num_keypoints = num_keypoints
        self.bev_stride = bev_stride
        self.pc_range = list(map(float, point_cloud_range))
        self.voxel_size = list(map(float, voxel_size))
        self.raw_radius = raw_radius
        self.raw_nsample = raw_nsample
        self.raw_mlp = PointMLP([4] + list(raw_mlps), rngs=rngs)
        self.stage_channels = list(stage_channels)
        self.stage_radii = list(stage_radii)
        self.stage_nsample = stage_nsample
        # stage_mlps: flat widths shared by every stage, or one width list
        # per stage (the reference's per-source sa_layer specs)
        if stage_mlps and isinstance(stage_mlps[0], (list, tuple)):
            per_stage = [list(s) for s in stage_mlps]
        else:
            per_stage = [list(stage_mlps) for _ in self.stage_channels]
        self.stage_mlps = nnx.List([
            PointMLP([c + 3] + widths, rngs=rngs)
            for c, widths in zip(self.stage_channels, per_stage)
        ])
        fuse_in = bev_channels + raw_mlps[-1] + \
            sum(widths[-1] for widths in per_stage[:len(self.stage_channels)])
        self.prefuse_channels = fuse_in
        self.fuse = PointMLP([fuse_in, out_channels], rngs=rngs)
        self.out_channels = out_channels

    def __call__(self, points, bev, sparse_stages=None,
                 return_prefuse=False):
        """points [B, N, C>=3] (NaN padded); bev [B, H, W, Cb];
        sparse_stages: optional list of (xyz [B,V,3], feats [B,V,C],
        mask [B,V]) per sparse level (len == len(stage_channels)) ->
        (keypoints [B, K, 3], features [B, K, out], mask [B, K]).

        Geometry (FPS/ball-query/bilinear) is vmapped; the BN-bearing MLPs
        run batched outside the vmap (BatchNorm state cannot mutate inside
        vmap on this platform)."""
        mask = jnp.all(jnp.isfinite(points), axis=-1)
        xyz = jnp.where(mask[..., None], points[..., :3], 0.)
        kp_idx = farthest_point_sample_batched(xyz, mask,
                                               self.num_keypoints)
        take = jax.vmap(lambda x, i: x[i])
        kp = take(xyz, kp_idx)
        kp_mask = take(mask, kp_idx)
        bevf = jax.vmap(
            lambda bev_map, k: bev_bilinear(bev_map, k[:, :2], self.pc_range,
                                            self.voxel_size,
                                            self.bev_stride))(bev, kp)

        # raw-point branch: batched Pallas ball query + row gathers
        gidx, count = ball_query_batched(self.raw_radius, self.raw_nsample,
                                         xyz, kp, mask)
        inten = jnp.where(mask[..., None],
                          jnp.nan_to_num(points[..., 3:4]), 0.)
        grouped = jnp.concatenate([
            take(xyz, gidx) - kp[:, :, None, :],
            take(inten, gidx),
        ], axis=-1)

        raw = self.raw_mlp(grouped)  # [B, K, n, C]
        kmask = (jnp.arange(raw.shape[2])[None, None, :] <
                 jnp.maximum(count, 1)[..., None])
        raw = jnp.max(jnp.where(kmask[..., None], raw, -1e9), axis=2)
        raw = jnp.where((count > 0)[..., None], raw, 0.)

        parts = [bevf, raw]
        if self.stage_channels and sparse_stages:
            for lvl, ((sxyz, sfeat, smask), radius, mlp) in enumerate(
                    zip(sparse_stages, self.stage_radii, self.stage_mlps)):
                gidx, cnt = ball_query_batched(radius, self.stage_nsample,
                                               sxyz, kp, smask)
                g = jnp.concatenate(
                    [take(sxyz, gidx) - kp[:, :, None, :],
                     take(sfeat, gidx)], axis=-1)
                o = mlp(g)
                km = (jnp.arange(o.shape[2])[None, None, :] <
                      jnp.maximum(cnt, 1)[..., None])
                o = jnp.max(jnp.where(km[..., None], o, -1e9), axis=2)
                o = jnp.where((cnt > 0)[..., None], o, 0.)
                parts.append(o)

        prefuse = jnp.concatenate(parts, axis=-1)
        feat = self.fuse(prefuse)
        if return_prefuse:
            # pre-fusion concat for Predicted Keypoint Weighting (the
            # reference's use_point_features_before_fusion path)
            return kp, feat * kp_mask[..., None], kp_mask, prefuse
        return kp, feat * kp_mask[..., None], kp_mask
