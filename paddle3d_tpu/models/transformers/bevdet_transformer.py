"""Lift-Splat-Shoot view transformer
(reference: paddle3d/models/transformers/bevdet_transformer.py:91
LSSViewTransformer + the bev_pool_v2 custom op pair, ops/bev_pool_v2*).

TPU-native: the CUDA rank/interval bookkeeping (QuickCumsumCuda PyLayer,
bevdet_transformer.py:27) collapses to one scatter-add over voxel indices —
`ops.bev_pool` — and autodiff supplies the backward, so the separate
bev_pool_v2_backward op has no equivalent here by design.
"""
from typing import Dict, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from flax import nnx

from ...apis import manager
from ...ops.scatter import bev_pool
from ..layers.layer_libs import uniform_bias_init, uniform_init

__all__ = ["LSSViewTransformer"]


@manager.TRANSFORMERS.add_component
class LSSViewTransformer(nnx.Module):
    def __init__(self,
                 grid_config: Dict,
                 input_size: Sequence[int],
                 downsample: int = 16,
                 in_channels: int = 512,
                 out_channels: int = 64,
                 accelerate: bool = False,
                 rngs: nnx.Rngs = None):
        rngs = rngs if rngs is not None else nnx.Rngs(0)
        self.grid_config = grid_config
        self.downsample = downsample
        self.out_channels = out_channels

        # static python attributes (kept out of nnx state on purpose)
        xs, ys, zs = grid_config["x"], grid_config["y"], grid_config["z"]
        self.grid_lower = (float(xs[0]), float(ys[0]), float(zs[0]))
        self.grid_interval = (float(xs[2]), float(ys[2]), float(zs[2]))
        self.grid_size = tuple(
            int(round((c[1] - c[0]) / c[2])) for c in (xs, ys, zs))

        h_in, w_in = input_size
        self.input_size = (int(h_in), int(w_in))
        self.h_feat, self.w_feat = h_in // downsample, w_in // downsample
        d0, d1, dd = grid_config["depth"]
        self.depth_cfg = (float(d0), float(d1), float(dd))
        self.D = len(np.arange(d0, d1, dd))

        self.depth_net = nnx.Conv(
            in_channels, self.D + out_channels, kernel_size=(1, 1),
            kernel_init=uniform_init(), bias_init=uniform_bias_init(in_channels),
            rngs=rngs)

    def get_lidar_coor(self, rots, trans, cam2imgs, post_rots, post_trans,
                       bda):
        """Frustum -> ego/lidar coords [B, N, D, h, w, 3]
        (reference: bevdet_transformer.py get_lidar_coor)."""
        # frustum [D, h, w, 3] in input-image pixel coords (trace-time const)
        h_in, w_in = self.input_size
        d0, d1, dd = self.depth_cfg
        depths = jnp.arange(d0, d1, dd, dtype=jnp.float32)
        xs_pix = jnp.linspace(0, w_in - 1, self.w_feat)
        ys_pix = jnp.linspace(0, h_in - 1, self.h_feat)
        fx = jnp.broadcast_to(xs_pix[None, None, :],
                              (self.D, self.h_feat, self.w_feat))
        fy = jnp.broadcast_to(ys_pix[None, :, None],
                              (self.D, self.h_feat, self.w_feat))
        fd = jnp.broadcast_to(depths[:, None, None],
                              (self.D, self.h_feat, self.w_feat))
        frustum = jnp.stack([fx, fy, fd], axis=-1)
        pts = frustum[None, None] - post_trans[:, :, None, None, None, :]
        inv_post = jnp.linalg.inv(post_rots)  # [B, N, 3, 3]
        pts = jnp.einsum("bnij,bndhwj->bndhwi", inv_post, pts)
        # (u, v, d) -> (u*d, v*d, d)
        pts = jnp.concatenate(
            [pts[..., :2] * pts[..., 2:3], pts[..., 2:3]], axis=-1)
        combine = jnp.einsum("bnij,bnjk->bnik", rots,
                             jnp.linalg.inv(cam2imgs))
        pts = jnp.einsum("bnij,bndhwj->bndhwi", combine, pts)
        pts = pts + trans[:, :, None, None, None, :]
        pts = jnp.einsum("bij,bndhwj->bndhwi", bda, pts)
        return pts

    def __call__(self, x, rots, trans, cam2imgs, post_rots, post_trans,
                 bda):
        """x [B, N, h, w, Cin] -> (bev [B, gy, gx, C], depth [B,N,h,w,D])."""
        b, n, h, w, cin = x.shape
        out = self.depth_net(x.reshape(b * n, h, w, cin))
        depth = jax.nn.softmax(out[..., :self.D], axis=-1)  # [B*N,h,w,D]
        feat = out[..., self.D:]  # [B*N, h, w, C]

        coor = self.get_lidar_coor(rots, trans, cam2imgs, post_rots,
                                   post_trans, bda)  # [B,N,D,h,w,3]
        gx, gy, gz = self.grid_size
        vox = jnp.floor(
            (coor - jnp.asarray(self.grid_lower)) /
            jnp.asarray(self.grid_interval)).astype(jnp.int32)
        valid = ((vox[..., 0] >= 0) & (vox[..., 0] < gx) &
                 (vox[..., 1] >= 0) & (vox[..., 1] < gy) &
                 (vox[..., 2] >= 0) & (vox[..., 2] < gz))
        rank = vox[..., 1] * gx + vox[..., 0]  # z collapsed (gz == 1 typical)

        # weighted features per (cam, depth, pixel):
        # [B, N, D, h, w, C] = depth [B,N,D,h,w,1] * feat [B,N,1,h,w,C]
        depth_b = depth.reshape(b, n, h, w, self.D).transpose(0, 1, 4, 2, 3)
        feat_b = feat.reshape(b, n, h, w, self.out_channels)
        prod = depth_b[..., None] * feat_b[:, :, None]

        def pool_one(p, r, v):
            return bev_pool(
                p.reshape(-1, self.out_channels), r.reshape(-1),
                v.reshape(-1), gy * gx).reshape(gy, gx, self.out_channels)

        bev = jax.vmap(pool_one)(prod, rank, valid)
        return bev, depth.reshape(b, n, h, w, self.D)
