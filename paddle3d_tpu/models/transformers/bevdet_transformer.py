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
        return self.lift_splat(depth, feat, (b, n, h, w), rots, trans,
                               cam2imgs, post_rots, post_trans, bda)

    def lift_splat(self, depth, feat, bnhw, rots, trans, cam2imgs,
                   post_rots, post_trans, bda):
        """depth [B*N,h,w,D] probs, feat [B*N,h,w,C] ->
        (bev [B,gy,gx,C], depth [B,N,h,w,D])."""
        b, n, h, w = bnhw
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

        # factored pooling: only SCALAR payloads (rank, pixel id, depth
        # weight) travel through the sort; rows are rebuilt from the small
        # per-(cam, pixel) feature table and reduced by the Pallas sorted
        # scatter. The outer-product + scatter-add formulation fuses the
        # product into XLA's scatter lowering and serializes (~46 ms at
        # the RTEBev shape vs ~4 ms for this path, tools/bench_bevpool.py).
        from ...ops.scatter import bev_pool_sorted
        depth_b = depth.reshape(b, n, h, w, self.D).transpose(0, 1, 4, 2, 3)
        feat_tab = feat.reshape(b, n * h * w, self.out_channels)
        pix = (jnp.arange(n * h * w, dtype=jnp.int32)
               .reshape(1, n, 1, h, w))
        pix = jnp.broadcast_to(pix, (b, n, self.D, h, w)).reshape(b, -1)
        bev = bev_pool_sorted(
            feat_tab, pix, depth_b.reshape(b, -1), rank.reshape(b, -1),
            valid.reshape(b, -1), gy * gx)
        bev = bev.reshape(b, gy, gx, self.out_channels)
        return bev, depth.reshape(b, n, h, w, self.D)

# --------------------------------------------------------------------------
# BEVDepth depth-supervised variants (reference: bevdet_transformer.py:496
# MSDepthNet, :582 DepthNet, :661 LSSViewTransformerBEVDepth, :748
# MSLSSViewTransformerBEVDepth). TPU-native: NHWC convs, depth BCE over a
# one-hot downsampled LiDAR depth map, autodiff end to end.


class _Mlp(nnx.Module):
    def __init__(self, in_f, hid, out, rngs=None):
        self.fc1 = nnx.Linear(in_f, hid, rngs=rngs)
        self.fc2 = nnx.Linear(hid, out, rngs=rngs)

    def __call__(self, x):
        return self.fc2(nnx.relu(self.fc1(x)))


class _SELayer(nnx.Module):
    """Channel gate conditioned on an external SE term
    (reference: bevdet_transformer.py:457)."""

    def __init__(self, channels, rngs=None):
        self.conv_reduce = nnx.Linear(channels, channels, rngs=rngs)
        self.conv_expand = nnx.Linear(channels, channels, rngs=rngs)

    def __call__(self, x, x_se):
        """x [BN,h,w,C]; x_se [BN,C] (1x1-conv == per-channel linear)."""
        g = self.conv_expand(nnx.relu(self.conv_reduce(x_se)))
        return x * jax.nn.sigmoid(g)[:, None, None, :]


class _BasicBlock(nnx.Module):
    """ResNet BasicBlock (3x3 conv-BN-relu x2 + identity skip)."""

    def __init__(self, channels, rngs=None):
        self.conv1 = nnx.Conv(channels, channels, (3, 3), use_bias=False,
                              rngs=rngs)
        self.bn1 = nnx.BatchNorm(channels, rngs=rngs)
        self.conv2 = nnx.Conv(channels, channels, (3, 3), use_bias=False,
                              rngs=rngs)
        self.bn2 = nnx.BatchNorm(channels, rngs=rngs)

    def __call__(self, x):
        y = nnx.relu(self.bn1(self.conv1(x)))
        y = self.bn2(self.conv2(y))
        return nnx.relu(x + y)


def _maxpool_same(x, k=5):
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1, k, k, 1), (1, 1, 1, 1), "SAME")


class _SimSPPF(nnx.Module):
    """Simplified SPPF (reference: bevdet_transformer.py:478): 1x1 reduce,
    three stacked 5x5 maxpools, concat, 1x1 expand."""

    def __init__(self, in_channels, out_channels, kernel_size=5, rngs=None):
        c_ = in_channels // 2
        self.k = kernel_size
        self.cv1 = nnx.Conv(in_channels, c_, (1, 1), use_bias=False,
                            rngs=rngs)
        self.bn1 = nnx.BatchNorm(c_, rngs=rngs)
        self.cv2 = nnx.Conv(c_ * 4, out_channels, (1, 1), use_bias=False,
                            rngs=rngs)
        self.bn2 = nnx.BatchNorm(out_channels, rngs=rngs)

    def __call__(self, x):
        x = nnx.relu(self.bn1(self.cv1(x)))
        y1 = _maxpool_same(x, self.k)
        y2 = _maxpool_same(y1, self.k)
        y3 = _maxpool_same(y2, self.k)
        return nnx.relu(self.bn2(self.cv2(
            jnp.concatenate([x, y1, y2, y3], axis=-1))))


class DepthNet(nnx.Module):
    """BEVDepth depth/context net conditioned on camera parameters
    (reference: bevdet_transformer.py:582). Input x [BN,h,w,Cin],
    mlp_input [BN,27] -> (depth [BN,h,w,D], context [BN,h,w,C])."""

    def __init__(self, in_channels, mid_channels, context_channels,
                 depth_channels, use_aspp=False, use_sppf=False,
                 use_dcn=False, rngs=None):
        del use_dcn  # unsupported in the reference too
        self.reduce_conv = nnx.Conv(in_channels, mid_channels, (3, 3),
                                    use_bias=False, rngs=rngs)
        self.reduce_bn = nnx.BatchNorm(mid_channels, rngs=rngs)
        self.context_conv = nnx.Conv(mid_channels, context_channels, (1, 1),
                                     rngs=rngs)
        self.bn = nnx.BatchNorm(27, rngs=rngs)
        self.depth_mlp = _Mlp(27, mid_channels, mid_channels, rngs=rngs)
        self.depth_se = _SELayer(mid_channels, rngs=rngs)
        self.context_mlp = _Mlp(27, mid_channels, mid_channels, rngs=rngs)
        self.context_se = _SELayer(mid_channels, rngs=rngs)
        blocks = [_BasicBlock(mid_channels, rngs=rngs) for _ in range(3)]
        if use_aspp or use_sppf:
            blocks.append(_SimSPPF(mid_channels, mid_channels, rngs=rngs))
        self.depth_blocks = nnx.List(blocks)
        self.depth_out = nnx.Conv(mid_channels, depth_channels, (1, 1),
                                  rngs=rngs)

    def __call__(self, x, mlp_input):
        mlp_input = self.bn(mlp_input)
        x = nnx.relu(self.reduce_bn(self.reduce_conv(x)))
        context = self.context_se(x, self.context_mlp(mlp_input))
        context = self.context_conv(context)
        depth = self.depth_se(x, self.depth_mlp(mlp_input))
        for blk in self.depth_blocks:
            depth = blk(depth)
        return self.depth_out(depth), context


def _up2(x):
    """2x bilinear upsample, NHWC."""
    b, h, w, c = x.shape
    return jax.image.resize(x, (b, h * 2, w * 2, c), method="bilinear")


class MSDepthNet(nnx.Module):
    """Multi-scale depth net (reference: bevdet_transformer.py:496): depth
    from the two deepest FPN levels (SPPF + upsample + mid refinement),
    context from the shallowest; both SE-conditioned on camera params."""

    def __init__(self, in_channels, mid_channels, context_channels,
                 depth_channels, use_aspp=False, use_sppf=True,
                 use_dcn=False, rngs=None):
        del use_aspp, use_dcn
        self.reduce_conv = nnx.Conv(in_channels, mid_channels, (3, 3),
                                    use_bias=False, rngs=rngs)
        self.reduce_bn = nnx.BatchNorm(mid_channels, rngs=rngs)
        self.context_conv = nnx.Conv(mid_channels, context_channels, (1, 1),
                                     rngs=rngs)
        self.bn = nnx.BatchNorm(27, rngs=rngs)
        self.depth_mlp = _Mlp(27, mid_channels, mid_channels, rngs=rngs)
        self.depth_se = _SELayer(mid_channels, rngs=rngs)
        self.context_mlp = _Mlp(27, mid_channels, mid_channels, rngs=rngs)
        self.context_se = _SELayer(mid_channels, rngs=rngs)
        low = [_BasicBlock(mid_channels, rngs=rngs)]
        if use_sppf:
            low.append(_SimSPPF(mid_channels, mid_channels, rngs=rngs))
        self.depth_conv_low = nnx.List(low)
        self.depth_conv_mid = nnx.List(
            [_BasicBlock(mid_channels, rngs=rngs) for _ in range(2)])
        self.depth_out = nnx.Conv(mid_channels, depth_channels, (1, 1),
                                  rngs=rngs)

    def __call__(self, x_high, x_mid, x_low, mlp_input):
        """x_high/x_mid/x_low [BN,h,w,C] at strides s, 2s, 4s ->
        (depth [BN,h,w,D], context [BN,h,w,Cout]) at stride s."""
        mlp_input = self.bn(mlp_input)
        x_high = nnx.relu(self.reduce_bn(self.reduce_conv(x_high)))
        depth = self.depth_se(x_low, self.depth_mlp(mlp_input))
        for blk in self.depth_conv_low:
            depth = blk(depth)
        depth = x_mid + _up2(depth)
        for blk in self.depth_conv_mid:
            depth = blk(depth)
        depth = _up2(self.depth_out(depth))
        context = self.context_se(x_high, self.context_mlp(mlp_input))
        return depth, self.context_conv(context)


class _BEVDepthMixin:
    """Shared mlp-input construction + depth supervision
    (reference: bevdet_transformer.py:755 get_mlp_input, :782
    get_downsampled_gt_depth, :808 get_depth_loss)."""

    def get_mlp_input(self, rots, trans, cam2imgs, post_rots, post_trans,
                      bda):
        """-> [B*N, 27] camera-parameter conditioning vector."""
        b, n = rots.shape[:2]
        bda_t = jnp.broadcast_to(bda[:, None], (b, n, 3, 3))
        cols = jnp.stack([
            cam2imgs[:, :, 0, 0], cam2imgs[:, :, 1, 1],
            cam2imgs[:, :, 0, 2], cam2imgs[:, :, 1, 2],
            post_rots[:, :, 0, 0], post_rots[:, :, 0, 1],
            post_trans[:, :, 0],
            post_rots[:, :, 1, 0], post_rots[:, :, 1, 1],
            post_trans[:, :, 1],
            bda_t[:, :, 0, 0], bda_t[:, :, 0, 1],
            bda_t[:, :, 1, 0], bda_t[:, :, 1, 1], bda_t[:, :, 2, 2],
        ], axis=-1)
        sensor2ego = jnp.concatenate(
            [rots, trans[..., None]], axis=-1).reshape(b, n, 12)
        return jnp.concatenate([cols, sensor2ego], axis=-1).reshape(
            b * n, 27)

    def get_downsampled_gt_depth(self, gt_depths):
        """[B,N,H,W] raw metric depth (0 = no return) -> [BN*h*w, D]
        one-hot bin labels at feature stride (min over each patch)."""
        b, n, hh, ww = gt_depths.shape
        s = self.downsample
        g = gt_depths.reshape(b * n, hh // s, s, ww // s, s)
        g = jnp.where(g == 0.0, 1e5, g).min(axis=(2, 4))
        d0, _, dd = self.depth_cfg
        g = (g - (d0 - dd)) / dd
        g = jnp.where((g < self.D + 1) & (g >= 0.0), g, 0.0)
        onehot = jax.nn.one_hot(g.astype(jnp.int32).reshape(-1),
                                self.D + 1)[:, 1:]
        return onehot

    def get_depth_loss(self, gt_depths, depth_preds):
        """gt_depths [B,N,H,W] input-res metric depth; depth_preds
        [B,N,h,w,D] softmax probs -> weighted BCE over fg pixels."""
        labels = self.get_downsampled_gt_depth(gt_depths)
        preds = depth_preds.reshape(-1, self.D)
        fg = jnp.max(labels, axis=1) > 0.0
        p = jnp.clip(preds, 1e-6, 1 - 1e-6)
        bce = -(labels * jnp.log(p) + (1 - labels) * jnp.log(1 - p))
        bce = jnp.where(fg[:, None], bce, 0.0)
        return self.loss_depth_weight * jnp.sum(bce) / jnp.maximum(
            jnp.sum(fg), 1.0)


@manager.TRANSFORMERS.add_component
class LSSViewTransformerBEVDepth(LSSViewTransformer, _BEVDepthMixin):
    """LSS with a camera-conditioned DepthNet + depth supervision
    (reference: bevdet_transformer.py:661)."""

    def __init__(self, *args, loss_depth_weight=3.0, depthnet_cfg=None,
                 rngs: nnx.Rngs = None, **kwargs):
        rngs = rngs if rngs is not None else nnx.Rngs(0)
        in_channels = kwargs.get("in_channels", 512)
        super().__init__(*args, rngs=rngs, **kwargs)
        self.loss_depth_weight = float(loss_depth_weight)
        self.depth_net = DepthNet(in_channels, in_channels,
                                  self.out_channels, self.D,
                                  **dict(depthnet_cfg or {}), rngs=rngs)

    def __call__(self, x, rots, trans, cam2imgs, post_rots, post_trans,
                 bda, mlp_input=None):
        if isinstance(x, (list, tuple)):
            x = x[0]
        b, n, h, w, cin = x.shape
        if mlp_input is None:
            mlp_input = self.get_mlp_input(rots, trans, cam2imgs, post_rots,
                                           post_trans, bda)
        # camera matrices are f32; an f32 conditioning vector would promote
        # the whole context/depth path (and the 2M-row pool) out of bf16
        mlp_input = mlp_input.astype(x.dtype)
        dep, feat = self.depth_net(x.reshape(b * n, h, w, cin), mlp_input)
        depth = jax.nn.softmax(dep, axis=-1)
        return self.lift_splat(depth, feat, (b, n, h, w), rots, trans,
                               cam2imgs, post_rots, post_trans, bda)


@manager.TRANSFORMERS.add_component
class MSLSSViewTransformerBEVDepth(LSSViewTransformer, _BEVDepthMixin):
    """Multi-scale-depth LSS (reference: bevdet_transformer.py:748) — the
    RTEBev view transformer. Takes the three FPN levels."""

    def __init__(self, *args, loss_depth_weight=1.0, depthnet_cfg=None,
                 rngs: nnx.Rngs = None, **kwargs):
        rngs = rngs if rngs is not None else nnx.Rngs(0)
        in_channels = kwargs.get("in_channels", 256)
        super().__init__(*args, rngs=rngs, **kwargs)
        self.loss_depth_weight = float(loss_depth_weight)
        self.depth_net = MSDepthNet(in_channels, in_channels,
                                    self.out_channels, self.D,
                                    **dict(depthnet_cfg or {}), rngs=rngs)

    def __call__(self, feats, rots, trans, cam2imgs, post_rots, post_trans,
                 bda, mlp_input=None):
        """feats: list of 3 [B,N,h_i,w_i,C] levels (strides s, 2s, 4s)."""
        x_high, x_mid, x_low = feats
        b, n, h, w, cin = x_high.shape
        if mlp_input is None:
            mlp_input = self.get_mlp_input(rots, trans, cam2imgs, post_rots,
                                           post_trans, bda)
        # see LSSViewTransformerBEVDepth: keep the conditioning vector in
        # the feature dtype so SE gating doesn't promote the path to f32
        mlp_input = mlp_input.astype(x_high.dtype)
        flat = [f.reshape((-1,) + f.shape[2:]) for f in (x_high, x_mid,
                                                         x_low)]
        dep, feat = self.depth_net(flat[0], flat[1], flat[2], mlp_input)
        depth = jax.nn.softmax(dep, axis=-1)
        return self.lift_splat(depth, feat, (b, n, h, w), rots, trans,
                               cam2imgs, post_rots, post_trans, bda)
