"""Sparse 3D middle encoders
(reference: paddle3d/models/middle_encoders/sparse_resnet.py:115 SparseResNet3D,
sparsenet.py:68 SparseNet3D).

Fixed-capacity sparse tensors with per-stage capacities; the final stage is
scattered to a dense [B, H, W, C * D] BEV map (NHWC, z folded into
channels — the reference's to_dense + reshape).
"""
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np
from flax import nnx

from ...apis import manager
from ..layers.sparse_layers import (MaskedBatchNorm, SparseBasicBlock,
                                    SparseConv3D, SparseTensor)

__all__ = ["SparseResNet3D", "SparseNet3D",
           "stage_voxel_centers"]


def _grid_from_range(point_cloud_range, voxel_size):
    pc = np.asarray(point_cloud_range, np.float32)
    vs = np.asarray(voxel_size, np.float32)
    g = np.round((pc[3:] - pc[:3]) / vs).astype(np.int64)
    # (D, H, W) = (z, y, x); +1 z padding like the reference grid (41 vs 40)
    return (int(g[2]) + 1, int(g[1]), int(g[0]))


class _ConvBNReLU(nnx.Module):
    def __init__(self, cin, cout, kernel_size=3, stride=1, out_capacity=None,
                 *, rngs):
        self.conv = SparseConv3D(cin, cout, kernel_size, stride,
                                 out_capacity=out_capacity, use_bias=False,
                                 rngs=rngs)
        self.bn = MaskedBatchNorm(cout, rngs=rngs)

    def __call__(self, st: SparseTensor) -> SparseTensor:
        if self.conv._use_kernel() and self.bn.use_running_average:
            # eval: BN affine + relu fused into the kernel epilogue (one
            # bf16 write instead of an f32 canvas round trip per conv)
            s, b = self.bn.fold_affine()
            return self.conv(st, scale=s, shift=b, relu=True)
        out = self.conv(st)
        return out.replace_features(
            nnx.relu(self.bn(out.features, out.mask)))


def stage_voxel_centers(st: SparseTensor, stride: int, voxel_size,
                        point_cloud_range):
    """World-frame centers of a stage's occupied voxels: [B, V, 3] xyz.

    Stage voxels live on the base grid downsampled by `stride`
    (reference VoxelSetAbstraction converts x_conv coords the same way,
    voxel_set_abstraction.py get_voxel_centers)."""
    vs = jnp.asarray(voxel_size, jnp.float32) * stride
    lo = jnp.asarray(point_cloud_range[:3], jnp.float32)
    zyx = st.coords.astype(jnp.float32)
    xyz = zyx[..., ::-1]
    return lo + (xyz + 0.5) * vs


def _dense_bev(st: SparseTensor, use_kernel: bool = None) -> jnp.ndarray:
    """[B,V,C] sparse -> [B, H, W, C*D] dense BEV.

    On TPU the sparse→dense step runs the sorted-scatter kernel (coords
    stay z-major-sorted through every stage, so the linear keys are
    monotone); XLA's scatter lowering measured ~31 ms for this shape
    class. The z→channel fold is a dense transpose afterwards."""
    d, h, w = st.grid
    b, v, c = st.features.shape
    lin = (st.coords[..., 0] * (h * w) + st.coords[..., 1] * w +
           st.coords[..., 2]).astype(jnp.int32)
    lin = jnp.where(st.mask, lin, d * h * w)
    if use_kernel is None:
        use_kernel = jax.default_backend() == "tpu"

    if use_kernel:
        from ...ops.pallas.sorted_scatter import sorted_segment_sum
        feats = st.features * st.mask[..., None].astype(st.features.dtype)
        canvas = sorted_segment_sum(lin, feats, d * h * w)  # [B, DHW, C]
        return canvas.reshape(b, d, h, w, c).transpose(
            0, 2, 3, 1, 4).reshape(b, h, w, d * c)

    def one(f, lin1):
        canvas = jnp.zeros((d * h * w + 1, c), f.dtype)
        canvas = canvas.at[lin1].set(f, mode="drop")[:-1]
        # [D, H, W, C] -> [H, W, D*C]
        return canvas.reshape(d, h, w, c).transpose(1, 2, 0, 3).reshape(
            h, w, d * c)

    return jax.vmap(one)(st.features, lin)


@manager.MIDDLE_ENCODERS.add_component
class SparseResNet3D(nnx.Module):
    """(reference: sparse_resnet.py:115) — subm stem, 2 res blocks, three
    strided stages with res blocks, z-collapse extra conv, dense BEV out."""

    #: BEV-plane downsampling vs. the voxel grid: three xy-stride-2 stages
    #: (the extra conv is z-only). CenterPoint derives/validates the target
    #: grid's down_ratio from this so configs cannot drift.
    bev_stride = 8

    def __init__(self,
                 in_channels: int = 128,
                 voxel_size=(0.2, 0.2, 4),
                 point_cloud_range=(0, -40, -3, 70.4, 40, 1),
                 stage_capacities: Sequence[int] = None,
                 rngs: nnx.Rngs = None):
        rngs = rngs if rngs is not None else nnx.Rngs(0)
        self.grid = _grid_from_range(point_cloud_range, voxel_size)
        self.stage_capacities = stage_capacities

        self.conv_input = _ConvBNReLU(in_channels, 16, rngs=rngs)
        self.conv1 = nnx.List(
            [SparseBasicBlock(16, rngs=rngs) for _ in range(2)])
        self.down2 = _ConvBNReLU(16, 32, stride=2, rngs=rngs)
        self.conv2 = nnx.List(
            [SparseBasicBlock(32, rngs=rngs) for _ in range(2)])
        self.down3 = _ConvBNReLU(32, 64, stride=2, rngs=rngs)
        self.conv3 = nnx.List(
            [SparseBasicBlock(64, rngs=rngs) for _ in range(2)])
        self.down4 = _ConvBNReLU(64, 128, stride=2, rngs=rngs)
        self.conv4 = nnx.List(
            [SparseBasicBlock(128, rngs=rngs) for _ in range(2)])
        # z-collapse: stride 2 in z ONLY (reference sparse_resnet.py conv
        # (3,1,1)/(2,1,1) — the BEV plane keeps the stage-4 resolution)
        self.extra = _ConvBNReLU(128, 128, kernel_size=3, stride=(2, 1, 1),
                                 rngs=rngs)

    def _caps(self, v):
        if self.stage_capacities is not None:
            return list(self.stage_capacities)
        return [v, max(v // 2, 1), max(v // 4, 1), max(v // 8, 1)]

    def __call__(self, voxel_features, coords, voxel_mask,
                 return_stages: bool = False):
        caps = self._caps(voxel_features.shape[1])
        st = SparseTensor(voxel_features, coords, voxel_mask, self.grid)
        st = self.conv_input(st)
        for blk in self.conv1:
            st = blk(st)
        stages = [(st, 1)]
        self.down2.conv.out_capacity = caps[1]
        st = self.down2(st)
        for blk in self.conv2:
            st = blk(st)
        stages.append((st, 2))
        self.down3.conv.out_capacity = caps[2]
        st = self.down3(st)
        for blk in self.conv3:
            st = blk(st)
        stages.append((st, 4))
        self.down4.conv.out_capacity = caps[3]
        st = self.down4(st)
        for blk in self.conv4:
            st = blk(st)
        stages.append((st, 8))
        self.extra.conv.out_capacity = caps[3]
        st = self.extra(st)
        bev = _dense_bev(st)
        if return_stages:
            # multi-level sparse taps (reference x_conv1..x_conv4,
            # voxel_set_abstraction.py:113)
            return bev, stages
        return bev


@manager.MIDDLE_ENCODERS.add_component
class SparseNet3D(nnx.Module):
    """SECOND-style sparse middle extractor (reference: sparsenet.py:68)."""

    #: Three xy-stride-2 downsamples vs. the voxel grid.
    bev_stride = 8

    def __init__(self,
                 in_channels: int = 4,
                 voxel_size=(0.05, 0.05, 0.1),
                 point_cloud_range=(0, -40, -3, 70.4, 40, 1),
                 stage_channels: Sequence[int] = (16, 32, 64, 64),
                 stage_capacities: Sequence[int] = None,
                 rngs: nnx.Rngs = None):
        rngs = rngs if rngs is not None else nnx.Rngs(0)
        self.grid = _grid_from_range(point_cloud_range, voxel_size)
        self.stage_capacities = stage_capacities
        c = list(stage_channels)

        self.stem = _ConvBNReLU(in_channels, c[0], rngs=rngs)
        self.block1 = _ConvBNReLU(c[0], c[0], rngs=rngs)
        self.down1 = _ConvBNReLU(c[0], c[1], stride=2, rngs=rngs)
        self.block2 = _ConvBNReLU(c[1], c[1], rngs=rngs)
        self.down2 = _ConvBNReLU(c[1], c[2], stride=2, rngs=rngs)
        self.block3 = _ConvBNReLU(c[2], c[2], rngs=rngs)
        self.down3 = _ConvBNReLU(c[2], c[3], stride=2, rngs=rngs)
        self.block4 = _ConvBNReLU(c[3], c[3], rngs=rngs)

    def _caps(self, v):
        if self.stage_capacities is not None:
            return list(self.stage_capacities)
        return [v, max(v // 2, 1), max(v // 4, 1), max(v // 8, 1)]

    def __call__(self, voxel_features, coords, voxel_mask,
                 return_stages: bool = False):
        caps = self._caps(voxel_features.shape[1])
        st = SparseTensor(voxel_features, coords, voxel_mask, self.grid)
        st = self.block1(self.stem(st))
        stages = [(st, 1)]
        self.down1.conv.out_capacity = caps[1]
        st = self.block2(self.down1(st))
        stages.append((st, 2))
        self.down2.conv.out_capacity = caps[2]
        st = self.block3(self.down2(st))
        stages.append((st, 4))
        self.down3.conv.out_capacity = caps[3]
        st = self.block4(self.down3(st))
        stages.append((st, 8))
        bev = _dense_bev(st)
        if return_stages:
            return bev, stages
        return bev
