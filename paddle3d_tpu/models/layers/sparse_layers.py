"""nnx layers over the sparse-conv ops (ops/sparse.py).

SparseTensorState is the fixed-capacity analogue of a paddle.sparse tensor:
(features [B, V, C], coords [B, V, 3] (z,y,x), mask [B, V], grid (D,H,W)).
"""
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import nnx

from ...ops.sparse import (downsample_coords, sparse_gather_neighbors,
                           subm_conv3d_gather)
from .layer_libs import uniform_bias_init, uniform_init

__all__ = ["SparseTensor", "SparseConv3D", "MaskedBatchNorm",
           "SparseBasicBlock"]


class SparseTensor(NamedTuple):
    features: jnp.ndarray  # [B, V, C]
    coords: jnp.ndarray    # [B, V, 3]
    mask: jnp.ndarray      # [B, V]
    grid: Tuple[int, int, int]  # (D, H, W) static

    def replace_features(self, feats):
        return SparseTensor(feats, self.coords, self.mask, self.grid)


class MaskedBatchNorm(nnx.Module):
    """BatchNorm over valid rows of [B, V, C] (invalid rows excluded from
    the statistics and zeroed in the output)."""

    def __init__(self, channels: int, eps: float = 1e-3,
                 momentum: float = 0.99, *, rngs: nnx.Rngs):
        self.eps = eps
        self.momentum = momentum
        self.scale = nnx.Param(jnp.ones((channels,)))
        self.bias = nnx.Param(jnp.zeros((channels,)))
        self.mean = nnx.BatchStat(jnp.zeros((channels,)))
        self.var = nnx.BatchStat(jnp.ones((channels,)))
        self.use_running_average = False

    def fold_affine(self):
        """Eval-mode per-channel (scale, shift) with running stats folded:
        y = x * scale + shift. Used to fuse BN(+relu) into the sparse-conv
        kernel epilogue."""
        s = (self.scale[...] *
             jax.lax.rsqrt(self.var[...] + self.eps)).astype(jnp.float32)
        b = (self.bias[...] - self.mean[...] * s).astype(jnp.float32)
        return s, b

    def __call__(self, x: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
        m = mask.astype(x.dtype)[..., None]
        if self.use_running_average:
            mean, var = self.mean[...], self.var[...]
        else:
            count = jnp.maximum(jnp.sum(m), 1.0)
            mean = jnp.sum(x * m, axis=(0, 1)) / count
            diff = (x - mean) * m
            var = jnp.sum(diff * diff, axis=(0, 1)) / count
            self.mean[...] = (self.momentum * self.mean[...] +
                              (1 - self.momentum) * mean)
            self.var[...] = (self.momentum * self.var[...] +
                             (1 - self.momentum) * var)
        y = (x - mean) * jax.lax.rsqrt(var + self.eps)
        y = y * self.scale[...] + self.bias[...]
        return y * m


class SparseConv3D(nnx.Module):
    """Submanifold (stride 1) or strided sparse conv.

    For stride > 1 the output active set is the downsampled unique coords
    with capacity `out_capacity`.
    """

    def __init__(self, in_channels: int, out_channels: int,
                 kernel_size: int = 3, stride: int = 1,
                 out_capacity: int = None, use_bias: bool = True,
                 *, rngs: nnx.Rngs):
        self.kernel_size = kernel_size
        self.stride = (tuple(stride) if isinstance(stride, (tuple, list))
                       else (stride,) * 3)  # (sz, sy, sx)
        self.out_capacity = out_capacity
        # flipped by model.eval(): the eval path runs the sorted-window
        # Pallas kernel (ops/pallas/sparse_conv.py); training keeps the
        # autodiff-friendly gather formulation
        self.use_running_average = False
        k3 = kernel_size ** 3
        init = uniform_init()
        key = rngs.params()
        # fan_in = k^3 * Cin
        self.weight = nnx.Param(
            init(key, (k3 * in_channels, out_channels)))
        self.bias = (nnx.Param(
            uniform_bias_init(k3 * in_channels)(rngs.params(),
                                                (out_channels,)))
                     if use_bias else None)

    def _use_kernel(self):
        return (self.use_running_average
                and jax.default_backend() == "tpu")

    @staticmethod
    def _lin_keys(coords, mask, grid):
        d, h, w = grid
        k = (coords[..., 0] * (h * w) + coords[..., 1] * w +
             coords[..., 2]).astype(jnp.int32)
        # masked rows get DISTINCT, increasing sentinel keys (sentinel +
        # row index): equal sentinels would give the kernel's padding
        # blocks windows spanning the whole sentinel tail
        v = coords.shape[-2]
        row = jnp.arange(v, dtype=jnp.int32)
        sent = np.int32(d * h * w + 7) + row
        return jnp.where(mask, k, sent)

    def __call__(self, st: SparseTensor, scale=None, shift=None,
                 relu: bool = False) -> SparseTensor:
        """`scale`/`shift`/`relu`: optional fused eval-BN epilogue — the
        Pallas kernel applies y = conv(x)*scale + shift (+relu) in its
        write stage, saving the f32 canvas round trip per conv. Callers
        pass these only in eval mode (_ConvBNReLU/SparseBasicBlock)."""
        fused = scale is not None or shift is not None or relu
        if self.bias is not None and fused:
            b = self.bias[...]
            shift = (b if scale is None else b * scale) if shift is None \
                else (shift + (b if scale is None else b * scale))
        if all(s == 1 for s in self.stride):
            if self._use_kernel():
                from ...ops.pallas.sparse_conv import sparse_conv3d_win
                keys = self._lin_keys(st.coords, st.mask, st.grid)
                d, h, w = st.grid
                out = sparse_conv3d_win(
                    keys, keys, st.features, self.weight[...], d, h, w,
                    kernel_size=self.kernel_size, scale=scale, shift=shift,
                    relu=relu, out_dtype=st.features.dtype)
                if fused:
                    return st.replace_features(out)
            else:
                def one(f, c, m):
                    return subm_conv3d_gather(f, c, m, self.weight[...],
                                              st.grid)
                out = jax.vmap(one)(st.features, st.coords, st.mask)
                if fused:
                    out = self._affine_np(out, scale, shift, relu, st.mask)
                    return st.replace_features(out)
            if self.bias is not None:
                out = out + self.bias[...]
            out = out * st.mask[..., None].astype(out.dtype)
            return st.replace_features(out)

        d, h, w = st.grid
        sz, sy, sx = self.stride
        new_grid = (max(d // sz, 1), h // sy, w // sx)
        cap = self.out_capacity or st.features.shape[1]

        oc, om = jax.vmap(lambda c, m: downsample_coords(
            c, m, st.grid, self.stride, cap))(st.coords, st.mask)
        if self._use_kernel():
            from ...ops.pallas.sparse_conv import sparse_conv3d_win
            keys = self._lin_keys(st.coords, st.mask, st.grid)
            stride_v = jnp.asarray(self.stride, oc.dtype)
            qb = self._lin_keys(oc * stride_v, om, st.grid)
            feats = sparse_conv3d_win(
                qb, keys, st.features, self.weight[...], d, h, w,
                kernel_size=self.kernel_size, scale=scale, shift=shift,
                relu=relu, out_dtype=st.features.dtype)
            if fused:
                return SparseTensor(feats, oc, om, new_grid)
            if self.bias is not None:
                feats = feats + self.bias[...]
            feats = feats * om[..., None].astype(feats.dtype)
            return SparseTensor(feats.astype(st.features.dtype), oc, om,
                                new_grid)

        def one(f, c, m, oc_, om_):
            g = sparse_gather_neighbors(f, c, m, oc_, om_,
                                        self.kernel_size,
                                        st.grid, stride=self.stride)
            out = jnp.dot(g.reshape(cap, -1), self.weight[...],
                          preferred_element_type=jnp.float32).astype(f.dtype)
            if self.bias is not None and not fused:
                out = out + self.bias[...]
            return out * om_[:, None].astype(out.dtype)

        feats = jax.vmap(one)(st.features, st.coords, st.mask, oc, om)
        out = SparseTensor(feats, oc, om, new_grid)
        if fused:
            out = out.replace_features(
                self._affine_np(out.features, scale, shift, relu, om))
        return out

    @staticmethod
    def _affine_np(out, scale, shift, relu, mask):
        """Reference epilogue for the non-kernel paths (bias already folded
        into `shift` by __call__)."""
        if scale is not None:
            out = out * scale
        if shift is not None:
            out = out + shift
        if relu:
            out = jnp.maximum(out, 0.0)
        return out * mask[..., None].astype(out.dtype)


class SparseBasicBlock(nnx.Module):
    """Two subm convs + residual (reference: sparse_resnet.py:62)."""

    def __init__(self, channels: int, *, rngs: nnx.Rngs):
        self.conv1 = SparseConv3D(channels, channels, 3, rngs=rngs)
        self.bn1 = MaskedBatchNorm(channels, rngs=rngs)
        self.conv2 = SparseConv3D(channels, channels, 3, rngs=rngs)
        self.bn2 = MaskedBatchNorm(channels, rngs=rngs)

    def __call__(self, st: SparseTensor) -> SparseTensor:
        identity = st.features
        if self.conv1._use_kernel() and self.bn1.use_running_average:
            s1, b1 = self.bn1.fold_affine()
            out = self.conv1(st, scale=s1, shift=b1, relu=True)
            s2, b2 = self.bn2.fold_affine()
            out = self.conv2(out, scale=s2, shift=b2)
            return out.replace_features(
                nnx.relu(out.features + identity))
        out = self.conv1(st)
        out = out.replace_features(
            nnx.relu(self.bn1(out.features, out.mask)))
        out = self.conv2(out)
        f = self.bn2(out.features, out.mask)
        return out.replace_features(nnx.relu(f + identity))
