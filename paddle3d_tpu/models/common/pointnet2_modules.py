"""PointNet++ set-abstraction modules over the masked batch layout
(reference: paddle3d/models/common/pointnet2_stack/pointnet2_modules.py and
models/detection/iassd/iassd_modules.py:24 SAModuleMSG_WithSampling /
Vote_layer).

All point sets are fixed-capacity [B, N, ...] with validity masks; sampling
is FPS or confidence-based ("ctr_aware") top-k.
"""
from typing import List, Sequence

import jax
import jax.numpy as jnp
from flax import nnx

from ...ops.pallas.ball_query import ball_query_batched

from ..layers.layer_libs import LinearBN1DReLU

__all__ = ["SAModuleMSG", "VoteLayer", "PointMLP"]


class PointMLP(nnx.Module):
    """Shared MLP over the last axis with BN+ReLU per layer."""

    def __init__(self, channels: Sequence[int], *, rngs: nnx.Rngs):
        self.layers = nnx.List([
            LinearBN1DReLU(channels[i], channels[i + 1], rngs=rngs)
            for i in range(len(channels) - 1)
        ])
        self.out_channels = channels[-1]

    def __call__(self, x):
        for layer in self.layers:
            x = layer(x)
        return x


class SAModuleMSG(nnx.Module):
    """Multi-scale-grouping set abstraction with selectable sampling.

    sample_type: 'd-fps' (farthest point) or 'ctr_aware' (top-k by class
    confidence — IA-SSD's contribution).
    """

    def __init__(self,
                 npoint: int,
                 radii: Sequence[float],
                 nsamples: Sequence[int],
                 mlps: List[List[int]],
                 in_channels: int,
                 sample_type: str = "d-fps",
                 aggregation_mlp: Sequence[int] = None,
                 confidence_mlp: Sequence[int] = None,
                 num_classes: int = 0,
                 *, rngs: nnx.Rngs):
        self.npoint = npoint
        self.radii = list(radii)
        self.nsamples = list(nsamples)
        self.sample_type = sample_type
        self.scale_mlps = nnx.List([
            PointMLP([in_channels + 3] + list(m), rngs=rngs) for m in mlps
        ])
        out_ch = sum(m[-1] for m in mlps)
        self.aggregation = (PointMLP([out_ch] + list(aggregation_mlp),
                                     rngs=rngs)
                            if aggregation_mlp else None)
        self.out_channels = (aggregation_mlp[-1] if aggregation_mlp
                             else out_ch)
        self.confidence = (PointMLP([self.out_channels] +
                                    list(confidence_mlp) + [num_classes],
                                    rngs=rngs)
                           if confidence_mlp else None)
        if self.confidence is not None:
            # last layer without BN/ReLU: use a plain linear on top
            self.confidence = nnx.Sequential(
                PointMLP([self.out_channels] + list(confidence_mlp),
                         rngs=rngs),
                nnx.Linear(confidence_mlp[-1], num_classes, rngs=rngs))

    def _sample(self, xyz, mask, scores):
        """-> indices [B, npoint]."""
        if self.sample_type == "ctr_aware" and scores is not None:
            conf = jnp.max(scores, axis=-1)
            conf = jnp.where(mask, conf, -jnp.inf)
            _, idx = jax.lax.top_k(conf, self.npoint)
            return idx.astype(jnp.int32)
        from ...ops.pallas.fps import farthest_point_sample_batched
        return farthest_point_sample_batched(xyz, mask, self.npoint)

    def __call__(self, xyz, feats, mask, scores=None):
        """xyz [B,N,3], feats [B,N,C], mask [B,N] ->
        (new_xyz [B,M,3], new_feats [B,M,C'], new_mask [B,M],
        confidence [B,M,num_classes] or None)."""
        idx = self._sample(xyz, mask, scores)  # [B, M]
        new_xyz = jnp.take_along_axis(xyz, idx[..., None], axis=1)
        new_mask = jnp.take_along_axis(mask, idx, axis=1)

        take = jax.vmap(lambda x, i: x[i])
        outs = []
        for radius, nsample, mlp in zip(self.radii, self.nsamples,
                                        self.scale_mlps):
            gidx, counts = ball_query_batched(radius, nsample, xyz,
                                              new_xyz, mask)
            grouped = jnp.concatenate([
                take(xyz, gidx) - new_xyz[:, :, None, :],
                take(feats, gidx)], axis=-1)        # [B, M, K, 3+C]
            out = mlp(grouped)  # [B, M, K, C']
            kmask = (jnp.arange(out.shape[2])[None, None, :] <
                     jnp.maximum(counts, 1)[..., None])
            out = jnp.where(kmask[..., None], out, -1e9)
            out = jnp.max(out, axis=2)
            out = jnp.where((counts > 0)[..., None], out, 0.)
            outs.append(out)
        new_feats = jnp.concatenate(outs, axis=-1)
        if self.aggregation is not None:
            new_feats = self.aggregation(new_feats)
        new_feats = new_feats * new_mask[..., None].astype(new_feats.dtype)
        conf = (self.confidence(new_feats)
                if self.confidence is not None else None)
        return new_xyz, new_feats, new_mask, conf


class VoteLayer(nnx.Module):
    """Centroid vote: predict per-point offsets, clamped to a max range
    (reference: iassd_modules.py Vote_layer)."""

    def __init__(self, mlps: Sequence[int], in_channels: int,
                 max_translate_range: Sequence[float], *, rngs: nnx.Rngs):
        self.mlp = PointMLP([in_channels] + list(mlps), rngs=rngs)
        self.ctr_reg = nnx.Linear(mlps[-1], 3, rngs=rngs)
        self.max_range = jnp.asarray(max_translate_range, jnp.float32)

    def __call__(self, xyz, feats, mask):
        f = self.mlp(feats)
        offset = self.ctr_reg(f)
        offset = jnp.clip(offset, -self.max_range, self.max_range)
        new_xyz = xyz + offset
        return new_xyz, f, offset
