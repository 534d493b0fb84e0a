"""BEVFormer attention modules
(reference: paddle3d/models/transformers/attentions/temporal_self_attention.py:35,
spatial_cross_attention.py:36,216 — all built on the ms_deform_attn CUDA op,
here on ops/ms_deform_attn bilinear gathers).
"""
import math
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import nnx

from ...apis import manager
from ...ops.ms_deform_attn import ms_deform_attn

__all__ = ["MSDeformableAttention", "TemporalSelfAttention",
           "SpatialCrossAttention"]


@manager.ATTENTIONS.add_component
class MSDeformableAttention(nnx.Module):
    """Single-source multi-scale deformable attention
    (reference: spatial_cross_attention.py:432 CustomMSDeformableAttention).
    """

    def __init__(self, embed_dims: int = 256, num_heads: int = 8,
                 num_levels: int = 1, num_points: int = 4,
                 rngs: nnx.Rngs = None):
        rngs = rngs if rngs is not None else nnx.Rngs(0)
        self.embed_dims = embed_dims
        self.num_heads = num_heads
        self.num_levels = num_levels
        self.num_points = num_points
        self.head_dim = embed_dims // num_heads
        self.sampling_offsets = nnx.Linear(
            embed_dims, num_heads * num_levels * num_points * 2,
            kernel_init=nnx.initializers.zeros_init(), rngs=rngs)
        self.attention_weights = nnx.Linear(
            embed_dims, num_heads * num_levels * num_points, rngs=rngs)
        self.value_proj = nnx.Linear(embed_dims, embed_dims, rngs=rngs)
        self.output_proj = nnx.Linear(embed_dims, embed_dims, rngs=rngs)

    def __call__(self, query, value, reference_points,
                 spatial_shapes: Tuple[Tuple[int, int], ...], **kwargs):
        """query [B,Q,C]; value [B,S,C]; reference_points [B,Q,2] in [0,1]."""
        b, q, c = query.shape
        m, l, p = self.num_heads, self.num_levels, self.num_points
        v = self.value_proj(value).reshape(b, -1, m, self.head_dim)
        offsets = self.sampling_offsets(query).reshape(b, q, m, l, p, 2)
        weights = self.attention_weights(query).reshape(b, q, m, l * p)
        weights = jax.nn.softmax(weights, axis=-1).reshape(b, q, m, l, p)
        # normalize offsets by each level's size
        norm = jnp.asarray(
            [[w_, h_] for (h_, w_) in spatial_shapes], jnp.float32)
        loc = (reference_points[:, :, None, None, None, :] +
               offsets / norm[None, None, None, :, None, :])

        out = jax.vmap(
            lambda vv, ll, ww: ms_deform_attn(vv, spatial_shapes, ll, ww))(
                v, loc, weights)
        return self.output_proj(out)


@manager.ATTENTIONS.add_component
class TemporalSelfAttention(MSDeformableAttention):
    """BEV self-attention over [prev_bev, cur_bev]
    (reference: temporal_self_attention.py:35): deformable sampling from both
    the current and the previous BEV, averaged."""

    def __call__(self, query, value=None, reference_points=None,
                 spatial_shapes=None, prev_bev=None, shift=None, **kwargs):
        """`shift` [B, 2] (normalized grid units) offsets the sampling grid
        of the PREVIOUS BEV only — the ego-motion translation alignment
        (reference: temporal_self_attention.py shift added to ref_2d for the
        prev branch)."""
        cur = query
        if prev_bev is None:
            prev_bev = query
        out_cur = super().__call__(cur, cur, reference_points,
                                   spatial_shapes)
        ref_prev = reference_points
        if shift is not None:
            ref_prev = reference_points + shift[:, None, :].astype(
                reference_points.dtype)
        out_prev = super().__call__(cur, prev_bev, ref_prev,
                                    spatial_shapes)
        return (out_cur + out_prev) / 2


@manager.ATTENTIONS.add_component
class SpatialCrossAttention(nnx.Module):
    """BEV -> multi-camera deformable cross attention
    (reference: spatial_cross_attention.py:36): each BEV query samples image
    features at the projections of its 3D pillar points in every camera that
    sees it."""

    def __init__(self, embed_dims: int = 256, num_heads: int = 8,
                 num_points: int = 4, num_z: int = 4,
                 pc_range: Sequence[float] = (-51.2, -51.2, -5., 51.2, 51.2,
                                              3.), rngs: nnx.Rngs = None):
        rngs = rngs if rngs is not None else nnx.Rngs(0)
        self.embed_dims = embed_dims
        self.num_z = num_z
        self.pc_range = list(map(float, pc_range))
        self.deform = MSDeformableAttention(
            embed_dims, num_heads, num_levels=1, num_points=num_points,
            rngs=rngs)
        self.output_proj = nnx.Linear(embed_dims, embed_dims, rngs=rngs)

    def __call__(self, query, value, bev_ref_2d, lidar2imgs,
                 spatial_shapes, **kwargs):
        """query [B,Q,C] BEV tokens; value [B,N,S,C] per-camera tokens;
        bev_ref_2d [Q,2] normalized BEV xy; lidar2imgs [B,N,4,4] projecting
        lidar -> normalized image coords."""
        b, q, c = query.shape
        n = value.shape[1]
        pc = self.pc_range
        # 3D pillar points per query (num_z heights)
        zs = jnp.linspace(0.25, 0.75, self.num_z)
        xs = bev_ref_2d[:, 0] * (pc[3] - pc[0]) + pc[0]
        ys = bev_ref_2d[:, 1] * (pc[4] - pc[1]) + pc[1]
        pts = jnp.stack([
            jnp.broadcast_to(xs[:, None], (q, self.num_z)),
            jnp.broadcast_to(ys[:, None], (q, self.num_z)),
            zs[None, :] * (pc[5] - pc[2]) + pc[2] *
            jnp.ones((q, self.num_z)),
            jnp.ones((q, self.num_z)),
        ], axis=-1)  # [Q, Z, 4]

        def per_cam(val_c, l2i_c, query_b):
            proj = jnp.einsum("ij,qzj->qzi", l2i_c, pts)
            depth = proj[..., 2]
            uv = proj[..., :2] / jnp.maximum(depth[..., None], 1e-5)
            visible = ((depth > 0.1) & (uv[..., 0] > 0) & (uv[..., 0] < 1) &
                       (uv[..., 1] > 0) & (uv[..., 1] < 1))
            ref = jnp.mean(jnp.where(visible[..., None], uv, 0.5), axis=1)
            out = self.deform(query_b[None], val_c[None], ref[None],
                              spatial_shapes)[0]
            hit = jnp.any(visible, axis=1)
            return out * hit[:, None], hit

        def per_sample(query_b, val_b, l2i_b):
            outs, hits = jax.vmap(
                lambda v_, m_: per_cam(v_, m_, query_b))(val_b, l2i_b)
            denom = jnp.maximum(jnp.sum(hits, axis=0), 1)[:, None]
            return jnp.sum(outs, axis=0) / denom

        out = jax.vmap(per_sample)(query, value, lidar2imgs)
        return self.output_proj(out)
