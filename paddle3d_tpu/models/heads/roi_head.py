"""RoI-grid refinement head for two-stage detectors
(reference: paddle3d/models/heads/roi_heads/roi_head_base.py:32,
pvrcnn_head.py:35 RoI-grid pooling, voxelrcnn_head.py:31 voxel query).

Each proposal is covered by a G^3 grid of points; features are aggregated
around grid points with ball queries over a support point set (PV-RCNN:
keypoints from VoxelSetAbstraction; Voxel-RCNN: sparse voxel centers) and
fed to cls/reg refinement MLPs. Fixed capacities everywhere.
"""
from typing import Sequence

import jax
import jax.numpy as jnp
from flax import nnx

from ...apis import manager
from ...ops.pallas.ball_query import ball_query_batched
from ..common.pointnet2_modules import PointMLP
from ..losses.weighted_loss import smooth_l1_loss

__all__ = ["RoIGridHead"]


@manager.HEADS.add_component
class RoIGridHead(nnx.Module):
    def __init__(self,
                 in_channels,
                 grid_size: int = 6,
                 mlps: Sequence[int] = (64, 64),
                 radii: Sequence[float] = (0.8, 1.6),
                 nsamples: Sequence[int] = (16, 16),
                 head_fc: Sequence[int] = (256, 256),
                 rngs: nnx.Rngs = None):
        """`in_channels` int = all radii pool one support set (PV-RCNN
        keypoints); list = one support set per radius level (Voxel-RCNN
        multi-level voxel query, reference voxelrcnn_head.py:31)."""
        rngs = rngs if rngs is not None else nnx.Rngs(0)
        self.grid_size = grid_size
        self.radii = list(radii)
        self.nsamples = list(nsamples)
        if isinstance(in_channels, (list, tuple)):
            ins = list(in_channels)
            assert len(ins) == len(self.radii)
        else:
            ins = [in_channels] * len(self.radii)
        self.scale_mlps = nnx.List([
            PointMLP([ins[i] + 3] + list(mlps), rngs=rngs)
            for i in range(len(self.radii))
        ])
        agg_ch = len(radii) * mlps[-1]
        g3 = grid_size ** 3
        self.fc = PointMLP([g3 * agg_ch] + list(head_fc), rngs=rngs)
        self.cls_out = nnx.Linear(head_fc[-1], 1, rngs=rngs)
        self.reg_out = nnx.Linear(head_fc[-1], 7, rngs=rngs)

    def _grid_points(self, rois):
        """rois [P, 7] (bottom-z) -> [P, G^3, 3] global grid points."""
        g = self.grid_size
        lin = (jnp.arange(g, dtype=jnp.float32) + 0.5) / g - 0.5
        zz, yy, xx = jnp.meshgrid(lin, lin, lin, indexing="ij")
        unit = jnp.stack([xx.reshape(-1), yy.reshape(-1), zz.reshape(-1)],
                         axis=-1)  # [G^3, 3] in [-.5, .5]
        local = unit[None] * rois[:, None, 3:6]
        yaw = rois[:, 6]
        c, s = jnp.cos(yaw), jnp.sin(yaw)
        rx = c[:, None] * local[..., 0] - s[:, None] * local[..., 1]
        ry = s[:, None] * local[..., 0] + c[:, None] * local[..., 1]
        center = rois[:, :3].at[:, 2].add(rois[:, 5] / 2)
        return jnp.stack([rx, ry, local[..., 2]],
                         axis=-1) + center[:, None, :]

    def pool(self, rois, supports):
        """rois [B,P,7]; supports = ONE (xyz [B,S,3], feats [B,S,C],
        mask [B,S]) pooled at every radius, or a LIST of per-radius support
        sets (multi-level voxel query) -> [B, P, head_fc[-1]].

        Grouping geometry is vmapped; the BN-bearing MLPs run batched
        outside the vmap (BatchNorm state cannot mutate inside vmap)."""
        if not isinstance(supports, (list, tuple)) or \
                (len(supports) == 3 and not
                 isinstance(supports[0], (list, tuple))):
            supports = [supports] * len(self.radii)

        flat = jax.vmap(
            lambda r: self._grid_points(r).reshape(-1, 3))(rois)  # [B,P*G3,3]

        outs = []
        for (sxyz, sfeat, smask), radius, nsample, mlp in zip(
                supports, self.radii, self.nsamples, self.scale_mlps):
            gidx, count = ball_query_batched(radius, nsample, sxyz, flat,
                                             smask)        # [B,P*G3,n]
            take = jax.vmap(lambda x, i: x[i])
            grouped = jnp.concatenate([
                take(sxyz, gidx) - flat[:, :, None, :],
                take(sfeat, gidx),
            ], axis=-1)                                     # [B,P*G3,n,3+C]
            out = mlp(grouped)  # [B, P*G3, n, C]
            kmask = (jnp.arange(out.shape[2])[None, None, :] <
                     jnp.maximum(count, 1)[..., None])
            out = jnp.max(jnp.where(kmask[..., None], out, -1e9), axis=2)
            out = jnp.where((count > 0)[..., None], out, 0.)
            outs.append(out)
        pooled = jnp.concatenate(outs, axis=-1)  # [B, P*G3, C]
        pooled = pooled.reshape(rois.shape[0], rois.shape[1], -1)
        return self.fc(pooled)

    def __call__(self, rois, supports):
        shared = self.pool(rois, supports)
        return self.cls_out(shared)[..., 0], self.reg_out(shared)

    @staticmethod
    def refine_loss(cls_pred, reg_pred, targets: dict):
        """Refinement loss on ProposalTargetLayer outputs (reference:
        roi_head_base.py get_box_cls_layer_loss/get_box_reg_layer_loss over
        proposal_target_layer.py targets):
          cls: binary CE against the IoU-conditioned (possibly soft)
               rcnn_cls_labels, entries < 0 ignored;
          reg: smooth-L1 of the roi-frame residual to the matched gt, only
               where reg_valid_mask (IoU > reg_fg_thresh).
        """
        rois = targets["rois"]
        cls_labels = targets["rcnn_cls_labels"]
        reg_mask = targets["reg_valid_mask"]
        gt = targets["gt_of_rois"]

        cls_valid = cls_labels >= 0
        ce = optax_sigmoid_ce(cls_pred,
                              jnp.clip(cls_labels, 0.).astype(
                                  cls_pred.dtype))
        cls_loss = jnp.sum(jnp.where(cls_valid, ce, 0.)) / \
            jnp.maximum(jnp.sum(cls_valid), 1)

        # residual in the same coding test_forward decodes with
        diag = 0.5 * jnp.sqrt(rois[..., 3] ** 2 + rois[..., 4] ** 2)
        roi_c = rois[..., :3].at[..., 2].add(rois[..., 5] / 2)
        gt_c = gt[..., :3].at[..., 2].add(gt[..., 5] / 2)
        residual = jnp.concatenate([
            (gt_c - roi_c) / jnp.maximum(diag, 1e-3)[..., None],
            jnp.log(jnp.maximum(gt[..., 3:6], 1e-3) /
                    jnp.maximum(rois[..., 3:6], 1e-3)),
            (gt[..., 6:7] - rois[..., 6:7]),
        ], axis=-1)
        l1 = jnp.sum(smooth_l1_loss(reg_pred, residual), axis=-1)
        reg_loss = jnp.sum(jnp.where(reg_mask, l1, 0.)) / \
            jnp.maximum(jnp.sum(reg_mask), 1)
        return cls_loss, reg_loss


def optax_sigmoid_ce(logits, labels):
    return jnp.clip(logits, 0) - logits * labels + jnp.log1p(
        jnp.exp(-jnp.abs(logits)))
