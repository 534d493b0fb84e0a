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
from ...ops.pointnet2 import ball_query
from ..common.pointnet2_modules import PointMLP
from ..losses.weighted_loss import smooth_l1_loss

__all__ = ["RoIGridHead"]


@manager.HEADS.add_component
class RoIGridHead(nnx.Module):
    def __init__(self,
                 in_channels: int,
                 grid_size: int = 6,
                 mlps: Sequence[int] = (64, 64),
                 radii: Sequence[float] = (0.8, 1.6),
                 nsamples: Sequence[int] = (16, 16),
                 head_fc: Sequence[int] = (256, 256),
                 rngs: nnx.Rngs = None):
        rngs = rngs if rngs is not None else nnx.Rngs(0)
        self.grid_size = grid_size
        self.radii = list(radii)
        self.nsamples = list(nsamples)
        self.scale_mlps = nnx.List([
            PointMLP([in_channels + 3] + list(mlps), rngs=rngs)
            for _ in radii
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

    def pool(self, rois, support_xyz, support_feats, support_mask):
        """rois [B,P,7]; support [B,S,...] -> [B, P, head_fc[-1]]."""
        g3 = self.grid_size ** 3

        def per_sample(roi, xyz, feats, mask):
            grid = self._grid_points(roi)  # [P, G3, 3]
            flat = grid.reshape(-1, 3)
            outs = []
            for radius, nsample, mlp in zip(self.radii, self.nsamples,
                                            self.scale_mlps):
                gidx, count = ball_query(radius, nsample, xyz, flat, mask)
                grouped = jnp.concatenate(
                    [xyz[gidx] - flat[:, None, :], feats[gidx]], axis=-1)
                out = mlp(grouped)
                kmask = (jnp.arange(out.shape[1])[None, :] <
                         jnp.maximum(count, 1)[:, None])
                out = jnp.where(kmask[..., None], out, -1e9)
                out = jnp.max(out, axis=1)
                out = jnp.where((count > 0)[:, None], out, 0.)
                outs.append(out)
            pooled = jnp.concatenate(outs, axis=-1)  # [P*G3, C]
            return pooled.reshape(roi.shape[0], -1)  # [P, G3*C]

        pooled = jax.vmap(per_sample)(rois, support_xyz, support_feats,
                                      support_mask)
        return self.fc(pooled)

    def __call__(self, rois, support_xyz, support_feats, support_mask):
        shared = self.pool(rois, support_xyz, support_feats, support_mask)
        return self.cls_out(shared)[..., 0], self.reg_out(shared)

    @staticmethod
    def refine_loss(cls_pred, reg_pred, rois, roi_mask, gt_boxes, gt_labels,
                    fg_iou: float = 0.55, bg_iou: float = 0.45):
        """Center-distance proxy assignment + IoU-free refinement loss:
        cls = box-confidence (soft IoU proxy), reg = residual to matched gt
        in the RoI frame (reference: proposal_target_layer.py semantics)."""
        gt_center = gt_boxes.at[..., 2].add(gt_boxes[..., 5] / 2)

        def one(cls_q, reg_q, roi, rmask, gt_b, gt_l):
            d = jnp.linalg.norm(roi[:, None, :2] - gt_b[None, :, :2],
                                axis=-1)
            d = jnp.where((gt_l >= 0)[None, :], d, 1e9)
            gi = jnp.argmin(d, axis=1)
            gd = jnp.min(d, axis=1)
            diag = 0.5 * jnp.sqrt(roi[:, 3] ** 2 + roi[:, 4] ** 2)
            fg = (gd < diag) & rmask
            tgt_cls = fg.astype(cls_q.dtype)
            cls_loss = jnp.sum(
                jnp.where(rmask,
                          optax_sigmoid_ce(cls_q, tgt_cls), 0.)) / \
                jnp.maximum(jnp.sum(rmask), 1)
            tgt_box = gt_b[jnp.clip(gi, 0)]
            tgt_box = tgt_box.at[:, 2].add(tgt_box[:, 5] / 2)
            roi_c = roi.at[:, 2].add(roi[:, 5] / 2)
            residual = jnp.concatenate([
                (tgt_box[:, :3] - roi_c[:, :3]) /
                jnp.maximum(diag, 1e-3)[:, None],
                jnp.log(jnp.maximum(tgt_box[:, 3:6], 1e-3) /
                        jnp.maximum(roi[:, 3:6], 1e-3)),
                (tgt_box[:, 6:7] - roi[:, 6:7]),
            ], axis=-1)
            reg_loss = jnp.sum(
                jnp.where(fg[:, None],
                          smooth_l1_loss(reg_q, residual), 0.)) / \
                jnp.maximum(jnp.sum(fg), 1)
            return cls_loss, reg_loss

        cls_loss, reg_loss = jax.vmap(one)(cls_pred, reg_pred, rois,
                                           roi_mask, gt_center, gt_labels)
        return jnp.mean(cls_loss), jnp.mean(reg_loss)


def optax_sigmoid_ce(logits, labels):
    return jnp.clip(logits, 0) - logits * labels + jnp.log1p(
        jnp.exp(-jnp.abs(logits)))
