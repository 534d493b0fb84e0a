"""PV-RCNN and Voxel-RCNN two-stage detectors
(reference: paddle3d/models/detection/pv_rcnn/pv_rcnn.py:34 and
voxel_rcnn/voxel_rcnn.py:34).

Stage 1: voxelize -> sparse 3D encoder -> dense BEV -> SECOND backbone/FPN
-> Anchor3DHead proposals. Stage 2: RoI-grid pooling over a support set —
PV-RCNN uses FPS keypoints (VoxelSetAbstraction), Voxel-RCNN uses the last
sparse stage's voxel centers — then cls/reg refinement.
"""
import jax
import jax.numpy as jnp
import numpy as np
from flax import nnx

from ....apis import manager
from ...base.base_model import BaseLidarModel
from ...heads.anchor3d_head import Anchor3DHead
from ...heads.proposal_target_layer import (ProposalTargetConfig,
                                            proposal_targets)
from ...heads.roi_head import RoIGridHead

__all__ = ["PVRCNN", "VoxelRCNN"]


class _TwoStageBase(BaseLidarModel):
    def __init__(self, voxelizer, voxel_encoder, middle_encoder, backbone,
                 neck, rpn_head=None, roi_head=None, pretrained=None,
                 target_config=None, sampler_seed: int = 0,
                 dense_head=None, point_head=None, num_class=None,
                 post_process_cfg=None):
        # dense_head / num_class / post_process_cfg are the reference's
        # kwarg names (configs/pv_rcnn/pv_rcnn_005voxel_kitti.yml:30,84)
        self.voxelizer = voxelizer
        self.voxel_encoder = voxel_encoder
        self.middle_encoder = middle_encoder
        self.backbone = backbone
        self.neck = neck
        self.rpn_head = rpn_head if rpn_head is not None else dense_head
        assert self.rpn_head is not None, "rpn_head/dense_head required"
        self.roi_head = roi_head
        self.point_head = point_head
        self.post_process_cfg = post_process_cfg
        self.pretrained = pretrained
        # rotated-IoU proposal-target sampling (reference:
        # proposal_target_layer.py + pv_rcnn config target_config)
        self.target_cfg = ProposalTargetConfig(**(target_config or {}))
        self.sampler_rngs = nnx.Rngs(sampler=sampler_seed)

    def _stage1(self, points, training):
        from ...voxel_encoders.voxel_encoder import VoxelMean
        if isinstance(self.voxel_encoder, VoxelMean):
            # fused voxelize+mean — the [V, P, C] buffer path's gather +
            # scatter never runs (see ops/voxelize.voxel_mean)
            from ....ops.voxelize import voxel_mean_batch
            feats, coords, _, vmask = voxel_mean_batch(
                points, self.voxelizer.voxel_size,
                self.voxelizer.point_cloud_range,
                self.voxelizer.max_num_points_in_voxel,
                self.voxelizer.max_num_voxels_for(training),
                self.voxel_encoder.in_channels)
        else:
            voxels, coords, num_points, vmask = self.voxelizer(
                points, training=training)
            feats = self.voxel_encoder(voxels, num_points, coords)
            feats = feats * vmask[..., None].astype(feats.dtype)
        bev, stages = self.middle_encoder(feats, coords, vmask,
                                          return_stages=True)
        dense = self.neck(self.backbone(bev))
        preds = self.rpn_head(dense)
        return preds, bev, (feats, coords, vmask, stages)

    def _stage_supports(self, stages, picks):
        """Sparse stages -> [(xyz, feats, mask), ...] support sets."""
        from ...middle_encoders.sparse_resnet import stage_voxel_centers
        out = []
        for i in picks:
            st, stride = stages[i]
            centers = stage_voxel_centers(
                st, stride, self.voxelizer.voxel_size,
                self.voxelizer.point_cloud_range)
            out.append((centers, st.features, st.mask))
        return out

    def _support_set(self, points, bev, sparse_out, batch=None):
        """-> (supports, aux_losses). `batch` is passed during training so
        auxiliary point supervision (PKW) can compute its loss."""
        raise NotImplementedError

    def train_forward(self, batch) -> dict:
        points = batch["data"]
        preds, bev, sparse_out = self._stage1(points, training=True)
        losses = self.rpn_head.loss(preds, batch["gt_boxes"],
                                    batch["gt_labels"])
        rois, roi_scores, roi_labels = self.rpn_head.proposals(preds)
        # rotated-IoU matching + fg/bg subsampling to roi_per_image slots;
        # stage 2 pools only the sampled rois (reference: roi_head_base
        # assign_targets -> proposal_target_layer forward)
        targets = proposal_targets(
            self.sampler_rngs.sampler(), rois, roi_labels >= 0, roi_labels,
            roi_scores, batch["gt_boxes"], batch["gt_labels"],
            self.target_cfg)
        supports, aux = self._support_set(points, bev, sparse_out,
                                          batch=batch)
        losses.update(aux)
        cls_pred, reg_pred = self.roi_head(targets["rois"], supports)
        rcnn_cls, rcnn_reg = RoIGridHead.refine_loss(
            cls_pred, reg_pred, targets)
        losses["loss_rcnn_cls"] = rcnn_cls
        losses["loss_rcnn_reg"] = rcnn_reg
        losses["loss"] = sum(losses.values())
        return losses

    def test_forward(self, batch) -> dict:
        points = batch["data"]
        preds, bev, sparse_out = self._stage1(points, training=False)
        rois, roi_scores, roi_labels = self.rpn_head.proposals(preds)
        supports, _ = self._support_set(points, bev, sparse_out)
        cls_pred, reg_pred = self.roi_head(rois, supports)

        # apply residuals in the roi frame
        diag = 0.5 * jnp.sqrt(rois[..., 3] ** 2 + rois[..., 4] ** 2)
        center = rois[..., :3].at[..., 2].add(rois[..., 5] / 2)
        new_center = center + reg_pred[..., :3] * diag[..., None]
        new_dims = rois[..., 3:6] * jnp.exp(reg_pred[..., 3:6])
        new_yaw = rois[..., 6] + reg_pred[..., 6]
        boxes = jnp.concatenate([
            new_center.at[..., 2].add(-new_dims[..., 2] / 2), new_dims,
            new_yaw[..., None]
        ], axis=-1)
        conf = jax.nn.sigmoid(cls_pred) * roi_scores
        valid = roi_labels >= 0
        scores = jnp.where(valid, conf, -1.)
        return {"box3d_lidar": boxes, "scores": scores,
                "label_preds": jnp.where(valid, roi_labels, -1)}

    @staticmethod
    def postprocess_to_samples(outputs, metas):
        from ..pointpillars.pointpillars import PointPillars
        return PointPillars.postprocess_to_samples(outputs, metas)


@manager.MODELS.add_component
class VoxelRCNN(_TwoStageBase):
    """(reference: voxel_rcnn.py:34) — stage-2 support = voxel centroids of
    the raw voxelization (TPU-friendly stand-in for multi-level voxel
    query; one fixed support set instead of per-level hash queries)."""

    def __init__(self, voxelizer, voxel_encoder, middle_encoder, backbone,
                 neck, rpn_head=None, roi_head=None, point_encoder=None,
                 pretrained=None, target_config=None, sampler_seed: int = 0,
                 **ref_kwargs):
        # point_encoder accepted (and ignored) so Voxel-RCNN configs can
        # share a _base_ with PV-RCNN configs.
        super().__init__(voxelizer, voxel_encoder, middle_encoder, backbone,
                         neck, rpn_head, roi_head, pretrained=pretrained,
                         target_config=target_config,
                         sampler_seed=sampler_seed, **ref_kwargs)

    def _support_set(self, points, bev, sparse_out, batch=None):
        # per-level voxel-query support sets from the sparse stages
        # (reference: voxelrcnn_head.py:31 multi-level pooling) — the roi
        # head pairs each radius with one level; picks spread across depth
        feats, coords, vmask, stages = sparse_out
        n_levels = len(self.roi_head.radii)
        picks = list(range(len(stages)))[-n_levels:]
        while len(picks) < n_levels:
            picks = [picks[0]] + picks
        return self._stage_supports(stages, picks), {}


@manager.MODELS.add_component
class PVRCNN(_TwoStageBase):
    """(reference: pv_rcnn.py:34) — stage-2 support = FPS keypoints
    aggregated by VoxelSetAbstraction."""

    def __init__(self, voxelizer, voxel_encoder, middle_encoder, backbone,
                 neck, rpn_head=None, roi_head=None, point_encoder=None,
                 pretrained=None, target_config=None, sampler_seed: int = 0,
                 **ref_kwargs):
        super().__init__(voxelizer, voxel_encoder, middle_encoder, backbone,
                         neck, rpn_head, roi_head, pretrained=pretrained,
                         target_config=target_config,
                         sampler_seed=sampler_seed, **ref_kwargs)
        assert point_encoder is not None
        self.point_encoder = point_encoder
        if self.point_head is not None:
            actual = getattr(point_encoder, "prefuse_channels", None)
            if actual and self.point_head.input_channels != actual:
                # the reference spec's input_channels counts BOTH radius
                # branches per source (640); this VSA keeps one branch per
                # source, so rebuild the head at the actual pre-fuse width
                from ...heads.point_head import PointHeadSimple
                self.point_head = PointHeadSimple(
                    num_class=self.point_head.raw_num_class,
                    input_channels=actual,
                    model_cfg=self.point_head.model_cfg)

    def _support_set(self, points, bev, sparse_out, batch=None):
        sparse_stages = None
        if getattr(self.point_encoder, "stage_channels", None):
            stages = sparse_out[3]
            n = len(self.point_encoder.stage_channels)
            sparse_stages = self._stage_supports(
                stages, list(range(len(stages)))[-n:])
        if self.point_head is None:
            kp, kf, km = self.point_encoder(points, bev,
                                            sparse_stages=sparse_stages)
            return (kp, kf, km), {}
        # Predicted Keypoint Weighting: foreground scores from pre-fusion
        # features scale the fused features fed to RoI-grid pooling
        # (reference: pv_rcnn.py forward — point_features * point_cls_scores)
        kp, kf, km, prefuse = self.point_encoder(
            points, bev, sparse_stages=sparse_stages, return_prefuse=True)
        logits = self.point_head(prefuse)
        w = jax.nn.sigmoid(jnp.max(logits, axis=-1, keepdims=True))
        kf = kf * w
        aux = {}
        if batch is not None:
            aux["loss_point_cls"] = self.point_head.loss(
                logits, kp, km, batch["gt_boxes"], batch["gt_labels"])
        return (kp, kf, km), aux
