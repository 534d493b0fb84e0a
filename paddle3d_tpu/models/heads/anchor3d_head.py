"""Dense anchor-based RPN head for two-stage detectors
(reference: paddle3d/models/heads/dense_heads/anchor3d_head.py:34 +
target_assigner/anchor3d_generator.py / axis_aligned_target_assigner.py).

Reuses the PointPillars anchor machinery (on-device assignment) and emits
fixed-capacity proposals for the RoI stage.
"""
from typing import List, Sequence

import jax
import jax.numpy as jnp
from flax import nnx

from ...apis import manager
from ...ops.box_ops import second_box_decode
from ...ops.iou3d_nms import nms_bev
from ..detection.pointpillars.anchors import AnchorGenerator
from ..detection.pointpillars.target_assigner import assign_targets
from ..layers.layer_libs import uniform_bias_init, uniform_init
from ..losses.weighted_loss import sigmoid_focal_loss, smooth_l1_loss

__all__ = ["Anchor3DHead"]


@manager.HEADS.add_component
class Anchor3DHead(nnx.Module):
    def __init__(self,
                 num_classes: int = None,
                 feature_channels: int = None,
                 anchor_configs: List[dict] = None,
                 point_cloud_range: Sequence[float] = None,
                 voxel_size: Sequence[float] = None,
                 output_stride_factor: int = 8,
                 num_proposals: int = 128,
                 nms_pre: int = 1024,
                 nms_thresh: float = 0.8,
                 anchor_generator: dict = None,
                 bbox_coder=None,
                 in_channels: int = None,
                 feat_channels: int = None,
                 test_cfg: dict = None,
                 rngs: nnx.Rngs = None,
                 **folded):
        # mmdet-style surface (reference bevfusion pts_bbox_head:
        # configs/bevfusion/bevf_pp_2x8_1x_nusc.yaml — per-size-group
        # `ranges` + `sizes` from AlignedAnchor3DRangeGenerator). The
        # aligned lattice is reconstructed at the published pillar grid
        # (voxel 0.25, feature stride 2); loss/dir sub-configs are folded
        # into this head's built-in focal + smooth-L1.
        del folded
        if anchor_generator is not None and anchor_configs is None:
            ranges = anchor_generator["ranges"]
            sizes = anchor_generator["sizes"]
            rots = list(anchor_generator.get("rotations", (0., 1.57)))
            voxel_size = list(voxel_size or (0.25, 0.25, 8.0))
            output_stride_factor = 2
            sx = voxel_size[0] * output_stride_factor
            sy = voxel_size[1] * output_stride_factor
            anchor_configs = []
            for rng_i, size_i in zip(ranges, sizes):
                anchor_configs.append(dict(
                    sizes=[size_i[0], size_i[1], size_i[2]],
                    anchor_strides=[sx, sy, 0.0],
                    anchor_offsets=[float(rng_i[0]), float(rng_i[1]),
                                    float(rng_i[2])],
                    rotations=rots,
                    matched_threshold=0.6, unmatched_threshold=0.45))
            if point_cloud_range is None:
                r0 = ranges[0]
                point_cloud_range = [r0[0], r0[1], -5.0, r0[3], r0[4], 3.0]
        if feature_channels is None:
            feature_channels = feat_channels or in_channels
        if test_cfg:
            num_proposals = min(int(test_cfg.get("max_num",
                                                 num_proposals)), 512)
            nms_pre = int(test_cfg.get("nms_pre", nms_pre))
            nms_thresh = float(test_cfg.get("nms_thr", nms_thresh))
        rngs = rngs if rngs is not None else nnx.Rngs(0)
        self.num_classes = num_classes
        self.num_proposals = num_proposals
        self.nms_pre = nms_pre
        self.nms_thresh = nms_thresh

        self.anchor_generator = AnchorGenerator(
            output_stride_factor=output_stride_factor,
            point_cloud_range=point_cloud_range,
            voxel_size=voxel_size,
            anchor_configs=anchor_configs)
        self._anchors = jnp.asarray(self.anchor_generator.anchors)
        self._matched = jnp.asarray(
            self.anchor_generator.matched_thresholds)
        self._unmatched = jnp.asarray(
            self.anchor_generator.unmatched_thresholds)
        k = self.anchor_generator.num_anchors_per_loc

        def conv1x1(cout):
            return nnx.Conv(feature_channels, cout, kernel_size=(1, 1),
                            kernel_init=uniform_init(),
                            bias_init=uniform_bias_init(feature_channels),
                            rngs=rngs)

        self.cls_head = conv1x1(k * num_classes)
        self.box_head = conv1x1(k * 7)
        self.dir_head = conv1x1(k * 2)

    def __call__(self, feats):
        b = feats.shape[0]
        return {
            "cls_preds": self.cls_head(feats).reshape(b, -1,
                                                      self.num_classes),
            "box_preds": self.box_head(feats).reshape(b, -1, 7),
            "dir_preds": self.dir_head(feats).reshape(b, -1, 2),
        }

    def loss(self, preds, gt_boxes, gt_labels) -> dict:
        labels, reg_targets = jax.vmap(
            lambda g, l: assign_targets(self._anchors, g, l, self._matched,
                                        self._unmatched))(gt_boxes,
                                                          gt_labels)
        fg = (labels > 0).astype(jnp.float32)
        num_fg = jnp.maximum(jnp.sum(fg, axis=1, keepdims=True), 1.)
        cared = labels >= 0
        onehot = jax.nn.one_hot(jnp.where(cared, labels, 0),
                                self.num_classes + 1)[..., 1:]
        cls_w = cared.astype(jnp.float32) / num_fg
        cls_loss = jnp.sum(
            sigmoid_focal_loss(preds["cls_preds"], onehot) *
            cls_w[..., None]) / preds["cls_preds"].shape[0]
        reg_w = fg / num_fg
        reg_loss = jnp.sum(
            smooth_l1_loss(preds["box_preds"], reg_targets) *
            reg_w[..., None]) / preds["box_preds"].shape[0]
        return {"loss_rpn_cls": cls_loss, "loss_rpn_reg": 2.0 * reg_loss}

    def proposals(self, preds):
        """-> (rois [B, P, 7], roi_scores [B, P], roi_labels [B, P])."""
        anchors = self._anchors

        def one(cls_p, box_p):
            boxes = second_box_decode(box_p, anchors)
            conf = jax.nn.sigmoid(cls_p)
            score = jnp.max(conf, axis=-1)
            label = jnp.argmax(conf, axis=-1)
            bev = jnp.stack([boxes[:, 0], boxes[:, 1], boxes[:, 3],
                             boxes[:, 4], boxes[:, 6]], axis=-1)
            keep, _ = nms_bev(bev, score, self.nms_thresh,
                              pre_max_size=self.nms_pre,
                              post_max_size=self.num_proposals)
            kept = keep >= 0
            safe = jnp.where(kept, keep, 0)
            return (jnp.where(kept[:, None], boxes[safe], 0.),
                    jnp.where(kept, score[safe], 0.),
                    jnp.where(kept, label[safe], -1))

        return jax.vmap(one)(preds["cls_preds"], preds["box_preds"])
