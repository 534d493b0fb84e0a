"""PointPillars (reference: paddle3d/models/detection/pointpillars/pointpillars.py:37).

TPU-native pipeline differences from the reference:
  * voxelization runs in-model on padded [B, N, C] point batches (the
    reference voxelizes per-sample on host in the HardVoxelize transform);
  * anchor target assignment runs on-device inside the jitted train step
    (the reference's Gt2PointPillarsTarget numpy transform);
  * post-processing (decode + NMS) is a fixed-shape vmapped program, so
    train/test/export forwards are three jit-able pure functions with no
    host round-trips.
"""
import jax
import jax.numpy as jnp
import numpy as np
from flax import nnx

from ....apis import manager
from ....geometries import BBoxes3D, CoordMode
from ....ops.box_ops import limit_period
from ....sample import Sample
from ...base.base_model import BaseLidarModel
from .anchors import AnchorGenerator
from .target_assigner import assign_targets

__all__ = ["PointPillars"]


@manager.MODELS.add_component
class PointPillars(BaseLidarModel):
    def __init__(self,
                 voxelizer,
                 pillar_encoder,
                 middle_encoder,
                 backbone,
                 neck,
                 head,
                 loss,
                 anchor_configs,
                 anchor_area_threshold: float = 1,
                 pretrained: str = None,
                 box_with_velocity: bool = False):
        self.voxelizer = voxelizer
        self.pillar_encoder = pillar_encoder
        self.middle_encoder = middle_encoder
        self.backbone = backbone
        self.neck = neck
        self.head = head
        self.loss = loss
        self.pretrained = pretrained

        self.anchor_generator = AnchorGenerator(
            output_stride_factor=(self.backbone.downsample_strides[0] //
                                  self.neck.upsample_strides[0]),
            point_cloud_range=self.voxelizer.point_cloud_range,
            voxel_size=self.voxelizer.voxel_size,
            anchor_configs=anchor_configs,
            anchor_area_threshold=anchor_area_threshold)
        # static buffers (not trainable): kept as plain numpy, closed over by
        # the jitted step as constants.
        self._anchors = jnp.asarray(self.anchor_generator.anchors)
        self._matched_thr = jnp.asarray(
            self.anchor_generator.matched_thresholds)
        self._unmatched_thr = jnp.asarray(
            self.anchor_generator.unmatched_thresholds)

    # ------------------------------------------------------------- internals
    def _can_fuse(self) -> bool:
        """The fused points→canvas path (ops/pillar_ops.py) covers any
        PillarFeatureNet depth over a PointPillarsScatter middle; anything
        else falls back to the buffer pipeline."""
        from ...middle_encoders.pillar_scatter import PointPillarsScatter
        from ...voxel_encoders.pillar_encoder import PillarFeatureNet
        # NOTE: no `legacy` gate — our PillarFeatureNet decorates identically
        # for both flags (non-legacy center offsets), so the fused path does
        # too
        return (isinstance(self.pillar_encoder, PillarFeatureNet)
                and isinstance(self.middle_encoder, PointPillarsScatter))

    def _extract_feats(self, points, training: bool):
        """-> (neck feats, live-anchor mask)."""
        if self._can_fuse():
            return self._extract_feats_fused(points, training)
        voxels, coords, num_points, vmask = self.voxelizer(
            points, training=training)
        pillar_feats = self.pillar_encoder(voxels, num_points, coords)
        pillar_feats = pillar_feats * vmask[..., None].astype(
            pillar_feats.dtype)
        canvas = self.middle_encoder(pillar_feats, coords, vmask)
        feats = self.neck(self.backbone(canvas))
        return feats, self.anchor_generator.anchors_mask(coords, vmask)

    def _extract_feats_fused(self, points, training: bool):
        """Fused pillar pipeline: sort-once decoration + segmented scans +
        Pallas sorted-scatter straight onto the canvas (the [V,P,C] voxel
        buffer never exists; see ops/pillar_ops.py). The occupancy map for
        the anchor mask rides along as a free extra canvas channel."""
        from ....ops.pillar_ops import fused_pillar_canvas

        canvas, occupancy = fused_pillar_canvas(
            self.voxelizer, self.pillar_encoder, self.middle_encoder,
            points, training, with_occupancy=True)
        feats = self.neck(self.backbone(canvas))
        return feats, self.anchor_generator.anchors_mask_dense(occupancy)

    # --------------------------------------------------------------- entries
    def train_forward(self, batch) -> dict:
        points = batch["data"]
        feats, anchors_mask = self._extract_feats(points, training=True)
        preds = self.head(feats)

        gt_boxes = batch["gt_boxes"]  # [B, G, 7]
        gt_labels = batch["gt_labels"]  # [B, G], -1 padded
        # wrap yaw to [-pi, pi) as the reference does before assignment
        gt_boxes = gt_boxes.at[..., -1].set(
            limit_period(gt_boxes[..., -1], 0.5, 2 * jnp.pi))

        labels, reg_targets = jax.vmap(
            lambda g, l, m: assign_targets(self._anchors, g, l,
                                           self._matched_thr,
                                           self._unmatched_thr, m))(
                                               gt_boxes, gt_labels,
                                               anchors_mask)

        if self.head.use_direction_classifier:
            return self.loss(preds["box_preds"], preds["cls_preds"],
                             reg_targets, labels, preds["dir_preds"],
                             self._anchors)
        return self.loss(preds["box_preds"], preds["cls_preds"], reg_targets,
                         labels)

    def test_forward(self, batch) -> dict:
        points = batch["data"]
        feats, anchors_mask = self._extract_feats(points, training=False)
        preds = self.head(feats)
        return self.head.post_process(preds, self._anchors, anchors_mask)

    def export_forward(self, batch) -> dict:
        return self.test_forward(batch)

    # ------------------------------------------------------------- host side
    @staticmethod
    def postprocess_to_samples(outputs: dict, metas: list) -> list:
        """Convert fixed-shape device outputs to host Sample records
        (the dynamic-shape step lives here, off the device program)."""
        boxes = np.asarray(outputs["box3d_lidar"])
        scores = np.asarray(outputs["scores"])
        labels = np.asarray(outputs["label_preds"])
        results = []
        for i, meta in enumerate(metas):
            valid = scores[i] >= 0
            sample = Sample(path=meta.get("path"), modality="lidar")
            b = boxes[i][valid]
            sample.bboxes_3d = BBoxes3D(
                b, origin=[.5, .5, 0], coordmode=CoordMode.KittiLidar,
                rot_axis=2)
            sample.labels = labels[i][valid]
            sample.confidences = scores[i][valid]
            sample.alpha = (-np.arctan2(-b[:, 1], b[:, 0]) +
                            b[:, 6]) if len(b) else np.zeros((0,))
            if meta.get("calibs") is not None:
                sample.calibs = meta["calibs"]
            sample.meta.update(
                {k: v for k, v in meta.items() if k not in ("path", "calibs")})
            results.append(sample)
        return results
