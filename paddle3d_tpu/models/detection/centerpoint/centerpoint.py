"""CenterPoint (reference: paddle3d/models/detection/centerpoint/centerpoint.py:45).

TPU-native pipeline: in-model batched voxelization (one vmapped program vs.
the reference's per-sample host loop, centerpoint.py:122-124), on-device
gaussian target generation (vs. the Gt2CenterPointTarget host transform),
and a fused decode+NMS predict (vs. the centerpoint_postprocess CUDA op).
"""
import jax.numpy as jnp
import numpy as np

from ....apis import manager
from ....geometries import BBoxes3D, CoordMode
from ....ops.box_ops import limit_period
from ....sample import Sample
from ...base.base_model import BaseLidarModel
from .centerpoint_target import CenterPointTargetGenerator

__all__ = ["CenterPoint"]


@manager.MODELS.add_component
class CenterPoint(BaseLidarModel):
    def __init__(self,
                 voxelizer,
                 voxel_encoder,
                 middle_encoder,
                 backbone,
                 neck,
                 bbox_head,
                 test_cfg: dict = None,
                 target_assign_cfg: dict = None,
                 pretrained: str = None,
                 box_with_velocity: bool = False):
        self.voxelizer = voxelizer
        self.voxel_encoder = voxel_encoder
        self.middle_encoder = middle_encoder
        self.backbone = backbone
        self.neck = neck
        self.bbox_head = bbox_head
        self.test_cfg = dict(test_cfg or {})
        self.pretrained = pretrained

        ta = dict(target_assign_cfg or {})
        down_ratio = self._resolve_down_ratio(ta)
        self.target_generator = CenterPointTargetGenerator(
            tasks=self.bbox_head.tasks_cfg,
            down_ratio=down_ratio,
            point_cloud_range=self.voxelizer.point_cloud_range,
            voxel_size=self.voxelizer.voxel_size,
            gaussian_overlap=ta.get("gaussian_overlap", 0.1),
            max_objs=ta.get("max_objs", 500),
            min_radius=ta.get("min_radius", 2),
            with_velocity=self.bbox_head.with_velocity)

    def _derived_down_ratio(self):
        """Feature-map stride vs. the voxel grid, derived from the actual
        network: middle-encoder BEV stride × first backbone stage stride ÷
        first neck upsample stride (all FPN branches land on the branch-0
        resolution). Matches the reference's out_size_factor semantics
        (Gt2CenterPointTarget, target_generator.py:345)."""
        mid = getattr(self.middle_encoder, "bev_stride", None)
        if mid is None:
            return None
        backbone = self.backbone
        blocks = getattr(backbone, "blocks", None)
        ds = getattr(blocks, "downsample_strides",
                     getattr(backbone, "downsample_strides", None))
        fuse = getattr(backbone, "fuse", self.neck)
        us = getattr(fuse, "upsample_strides",
                     getattr(self.neck, "upsample_strides", None))
        if not ds or not us:
            return None
        ratio = mid * ds[0] / us[0]
        return int(ratio) if ratio == int(ratio) else None

    def _resolve_down_ratio(self, ta: dict) -> int:
        configured = ta.get("down_ratio", self.test_cfg.get("down_ratio"))
        derived = self._derived_down_ratio()
        if derived is not None and configured is not None \
                and int(configured) != derived:
            raise ValueError(
                f"target_assign_cfg/test_cfg down_ratio={configured} does "
                f"not match the network's actual BEV stride {derived} "
                f"(middle encoder bev_stride="
                f"{getattr(self.middle_encoder, 'bev_stride', '?')}); the "
                f"heatmap target grid would not align with the head's "
                f"feature map.")
        if configured is not None:
            return int(configured)
        return derived if derived is not None else 1

    def _can_fuse(self) -> bool:
        """Pillar configs (PillarFeatureNet → PointPillarsScatter) take the
        fused sorted pipeline (ops/pillar_ops.fused_pillar_canvas); voxel
        configs (VoxelMean → sparse middles) keep the buffer path."""
        from ...middle_encoders.pillar_scatter import PointPillarsScatter
        from ...voxel_encoders.pillar_encoder import PillarFeatureNet
        return (isinstance(self.voxel_encoder, PillarFeatureNet)
                and isinstance(self.middle_encoder, PointPillarsScatter))

    def _extract_feats(self, points, training: bool):
        if self._can_fuse():
            from ....ops.pillar_ops import fused_pillar_canvas
            canvas = fused_pillar_canvas(
                self.voxelizer, self.voxel_encoder, self.middle_encoder,
                points, training)
            return self.neck(self.backbone(canvas))
        from ...voxel_encoders.voxel_encoder import VoxelMean
        if isinstance(self.voxel_encoder, VoxelMean):
            # fused voxelize+mean: the [V, P, C] buffer path costs a
            # 250k-row gather + 1.6M-slot scatter (~426 ms at the nuScenes
            # 0.075 grid, batch 4) that the mean never needs — see
            # ops/voxelize.voxel_mean
            from ....ops.voxelize import voxel_mean_batch
            feats, coords, _, vmask = voxel_mean_batch(
                points, self.voxelizer.voxel_size,
                self.voxelizer.point_cloud_range,
                self.voxelizer.max_num_points_in_voxel,
                self.voxelizer.max_num_voxels_for(training),
                self.voxel_encoder.in_channels)
            canvas = self.middle_encoder(feats, coords, vmask)
            return self.neck(self.backbone(canvas))
        voxels, coords, num_points, vmask = self.voxelizer(
            points, training=training)
        feats = self.voxel_encoder(voxels, num_points, coords)
        feats = feats * vmask[..., None].astype(feats.dtype)
        canvas = self.middle_encoder(feats, coords, vmask)
        return self.neck(self.backbone(canvas))

    def train_forward(self, batch) -> dict:
        x = self._extract_feats(batch["data"], training=True)
        preds = self.bbox_head(x)

        gt_boxes = batch["gt_boxes"]
        gt_boxes = gt_boxes.at[..., 6].set(
            limit_period(gt_boxes[..., 6], 0.5, 2 * jnp.pi))
        targets = self.target_generator(gt_boxes, batch["gt_labels"])
        return self.bbox_head.loss(preds, targets)

    def test_forward(self, batch) -> dict:
        x = self._extract_feats(batch["data"], training=False)
        preds = self.bbox_head(x)
        return self.bbox_head.predict(preds, self.test_cfg)

    def export_forward(self, batch) -> dict:
        return self.test_forward(batch)

    @staticmethod
    def postprocess_to_samples(outputs: dict, metas: list) -> list:
        """Fixed-shape outputs -> host Sample records (bottom-z boxes,
        matching reference _parse_results_to_sample, centerpoint.py:182)."""
        boxes = np.asarray(outputs["box3d_lidar"])
        scores = np.asarray(outputs["scores"])
        labels = np.asarray(outputs["label_preds"])
        results = []
        for i, meta in enumerate(metas):
            valid = scores[i] >= 0
            sample = Sample(path=meta.get("path"), modality="lidar")
            b = boxes[i][valid]
            box7 = b[:, [0, 1, 2, 3, 4, 5, b.shape[-1] - 1]] if len(b) else \
                b.reshape(0, 7)
            sample.bboxes_3d = BBoxes3D(
                box7, origin=[.5, .5, 0.], coordmode=CoordMode.KittiLidar,
                rot_axis=2)
            if b.shape[-1] == 9 and len(b):
                sample.bboxes_3d.velocities = b[:, 6:8]
            sample.labels = labels[i][valid]
            sample.confidences = scores[i][valid]
            sample.alpha = (-np.arctan2(-box7[:, 1], box7[:, 0]) +
                            box7[:, 6]) if len(b) else np.zeros((0,))
            if meta.get("calibs") is not None:
                sample.calibs = meta["calibs"]
            sample.meta.update(
                {k: v for k, v in meta.items() if k not in ("path", "calibs")})
            results.append(sample)
        return results
