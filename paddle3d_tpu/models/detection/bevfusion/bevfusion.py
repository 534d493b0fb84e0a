"""BEVFusion (reference: paddle3d/models/detection/bevfusion/
bevf_faster_rcnn.py:55 -> mvx_faster_rcnn.py:23 -> mvx_two_stage.py:27).

LiDAR branch (voxelize -> encoder -> BEV) and camera branch (image
backbone -> LSS lift-splat, reference cam_stream_lss.py) produce aligned
BEV maps, concatenated + fused by a conv, then a CenterHead detects.
Either branch can be disabled (camera-only / lidar-only variants of the
reference README).
"""
import jax.numpy as jnp
import numpy as np
from flax import nnx

from ....apis import manager
from ....ops.box_ops import limit_period
from ...base.base_model import BaseMultiViewModel
from ...layers.layer_libs import ConvBNReLU
from ..centerpoint.centerpoint import CenterPoint
from ..centerpoint.centerpoint_target import CenterPointTargetGenerator

__all__ = ["BEVFusion"]


@manager.MODELS.add_component
class BEVFusion(BaseMultiViewModel):
    def __init__(self,
                 bbox_head,
                 test_cfg: dict,
                 point_cloud_range,
                 voxel_size,
                 lidar_voxelizer=None,
                 lidar_voxel_encoder=None,
                 lidar_middle_encoder=None,
                 img_backbone=None,
                 img_neck=None,
                 img_view_transformer=None,
                 fusion_channels: int = 256,
                 lidar_channels: int = 0,
                 camera_channels: int = 0,
                 bev_backbone=None,
                 bev_neck=None,
                 target_assign_cfg: dict = None,
                 pretrained: str = None,
                 rngs: nnx.Rngs = None):
        rngs = rngs if rngs is not None else nnx.Rngs(0)
        self.lidar_voxelizer = lidar_voxelizer
        self.lidar_voxel_encoder = lidar_voxel_encoder
        self.lidar_middle_encoder = lidar_middle_encoder
        self.img_backbone = img_backbone
        self.img_neck = img_neck
        self.img_view_transformer = img_view_transformer
        self.bev_backbone = bev_backbone
        self.bev_neck = bev_neck
        self.bbox_head = bbox_head
        self.test_cfg = dict(test_cfg)
        self.pretrained = pretrained

        in_ch = lidar_channels + camera_channels
        self.fuse_conv = ConvBNReLU(in_ch, fusion_channels, 3, rngs=rngs)

        ta = dict(target_assign_cfg or {})
        self.target_generator = CenterPointTargetGenerator(
            tasks=self.bbox_head.tasks_cfg,
            down_ratio=ta.get("down_ratio", 1),
            point_cloud_range=point_cloud_range,
            voxel_size=voxel_size,
            gaussian_overlap=ta.get("gaussian_overlap", 0.1),
            max_objs=ta.get("max_objs", 500),
            min_radius=ta.get("min_radius", 2),
            with_velocity=self.bbox_head.with_velocity)

    def _lidar_bev(self, points, training):
        voxels, coords, num_points, vmask = self.lidar_voxelizer(
            points, training=training)
        feats = self.lidar_voxel_encoder(voxels, num_points, coords)
        feats = feats * vmask[..., None].astype(feats.dtype)
        return self.lidar_middle_encoder(feats, coords, vmask)

    def _camera_bev(self, batch):
        imgs = batch["img"]
        b, n, h, w, c = imgs.shape
        x = self.img_backbone(imgs.reshape(b * n, h, w, c))
        if self.img_neck is not None:
            x = self.img_neck(x)
        f = x[0] if isinstance(x, (tuple, list)) else x
        _, fh, fw, fc = f.shape
        bev, _ = self.img_view_transformer(
            f.reshape(b, n, fh, fw, fc), batch["rots"], batch["trans"],
            batch["cam2imgs"], batch["post_rots"], batch["post_trans"],
            batch["bda"])
        return bev

    def _fused_feats(self, batch, training):
        bevs = []
        if self.lidar_voxelizer is not None and "data" in batch:
            bevs.append(self._lidar_bev(batch["data"], training))
        if self.img_view_transformer is not None and "img" in batch:
            cam_bev = self._camera_bev(batch)
            if bevs and cam_bev.shape[1:3] != bevs[0].shape[1:3]:
                import jax
                cam_bev = jax.image.resize(
                    cam_bev, bevs[0].shape[:3] + (cam_bev.shape[-1],),
                    method="bilinear")
            bevs.append(cam_bev)
        fused = self.fuse_conv(jnp.concatenate(bevs, axis=-1))
        if self.bev_backbone is not None:
            feats = self.bev_backbone(fused)
            fused = self.bev_neck(feats) if self.bev_neck is not None else \
                feats[-1]
        return fused

    def train_forward(self, batch) -> dict:
        feats = self._fused_feats(batch, training=True)
        preds = self.bbox_head(feats)
        gt_boxes = batch["gt_boxes"]
        gt_boxes = gt_boxes.at[..., 6].set(
            limit_period(gt_boxes[..., 6], 0.5, 2 * jnp.pi))
        targets = self.target_generator(gt_boxes, batch["gt_labels"])
        return self.bbox_head.loss(preds, targets)

    def test_forward(self, batch) -> dict:
        feats = self._fused_feats(batch, training=False)
        preds = self.bbox_head(feats)
        return self.bbox_head.predict(preds, self.test_cfg)

    postprocess_to_samples = staticmethod(CenterPoint.postprocess_to_samples)
