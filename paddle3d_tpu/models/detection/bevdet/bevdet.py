"""BEVDet / BEVDet4D (reference: paddle3d/models/detection/bevdet/bevdet4d.py:34).

Camera images -> image backbone/neck -> LSS view transform (bev_pool) ->
BEV encoder (CustomResNet + FPN_LSS) -> CenterHead. Temporal fusion
(BEVDet4D) concatenates the previous frame's BEV feature, carried as
explicit state in the batch (`prev_bev`) instead of module attributes
(SURVEY.md §7 hard part 7).

Batch contract:
    img:  [B, N, H, W, 3]
    rots/trans/cam2imgs/post_rots/post_trans: camera matrices
    bda:  [B, 3, 3] bev-data-augmentation matrix
    gt_boxes [B, G, 7|9] bottom-z, gt_labels [B, G]
    prev_bev (optional): [B, gy, gx, C]
"""
import jax.numpy as jnp
import numpy as np
from flax import nnx

from ....apis import manager
from ....ops.box_ops import limit_period
from ...base.base_model import BaseMultiViewModel
from ..centerpoint.centerpoint import CenterPoint
from ..centerpoint.centerpoint_target import CenterPointTargetGenerator

__all__ = ["BEVDet"]


@manager.MODELS.add_component
class BEVDet(BaseMultiViewModel):
    def __init__(self,
                 img_backbone,
                 img_neck,
                 img_view_transformer,
                 img_bev_encoder_backbone,
                 img_bev_encoder_neck,
                 bbox_head,
                 test_cfg: dict = None,
                 target_assign_cfg: dict = None,
                 temporal: bool = False,
                 pretrained: str = None):
        self.img_backbone = img_backbone
        self.img_neck = img_neck
        self.img_view_transformer = img_view_transformer
        self.img_bev_encoder_backbone = img_bev_encoder_backbone
        self.img_bev_encoder_neck = img_bev_encoder_neck
        self.bbox_head = bbox_head
        self.test_cfg = dict(test_cfg or {})
        self.temporal = temporal
        self.pretrained = pretrained

        ta = dict(target_assign_cfg or {})
        grid = img_view_transformer.grid_config
        pc_range = [grid["x"][0], grid["y"][0], grid["z"][0],
                    grid["x"][1], grid["y"][1], grid["z"][1]]
        voxel_size = [grid["x"][2], grid["y"][2],
                      grid["z"][1] - grid["z"][0]]
        self.target_generator = CenterPointTargetGenerator(
            tasks=self.bbox_head.tasks_cfg,
            down_ratio=ta.get("down_ratio", 1),
            point_cloud_range=pc_range,
            voxel_size=voxel_size,
            gaussian_overlap=ta.get("gaussian_overlap", 0.1),
            max_objs=ta.get("max_objs", 500),
            min_radius=ta.get("min_radius", 2),
            with_velocity=self.bbox_head.with_velocity)

    def extract_bev(self, batch):
        imgs = batch["img"]
        b, n, h, w, c = imgs.shape
        x = self.img_backbone(imgs.reshape(b * n, h, w, c))
        if self.img_neck is not None:
            x = self.img_neck(x)
        f = x[0] if isinstance(x, (tuple, list)) else x
        _, fh, fw, fc = f.shape
        f = f.reshape(b, n, fh, fw, fc)
        bev, depth = self.img_view_transformer(
            f, batch["rots"], batch["trans"], batch["cam2imgs"],
            batch["post_rots"], batch["post_trans"], batch["bda"])
        if self.temporal and "prev_bev" in batch:
            bev = jnp.concatenate([bev, batch["prev_bev"]], axis=-1)
        feats = self.img_bev_encoder_backbone(bev)
        return self.img_bev_encoder_neck(feats), bev, depth

    def train_forward(self, batch) -> dict:
        feats, _, depth = self.extract_bev(batch)
        preds = self.bbox_head(feats)
        gt_boxes = batch["gt_boxes"]
        gt_boxes = gt_boxes.at[..., 6].set(
            limit_period(gt_boxes[..., 6], 0.5, 2 * jnp.pi))
        targets = self.target_generator(gt_boxes, batch["gt_labels"])
        return self.bbox_head.loss(preds, targets)

    def test_forward(self, batch) -> dict:
        feats, bev, _ = self.extract_bev(batch)
        preds = self.bbox_head(feats)
        out = self.bbox_head.predict(preds, self.test_cfg)
        out["bev_feature"] = bev  # carried state for BEVDet4D video mode
        return out

    postprocess_to_samples = staticmethod(CenterPoint.postprocess_to_samples)
