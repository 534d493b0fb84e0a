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

    def _camera_bev(self, imgs, rots, trans, cam2imgs, post_rots,
                    post_trans, bda):
        b, n, h, w, c = imgs.shape
        x = self.img_backbone(imgs.reshape(b * n, h, w, c))
        if self.img_neck is not None:
            x = self.img_neck(x)
        f = x[0] if isinstance(x, (tuple, list)) else x
        _, fh, fw, fc = f.shape
        return self.img_view_transformer(
            f.reshape(b, n, fh, fw, fc), rots, trans, cam2imgs, post_rots,
            post_trans, bda)

    def _temporal_bev(self, bev, batch):
        """BEVDet4D fusion: concat the previous frame's BEV. Sources, in
        order: explicit `prev_bev` state (video inference), adjacent-frame
        images `img_adj` whose cam->lidar matrices are ALREADY composed
        into the current lidar frame (the dataset does the ego-motion
        alignment — no feature-space shift needed, reference bevdet4d.py
        shift_feature), else the current bev (first frame)."""
        import jax
        if "prev_bev" in batch:
            prev = batch["prev_bev"]
        elif "img_adj" in batch:
            prev, _ = jax.lax.stop_gradient(self._camera_bev(
                batch["img_adj"], batch["rots_adj"], batch["trans_adj"],
                batch["cam2imgs"], batch["post_rots"], batch["post_trans"],
                batch["bda"]))
        else:
            prev = jax.lax.stop_gradient(bev)
        return jnp.concatenate([bev, prev], axis=-1)

    def extract_bev(self, batch):
        bev, depth = self._camera_bev(
            batch["img"], batch["rots"], batch["trans"], batch["cam2imgs"],
            batch["post_rots"], batch["post_trans"], batch["bda"])
        if self.temporal:
            bev = self._temporal_bev(bev, batch)
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
