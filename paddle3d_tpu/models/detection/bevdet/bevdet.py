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
                 bbox_head=None,
                 pts_bbox_head=None,
                 pre_process=None,
                 test_cfg: dict = None,
                 target_assign_cfg: dict = None,
                 temporal: bool = False,
                 num_adj: int = None,
                 align_after_view_transfromation: bool = False,
                 start_temporal_epoch: int = None,
                 use_depth: bool = False,
                 pretrained: str = None):
        self.img_backbone = img_backbone
        self.img_neck = img_neck
        self.img_view_transformer = img_view_transformer
        self.img_bev_encoder_backbone = img_bev_encoder_backbone
        self.img_bev_encoder_neck = img_bev_encoder_neck
        self.bbox_head = bbox_head if bbox_head is not None else \
            pts_bbox_head
        self.pre_process_net = pre_process
        # reference BEVDet4D surface: num_adj adjacent frames concatenated
        # (bevdet4d.py num_adj); `temporal: True` == num_adj 1
        self.num_adj = int(num_adj) if num_adj is not None else \
            (1 if temporal else 0)
        self.temporal = self.num_adj > 0
        self.start_temporal_epoch = start_temporal_epoch
        self.align_after_view_transfromation = align_after_view_transfromation
        self.use_depth = use_depth
        self.test_cfg = dict(test_cfg or {})
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
        bev, depth = self.img_view_transformer(
            f.reshape(b, n, fh, fw, fc), rots, trans, cam2imgs, post_rots,
            post_trans, bda)
        if self.pre_process_net is not None:
            out = self.pre_process_net(bev)
            bev = out[0] if isinstance(out, (tuple, list)) else out
        return bev, depth

    def _temporal_bev(self, bev, batch):
        """BEVDet4D fusion: concat `num_adj` previous frames' BEVs.
        Sources, in order: explicit `prev_bev` state (video inference),
        adjacent-frame images `img_adj` [B,(F,)N,H,W,3] whose cam->lidar
        matrices are ALREADY composed into the current lidar frame (the
        dataset does the ego-motion alignment — no feature-space shift
        needed, reference bevdet4d.py shift_feature), else the current bev
        repeated (first frame)."""
        import jax
        if "prev_bev" in batch:
            prev = batch["prev_bev"]
            frames = ([prev] if prev.shape[-1] == bev.shape[-1] *
                      self.num_adj else [prev] * self.num_adj)
        elif "img_adj" in batch:
            img_adj = batch["img_adj"]
            rots_adj = batch["rots_adj"]
            trans_adj = batch["trans_adj"]
            if img_adj.ndim == 5:
                img_adj = img_adj[:, None]
                rots_adj = rots_adj[:, None]
                trans_adj = trans_adj[:, None]
            f_have = img_adj.shape[1]
            frames = []
            for f in range(self.num_adj):
                fi = min(f, f_have - 1)
                bev_f, _ = self._camera_bev(
                    jax.lax.stop_gradient(img_adj[:, fi]),
                    rots_adj[:, fi], trans_adj[:, fi], batch["cam2imgs"],
                    batch["post_rots"], batch["post_trans"], batch["bda"])
                frames.append(jax.lax.stop_gradient(bev_f))
        else:
            frames = [jax.lax.stop_gradient(bev)] * self.num_adj
        return jnp.concatenate([bev] + frames, axis=-1)

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
        losses = self.bbox_head.loss(preds, targets)
        if (self.use_depth or hasattr(self.img_view_transformer,
                                      "loss_depth_weight")) and \
                "gt_depth" in batch:
            dl = self.img_view_transformer.get_depth_loss(
                batch["gt_depth"], depth)
            losses["loss_depth"] = dl
            losses["loss"] = losses["loss"] + dl
        return losses

    def test_forward(self, batch) -> dict:
        feats, bev, _ = self.extract_bev(batch)
        preds = self.bbox_head(feats)
        out = self.bbox_head.predict(preds, self.test_cfg)
        out["bev_feature"] = bev  # carried state for BEVDet4D video mode
        return out

    postprocess_to_samples = staticmethod(CenterPoint.postprocess_to_samples)
