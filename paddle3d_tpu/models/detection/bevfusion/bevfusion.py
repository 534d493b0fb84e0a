"""BEVFusion (reference: paddle3d/models/detection/bevfusion/
bevf_faster_rcnn.py:55 BEVFFasterRCNN -> mvx_faster_rcnn.py:23 ->
mvx_two_stage.py:27 MVXTwoStageDetector).

Faithful BEVFFasterRCNN structure:
  * lidar stream: voxelize -> VFE -> scatter -> pts_backbone -> pts_neck
    (the lidar BEV is FULLY encoded before fusion, bevf_faster_rcnn.py:146)
  * camera stream: image backbone/neck -> LSS lift-splat (cam_stream_lss.py)
  * fusion: camera BEV resized onto the lidar BEV grid, channel concat ->
    3x3 reduc_conv -> optional SE_Block channel gate
    (bevf_faster_rcnn.py:199-213, :35 SE_Block)
  * camera depth supervision: KLD (or MSE) between the LSS depth
    distribution and a per-patch gaussian depth target built from the
    projected lidar scan (bevf_faster_rcnn.py:297 depth_dist_loss,
    bevfusion/utils.py:40 generate_guassian_depth_target)
  * freeze_img: the camera encoder trains with stopped gradients
    (bevf_faster_rcnn.py:135)
  * MVX two-stage hooks: optional `img_rpn_head` / `img_roi_head`
    components whose losses merge into training (mvx_two_stage.py:330
    forward_img_train). NOTE: no published reference config fills these
    slots and the reference repo registers no RPN/RoI 2D head classes —
    they are pass-through extension points, mirrored here with the same
    contract (head.loss(img_feats, batch) -> dict).

Either branch can be disabled (camera-only / lidar-only README variants).
"""
import jax
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


class SE_Block(nnx.Module):
    """Global-average channel gate (reference: bevf_faster_rcnn.py:35)."""

    def __init__(self, channels, rngs=None):
        self.fc = nnx.Linear(channels, channels, rngs=rngs)

    def __call__(self, x):
        """x [B, H, W, C]."""
        g = jax.nn.sigmoid(self.fc(jnp.mean(x, axis=(1, 2))))
        return x * g[:, None, None, :]


@manager.MODELS.add_component
class BEVFusion(BaseMultiViewModel):
    def __init__(self,
                 bbox_head=None,
                 test_cfg: dict = None,
                 point_cloud_range=None,
                 voxel_size=None,
                 lidar_voxelizer=None,
                 lidar_voxel_encoder=None,
                 lidar_middle_encoder=None,
                 pts_backbone=None,
                 pts_neck=None,
                 img_backbone=None,
                 img_neck=None,
                 img_view_transformer=None,
                 img_rpn_head=None,
                 img_roi_head=None,
                 fusion_channels: int = 256,
                 lidar_channels: int = 0,
                 camera_channels: int = 0,
                 se: bool = False,
                 freeze_img: bool = False,
                 camera_depth_range=None,
                 img_depth_loss_weight: float = 1.0,
                 img_depth_loss_method: str = "kld",
                 bev_backbone=None,
                 bev_neck=None,
                 target_assign_cfg: dict = None,
                 pretrained: str = None,
                 pts_voxel_layer: dict = None,
                 pts_voxel_encoder=None,
                 pts_middle_encoder=None,
                 pts_bbox_head=None,
                 camera_stream: bool = False,
                 lss: bool = False,
                 grid: float = 0.6,
                 num_views: int = 6,
                 final_dim=(900, 1600),
                 pc_range=(-50, -50, -5, 50, 50, 3),
                 downsample: int = 4,
                 imc: int = 256,
                 lic: int = 384,
                 rngs: nnx.Rngs = None,
                 **folded):
        rngs = rngs if rngs is not None else nnx.Rngs(0)
        # --- reference BEVFFasterRCNN surface translation ----------------
        # (configs/bevfusion/*.yaml): pts_voxel_layer dict -> HardVoxelizer;
        # camera_stream/grid/final_dim/downsample -> an LSS transformer on
        # this repo's bev_pool; load_*_from / freeze knobs arrive folded.
        del folded, lss
        if pts_voxel_layer is not None and lidar_voxelizer is None:
            from ...voxelizers import HardVoxelizer
            point_cloud_range = pts_voxel_layer.get("point_cloud_range",
                                                    point_cloud_range)
            voxel_size = pts_voxel_layer.get("voxel_size", voxel_size)
            lidar_voxelizer = HardVoxelizer(
                voxel_size, point_cloud_range,
                pts_voxel_layer.get("max_num_points_in_voxel", 32),
                pts_voxel_layer.get("max_num_voxels", (30000, 40000)))
        if pts_voxel_encoder is not None and lidar_voxel_encoder is None:
            lidar_voxel_encoder = pts_voxel_encoder
        if pts_middle_encoder is not None and lidar_middle_encoder is None:
            lidar_middle_encoder = pts_middle_encoder
        if pts_bbox_head is not None and bbox_head is None:
            bbox_head = pts_bbox_head
        if camera_stream and img_view_transformer is None:
            from ...transformers.bevdet_transformer import LSSViewTransformer
            d0, d1, dd = (camera_depth_range or (4.0, 45.0, 1.0))
            img_view_transformer = LSSViewTransformer(
                grid_config=dict(
                    x=[pc_range[0], pc_range[3], grid],
                    y=[pc_range[1], pc_range[4], grid],
                    z=[pc_range[2], pc_range[5],
                       pc_range[5] - pc_range[2]],
                    depth=[d0, d1, dd]),
                input_size=tuple(final_dim), downsample=downsample,
                in_channels=imc, out_channels=imc, rngs=rngs)
            camera_channels = camera_channels or imc
        if lidar_voxelizer is not None and lidar_channels == 0:
            lidar_channels = lic
            fusion_channels = lic
        self.lidar_voxelizer = lidar_voxelizer
        self.lidar_voxel_encoder = lidar_voxel_encoder
        self.lidar_middle_encoder = lidar_middle_encoder
        self.pts_backbone = pts_backbone
        self.pts_neck = pts_neck
        self.img_backbone = img_backbone
        self.img_neck = img_neck
        self.img_view_transformer = img_view_transformer
        self.img_rpn_head = img_rpn_head
        self.img_roi_head = img_roi_head
        self.bev_backbone = bev_backbone
        self.bev_neck = bev_neck
        self.bbox_head = bbox_head
        self.test_cfg = dict(test_cfg or {})
        self.pretrained = pretrained
        self.freeze_img = freeze_img
        self.camera_depth_range = (list(map(float, camera_depth_range))
                                   if camera_depth_range else None)
        self.img_depth_loss_weight = float(img_depth_loss_weight)
        self.img_depth_loss_method = img_depth_loss_method

        in_ch = lidar_channels + camera_channels
        self.fuse_conv = ConvBNReLU(in_ch, fusion_channels, 3, rngs=rngs)
        self.seblock = SE_Block(fusion_channels, rngs=rngs) if se else None

        self.anchor_mode = not hasattr(self.bbox_head, "tasks_cfg")
        if self.anchor_mode:
            self.target_generator = None
            return
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

    # -------------------------------------------------------------- streams
    def _lidar_bev(self, points, training):
        voxels, coords, num_points, vmask = self.lidar_voxelizer(
            points, training=training)
        feats = self.lidar_voxel_encoder(voxels, num_points, coords)
        feats = feats * vmask[..., None].astype(feats.dtype)
        x = self.lidar_middle_encoder(feats, coords, vmask)
        # the reference fully encodes the lidar BEV BEFORE fusion
        # (extract_pts_feat: middle -> backbone -> neck)
        if self.pts_backbone is not None:
            x = self.pts_backbone(x)
            if self.pts_neck is not None:
                x = self.pts_neck(x)
            if isinstance(x, (tuple, list)):
                x = x[0] if len(x) == 1 else jnp.concatenate(x, axis=-1)
        return x

    def _camera_feats(self, batch):
        """-> (img_feats [B,N,h,w,C], cam BEV [B,gy,gx,C'], depth)."""
        imgs = batch["img"]
        b, n, h, w, c = imgs.shape
        x = self.img_backbone(imgs.reshape(b * n, h, w, c))
        if self.img_neck is not None:
            x = self.img_neck(x)
        f = x[0] if isinstance(x, (tuple, list)) else x
        if self.freeze_img:
            f = jax.lax.stop_gradient(f)
        _, fh, fw, fc = f.shape
        img_feats = f.reshape(b, n, fh, fw, fc)
        bev, depth = self.img_view_transformer(
            img_feats, batch["rots"], batch["trans"],
            batch["cam2imgs"], batch["post_rots"], batch["post_trans"],
            batch["bda"])
        return img_feats, bev, depth

    def _fused_feats(self, batch, training):
        bevs = []
        img_feats = depth = None
        if self.lidar_voxelizer is not None and "data" in batch:
            bevs.append(self._lidar_bev(batch["data"], training))
        if self.img_view_transformer is not None and "img" in batch:
            img_feats, cam_bev, depth = self._camera_feats(batch)
            if bevs and cam_bev.shape[1:3] != bevs[0].shape[1:3]:
                cam_bev = jax.image.resize(
                    cam_bev, bevs[0].shape[:3] + (cam_bev.shape[-1],),
                    method="bilinear")
            bevs.append(cam_bev)
        fused = self.fuse_conv(jnp.concatenate(bevs, axis=-1))
        if self.seblock is not None:
            fused = self.seblock(fused)
        if self.bev_backbone is not None:
            feats = self.bev_backbone(fused)
            fused = self.bev_neck(feats) if self.bev_neck is not None else \
                feats[-1]
        return fused, img_feats, depth

    # ---------------------------------------------------------- depth loss
    def depth_dist_loss(self, depth_pred, img_depth):
        """depth_pred [B,N,h,w,D] softmax probs; img_depth [B,N,h,w,1+D]
        (channel 0 = patch min depth, 1: = gaussian target) — reference
        bevf_faster_rcnn.py:297."""
        d = depth_pred.shape[-1]
        min_depth = img_depth[..., 0]
        target = img_depth[..., 1:1 + d]
        lo, hi = self.camera_depth_range[0], self.camera_depth_range[1]
        mask = ((min_depth >= lo) & (min_depth <= hi)).reshape(-1)
        pred = depth_pred.reshape(-1, d)
        tgt = target.reshape(-1, d)
        mf = mask.astype(jnp.float32)[:, None]
        denom = jnp.maximum(jnp.sum(mf) * d, 1.0)
        if self.img_depth_loss_method == "mse":
            loss = jnp.sum(((pred - tgt) ** 2) * mf) / denom
        else:  # kld
            p = jnp.clip(pred, 1e-6, 1.0)
            t = jnp.clip(tgt, 0.0, 1.0)
            kld = t * (jnp.log(jnp.clip(t, 1e-6, 1.0)) - jnp.log(p))
            loss = jnp.sum(kld * mf) / denom
        return self.img_depth_loss_weight * loss

    # --------------------------------------------------------------- fwd
    def train_forward(self, batch) -> dict:
        feats, img_feats, depth = self._fused_feats(batch, training=True)
        preds = self.bbox_head(feats)
        gt_boxes = batch["gt_boxes"]
        gt_boxes = gt_boxes.at[..., 6].set(
            limit_period(gt_boxes[..., 6], 0.5, 2 * jnp.pi))
        if self.anchor_mode:
            losses = self.bbox_head.loss(preds, gt_boxes[..., :7],
                                         batch["gt_labels"])
            losses["loss"] = sum(losses.values())
        else:
            targets = self.target_generator(gt_boxes, batch["gt_labels"])
            losses = self.bbox_head.loss(preds, targets)
        if (depth is not None and self.camera_depth_range is not None and
                "img_depth" in batch):
            dl = self.depth_dist_loss(depth, batch["img_depth"])
            losses["img_depth_loss"] = dl
            losses["loss"] = losses["loss"] + dl
        # MVX image-branch hooks (mvx_two_stage.py:330 forward_img_train)
        for name, head in (("img_rpn", self.img_rpn_head),
                           ("img_roi", self.img_roi_head)):
            if head is not None and img_feats is not None:
                sub = head.loss(img_feats, batch)
                for k, v in sub.items():
                    if k == "loss":
                        losses["loss"] = losses["loss"] + v
                    else:
                        losses[f"{name}_{k}"] = v
        return losses

    def test_forward(self, batch) -> dict:
        feats, _, _ = self._fused_feats(batch, training=False)
        preds = self.bbox_head(feats)
        if self.anchor_mode:
            rois, scores, labels = self.bbox_head.proposals(preds)
            thr = float(self.test_cfg.get("score_threshold", 0.0))
            keep = scores > thr
            return {"box3d_lidar": rois,
                    "scores": jnp.where(keep, scores, -1.),
                    "label_preds": jnp.where(keep, labels, -1)}
        return self.bbox_head.predict(preds, self.test_cfg)

    postprocess_to_samples = staticmethod(CenterPoint.postprocess_to_samples)
