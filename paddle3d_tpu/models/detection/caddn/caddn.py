"""CADDN monocular 3D detector
(reference: paddle3d/models/detection/caddn/caddn.py:35 — FFE depth
distribution + F2V frustum-to-voxel + BEV net).

TPU-native composition: the frustum-to-voxel sampling (reference F2V
grid-sample) is expressed as the same scatter-add pooling as LSS
(ops.bev_pool): each (pixel, depth-bin) frustum cell carries
depth_prob x image_feature and lands in its BEV cell. Depth distributions
get explicit supervision from lidar-projected depth maps when provided.
"""
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np
from flax import nnx

from ....apis import manager
from ....ops.box_ops import limit_period
from ....ops.scatter import bev_pool
from ...base.base_model import BaseMonoModel
from ...layers.layer_libs import ConvBNReLU, uniform_bias_init, uniform_init
from ..centerpoint.centerpoint import CenterPoint
from ..centerpoint.centerpoint_target import CenterPointTargetGenerator

__all__ = ["CADDN"]


@manager.MODELS.add_component
class CADDN(BaseMonoModel):
    def __init__(self,
                 backbone=None,
                 bev_backbone=None,
                 bbox_head=None,
                 test_cfg: dict = None,
                 point_cloud_range: Sequence[float] = None,
                 voxel_size: Sequence[float] = None,
                 backbone_3d=None,
                 dense_head=None,
                 bev_cfg: dict = None,
                 ffe_cfg: dict = None,
                 f2v_cfg: dict = None,
                 disc_cfg: dict = None,
                 post_process_cfg: dict = None,
                 map_to_bev_cfg: dict = None,
                 depth_bins: int = 80,
                 depth_range: Sequence[float] = (2.0, 46.8),
                 depth_mode: str = "LID",
                 feat_channels: int = 64,
                 backbone_channels: int = 256,
                 downsample: int = 8,
                 image_size: Sequence[int] = (375, 1242),
                 depth_loss_weight: float = 3.0,
                 class_head=None,
                 target_assign_cfg: dict = None,
                 pretrained: str = None,
                 rngs: nnx.Rngs = None):
        rngs = rngs if rngs is not None else nnx.Rngs(0)
        # --- reference-YAML surface (configs/caddn/*.yml) translation ---
        # backbone_3d/dense_head/bev_cfg/ffe_cfg/f2v_cfg/disc_cfg map onto
        # this model's flat params; map_to_bev_cfg is folded by design (the
        # frustum pool collapses z by summation instead of a z-concat +
        # 1x1 conv). dense_head is the AnchorHeadSingle shim's Anchor3DHead
        # — anchor mode is detected by the absence of tasks_cfg below.
        if backbone_3d is not None:
            backbone = backbone_3d
        if dense_head is not None:
            bbox_head = dense_head
        if f2v_cfg:
            point_cloud_range = f2v_cfg.get("pc_range", point_cloud_range)
            voxel_size = f2v_cfg.get("voxel_size", voxel_size)
        if disc_cfg:
            depth_mode = disc_cfg.get("mode", depth_mode)
            depth_bins = disc_cfg.get("num_bins", depth_bins)
            depth_range = (disc_cfg.get("depth_min", depth_range[0]),
                           disc_cfg.get("depth_max", depth_range[1]))
        if ffe_cfg:
            cr = ffe_cfg.get("channel_reduce_cfg", {}) or {}
            backbone_channels = cr.get("in_channels", backbone_channels)
            feat_channels = cr.get("out_channels", feat_channels)
            downsample = ffe_cfg.get("downsample_factor", downsample)
            depth_loss_weight = (ffe_cfg.get("ddn_loss", {}) or {}).get(
                "weight", depth_loss_weight)
        if bev_cfg and bev_backbone is None:
            from ...backbones import SecondBackbone
            from ...necks import SecondFPN

            class _BEVNet(nnx.Module):
                def __init__(self, cfg, rngs):
                    self.net = SecondBackbone(
                        in_channels=cfg.get("input_channels", 64),
                        out_channels=list(cfg.get("num_filters",
                                                  (64, 128, 256))),
                        layer_nums=list(cfg.get("layer_nums", (10,) * 3)),
                        downsample_strides=list(
                            cfg.get("layer_strides", (2, 2, 2))),
                        rngs=rngs)
                    self.fpn = SecondFPN(
                        in_channels=list(cfg.get("num_filters",
                                                 (64, 128, 256))),
                        out_channels=list(cfg.get("num_upsample_filters",
                                                  (128,) * 3)),
                        upsample_strides=list(
                            cfg.get("upsample_strides", (1, 2, 4))),
                        rngs=rngs)

                def __call__(self, x):
                    return self.fpn(self.net(x))

            bev_backbone = _BEVNet(bev_cfg, rngs)
        if post_process_cfg and test_cfg is None:
            nmsc = post_process_cfg.get("nms_config", {}) or {}
            test_cfg = dict(
                score_threshold=post_process_cfg.get("score_thresh", 0.1),
                nms=dict(
                    nms_pre_max_size=nmsc.get("nms_pre_maxsize", 1024),
                    nms_post_max_size=min(
                        nmsc.get("nms_post_maxsize", 500), 500),
                    nms_iou_threshold=nmsc.get("nms_thresh", 0.01)))
        self.backbone = backbone
        # optional semantic camera branch (reference: the CADDN image
        # branch is an OCRNet/DeepLabV3 segmentation network whose
        # pre-logit features feed the FFE — heads/class_heads.py)
        self.class_head = class_head
        self.bev_backbone = bev_backbone
        self.bbox_head = bbox_head
        self.test_cfg = dict(test_cfg)
        self.pc_range = list(map(float, point_cloud_range))
        self.voxel_size = list(map(float, voxel_size))
        self.grid_size = [
            int(round((self.pc_range[i + 3] - self.pc_range[i]) /
                      self.voxel_size[i])) for i in range(3)
        ]
        self.depth_bins = depth_bins
        self.depth_range = tuple(map(float, depth_range))
        self.depth_mode = depth_mode
        self.downsample = downsample
        self.image_size = tuple(image_size)
        self.depth_loss_weight = depth_loss_weight
        self.feat_channels = feat_channels

        # FFE: depth logits (D+1, last = beyond-range) + channel reduce
        self.depth_head = nnx.Conv(
            backbone_channels, depth_bins + 1, kernel_size=(1, 1),
            kernel_init=uniform_init(),
            bias_init=uniform_bias_init(backbone_channels), rngs=rngs)
        self.chan_reduce = ConvBNReLU(backbone_channels, feat_channels, 3,
                                      rngs=rngs)

        # anchor mode (reference dense_head AnchorHeadSingle) vs this
        # repo's center-head mode
        self.anchor_mode = not hasattr(self.bbox_head, "tasks_cfg")
        if self.anchor_mode:
            self.target_generator = None
        else:
            ta = dict(target_assign_cfg or {})
            self.target_generator = CenterPointTargetGenerator(
                tasks=self.bbox_head.tasks_cfg,
                down_ratio=ta.get("down_ratio", 1),
                point_cloud_range=self.pc_range,
                voxel_size=self.voxel_size,
                gaussian_overlap=ta.get("gaussian_overlap", 0.1),
                max_objs=ta.get("max_objs", 100),
                min_radius=ta.get("min_radius", 2),
                with_velocity=self.bbox_head.with_velocity)

    def _bin_depths(self):
        """LID depth-bin edges (reference F2V LID discretization)."""
        d0, d1 = self.depth_range
        i = jnp.arange(self.depth_bins, dtype=jnp.float32)
        if self.depth_mode == "LID":
            bin_size = 2 * (d1 - d0) / (self.depth_bins *
                                        (1 + self.depth_bins))
            return d0 + bin_size / 2 * (i * (i + 1) + i + 1) / 1
        return d0 + (d1 - d0) * (i + 0.5) / self.depth_bins

    def _frustum_to_bev(self, feats, depth_prob, lidar2img_inv):
        """feats [B, h, w, C]; depth_prob [B, h, w, D];
        lidar2img_inv [B, 4, 4] (image pixel+depth -> lidar)."""
        b, h, w, c = feats.shape
        d = self.depth_bins
        depths = self._bin_depths()  # [D]
        h_in, w_in = self.image_size
        us = jnp.linspace(0, w_in - 1, w)
        vs = jnp.linspace(0, h_in - 1, h)
        uu, vv = jnp.meshgrid(us, vs, indexing="xy")  # [h, w]
        # homogeneous image points at each depth: (u*z, v*z, z, 1)
        pts = jnp.stack([
            uu[None] * depths[:, None, None],
            vv[None] * depths[:, None, None],
            jnp.broadcast_to(depths[:, None, None], (d, h, w)),
            jnp.ones((d, h, w)),
        ], axis=-1)  # [D, h, w, 4]
        xyz = jnp.einsum("bij,dhwj->bdhwi", lidar2img_inv, pts)[..., :3]
        lo = jnp.asarray(self.pc_range[:3])
        vsz = jnp.asarray(self.voxel_size)
        vox = jnp.floor((xyz - lo) / vsz).astype(jnp.int32)
        gx, gy, gz = self.grid_size
        valid = ((vox[..., 0] >= 0) & (vox[..., 0] < gx) &
                 (vox[..., 1] >= 0) & (vox[..., 1] < gy) &
                 (vox[..., 2] >= 0) & (vox[..., 2] < gz))
        rank = vox[..., 1] * gx + vox[..., 0]

        # factored pooling (see ops/scatter.bev_pool_sorted): the
        # outer-product + scatter-add form fuses the [B·D·h·w, C] product
        # into XLA's serialized scatter lowering (35.9 ms of the 56.9 ms
        # frame, profiler trace) — sort scalar payloads instead and
        # rebuild rows from the per-pixel feature table
        from ....ops.scatter import bev_pool_sorted
        b = feats.shape[0]
        depth_b = depth_prob.transpose(0, 3, 1, 2)      # [B, D, h, w]
        feat_tab = feats.reshape(b, h * w, c)
        pix = jnp.broadcast_to(
            jnp.arange(h * w, dtype=jnp.int32).reshape(1, 1, h, w),
            (b, d, h, w)).reshape(b, -1)
        rank_b = jnp.broadcast_to(rank[:, None] if rank.ndim == 3 else rank,
                                  (b, d, h, w)).reshape(b, -1)
        valid_b = jnp.broadcast_to(
            valid[:, None] if valid.ndim == 3 else valid,
            (b, d, h, w)).reshape(b, -1)
        bev = bev_pool_sorted(feat_tab, pix, depth_b.reshape(b, -1),
                              rank_b, valid_b, gy * gx)
        return bev.reshape(b, gy, gx, c)

    def _forward_bev(self, batch):
        img = batch["data"] / 255.0
        feats = self.backbone(img)
        if self.class_head is not None:
            f = self.class_head.features(feats)
        else:
            f = feats[0] if isinstance(feats, (tuple, list)) else feats
        depth_logits = self.depth_head(f)
        depth_prob = jax.nn.softmax(depth_logits, axis=-1)[..., :-1]
        reduced = self.chan_reduce(f)
        bev = self._frustum_to_bev(reduced, depth_prob,
                                   batch["img2lidars"])
        return self.bev_backbone(bev), depth_logits

    def train_forward(self, batch) -> dict:
        feats, depth_logits = self._forward_bev(batch)
        if isinstance(feats, (tuple, list)):
            feats = feats[-1]
        preds = self.bbox_head(feats)
        gt_boxes = batch["gt_boxes"]
        gt_boxes = gt_boxes.at[..., 6].set(
            limit_period(gt_boxes[..., 6], 0.5, 2 * jnp.pi))
        if self.anchor_mode:
            losses = self.bbox_head.loss(preds, gt_boxes,
                                         batch["gt_labels"])
            losses["loss"] = sum(losses.values())
        else:
            targets = self.target_generator(gt_boxes, batch["gt_labels"])
            losses = self.bbox_head.loss(preds, targets)

        # explicit depth supervision (reference FFE DDN loss) when the
        # dataloader provides a lidar-projected depth map [B, h, w]
        if "depth_map" in batch:
            tgt = self._depth_to_bin(batch["depth_map"])
            logp = jax.nn.log_softmax(depth_logits, axis=-1)
            nll = -jnp.take_along_axis(logp, tgt[..., None],
                                       axis=-1)[..., 0]
            depth_loss = jnp.mean(nll) * self.depth_loss_weight
            losses["loss_depth"] = depth_loss
            losses["loss"] = losses["loss"] + depth_loss
        return losses

    def _depth_to_bin(self, depth_map):
        d0, d1 = self.depth_range
        d = self.depth_bins
        x = depth_map
        if self.depth_mode == "LID":
            bin_size = 2 * (d1 - d0) / (d * (1 + d))
            idx = (-0.5 + 0.5 * jnp.sqrt(1 + 8 * (x - d0) / bin_size))
        else:
            idx = (x - d0) / ((d1 - d0) / d)
        idx = jnp.where((x < d0) | (x > d1), d, idx)
        return jnp.clip(idx, 0, d).astype(jnp.int32)

    def test_forward(self, batch) -> dict:
        feats, _ = self._forward_bev(batch)
        if isinstance(feats, (tuple, list)):
            feats = feats[-1]
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
