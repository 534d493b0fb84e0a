"""RTEBev (reference: paddle3d/models/detection/rtebev/rtebev.py:590).

Real-time BEV detector, faithful to the reference design:
  * multi-camera images -> backbone/neck -> MS-depth-supervised LSS lift
    (MSLSSViewTransformerBEVDepth, bevdet_transformer.py:748)
  * multi-frame temporal fusion: the current BEV is concatenated with
    `num_adj` adjacent-frame BEVs (rtebev.py:802 extract_img_feat loops
    frames; ego alignment is composed into the per-frame camera matrices by
    the dataset, so no feature-space shift is needed here)
  * optional per-frame pre_process net (rtebev.py:641)
  * CustomResNet + FPN_LSS BEV encoder
  * RTEBevHead: hybrid one2one/one2many NMS-free query decoder
    (rtebev_head.py:43)

TPU-native: frames fold into one batched backbone call (B*(F+1)*N images in
a single conv program); adjacent frames run under stop_gradient (the
reference computes them sequentially without re-backprop); everything is
fixed-shape.
"""
import jax
import jax.numpy as jnp
import numpy as np
from flax import nnx

from ....apis import manager
from ....ops.box_ops import limit_period
from ...base.base_model import BaseMultiViewModel
from ..petr.petr3d import PETR

__all__ = ["RTEBev"]


@manager.MODELS.add_component
class RTEBev(BaseMultiViewModel):
    def __init__(self,
                 img_backbone,
                 img_neck,
                 img_view_transformer,
                 img_bev_encoder_backbone,
                 img_bev_encoder_neck,
                 pts_bbox_head=None,
                 bbox_head=None,
                 pre_process=None,
                 num_adj: int = 0,
                 use_depth: bool = False,
                 use_ms_depth: bool = False,
                 start_temporal_epoch: int = None,
                 align_after_view_transfromation: bool = False,
                 test_cfg: dict = None,
                 pretrained: str = None):
        self.img_backbone = img_backbone
        self.img_neck = img_neck
        self.img_view_transformer = img_view_transformer
        self.img_bev_encoder_backbone = img_bev_encoder_backbone
        self.img_bev_encoder_neck = img_bev_encoder_neck
        self.bbox_head = pts_bbox_head if pts_bbox_head is not None else \
            bbox_head
        self.pre_process_net = pre_process
        self.num_adj = int(num_adj)
        self.num_frame = self.num_adj + 1
        self.use_depth = use_depth
        self.use_ms_depth = use_ms_depth
        self.start_temporal_epoch = start_temporal_epoch
        self.align_after_view_transfromation = align_after_view_transfromation
        self.test_cfg = dict(test_cfg or {})
        self.pretrained = pretrained

    # ------------------------------------------------------------- encoders
    def _image_feats(self, imgs):
        """imgs [B, N, H, W, 3] -> list of [B, N, h_i, w_i, C] levels."""
        b, n, h, w, c = imgs.shape
        x = self.img_backbone(imgs.reshape(b * n, h, w, c))
        if self.img_neck is not None:
            x = self.img_neck(x)
        feats = list(x) if isinstance(x, (tuple, list)) else [x]
        return [f.reshape((b, n) + f.shape[1:]) for f in feats]

    def _frame_bev(self, imgs, rots, trans, cam2imgs, post_rots, post_trans,
                   bda):
        """One frame's images -> (bev [B,gy,gx,C], depth)."""
        feats = self._image_feats(imgs)
        vt_in = feats[:3] if self.use_ms_depth else feats[0]
        bev, depth = self.img_view_transformer(
            vt_in, rots, trans, cam2imgs, post_rots, post_trans, bda)
        if self.pre_process_net is not None:
            out = self.pre_process_net(bev)
            bev = out[0] if isinstance(out, (tuple, list)) else out
        return bev, depth

    def _multi_frame_bev(self, batch):
        """Current + num_adj adjacent frames, channel-concatenated.
        Adjacent inputs: img_adj [B,F,N,H,W,3] (or [B,N,H,W,3] for F=1)
        with rots_adj/trans_adj composed into the current lidar frame by
        the dataset (reference prepare_inputs)."""
        bev, depth = self._frame_bev(
            batch["img"], batch["rots"], batch["trans"], batch["cam2imgs"],
            batch["post_rots"], batch["post_trans"], batch["bda"])
        if self.num_adj == 0:
            return bev, depth
        bevs = [bev]
        bev_adj = batch.get("bev_adj")
        if bev_adj is not None:
            # deploy protocol: history BEV features are computed once per
            # frame and fed back as inputs — the reference's timed TRT
            # engine takes feat_prev as an input tensor
            # (deploy/rtebev/python/infer_mf_paddletrt.py:216-264), so the
            # per-frame cost excludes re-encoding adjacent frames.
            # CONTRACT: bev_adj must already be ego-motion aligned into the
            # current frame by the caller (the reference host-side
            # shift_feature step); features are concatenated as-is here.
            if bev_adj.ndim == 4:
                bev_adj = bev_adj[:, None]
            for f in range(self.num_adj):
                fi = min(f, bev_adj.shape[1] - 1)
                bevs.append(jax.lax.stop_gradient(bev_adj[:, fi]))
            return jnp.concatenate(bevs, axis=-1), depth
        img_adj = batch.get("img_adj")
        if img_adj is None:
            # first-frame fallback: repeat the current BEV (reference
            # forward_test pads with the key frame when history is absent)
            bevs.extend([jax.lax.stop_gradient(bev)] * self.num_adj)
        else:
            if img_adj.ndim == 5:  # single adjacent frame, no frame axis
                img_adj = img_adj[:, None]
            rots_adj = batch["rots_adj"]
            trans_adj = batch["trans_adj"]
            if rots_adj.ndim == 4:
                rots_adj = rots_adj[:, None]
                trans_adj = trans_adj[:, None]
            f_have = img_adj.shape[1]
            for f in range(self.num_adj):
                fi = min(f, f_have - 1)
                bev_f, _ = self._frame_bev(
                    jax.lax.stop_gradient(img_adj[:, fi]),
                    rots_adj[:, fi], trans_adj[:, fi], batch["cam2imgs"],
                    batch["post_rots"], batch["post_trans"], batch["bda"])
                bevs.append(jax.lax.stop_gradient(bev_f))
        return jnp.concatenate(bevs, axis=-1), depth

    def extract_feat(self, batch):
        bev, depth = self._multi_frame_bev(batch)
        x = self.img_bev_encoder_backbone(bev)
        x = self.img_bev_encoder_neck(x)
        if isinstance(x, (tuple, list)):
            x = x[0]
        return x, depth

    # --------------------------------------------------------------- fwd
    def train_forward(self, batch) -> dict:
        feats, depth = self.extract_feat(batch)
        all_cls, all_bbox = self.bbox_head(feats, training=True)
        gt_boxes = batch["gt_boxes"]
        # bottom-z -> center-z for the set loss (reference LiDARInstance3DBoxes
        # gravity_center), yaw wrapped
        gt_boxes = gt_boxes.at[..., 2].add(gt_boxes[..., 5] / 2.)
        gt_boxes = gt_boxes.at[..., 6].set(
            limit_period(gt_boxes[..., 6], 0.5, 2 * jnp.pi))
        losses = self.bbox_head.loss(all_cls, all_bbox, gt_boxes,
                                     batch["gt_labels"])
        if self.use_depth and "gt_depth" in batch:
            dl = self.img_view_transformer.get_depth_loss(
                batch["gt_depth"], depth)
            losses["loss_depth"] = dl
            losses["loss"] = losses["loss"] + dl
        return losses

    def test_forward(self, batch) -> dict:
        feats, _ = self.extract_feat(batch)
        all_cls, all_bbox = self.bbox_head(feats, training=False)
        return self.bbox_head.predict(
            all_cls, all_bbox,
            score_threshold=self.test_cfg.get("score_threshold", 0.0))

    def export_forward(self, batch) -> dict:
        return self.test_forward(batch)

    postprocess_to_samples = staticmethod(PETR.postprocess_to_samples)
