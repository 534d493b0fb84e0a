"""PETR multi-view 3D detector
(reference: paddle3d/models/detection/petr/petr3d.py:117).

Batch contract (fixed shapes):
    img:        [B, N_cam, H, W, 3]
    img2lidars: [B, N_cam, 4, 4] — lidar <- normalized-image-frustum
    gt_boxes:   [B, G, 7|9] bottom-z lidar boxes (+vx, vy)
    gt_labels:  [B, G] (-1 padded)
"""
import jax.numpy as jnp
import numpy as np

from ....apis import manager
from ....geometries import BBoxes3D, CoordMode
from ....sample import Sample
from ...base.base_model import BaseMultiViewModel

__all__ = ["PETR"]


@manager.MODELS.add_component
class PETR(BaseMultiViewModel):
    """PETR v1; `version=2` enables PETRv2's temporal mode
    (reference petr3d.py handles both): the previous frame's images ride as
    extra camera views whose img2lidar matrices already encode the ego
    motion, and a per-frame time embedding is added to the tokens."""

    def __init__(self, backbone=None, neck=None, head=None, seg_head=None,
                 use_grid_mask: bool = False, version: int = None,
                 dn_config: dict = None, pretrained: str = None,
                 pts_bbox_head=None, img_backbone=None, img_neck=None):
        # reference CAPE configs name the camera encoder img_backbone/
        # img_neck (petr configs say backbone/neck)
        self.backbone = backbone if backbone is not None else img_backbone
        self.neck = neck if neck is not None else img_neck
        head = head if head is not None else pts_bbox_head
        if isinstance(head, dict):
            # PETRHeadseg spec (reference petr_head_seg.py: det + num_lane
            # seg queries in one head) -> det PETRHead + PETRSegHead pair
            from ...heads.petr_head import PETRHead
            from ...heads.petr_seg_head import PETRSegHead
            spec = {k: v for k, v in head.items() if k != "type"}
            num_lane = int(spec.pop("num_lane", 256))
            patch = 16
            side = int(round(num_lane ** 0.5)) * patch
            seg_spec = {k: v for k, v in spec.items()
                        if k not in ("num_query", "num_classes")}
            head = PETRHead(**spec)
            if seg_head is None:
                seg_head = PETRSegHead(num_classes=3,
                                       bev_size=(side, side),
                                       patch_size=patch, **seg_spec)
        # reference Petr3D configs mark v2 on the HEAD (with_time: true)
        # and denoising via with_denoise/scalar/noise_scale
        if version is None:
            version = 2 if getattr(head, "with_time", False) else 1
        if dn_config is None and getattr(head, "with_denoise", False):
            dn_config = dict(head.dn_params)
        self.head = head
        self.seg_head = seg_head  # PETRv2 BEV segmentation (petr_head_seg)
        self.use_grid_mask = use_grid_mask
        self.version = version
        self.pretrained = pretrained
        # query-denoising training (reference: cape_dn_head.py:47, PETRv2
        # "+dn" configs) — None disables
        self.dn_cfg = None
        if dn_config is not None:
            from flax import nnx as _nnx

            from ...heads.denoising import DenoisingConfig
            self.dn_cfg = DenoisingConfig(**dn_config)
            self.dn_rngs = _nnx.Rngs(denoise=0)
        if version >= 2:
            from flax import nnx
            import jax
            rngs = nnx.Rngs(0)
            self.time_embed = nnx.Param(
                jax.random.normal(rngs.params(),
                                  (2, head.embed_dims)) * 0.02)

    def _extract_feats(self, imgs):
        b, n, h, w, c = imgs.shape
        x = imgs.reshape(b * n, h, w, c)
        feats = self.backbone(x)
        if self.neck is not None:
            feats = self.neck(feats)
        f = feats[0]  # use the first (highest-res) level like PETR v1
        _, fh, fw, fc = f.shape
        f = f.reshape(b, n, fh, fw, fc)
        if self.version >= 2:
            # first half of the views = current frame, second = previous
            half = n // 2
            te = self.time_embed[...]
            f = jnp.concatenate([
                f[:, :half] + te[0][None, None, None, None, :f.shape[-1]],
                f[:, half:] + te[1][None, None, None, None, :f.shape[-1]],
            ], axis=1) if f.shape[-1] <= te.shape[-1] else f
        return f

    def train_forward(self, batch) -> dict:
        feats = self._extract_feats(batch["img"])
        gt_boxes = batch["gt_boxes"]
        # bottom-z -> center-z for the set-matching targets
        gt_boxes = gt_boxes.at[..., 2].add(gt_boxes[..., 5] / 2)
        dn_meta = dn_ref = attn_mask = None
        if self.dn_cfg is not None:
            from ...heads.denoising import build_dn_queries, dn_attn_mask
            dn_meta = build_dn_queries(
                self.dn_rngs.denoise(), gt_boxes, batch["gt_labels"],
                self.head.num_classes, self.head.pc_range, self.dn_cfg)
            dn_ref = dn_meta["ref"]
            attn_mask = dn_attn_mask(self.head.num_query,
                                     dn_meta["groups"],
                                     dn_meta["group_size"])
        head_kwargs = {}
        if getattr(self.head, "wants_lidar2cams", False) and \
                "lidar2cams" in batch:
            head_kwargs["lidar2cams"] = batch["lidar2cams"]
        all_cls, all_bbox = self.head(feats, batch["img2lidars"],
                                      dn_ref=dn_ref, attn_mask=attn_mask,
                                      **head_kwargs)
        losses = self.head.loss(all_cls, all_bbox, gt_boxes,
                                batch["gt_labels"], dn_meta=dn_meta)
        if self.seg_head is not None and "gt_semantic_map" in batch:
            seg_logits = self.seg_head(feats, batch["img2lidars"])
            seg_losses = self.seg_head.loss(seg_logits,
                                            batch["gt_semantic_map"])
            losses["loss"] = losses["loss"] + seg_losses.pop("loss_seg")
            losses.update(seg_losses)
        return losses

    def test_forward(self, batch) -> dict:
        feats = self._extract_feats(batch["img"])
        head_kwargs = {}
        if getattr(self.head, "wants_lidar2cams", False) and \
                "lidar2cams" in batch:
            head_kwargs["lidar2cams"] = batch["lidar2cams"]
        all_cls, all_bbox = self.head(feats, batch["img2lidars"],
                                      **head_kwargs)
        out = self.head.predict(all_cls, all_bbox)
        if self.seg_head is not None:
            seg_logits = self.seg_head(feats, batch["img2lidars"])
            out.update(self.seg_head.predict(seg_logits))
        return out

    @staticmethod
    def postprocess_to_samples(outputs: dict, metas: list) -> list:
        boxes = np.asarray(outputs["box3d_lidar"])
        scores = np.asarray(outputs["scores"])
        labels = np.asarray(outputs["label_preds"])
        results = []
        for i, meta in enumerate(metas):
            valid = scores[i] >= 0
            s = Sample(path=meta.get("path"), modality="multiview")
            b = boxes[i][valid]
            s.bboxes_3d = BBoxes3D(
                b[:, :7], origin=[.5, .5, 0.],
                coordmode=CoordMode.NuScenesLidar, rot_axis=2)
            if b.shape[-1] >= 9:
                s.bboxes_3d.velocities = b[:, 7:9]
            s.labels = labels[i][valid]
            s.confidences = scores[i][valid]
            if "seg_probs" in outputs:
                s.pred_semantic_map = np.asarray(outputs["seg_probs"][i])
            s.meta.update(
                {k: v for k, v in meta.items() if k not in ("path",)})
            results.append(s)
        return results
