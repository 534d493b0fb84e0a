"""DD3D monocular FCOS-style detector
(reference: paddle3d/models/detection/dd3d/dd3d.py:33 with FCOS2D/FCOS3D
heads, models/heads/fcos_heads/fcos2d_head.py / fcos3d_head.py:112,300,483).

Compact TPU-native formulation: shared conv towers over FPN levels predict
per-pixel (cls, centerness, 2D ltrb, depth, 3D-center offset, dims,
orientation); FCOS assignment (point-in-2D-box + per-level size ranges) is
computed on device from padded camera-frame gt; inference is heatmap-free
top-k over all level pixels.
"""
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np
from flax import nnx

from ....apis import manager
from ....sample import Sample
from ...base.base_model import BaseMonoModel
from ...layers.layer_libs import uniform_bias_init, uniform_init
from ...losses.weighted_loss import sigmoid_focal_loss, smooth_l1_loss

__all__ = ["DD3D"]


def _conv_gn_relu(cin, cout, *, rngs):
    return nnx.Sequential(
        nnx.Conv(cin, cout, kernel_size=(3, 3), padding="SAME",
                 use_bias=False, kernel_init=uniform_init(), rngs=rngs),
        nnx.GroupNorm(cout, num_groups=min(32, cout), rngs=rngs), nnx.relu)


@manager.MODELS.add_component
class DD3D(BaseMonoModel):
    def __init__(self,
                 backbone,
                 neck=None,
                 num_classes: int = 3,
                 in_channels: int = 256,
                 feat_channels: int = 128,
                 num_convs: int = 2,
                 strides: Sequence[int] = (8, 16, 32),
                 size_ranges: Sequence[Sequence[float]] = ((0, 64),
                                                           (64, 128),
                                                           (128, 1e8)),
                 depth_ref: Sequence[float] = (28.01, 16.32),
                 dim_ref=((3.88, 1.63, 1.53), (0.84, 1.76, 0.66),
                          (1.76, 1.73, 0.6)),
                 max_detection: int = 100,
                 score_threshold: float = 0.2,
                 pretrained: str = None,
                 fpn=None,
                 fcos2d_head: dict = None,
                 fcos3d_head: dict = None,
                 fcos2d_loss: dict = None,
                 fcos3d_loss: dict = None,
                 fcos2d_inference: dict = None,
                 fcos3d_inference: dict = None,
                 feature_locations_offset: str = None,
                 prepare_targets: dict = None,
                 rngs: nnx.Rngs = None):
        # reference-YAML surface (configs/dd3d/*.yml): the FCOS2D/3D
        # head/loss/inference sub-components are folded into this model's
        # shared tower design — their specs translate the overlapping knobs
        del feature_locations_offset, prepare_targets
        if fpn is not None and neck is None:
            neck = fpn
        if isinstance(fcos2d_head, dict):
            num_classes = fcos2d_head.get("num_classes", num_classes)
            strides3 = fcos2d_head.get("in_strides", None)
            if strides3:
                strides = list(strides3)[:len(strides)] if \
                    len(strides3) >= len(strides) else strides
            chans = fcos2d_head.get("in_channels")
            if chans:
                in_channels = chans[0]
            num_convs = fcos2d_head.get("num_cls_convs", num_convs)
        del fcos3d_head  # per-level depth refs folded into depth_scales
        if isinstance(fcos2d_inference, dict):
            score_threshold = fcos2d_inference.get("pre_nms_thresh",
                                                   score_threshold)
            max_detection = fcos2d_inference.get("post_nms_topk",
                                                 max_detection)
        del fcos2d_loss, fcos3d_loss, fcos3d_inference  # folded losses
        rngs = rngs if rngs is not None else nnx.Rngs(0)
        self.backbone = backbone
        self.neck = neck
        self.num_classes = num_classes
        self.strides = tuple(strides)
        self.size_ranges = tuple(tuple(r) for r in size_ranges)
        self.depth_ref = tuple(map(float, depth_ref))
        self.dim_ref = jnp.asarray(dim_ref, jnp.float32)
        self.max_detection = max_detection
        self.score_threshold = score_threshold
        self.pretrained = pretrained

        towers = []
        c = in_channels
        for _ in range(num_convs):
            towers.append(_conv_gn_relu(c, feat_channels, rngs=rngs))
            c = feat_channels
        self.tower = nnx.List(towers)

        def head(cout, bias=0.0):
            return nnx.Conv(feat_channels, cout, kernel_size=(3, 3),
                            padding="SAME", kernel_init=uniform_init(),
                            bias_init=nnx.initializers.constant(bias),
                            rngs=rngs)

        self.cls_head = head(num_classes, bias=-2.19)
        self.ctr_head = head(1)
        self.box2d_head = head(4)
        # 3D: depth 1, offset 2, dims 3, ori(sin,cos) 2
        self.box3d_head = head(8)
        # per-level learnable depth scales (reference fcos3d scale params)
        self.depth_scales = nnx.Param(jnp.ones((len(strides),)))

    def _forward_levels(self, img):
        feats = self.backbone(img)
        if self.neck is not None:
            feats = self.neck(feats)
        outs = []
        for lvl, f in enumerate(feats[:len(self.strides)]):
            x = f
            for layer in self.tower:
                x = layer(x)
            depth_scale = self.depth_scales[lvl]
            b3d = self.box3d_head(x)
            outs.append({
                "cls": self.cls_head(x),
                "ctr": self.ctr_head(x),
                "box2d": jax.nn.softplus(self.box2d_head(x)) *
                self.strides[lvl],
                "depth": b3d[..., 0] * self.depth_ref[1] * depth_scale +
                self.depth_ref[0],
                "offset": b3d[..., 1:3],
                "dims": b3d[..., 3:6],
                "ori": b3d[..., 6:8],
                "stride": self.strides[lvl],
            })
        return outs

    # ----------------------------------------------------------------- train
    def train_forward(self, batch) -> dict:
        img = batch["data"] / 255.0
        gt2d = batch["gt_boxes_2d"]     # [B, G, 4] x1y1x2y2 (input pixels)
        gt3d = batch["gt_boxes_cam"]    # [B, G, 7] x,y,z,h,w,l,ry
        gt_labels = batch["gt_labels"]  # [B, G] (-1 pad)
        outs = self._forward_levels(img)

        total_cls = total_box = total_ctr = total_3d = 0.
        for lvl, out in enumerate(outs):
            b, h, w, _ = out["cls"].shape
            stride = out["stride"]
            ys = (jnp.arange(h) + 0.5) * stride
            xs = (jnp.arange(w) + 0.5) * stride
            py, px = jnp.meshgrid(ys, xs, indexing="ij")
            lo, hi = self.size_ranges[lvl]

            def assign_one(g2d, g3d, gl):
                l = px[None] - g2d[:, None, None, 0]
                t = py[None] - g2d[:, None, None, 1]
                r = g2d[:, None, None, 2] - px[None]
                btm = g2d[:, None, None, 3] - py[None]
                ltrb = jnp.stack([l, t, r, btm], axis=-1)  # [G,h,w,4]
                inside = jnp.min(ltrb, axis=-1) > 0
                max_reg = jnp.max(ltrb, axis=-1)
                in_range = (max_reg >= lo) & (max_reg <= hi)
                valid = inside & in_range & (gl >= 0)[:, None, None]
                area = ((g2d[:, 2] - g2d[:, 0]) *
                        (g2d[:, 3] - g2d[:, 1]))[:, None, None]
                area = jnp.where(valid, area, 1e10)
                gi = jnp.argmin(area, axis=0)  # [h, w]
                fg = jnp.any(valid, axis=0)
                return gi, fg, ltrb

            gi, fg, ltrb = jax.vmap(assign_one)(gt2d, gt3d, gt_labels)
            safe = jnp.clip(gi, 0)
            tgt_cls = jnp.where(
                fg, jnp.take_along_axis(
                    gt_labels[:, :, None, None],
                    safe[:, None], axis=1)[:, 0], self.num_classes)
            onehot = jax.nn.one_hot(tgt_cls, self.num_classes + 1)[
                ..., :self.num_classes]
            num_fg = jnp.maximum(jnp.sum(fg), 1)
            total_cls += jnp.sum(
                sigmoid_focal_loss(out["cls"], onehot)) / num_fg

            tgt_ltrb = jnp.take_along_axis(
                ltrb, safe[:, None, :, :, None], axis=1)[:, 0]
            total_box += jnp.sum(jnp.where(
                fg[..., None],
                smooth_l1_loss(out["box2d"] / stride,
                               tgt_ltrb / stride), 0.)) / num_fg

            lr = tgt_ltrb[..., [0, 2]]
            tb = tgt_ltrb[..., [1, 3]]
            ctr_tgt = jnp.sqrt(jnp.clip(
                (jnp.min(lr, -1) / jnp.maximum(jnp.max(lr, -1), 1e-6)) *
                (jnp.min(tb, -1) / jnp.maximum(jnp.max(tb, -1), 1e-6)),
                0, 1))
            ctr_bce = (jnp.clip(out["ctr"][..., 0], 0) -
                       out["ctr"][..., 0] * ctr_tgt +
                       jnp.log1p(jnp.exp(-jnp.abs(out["ctr"][..., 0]))))
            total_ctr += jnp.sum(jnp.where(fg, ctr_bce, 0.)) / num_fg

            # 3D: depth + dims + orientation at fg points
            tgt3d = jnp.take_along_axis(
                gt3d[:, :, None, None, :],
                safe[:, None, :, :, None], axis=1)[:, 0]  # [B,h,w,7]
            depth_l1 = jnp.abs(out["depth"] - tgt3d[..., 2])
            safe_lbl = jnp.clip(tgt_cls, 0, self.num_classes - 1)
            ref = self.dim_ref[safe_lbl]  # [B,h,w,3]
            dims_pred = ref * jnp.exp(out["dims"])
            dims_l1 = jnp.sum(jnp.abs(dims_pred - tgt3d[..., 3:6]), -1)
            ori = out["ori"] / jnp.maximum(
                jnp.linalg.norm(out["ori"], axis=-1, keepdims=True), 1e-6)
            ori_l1 = (jnp.abs(ori[..., 0] - jnp.sin(tgt3d[..., 6])) +
                      jnp.abs(ori[..., 1] - jnp.cos(tgt3d[..., 6])))
            total_3d += jnp.sum(jnp.where(
                fg, depth_l1 + dims_l1 + ori_l1, 0.)) / num_fg

        loss = total_cls + total_box + 0.5 * total_ctr + total_3d
        return {"loss": loss, "loss_cls": total_cls, "loss_box2d": total_box,
                "loss_ctr": total_ctr, "loss_3d": total_3d}

    # ------------------------------------------------------------------ test
    def test_forward(self, batch) -> dict:
        img = batch["data"] / 255.0
        k_inv = batch["K_inv"]  # [B, 3, 3]
        outs = self._forward_levels(img)
        all_scores, all_boxes, all_labels = [], [], []
        for out in outs:
            b, h, w, c = out["cls"].shape
            stride = out["stride"]
            scores = (jax.nn.sigmoid(out["cls"]) *
                      jax.nn.sigmoid(out["ctr"]))

            ys = (jnp.arange(h) + 0.5) * stride
            xs = (jnp.arange(w) + 0.5) * stride
            py, px = jnp.meshgrid(ys, xs, indexing="ij")

            def decode_one(sc, depth, offset, dims_o, ori, kinv):
                flat = sc.reshape(-1)
                k = min(self.max_detection, flat.shape[0])
                top, idx = jax.lax.top_k(flat, k)
                pix = idx // self.num_classes
                label = idx % self.num_classes
                u = px.reshape(-1)[pix] + offset.reshape(-1, 2)[pix, 0] * \
                    stride
                v = py.reshape(-1)[pix] + offset.reshape(-1, 2)[pix, 1] * \
                    stride
                z = depth.reshape(-1)[pix]
                xyz = jnp.einsum(
                    "ij,nj->ni", kinv,
                    jnp.stack([u * z, v * z, z], axis=-1))
                ref = self.dim_ref[label]
                dims = ref * jnp.exp(dims_o.reshape(-1, 3)[pix])
                o = ori.reshape(-1, 2)[pix]
                ry = jnp.arctan2(o[:, 0], o[:, 1])
                boxes = jnp.concatenate(
                    [xyz.at[:, 1].add(dims[:, 0] / 2), dims, ry[:, None]],
                    axis=-1)
                valid = top >= self.score_threshold
                return (boxes, jnp.where(valid, top, -1.),
                        jnp.where(valid, label, -1))

            boxes, scores_k, labels = jax.vmap(decode_one)(
                scores, out["depth"], out["offset"], out["dims"],
                out["ori"], k_inv)
            all_boxes.append(boxes)
            all_scores.append(scores_k)
            all_labels.append(labels)
        return {
            "box3d_cam": jnp.concatenate(all_boxes, axis=1),
            "scores": jnp.concatenate(all_scores, axis=1),
            "label_preds": jnp.concatenate(all_labels, axis=1),
        }

    @staticmethod
    def postprocess_to_samples(outputs: dict, metas: list) -> list:
        boxes = np.asarray(outputs["box3d_cam"])
        scores = np.asarray(outputs["scores"])
        labels = np.asarray(outputs["label_preds"])
        results = []
        for i, meta in enumerate(metas):
            valid = scores[i] >= 0
            s = Sample(path=meta.get("path"), modality="image")
            s.bboxes_3d = boxes[i][valid]
            s.labels = labels[i][valid]
            s.confidences = scores[i][valid]
            s.frame = "camera"
            s.meta.update({k: v for k, v in meta.items() if k != "path"})
            results.append(s)
        return results
