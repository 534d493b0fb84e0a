"""Predicted Keypoint Weighting head for PV-RCNN
(reference: paddle3d/models/heads/dense_heads/point_head.py:32 —
PointHeadSimple: FC+BN stack over pre-fusion keypoint features, sigmoid
focal loss against in-box labels with an ignore band around box borders).

The keypoint foreground scores weight the fused keypoint features before
RoI-grid pooling (the reference multiplies point_features by
point_cls_scores in the PVRCNN forward). Labels are computed on device:
inside a GT box -> foreground, inside only the gt_extra_width-extended box
-> ignored, else background.
"""
from typing import Sequence

import jax
import jax.numpy as jnp
from flax import nnx

from ...apis import manager

__all__ = ["PointHeadSimple", "points_in_rotated_boxes"]


def points_in_rotated_boxes(pts: jnp.ndarray, boxes: jnp.ndarray,
                            extra: Sequence[float] = (0., 0., 0.)):
    """pts [K, 3]; boxes [G, 7] (x, y, bottom-z, dx, dy, dz, yaw) ->
    [K, G] bool containment with per-axis enlargement `extra`."""
    d = pts[:, None, :2] - boxes[None, :, :2]
    c = jnp.cos(boxes[:, 6])[None, :]
    s = jnp.sin(boxes[:, 6])[None, :]
    lx = d[..., 0] * c + d[..., 1] * s
    ly = -d[..., 0] * s + d[..., 1] * c
    in_bev = ((jnp.abs(lx) <= boxes[None, :, 3] / 2 + extra[0]) &
              (jnp.abs(ly) <= boxes[None, :, 4] / 2 + extra[1]))
    z = pts[:, 2][:, None]
    in_z = ((z >= boxes[None, :, 2] - extra[2]) &
            (z <= boxes[None, :, 2] + boxes[None, :, 5] + extra[2]))
    return in_bev & in_z


@manager.HEADS.add_component
class PointHeadSimple(nnx.Module):
    def __init__(self, num_class: int = 3, input_channels: int = 640,
                 model_cfg: dict = None, rngs: nnx.Rngs = None):
        rngs = rngs if rngs is not None else nnx.Rngs(0)
        cfg = dict(model_cfg or {})
        self.model_cfg = cfg
        self.input_channels = input_channels
        self.raw_num_class = num_class
        self.num_class = 1 if cfg.get("class_agnostic", True) else num_class
        tcfg = cfg.get("target_config", {}) or {}
        self.gt_extra_width = tuple(tcfg.get("gt_extra_width",
                                             (0.2, 0.2, 0.2)))
        lcfg = cfg.get("loss_config", {}) or {}
        self.cls_weight = float(
            (lcfg.get("loss_weights", {}) or {}).get("point_cls_weight", 1.))

        layers = []
        cin = input_channels
        for c in cfg.get("cls_fc", (256, 256)):
            layers += [
                nnx.Linear(cin, c, use_bias=False, rngs=rngs),
                nnx.BatchNorm(c, epsilon=1e-5, momentum=0.9,
                              use_running_average=False, rngs=rngs),
                nnx.relu,
            ]
            cin = c
        layers.append(nnx.Linear(cin, self.num_class, rngs=rngs))
        self.cls_layers = nnx.Sequential(*layers)

    def __call__(self, feats: jnp.ndarray) -> jnp.ndarray:
        """feats [B, K, C] -> logits [B, K, num_class]."""
        return self.cls_layers(feats)

    def labels(self, kp, kmask, gt_boxes, gt_labels):
        """[B, K] int labels: class+1 inside a GT box, -1 in the extended
        shell (ignored), 0 background, -1 for padded keypoints."""
        def one(pts, m, boxes, labels):
            valid_gt = labels >= 0
            inside = points_in_rotated_boxes(pts, boxes) & valid_gt[None]
            shell = (points_in_rotated_boxes(pts, boxes,
                                             self.gt_extra_width)
                     & valid_gt[None])
            hit = jnp.argmax(inside, axis=1)
            fg = jnp.any(inside, axis=1)
            lab = jnp.where(fg, labels[hit] + 1, 0)
            lab = jnp.where(~fg & jnp.any(shell, axis=1), -1, lab)
            return jnp.where(m, lab, -1)

        return jax.vmap(one)(kp, kmask, gt_boxes, gt_labels)

    def loss(self, logits, kp, kmask, gt_boxes, gt_labels) -> jnp.ndarray:
        """Sigmoid focal loss (gamma 2, alpha 0.25), normalized by the
        foreground count (reference: point_head.py loss_point)."""
        lab = self.labels(kp, kmask, gt_boxes, gt_labels)
        care = lab >= 0
        if self.num_class == 1:
            target = (lab > 0)[..., None].astype(logits.dtype)
        else:
            target = jax.nn.one_hot(jnp.maximum(lab - 1, 0),
                                    self.num_class, dtype=logits.dtype)
            target = target * (lab > 0)[..., None].astype(logits.dtype)
        p = jax.nn.sigmoid(logits)
        alpha_w = target * 0.25 + (1. - target) * 0.75
        pt = target * (1. - p) + (1. - target) * p
        bce = (jnp.maximum(logits, 0.) - logits * target +
               jnp.log1p(jnp.exp(-jnp.abs(logits))))
        focal = alpha_w * (pt ** 2) * bce
        focal = focal * care[..., None].astype(logits.dtype)
        n_fg = jnp.maximum(jnp.sum((lab > 0).astype(logits.dtype)), 1.)
        return self.cls_weight * jnp.sum(focal) / n_fg
