"""BBOX_CODERS components (reference: paddle3d/models/heads/dense_heads/
target_assigner/... DeltaXYZWLHRBBoxCoder, bevformer/petr NMSFreeCoder,
bevdet_centerhead.py:1049 CenterPointBBoxCoder).

Fixed-shape jax formulations of the reference coders, exposed as registry
components so reference configs' `bbox_coder:` blocks resolve by name.
The heavy in-model paths (SSDHead, PETRHead, CenterHead) inline the same
math for fusion; these components are the standalone, config-addressable
surface."""
from typing import Optional, Sequence

import jax
import jax.numpy as jnp

from ...apis import manager
from ...ops.box_ops import second_box_decode, second_box_encode

__all__ = ["DeltaXYZWLHRBBoxCoder", "NMSFreeCoder", "CenterPointBBoxCoder"]


@manager.BBOX_CODERS.add_component
class DeltaXYZWLHRBBoxCoder:
    """SECOND-style residual coder (reference DeltaXYZWLHRBBoxCoder —
    diagonal-normalized center deltas, log dims, yaw delta)."""

    def __init__(self, code_size: int = 7):
        self.code_size = code_size

    def encode(self, src_boxes: jnp.ndarray,
               dst_boxes: jnp.ndarray) -> jnp.ndarray:
        """Residuals taking src (anchors) to dst (gt)."""
        return second_box_encode(dst_boxes, src_boxes)

    def decode(self, anchors: jnp.ndarray,
               deltas: jnp.ndarray) -> jnp.ndarray:
        return second_box_decode(deltas, anchors)


@manager.BBOX_CODERS.add_component
class NMSFreeCoder:
    """DETR-style set-prediction decode (reference petr/bevformer
    NMSFreeCoder): flat top-k over Q×C sigmoid scores, denormalized boxes,
    optional post-center-range mask. Fixed [max_num] outputs."""

    def __init__(self, pc_range: Sequence[float] = None,
                 post_center_range: Optional[Sequence[float]] = None,
                 max_num: int = 100, score_threshold: Optional[float] = None,
                 num_classes: int = 10):
        self.pc_range = pc_range
        self.post_center_range = (list(map(float, post_center_range))
                                  if post_center_range is not None else None)
        self.max_num = max_num
        self.score_threshold = score_threshold
        self.num_classes = num_classes

    def decode_single(self, cls_scores: jnp.ndarray,
                      bbox_preds: jnp.ndarray) -> dict:
        """cls_scores [Q, C] logits; bbox_preds [Q, D] with
        (cx, cy, cz, log dims..., sin, cos, [vx, vy])."""
        scores = jax.nn.sigmoid(cls_scores).reshape(-1)
        k = min(self.max_num, scores.shape[0])
        top_scores, idx = jax.lax.top_k(scores, k)
        qi = idx // self.num_classes
        labels = (idx % self.num_classes).astype(jnp.int32)
        box = bbox_preds[qi]
        yaw = jnp.arctan2(box[:, 6], box[:, 7])
        dims = jnp.exp(box[:, 3:6])
        cols = [box[:, 0:2], box[:, 2:3], dims, yaw[:, None]]
        if box.shape[-1] > 8:
            cols.append(box[:, 8:10])
        boxes = jnp.concatenate(cols, axis=-1)
        valid = jnp.ones_like(top_scores, bool)
        if self.score_threshold is not None:
            valid &= top_scores > self.score_threshold
        if self.post_center_range is not None:
            lim = jnp.asarray(self.post_center_range)
            valid &= (jnp.all(boxes[:, :3] >= lim[:3], axis=1)
                      & jnp.all(boxes[:, :3] <= lim[3:], axis=1))
        return {
            "bboxes": boxes,
            "scores": jnp.where(valid, top_scores, -1.),
            "labels": jnp.where(valid, labels, -1),
        }

    def decode(self, all_cls_scores, all_bbox_preds) -> list:
        """Batched decode of the LAST decoder layer (reference contract)."""
        cls, bbox = all_cls_scores[-1], all_bbox_preds[-1]
        out = jax.vmap(self.decode_single)(cls, bbox)
        b = cls.shape[0]
        return [jax.tree.map(lambda x: x[i], out) for i in range(b)]


@manager.BBOX_CODERS.add_component
class CenterPointBBoxCoder:
    """CenterPoint heatmap decode (reference bevdet_centerhead.py:1049):
    per-map top-k peaks, sub-pixel regression, exp dims, atan2 yaw."""

    def __init__(self, pc_range: Sequence[float], voxel_size: Sequence[float],
                 out_size_factor: int = 4,
                 post_center_range: Optional[Sequence[float]] = None,
                 max_num: int = 100, score_threshold: float = 0.1):
        self.pc_range = list(map(float, pc_range))
        self.voxel_size = list(map(float, voxel_size))
        self.out_size_factor = out_size_factor
        self.post_center_range = (list(map(float, post_center_range))
                                  if post_center_range is not None else None)
        self.max_num = max_num
        self.score_threshold = score_threshold

    def decode_single(self, heat, reg, hei, dim, rot, vel=None) -> dict:
        """heat [H, W, C]; reg [H, W, 2]; hei [H, W, 1]; dim [H, W, 3];
        rot [H, W, 2]; vel [H, W, 2] or None."""
        h, w, c = heat.shape
        scores_flat = heat.transpose(2, 0, 1).reshape(-1)
        k = min(self.max_num, scores_flat.shape[0])
        top_scores, idx = jax.lax.top_k(scores_flat, k)
        labels = (idx // (h * w)).astype(jnp.int32)
        pos = idx % (h * w)
        ys = (pos // w).astype(jnp.float32)
        xs = (pos % w).astype(jnp.float32)
        r = reg.reshape(h * w, 2)[pos]
        x = (xs + r[:, 0]) * self.out_size_factor * self.voxel_size[0] + \
            self.pc_range[0]
        y = (ys + r[:, 1]) * self.out_size_factor * self.voxel_size[1] + \
            self.pc_range[1]
        z = hei.reshape(h * w, 1)[pos][:, 0]
        d = jnp.exp(dim.reshape(h * w, 3)[pos])
        rr = rot.reshape(h * w, 2)[pos]
        yaw = jnp.arctan2(rr[:, 0], rr[:, 1])
        cols = [x[:, None], y[:, None], z[:, None], d]
        if vel is not None:
            cols.append(vel.reshape(h * w, 2)[pos])
        cols.append(yaw[:, None])
        boxes = jnp.concatenate(cols, axis=-1)
        valid = top_scores >= self.score_threshold
        if self.post_center_range is not None:
            lim = jnp.asarray(self.post_center_range)
            valid &= (jnp.all(boxes[:, :3] >= lim[:3], axis=1)
                      & jnp.all(boxes[:, :3] <= lim[3:], axis=1))
        return {
            "bboxes": boxes,
            "scores": jnp.where(valid, top_scores, -1.),
            "labels": jnp.where(valid, labels, -1),
        }
