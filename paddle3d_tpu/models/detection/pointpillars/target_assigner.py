"""On-device anchor target assignment.

TPU-native replacement for the host-side numpy assigner
(reference: paddle3d/transforms/target_generator.py:527 Gt2PointPillarsTarget):
the whole assignment — nearest-IoU similarity, per-gt force matching with
ties, threshold labeling, residual encoding — runs as one vectorized jax
program inside the jitted train step, over padded [maxG] gt arrays. This
moves per-iteration work off the single host CPU and removes the dataloader
target-gen bottleneck entirely.

Semantics match the reference assigner:
  label -1 = ignore, 0 = background, c>0 = class c;
  similarity = axis-aligned IoU of nearest ("near") bounding boxes;
  each gt force-matches its best anchors (including ties) even below
  threshold, unless it overlaps nothing.
"""
import jax
import jax.numpy as jnp

from ....ops.box_ops import limit_period, second_box_encode

__all__ = ["assign_targets", "nearest_iou_similarity"]


def _rbbox_to_near_bbox(boxes: jnp.ndarray) -> jnp.ndarray:
    """[N,5] (cx,cy,dx,dy,yaw) -> [N,4] axis-aligned (x1,y1,x2,y2)."""
    rots = jnp.abs(limit_period(boxes[:, 4], 0.5, jnp.pi))
    cond = (rots > jnp.pi / 4)[:, None]
    dims = jnp.where(cond, boxes[:, [3, 2]], boxes[:, [2, 3]])
    centers = boxes[:, :2]
    return jnp.concatenate([centers - dims / 2, centers + dims / 2], axis=-1)


def _aa_iou(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """[N,4] x [M,4] axis-aligned IoU."""
    lt = jnp.maximum(a[:, None, :2], b[None, :, :2])
    rb = jnp.minimum(a[:, None, 2:], b[None, :, 2:])
    wh = jnp.clip(rb - lt, 0)
    inter = wh[..., 0] * wh[..., 1]
    area_a = (a[:, 2] - a[:, 0]) * (a[:, 3] - a[:, 1])
    area_b = (b[:, 2] - b[:, 0]) * (b[:, 3] - b[:, 1])
    return inter / jnp.maximum(area_a[:, None] + area_b[None, :] - inter, 1e-8)


def nearest_iou_similarity(anchors: jnp.ndarray,
                           gt_boxes: jnp.ndarray) -> jnp.ndarray:
    """[A,7] anchors x [G,7] gt -> [A,G] nearest-bbox IoU."""
    a_bev = _rbbox_to_near_bbox(anchors[:, [0, 1, 3, 4, 6]])
    g_bev = _rbbox_to_near_bbox(gt_boxes[:, [0, 1, 3, 4, 6]])
    return _aa_iou(a_bev, g_bev)


def assign_targets(anchors: jnp.ndarray,
                   gt_boxes: jnp.ndarray,
                   gt_labels: jnp.ndarray,
                   matched_thresholds: jnp.ndarray,
                   unmatched_thresholds: jnp.ndarray,
                   anchors_mask: jnp.ndarray = None):
    """Single-sample assignment (vmap over the batch).

    Args:
        anchors: [A, 7].
        gt_boxes: [G, 7] padded.
        gt_labels: [G] int; classes 0..C-1, padding rows = -1.
        matched/unmatched_thresholds: [A].
        anchors_mask: [A] bool or None.
    Returns:
        labels: [A] int32 (-1 ignore / 0 bg / 1..C fg class+1).
        reg_targets: [A, 7] encoded residuals (0 for non-fg).
    """
    a = anchors.shape[0]
    gt_valid = gt_labels >= 0  # [G]
    iou = nearest_iou_similarity(anchors, gt_boxes)  # [A,G]
    iou = jnp.where(gt_valid[None, :], iou, -1.)
    if anchors_mask is not None:
        iou = jnp.where(anchors_mask[:, None], iou, -1.)

    anchor_to_gt_argmax = jnp.argmax(iou, axis=1)  # [A]
    anchor_to_gt_max = jnp.max(iou, axis=1)  # [A]
    gt_to_anchor_max = jnp.max(iou, axis=0)  # [G]
    # gt that overlaps nothing does not force-match
    gt_to_anchor_max = jnp.where(gt_to_anchor_max <= 0, -1., gt_to_anchor_max)
    force = (iou == gt_to_anchor_max[None, :]) & gt_valid[None, :]  # [A,G]
    force_anchor = jnp.any(force, axis=1)

    pos = anchor_to_gt_max >= matched_thresholds
    neg = anchor_to_gt_max < unmatched_thresholds

    assigned_gt = anchor_to_gt_argmax
    fg = pos | force_anchor
    # one-hot dots, not row gathers: a [857k]-row gather from a 24-row
    # table runs at ~16 GB/s on TPU (10 ms of the train forward); the
    # one-hot contraction is exact (single 1.0 per row) under HIGHEST
    # matmul precision
    g = gt_boxes.shape[0]
    oh = jax.nn.one_hot(assigned_gt, g, dtype=jnp.float32)  # [A, G]
    cls_of_assigned = jnp.round(
        oh @ (gt_labels + 1).astype(jnp.float32)).astype(jnp.int32)

    labels = jnp.full((a,), -1, jnp.int32)
    labels = jnp.where(neg, 0, labels)
    labels = jnp.where(fg, cls_of_assigned, labels)
    if anchors_mask is not None:
        labels = jnp.where(anchors_mask, labels, -1)
        fg = fg & anchors_mask

    assigned_boxes = jnp.dot(oh, gt_boxes.astype(jnp.float32),
                             precision=jax.lax.Precision.HIGHEST)
    reg_targets = second_box_encode(assigned_boxes.astype(gt_boxes.dtype),
                                    anchors)
    reg_targets = jnp.where(fg[:, None], reg_targets, 0.)
    return labels, reg_targets
