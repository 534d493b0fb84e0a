"""Rotated-IoU proposal-target assignment for two-stage RoI heads.

TPU-native re-design of the reference ProposalTargetLayer (reference:
paddle3d/models/heads/roi_heads/target_assigner/proposal_target_layer.py:27
forward, :90 sample_rois_for_rcnn, :157 subsample_rois): the dynamic
nonzero()/concat subsampling becomes a fixed-capacity priority-top-k
selection, and the per-sample python loop becomes one vmapped program.

Semantics preserved:
  * rotated 3D IoU matching of every roi to its best (same-class) gt;
  * fg/bg subsampling to `roi_per_image` slots: fg (IoU >= min(reg_fg,
    cls_fg)) capped at round(fg_ratio * roi_per_image), remainder filled
    with hard bg (cls_bg_thresh_lo <= IoU < reg_fg) and easy bg
    (IoU < cls_bg_thresh_lo) in hard_bg_ratio proportion, sampled uniformly
    at random (with wrap-around reuse standing in for the reference's
    with-replacement randint when a pool is short);
  * IoU-conditioned cls targets: hard labels for 'cls', the
    (iou - bg)/(fg - bg) soft interval for 'roi_iou';
  * reg_valid_mask = IoU > reg_fg_thresh.
"""
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ...ops.iou3d_nms import boxes_iou3d

__all__ = ["ProposalTargetConfig", "sample_rois_for_rcnn",
           "proposal_targets"]


class ProposalTargetConfig(NamedTuple):
    roi_per_image: int = 128
    fg_ratio: float = 0.5
    reg_fg_thresh: float = 0.55
    cls_fg_thresh: float = 0.75
    cls_bg_thresh: float = 0.25
    cls_bg_thresh_lo: float = 0.1
    hard_bg_ratio: float = 0.8
    cls_score_type: str = "roi_iou"
    sample_roi_by_each_class: bool = True


def match_rois_to_gt(rois, roi_mask, roi_labels, gt_boxes, gt_labels,
                     by_class: bool = True):
    """[P,7] rois (bottom-z) x [G,7+] gts (bottom-z) -> (max_iou [P],
    gt_assignment [P]) via rotated 3D IoU (reference:
    proposal_target_layer.py get_max_iou_with_same_class / boxes_iou3d_gpu).
    """
    rois_c = rois[:, :7].at[:, 2].add(rois[:, 5] / 2)
    gts_c = gt_boxes[:, :7].at[:, 2].add(gt_boxes[:, 5] / 2)
    iou = boxes_iou3d(rois_c, gts_c)  # [P, G]
    gt_valid = gt_labels >= 0
    ok = gt_valid[None, :]
    if by_class:
        ok = ok & (roi_labels[:, None] == gt_labels[None, :])
    iou = jnp.where(ok, iou, -1.0)
    gt_assignment = jnp.argmax(iou, axis=1)
    max_iou = jnp.maximum(jnp.max(iou, axis=1), 0.0)
    max_iou = jnp.where(roi_mask, max_iou, 0.0)
    return max_iou, gt_assignment


def _priority_select(priority, take, capacity):
    """Top-`capacity` candidate indices by priority with wrap-around reuse:
    slot j holds the (j mod n_avail)-th best candidate, valid while j < take.
    priority: [P] with -inf for non-candidates. Returns (idx [capacity],
    valid [capacity])."""
    n_avail = jnp.sum(jnp.isfinite(priority))
    k = min(capacity, priority.shape[0])
    _, order = jax.lax.top_k(priority, k)
    if k < capacity:
        order = jnp.pad(order, (0, capacity - k))
    j = jnp.arange(capacity)
    wrapped = jnp.where(n_avail > 0, j % jnp.maximum(n_avail, 1), 0)
    idx = order[wrapped]
    valid = (j < take) & (n_avail > 0)
    return idx, valid


def sample_rois_for_rcnn(key, rois, roi_mask, roi_labels, roi_scores,
                         gt_boxes, gt_labels,
                         cfg: ProposalTargetConfig):
    """Single-sample fixed-shape subsampling
    (reference: proposal_target_layer.py:90,157).

    Returns dict with rois/roi_labels/roi_scores/roi_ious/gt_of_rois/
    gt_label_of_rois/valid, all [M, ...] where M = cfg.roi_per_image.
    """
    m = cfg.roi_per_image
    max_iou, gt_assignment = match_rois_to_gt(
        rois, roi_mask, roi_labels, gt_boxes, gt_labels,
        by_class=cfg.sample_roi_by_each_class)

    fg_thresh = min(cfg.reg_fg_thresh, cfg.cls_fg_thresh)
    fg_mask = roi_mask & (max_iou >= fg_thresh)
    easy_mask = roi_mask & (max_iou < cfg.cls_bg_thresh_lo)
    hard_mask = roi_mask & (max_iou < cfg.reg_fg_thresh) & \
        (max_iou >= cfg.cls_bg_thresh_lo)

    kf, kh, ke = jax.random.split(key, 3)
    p = rois.shape[0]
    rand_f = jax.random.uniform(kf, (p,))
    rand_h = jax.random.uniform(kh, (p,))
    rand_e = jax.random.uniform(ke, (p,))

    n_fg = jnp.sum(fg_mask)
    n_hard = jnp.sum(hard_mask)
    n_easy = jnp.sum(easy_mask)
    n_bg = n_hard + n_easy

    fg_cap = int(round(cfg.fg_ratio * m))
    # fg count: capped when bg exists, fills all M when there is no bg
    fg_take = jnp.where(n_bg > 0, jnp.minimum(fg_cap, n_fg),
                        jnp.where(n_fg > 0, m, 0))
    bg_take = m - fg_take
    # hard/easy split (reference sample_bg_inds): proportional when both
    # pools are non-empty, otherwise whichever exists takes all
    hard_take = jnp.where(
        (n_hard > 0) & (n_easy > 0),
        jnp.minimum((bg_take * cfg.hard_bg_ratio).astype(jnp.int32),
                    n_hard),
        jnp.where(n_hard > 0, bg_take, 0))
    hard_take = jnp.where(n_bg > 0, hard_take, 0)
    easy_take = jnp.where(n_easy > 0, bg_take - hard_take, 0)

    neg = -jnp.inf
    fg_idx, fg_ok = _priority_select(
        jnp.where(fg_mask, rand_f, neg), fg_take, m)
    hard_idx, hard_ok = _priority_select(
        jnp.where(hard_mask, rand_h, neg), hard_take, m)
    easy_idx, easy_ok = _priority_select(
        jnp.where(easy_mask, rand_e, neg), easy_take, m)

    # pack [fg | hard | easy] into the M slots
    j = jnp.arange(m)
    hard_slot = jnp.clip(j - fg_take, 0, m - 1)
    easy_slot = jnp.clip(j - fg_take - hard_take, 0, m - 1)
    sel = jnp.where(
        j < fg_take, fg_idx[jnp.clip(j, 0, m - 1)],
        jnp.where(j < fg_take + hard_take, hard_idx[hard_slot],
                  easy_idx[easy_slot]))
    valid = jnp.where(
        j < fg_take, fg_ok[jnp.clip(j, 0, m - 1)],
        jnp.where(j < fg_take + hard_take, hard_ok[hard_slot],
                  easy_ok[easy_slot] & (j < fg_take + hard_take +
                                        easy_take)))
    sel = jnp.where(valid, sel, 0)

    gt_sel = gt_assignment[sel]
    return {
        "rois": jnp.where(valid[:, None], rois[sel], 0.),
        "roi_labels": jnp.where(valid, roi_labels[sel], -1),
        "roi_scores": jnp.where(valid, roi_scores[sel], 0.),
        "roi_ious": jnp.where(valid, max_iou[sel], 0.),
        "gt_of_rois": jnp.where(valid[:, None], gt_boxes[gt_sel], 0.),
        "gt_label_of_rois": jnp.where(valid, gt_labels[gt_sel], -1),
        "valid": valid,
    }


def proposal_targets(key, rois, roi_mask, roi_labels, roi_scores, gt_boxes,
                     gt_labels, cfg: ProposalTargetConfig):
    """Batched targets (reference: proposal_target_layer.py:32 forward).

    All inputs batched [B, ...]; returns the reference's targets_dict with
    reg_valid_mask and rcnn_cls_labels included.
    """
    b = rois.shape[0]
    keys = jax.random.split(key, b)
    out = jax.vmap(
        lambda k, r, rm, rl, rs, gb, gl: sample_rois_for_rcnn(
            k, r, rm, rl, rs, gb, gl, cfg))(
                keys, rois, roi_mask, roi_labels, roi_scores, gt_boxes,
                gt_labels)

    ious = out["roi_ious"]
    reg_valid = (ious > cfg.reg_fg_thresh) & out["valid"]
    if cfg.cls_score_type == "cls":
        cls_labels = (ious > cfg.cls_fg_thresh).astype(jnp.float32)
        ignore = (ious > cfg.cls_bg_thresh) & (ious < cfg.cls_fg_thresh)
        cls_labels = jnp.where(ignore, -1.0, cls_labels)
    elif cfg.cls_score_type == "roi_iou":
        fg = ious > cfg.cls_fg_thresh
        bg = ious < cfg.cls_bg_thresh
        soft = (ious - cfg.cls_bg_thresh) / \
            (cfg.cls_fg_thresh - cfg.cls_bg_thresh)
        cls_labels = jnp.where(fg, 1.0, jnp.where(bg, 0.0, soft))
    else:
        raise NotImplementedError(cfg.cls_score_type)
    cls_labels = jnp.where(out["valid"], cls_labels, -1.0)

    out["reg_valid_mask"] = reg_valid
    out["rcnn_cls_labels"] = cls_labels
    # targets are constants wrt the loss (reference detaches them); also
    # keeps autodiff away from the non-differentiable IoU/NMS path
    return jax.tree.map(jax.lax.stop_gradient, out)
