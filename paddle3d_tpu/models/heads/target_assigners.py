"""Set-matching target assigners for DETR-style heads
(reference: paddle3d/models/heads/dense_heads/target_assigner/
hungarian_assigner.py:92 HungarianAssigner3D and
match_costs/match_cost.py — FocalLossCost, BBox3DL1Cost, IoUCost).

The Hungarian solve runs as a host callback (scipy linear_sum_assignment)
under jit — gt counts are tiny (<= max_gt), so the host round-trip is
negligible next to the network, and exact matching preserves mAP parity
(SURVEY.md §7 hard part 5).
"""
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ...apis import manager

__all__ = ["FocalLossCost", "BBox3DL1Cost", "HungarianAssigner3D",
           "hungarian_match"]


@manager.MATCH_COSTS.add_component
class FocalLossCost:
    def __init__(self, weight: float = 1., alpha: float = 0.25,
                 gamma: float = 2., eps: float = 1e-12):
        self.weight = weight
        self.alpha = alpha
        self.gamma = gamma
        self.eps = eps

    def __call__(self, cls_pred: jnp.ndarray,
                 gt_labels: jnp.ndarray) -> jnp.ndarray:
        """cls_pred [Q, C] logits, gt_labels [G] -> [Q, G]
        (focal pos-cost minus neg-cost at each gt's class)."""
        prob = jax.nn.sigmoid(cls_pred)
        neg_cost = (-jnp.log(1 - prob + self.eps) * (1 - self.alpha) *
                    prob ** self.gamma)
        pos_cost = (-jnp.log(prob + self.eps) * self.alpha *
                    (1 - prob) ** self.gamma)
        safe_labels = jnp.clip(gt_labels, 0)
        cost = pos_cost[:, safe_labels] - neg_cost[:, safe_labels]
        # padded gt columns (label < 0) must never win an assignment even
        # if a caller forgets to mask them downstream
        cost = jnp.where((gt_labels < 0)[None, :], 1e9, cost)
        return cost * self.weight


@manager.MATCH_COSTS.add_component
class BBox3DL1Cost:
    def __init__(self, weight: float = 1.):
        self.weight = weight

    def __call__(self, bbox_pred: jnp.ndarray,
                 gt_bboxes: jnp.ndarray) -> jnp.ndarray:
        """[Q, D] x [G, D] -> [Q, G] L1 distance."""
        return jnp.sum(
            jnp.abs(bbox_pred[:, None, :] - gt_bboxes[None, :, :]),
            axis=-1) * self.weight


@manager.MATCH_COSTS.add_component
class ClassificationCost:
    """Softmax-probability classification cost (reference
    match_costs/match_cost.py ClassificationCost)."""

    def __init__(self, weight: float = 1.):
        self.weight = weight

    def __call__(self, cls_pred: jnp.ndarray,
                 gt_labels: jnp.ndarray) -> jnp.ndarray:
        prob = jax.nn.softmax(cls_pred, axis=-1)
        safe = jnp.clip(gt_labels, 0)
        cost = -prob[:, safe]
        cost = jnp.where((gt_labels < 0)[None, :], 1e9, cost)
        return cost * self.weight


@manager.MATCH_COSTS.add_component
class BBoxL1Cost:
    """Plain L1 box cost (reference match_cost.py BBoxL1Cost)."""

    def __init__(self, weight: float = 1.):
        self.weight = weight

    def __call__(self, bbox_pred: jnp.ndarray,
                 gt_bboxes: jnp.ndarray) -> jnp.ndarray:
        return jnp.sum(
            jnp.abs(bbox_pred[:, None, :] - gt_bboxes[None, :, :]),
            axis=-1) * self.weight


@manager.MATCH_COSTS.add_component
class IoUCost:
    """Negative axis-aligned 2D IoU/GIoU cost (reference match_cost.py
    IoUCost). Boxes are (x1, y1, x2, y2)."""

    def __init__(self, weight: float = 1., iou_mode: str = "giou"):
        self.weight = weight
        self.iou_mode = iou_mode

    def __call__(self, bboxes: jnp.ndarray,
                 gt_bboxes: jnp.ndarray) -> jnp.ndarray:
        lt = jnp.maximum(bboxes[:, None, :2], gt_bboxes[None, :, :2])
        rb = jnp.minimum(bboxes[:, None, 2:], gt_bboxes[None, :, 2:])
        wh = jnp.clip(rb - lt, 0)
        inter = wh[..., 0] * wh[..., 1]
        area_a = ((bboxes[:, 2] - bboxes[:, 0]) *
                  (bboxes[:, 3] - bboxes[:, 1]))[:, None]
        area_b = ((gt_bboxes[:, 2] - gt_bboxes[:, 0]) *
                  (gt_bboxes[:, 3] - gt_bboxes[:, 1]))[None, :]
        union = jnp.maximum(area_a + area_b - inter, 1e-7)
        iou = inter / union
        if self.iou_mode == "giou":
            lt_c = jnp.minimum(bboxes[:, None, :2], gt_bboxes[None, :, :2])
            rb_c = jnp.maximum(bboxes[:, None, 2:], gt_bboxes[None, :, 2:])
            wh_c = jnp.clip(rb_c - lt_c, 0)
            hull = jnp.maximum(wh_c[..., 0] * wh_c[..., 1], 1e-7)
            iou = iou - (hull - union) / hull
        return -iou * self.weight


@manager.BBOX_SAMPLERS.add_component
class RandomSampler:
    """Fixed-capacity random pos/neg subsampler (reference
    samplers/random_sampler.py semantics, fixed-shape: returns weighted
    masks instead of index lists — sampled entries get weight 1)."""

    def __init__(self, num: int = 512, pos_fraction: float = 0.25,
                 neg_pos_ub: float = -1, add_gt_as_proposals: bool = False):
        self.num = num
        self.pos_fraction = pos_fraction
        self.neg_pos_ub = neg_pos_ub
        self.add_gt_as_proposals = add_gt_as_proposals

    def sample(self, assigned: jnp.ndarray, rng_key) -> Tuple[jnp.ndarray,
                                                              jnp.ndarray]:
        """assigned [A] (mmdet: -1 ignore / 0 neg / i>0 gt). Returns
        (pos_mask, neg_mask) with at most num·pos_fraction positives and
        num total sampled."""
        pos = assigned > 0
        neg = assigned == 0
        max_pos = int(self.num * self.pos_fraction)
        noise = jax.random.uniform(rng_key, assigned.shape)
        # keep the max_pos highest-noise positives (a uniform random subset)
        if max_pos > 0:
            pos_scores = jnp.where(pos, noise, -jnp.inf)
            kth_pos = jax.lax.top_k(
                pos_scores, min(max_pos, assigned.shape[0]))[0][-1]
            pos_sel = pos & (pos_scores >= kth_pos)
        else:
            pos_sel = jnp.zeros_like(pos)
        n_pos = jnp.sum(pos_sel.astype(jnp.int32))
        max_neg = self.num - n_pos
        if self.neg_pos_ub >= 0:
            # reference random_sampler semantics: cap negatives at
            # neg_pos_ub × (sampled positives, at least 1); >= so that
            # neg_pos_ub=0 means ZERO negatives, as in the reference
            max_neg = jnp.minimum(
                max_neg, jnp.int32(self.neg_pos_ub) * jnp.maximum(n_pos, 1))
        neg_scores = jnp.where(neg, noise, -jnp.inf)
        neg_sorted = jnp.sort(neg_scores)[::-1]
        kth_neg = neg_sorted[jnp.clip(max_neg - 1, 0,
                                      assigned.shape[0] - 1)]
        neg_sel = neg & (neg_scores >= kth_neg) & (max_neg > 0)
        return pos_sel, neg_sel


def _solve_host(cost: np.ndarray, valid: np.ndarray) -> np.ndarray:
    """Host-side rectangular assignment -> per-query gt index (-1 none)."""
    from scipy.optimize import linear_sum_assignment
    q = cost.shape[0]
    out = np.full((q,), -1, np.int32)
    idx = np.where(valid)[0]
    if len(idx) == 0:
        return out
    sub = cost[:, idx]
    rows, cols = linear_sum_assignment(sub)
    out[rows] = idx[cols]
    return out


def hungarian_match(cost: jnp.ndarray, gt_valid: jnp.ndarray) -> jnp.ndarray:
    """cost [Q, G] + validity [G] -> assigned gt per query [Q] (-1 none)."""
    q = cost.shape[0]
    # matching is a discrete decision: block gradients so the callback never
    # sees tangents (the losses differentiate through the *selected* pairs,
    # not the selection itself — same as the reference)
    cost = jax.lax.stop_gradient(cost.astype(jnp.float32))
    return jax.pure_callback(
        _solve_host, jax.ShapeDtypeStruct((q,), jnp.int32),
        cost, gt_valid, vmap_method="sequential")


@manager.BBOX_ASSIGNERS.add_component
class HungarianAssigner3D:
    """(reference: hungarian_assigner.py:92)."""

    def __init__(self, cls_cost=None, reg_cost=None, pc_range=None):
        self.cls_cost = cls_cost or FocalLossCost(weight=2.0)
        self.reg_cost = reg_cost or BBox3DL1Cost(weight=0.25)
        self.pc_range = pc_range

    def assign(self, bbox_pred: jnp.ndarray, cls_pred: jnp.ndarray,
               gt_bboxes: jnp.ndarray, gt_labels: jnp.ndarray
               ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """Single sample. bbox_pred [Q, D] (normalized center part),
        cls_pred [Q, C] logits, gt_bboxes [G, D], gt_labels [G] (-1 pad).
        Returns (assigned_gt [Q] (-1 = background), assigned mask)."""
        gt_valid = gt_labels >= 0
        cost = (self.cls_cost(cls_pred, gt_labels) +
                self.reg_cost(bbox_pred[:, :8], gt_bboxes[:, :8]))
        cost = jnp.where(gt_valid[None, :], cost, 1e8)
        assigned = hungarian_match(cost, gt_valid)
        return assigned, assigned >= 0


@manager.BBOX_SAMPLERS.add_component
class PseudoSampler:
    """No-op sampler: every assigned positive/negative is kept (reference:
    paddle3d/models/heads/dense_heads/samplers/pseudo_sampler.py — DETR-style
    heads don't subsample). Returns fixed-shape masks instead of index
    lists."""

    def sample(self, assigned: jnp.ndarray):
        """assigned [A] int32 (mmdet semantics: -1 ignore, 0 neg, i>0 gt).
        Returns (pos_mask [A], neg_mask [A], gt_inds [A] 0-based, clamped)."""
        pos = assigned > 0
        neg = assigned == 0
        return pos, neg, jnp.maximum(assigned - 1, 0)


@manager.BBOX_ASSIGNERS.add_component
class MaxIoUAssigner:
    """Nearest-BEV max-IoU anchor↔gt assignment (reference:
    paddle3d/models/heads/dense_heads/target_assigner/max_iou_assigner.py:178
    — the mmdet 4-step protocol over BboxOverlapsNearest3D).

    Fixed-shape jax formulation over padded gt arrays. assign() returns
    `assigned` [A] int32 with mmdet semantics: -1 ignore (between neg and
    pos thresholds), 0 negative, i>0 = gt index i-1.
    """

    def __init__(self, pos_iou_thr: float, neg_iou_thr: float,
                 min_pos_iou: float = 0., gt_max_assign_all: bool = True,
                 match_low_quality: bool = True):
        self.pos_iou_thr = float(pos_iou_thr)
        self.neg_iou_thr = float(neg_iou_thr)
        self.min_pos_iou = float(min_pos_iou)
        self.gt_max_assign_all = bool(gt_max_assign_all)
        self.match_low_quality = bool(match_low_quality)

    def assign(self, bboxes: jnp.ndarray, gt_bboxes: jnp.ndarray,
               gt_labels: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """bboxes [A,7], gt_bboxes [G,7] padded, gt_labels [G] (-1 pad).
        Returns (assigned [A] int32, max_overlaps [A])."""
        from ..detection.pointpillars.target_assigner import \
            nearest_iou_similarity

        gt_valid = gt_labels >= 0
        iou = nearest_iou_similarity(bboxes, gt_bboxes)  # [A, G]
        iou = jnp.where(gt_valid[None, :], iou, -1.)

        max_overlaps = jnp.max(iou, axis=1)
        argmax = jnp.argmax(iou, axis=1).astype(jnp.int32)
        # no valid gt at all: everything is background with 0 overlap
        # (reference max_iou_assigner.py assign_wrt_overlaps num_gts == 0)
        no_gt = ~jnp.any(gt_valid)
        max_overlaps = jnp.where(no_gt, 0., max_overlaps)

        # step 1-3: ignore by default, negative below neg_thr, positive at
        # the per-anchor best gt above pos_thr
        assigned = jnp.full(bboxes.shape[:1], -1, jnp.int32)
        assigned = jnp.where(
            (max_overlaps >= 0) & (max_overlaps < self.neg_iou_thr), 0,
            assigned)
        assigned = jnp.where(max_overlaps >= self.pos_iou_thr, argmax + 1,
                             assigned)

        if self.match_low_quality:
            # step 4: each gt claims its best-overlap anchor(s) when that
            # overlap clears min_pos_iou (ties included iff gt_max_assign_all)
            gt_best = jnp.max(iou, axis=0)  # [G]
            claim = (iou == gt_best[None, :]) & gt_valid[None, :] & \
                (gt_best >= self.min_pos_iou)[None, :]
            if not self.gt_max_assign_all:
                best_anchor = jnp.argmax(iou, axis=0)  # [G]
                rows = jnp.zeros_like(claim).at[
                    best_anchor, jnp.arange(claim.shape[1])].set(True)
                claim = claim & rows
            # later gts override earlier ones, matching the reference's
            # sequential per-gt loop
            gi = jnp.arange(claim.shape[1], dtype=jnp.int32)
            claimed_by = jnp.max(jnp.where(claim, gi[None, :] + 1, 0), axis=1)
            assigned = jnp.where(claimed_by > 0, claimed_by, assigned)
        assigned = jnp.where(no_gt, 0, assigned)
        return assigned, max_overlaps
