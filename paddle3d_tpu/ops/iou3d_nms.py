"""Rotated BEV IoU and 3D NMS as fixed-shape XLA programs.

TPU-native replacement for the reference CUDA module
(reference: paddle3d/ops/iou3d_nms/iou3d_nms_kernel.cu:275,292,310 — rotated
IoU via cross-product line intersection; bitmask-block greedy NMS).

Design (v5e-profiled):
  1. all-pairs intersection areas via a no-compaction Sutherland–Hodgman
     clip: each clip stage emits exactly 2 slots per edge, with outside
     vertices replaced by their projection onto the clip line (collinear
     excursions telescope in the shoelace sum, keeping the area exact) —
     slot-list elementwise program that XLA fuses end-to-end: 6.8 ms for
     8x1000x1000 (the rolled/stacked form took 110 ms; scatter-based 45 s);
  2. greedy suppression as a lax.scan over score-ordered IoU rows.
"""
import functools
from typing import Tuple

import jax
import jax.numpy as jnp

from .box_ops import boxes_to_corners_bev

__all__ = [
    "boxes_iou_bev", "boxes_overlap_bev", "boxes_iou3d", "nms_bev",
    "rotate_nms_pcdet",
]

def _pairwise_intersection_area(ca: jnp.ndarray,
                                cb: jnp.ndarray) -> jnp.ndarray:
    """All-pairs convex-quad intersection areas, scatter-free.

    ca [N,4,2], cb [M,4,2] (CCW) -> [N,M].

    No-compaction Sutherland–Hodgman: the polygon buffer doubles per clip
    stage (2 slots per edge) instead of compacting via scatters; outside
    vertices are emitted as their orthogonal projection onto the clip line,
    whose shoelace contribution telescopes to the exact chord.

    Slot-LIST formulation: every polygon slot is its own [N, M] array and
    there are NO roll/stack/reshape ops between clip stages, so XLA fuses
    the whole 4-stage chain into a handful of elementwise loops instead of
    materializing [N, M, k, 2] buffers in HBM per stage — measured 6.8 ms
    vs 110 ms for 8x1000x1000 on v5e (16x).
    """
    eps = 1e-7
    ax = [ca[:, j, 0][:, None] for j in range(4)]   # [N, 1]
    ay = [ca[:, j, 1][:, None] for j in range(4)]
    bx = [cb[:, j, 0][None, :] for j in range(4)]   # [1, M]
    by = [cb[:, j, 1][None, :] for j in range(4)]

    # circumscribed-circle guard: provably-disjoint pairs are exactly 0
    # (also removes f32 shoelace residue on far-apart pairs)
    cax = sum(ax) * 0.25
    cay = sum(ay) * 0.25
    cbx = sum(bx) * 0.25
    cby = sum(by) * 0.25
    ra = jnp.zeros_like(cax)
    rb = jnp.zeros_like(cbx)
    for j in range(4):
        ra = jnp.maximum(ra, jnp.sqrt((ax[j] - cax) ** 2 +
                                      (ay[j] - cay) ** 2))
        rb = jnp.maximum(rb, jnp.sqrt((bx[j] - cbx) ** 2 +
                                      (by[j] - cby) ** 2))
    dist = jnp.sqrt((cax - cbx) ** 2 + (cay - cby) ** 2)
    overlap_possible = dist <= ra + rb

    shape = (ca.shape[0], cb.shape[0])
    ones = jnp.ones(shape, ca.dtype)
    poly = [(ax[j] * ones, ay[j] * ones) for j in range(4)]

    for e in range(4):
        a_x, a_y = bx[e], by[e]
        dxe = bx[(e + 1) % 4] - a_x
        dye = by[(e + 1) % 4] - a_y
        inv_d2 = 1.0 / jnp.maximum(dxe * dxe + dye * dye, eps)
        k = len(poly)
        sides = [dxe * (py - a_y) - dye * (px - a_x) for px, py in poly]
        new_poly = []
        for i in range(k):
            sx, sy = poly[i]
            ex, ey = poly[(i + 1) % k]
            ds, de = sides[i], sides[(i + 1) % k]
            s_in = ds >= 0
            denom = ds - de
            t = ds / jnp.where(jnp.abs(denom) < eps, 1.0, denom)
            ix = sx + t * (ex - sx)
            iy = sy + t * (ey - sy)
            crossing = (s_in != (de >= 0)) & (jnp.abs(denom) >= eps)
            # orthogonal projection of s onto the clip line
            tp = ((sx - a_x) * dxe + (sy - a_y) * dye) * inv_d2
            pxv = a_x + tp * dxe
            pyv = a_y + tp * dye
            sax = jnp.where(s_in, sx, pxv)
            say = jnp.where(s_in, sy, pyv)
            new_poly.append((sax, say))
            new_poly.append((jnp.where(crossing, ix, sax),
                             jnp.where(crossing, iy, say)))
        poly = new_poly

    acc = 0.
    k = len(poly)
    for i in range(k):
        x0, y0 = poly[i]
        x1, y1 = poly[(i + 1) % k]
        acc = acc + (x0 * y1 - x1 * y0)
    area = 0.5 * jnp.abs(acc)
    return jnp.where(overlap_possible, area, 0.)


def _on_tpu() -> bool:
    try:
        return jax.default_backend() not in ("cpu", "gpu")
    except Exception:
        return False


@jax.jit
def boxes_overlap_bev(boxes_a: jnp.ndarray,
                      boxes_b: jnp.ndarray) -> jnp.ndarray:
    """[N,5|7] x [M,5|7] rotated boxes -> [N,M] BEV intersection areas
    (reference: iou3d_nms `boxes_overlap_bev_gpu`).

    Fused slot-list XLA clip (6.8 ms for 8x1000x1000 on v5e); the pallas
    kernel variant is opt-in via PADDLE3D_TPU_PALLAS_IOU (currently slower).
    """
    ca = boxes_to_corners_bev(boxes_a).astype(jnp.float32)
    cb = boxes_to_corners_bev(boxes_b).astype(jnp.float32)
    n = ca.shape[0]
    import os
    if os.environ.get("PADDLE3D_TPU_PALLAS_IOU") and _on_tpu() \
            and n >= 64 and cb.shape[0] >= 64:
        # opt-in: the scratch/fori pallas kernel currently measures SLOWER
        # than the fused XLA slot formulation (4.6 s vs ~0.1 s for
        # 8x1000^2) — kept for further Mosaic iteration
        from .pallas.iou_clip import pairwise_intersection_area
        return pairwise_intersection_area(ca, cb)
    # slot-list formulation fuses fully — no row blocking needed (no
    # [N, M, k, 2] buffers exist to bound)
    return _pairwise_intersection_area(ca, cb)


@jax.jit
def boxes_iou_bev(boxes_a: jnp.ndarray, boxes_b: jnp.ndarray) -> jnp.ndarray:
    """[N,.] x [M,.] -> [N,M] rotated BEV IoU
    (reference: iou3d_nms `boxes_iou_bev_gpu`)."""
    inter = boxes_overlap_bev(boxes_a, boxes_b)
    if boxes_a.shape[-1] >= 7:
        area_a = boxes_a[:, 3] * boxes_a[:, 4]
        area_b = boxes_b[:, 3] * boxes_b[:, 4]
    else:
        area_a = boxes_a[:, 2] * boxes_a[:, 3]
        area_b = boxes_b[:, 2] * boxes_b[:, 3]
    union = area_a[:, None] + area_b[None, :] - inter
    return inter / jnp.maximum(union, 1e-6)


@jax.jit
def boxes_iou3d(boxes_a: jnp.ndarray, boxes_b: jnp.ndarray) -> jnp.ndarray:
    """[N,7] x [M,7] -> [N,M] 3D IoU; boxes are (x,y,z_center,dx,dy,dz,yaw).

    Matches the reference convention where z is the box center
    (reference: iou3d_nms_api.cpp `boxes_iou3d_gpu` uses
    z ± dz/2 for the vertical extent).
    """
    inter_bev = boxes_overlap_bev(boxes_a, boxes_b)
    a_zmin = boxes_a[:, 2] - boxes_a[:, 5] / 2
    a_zmax = boxes_a[:, 2] + boxes_a[:, 5] / 2
    b_zmin = boxes_b[:, 2] - boxes_b[:, 5] / 2
    b_zmax = boxes_b[:, 2] + boxes_b[:, 5] / 2
    overlap_z = jnp.maximum(
        jnp.minimum(a_zmax[:, None], b_zmax[None, :]) -
        jnp.maximum(a_zmin[:, None], b_zmin[None, :]), 0.)
    inter = inter_bev * overlap_z
    vol_a = boxes_a[:, 3] * boxes_a[:, 4] * boxes_a[:, 5]
    vol_b = boxes_b[:, 3] * boxes_b[:, 4] * boxes_b[:, 5]
    union = vol_a[:, None] + vol_b[None, :] - inter
    return inter / jnp.maximum(union, 1e-6)


@functools.partial(jax.jit, static_argnames=("post_max_size",))
def _greedy_suppress(iou: jnp.ndarray, valid: jnp.ndarray,
                     iou_threshold: float,
                     post_max_size: int) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Greedy NMS given a score-descending-ordered [K,K] IoU matrix.

    Returns (keep_mask [K], keep_idx [post_max_size] padded with -1).
    """
    k = iou.shape[0]

    # Exact greedy via fixpoint iteration: greedy's defining recurrence
    #   alive_i = valid_i & not exists j < i: alive_j & iou[j, i] > thr
    # has a unique solution; iterating it in parallel (one [K,K] mask-reduce
    # per step) converges in suppression-chain-depth steps (typically < 10)
    # instead of K sequential steps.
    idx = jnp.arange(k)
    sup = (iou > iou_threshold) & (idx[:, None] < idx[None, :]) & \
        valid[:, None] & valid[None, :]

    def cond(state):
        alive, prev, it = state
        return jnp.any(alive != prev) & (it < k)

    def body(state):
        alive, _, it = state
        suppressed = jnp.any(sup & alive[:, None], axis=0)
        return valid & ~suppressed, alive, it + 1

    alive, _, _ = jax.lax.while_loop(
        cond, body, (valid, ~valid, jnp.asarray(0)))
    keep_mask = alive & valid
    # Compact kept indices (score order) into post_max_size slots.
    order_pos = jnp.cumsum(keep_mask.astype(jnp.int32)) - 1
    slots = jnp.where(keep_mask & (order_pos < post_max_size), order_pos,
                      post_max_size)
    keep_idx = jnp.full((post_max_size + 1,), -1, jnp.int32)
    keep_idx = keep_idx.at[slots].set(
        jnp.arange(k, dtype=jnp.int32), mode="drop")[:post_max_size]
    return keep_mask, keep_idx


@functools.partial(
    jax.jit, static_argnames=("pre_max_size", "post_max_size"))
def nms_bev(boxes: jnp.ndarray,
            scores: jnp.ndarray,
            iou_threshold: float,
            pre_max_size: int = 1024,
            post_max_size: int = 256,
            score_threshold: float = float("-inf")):
    """Rotated-BEV NMS (reference: iou3d_nms `nms_gpu` + the python wrapper
    models/layers/layer_libs.py:210 `rotate_nms_pcdet`).

    Args:
        boxes: [N, 5|7] rotated boxes.
        scores: [N] confidences; invalid/padding rows should carry -inf.
    Returns:
        keep_idx: [post_max_size] indices into the input arrays (-1 padded).
        count: number of kept boxes.
    """
    scores = jnp.where(jnp.isfinite(scores), scores, -jnp.inf)
    scores = jnp.where(scores > score_threshold, scores, -jnp.inf)
    k = min(pre_max_size, boxes.shape[0])
    top_scores, top_idx = jax.lax.top_k(scores, k)
    top_boxes = boxes[top_idx]
    valid = jnp.isfinite(top_scores)
    iou = boxes_iou_bev(top_boxes, top_boxes)
    _, keep_local = _greedy_suppress(iou, valid, iou_threshold, post_max_size)
    keep_idx = jnp.where(keep_local >= 0, top_idx[keep_local], -1)
    count = jnp.sum((keep_idx >= 0).astype(jnp.int32))
    return keep_idx, count


def rotate_nms_pcdet(boxes: jnp.ndarray, scores: jnp.ndarray,
                     thresh: float, pre_max_size: int = 1024,
                     post_max_size: int = 256):
    """Name-parity wrapper (reference: models/layers/layer_libs.py:210)."""
    return nms_bev(boxes, scores, thresh, pre_max_size, post_max_size)
