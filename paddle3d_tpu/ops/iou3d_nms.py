"""Rotated BEV IoU and 3D NMS as fixed-shape XLA programs.

TPU-native replacement for the reference CUDA module
(reference: paddle3d/ops/iou3d_nms/iou3d_nms_kernel.cu:275,292,310 — rotated
IoU via cross-product line intersection; bitmask-block greedy NMS).

Design (v5e-profiled):
  1. all-pairs intersection areas via a no-compaction Sutherland–Hodgman
     clip: each clip stage emits exactly 2 slots per edge, with outside
     vertices replaced by their projection onto the clip line (collinear
     excursions telescope in the shoelace sum, keeping the area exact) —
     pure elementwise/roll ops, no scatters/sorts/gathers, ~115 ms for
     8x1000x1000 where the scatter-based formulation took 45 s;
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

_IOU_ROW_BLOCK = 32


def _pairwise_intersection_area(ca: jnp.ndarray,
                                cb: jnp.ndarray) -> jnp.ndarray:
    """All-pairs convex-quad intersection areas, scatter-free.

    ca [N,4,2], cb [M,4,2] (CCW) -> [N,M].

    No-compaction Sutherland–Hodgman: the polygon buffer doubles per clip
    stage (2 slots per edge) instead of compacting via scatters; outside
    vertices are emitted as their orthogonal projection onto the clip line,
    whose shoelace contribution telescopes to the exact chord.
    """
    n, m = ca.shape[0], cb.shape[0]
    eps = 1e-7

    # Current polygon: A's corners broadcast per pair; grows 4->8->16->32->64
    # through the four clip stages (2 slots per edge, no compaction).
    poly = jnp.broadcast_to(ca[:, None], (n, m, 4, 2))
    ecb = jnp.roll(cb, -1, axis=1)

    for e in range(4):
        a = cb[None, :, None, e]   # [1,M,1,2] clip-edge start
        b = ecb[None, :, None, e]  # clip-edge end
        d = b - a                  # edge direction (inside = left)
        k = poly.shape[2]
        s = poly
        epts = jnp.roll(poly, -1, axis=2)

        def side(p):
            return d[..., 0] * (p[..., 1] - a[..., 1]) - \
                d[..., 1] * (p[..., 0] - a[..., 0])

        ds = side(s)
        de = side(epts)
        s_in = ds >= 0
        # segment-line intersection
        denom = ds - de
        t = ds / jnp.where(jnp.abs(denom) < eps, 1.0, denom)
        inter = s + t[..., None] * (epts - s)
        crossing = (s_in != (de >= 0)) & (jnp.abs(denom) >= eps)

        # orthogonal projection of s onto the clip line: points emitted for
        # outside vertices lie ON the line, so their shoelace contribution
        # telescopes to the exact chord (collinear-excursion identity)
        d2 = jnp.maximum(d[..., 0] ** 2 + d[..., 1] ** 2, eps)
        rel = s - a
        tproj = (rel[..., 0] * d[..., 0] + rel[..., 1] * d[..., 1]) / d2
        proj = a + tproj[..., None] * d

        slot_a = jnp.where(s_in[..., None], s, proj)
        slot_b = jnp.where(crossing[..., None], inter, slot_a)
        poly = jnp.stack([slot_a, slot_b], axis=3).reshape(n, m, 2 * k, 2)

    nxt = jnp.roll(poly, -1, axis=2)
    terms = poly[..., 0] * nxt[..., 1] - nxt[..., 0] * poly[..., 1]
    area = 0.5 * jnp.abs(jnp.sum(terms, axis=-1))

    # circumscribed-circle guard: provably-disjoint pairs are exactly 0
    # (also removes f32 shoelace residue on far-apart pairs)
    centers_a = jnp.mean(ca, axis=1)
    centers_b = jnp.mean(cb, axis=1)
    ra = jnp.max(jnp.linalg.norm(ca - centers_a[:, None], axis=-1), axis=1)
    rb = jnp.max(jnp.linalg.norm(cb - centers_b[:, None], axis=-1), axis=1)
    dist = jnp.linalg.norm(
        centers_a[:, None, :] - centers_b[None, :, :], axis=-1)
    overlap_possible = dist <= (ra[:, None] + rb[None, :])
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

    On TPU the clip runs as a Pallas kernel (VMEM-resident polygon buffers,
    ops/pallas/iou_clip.py — 110 ms -> ~10 ms for 8x1000x1000); elsewhere
    the XLA formulation, row-blocked with lax.map so the [BLOCK, M, 64, 2]
    clip buffers stay bounded regardless of N.
    """
    ca = boxes_to_corners_bev(boxes_a).astype(jnp.float32)
    cb = boxes_to_corners_bev(boxes_b).astype(jnp.float32)
    n = ca.shape[0]
    if _on_tpu() and n >= 64 and cb.shape[0] >= 64:
        from .pallas.iou_clip import pairwise_intersection_area
        return pairwise_intersection_area(ca, cb)
    block = _IOU_ROW_BLOCK
    if n <= block:
        return _pairwise_intersection_area(ca, cb)
    pad = (-n) % block
    ca_pad = jnp.pad(ca, ((0, pad), (0, 0), (0, 0)))
    blocks = ca_pad.reshape(-1, block, 4, 2)
    out = jax.lax.map(lambda blk: _pairwise_intersection_area(blk, cb),
                      blocks)
    return out.reshape(-1, cb.shape[0])[:n]


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
