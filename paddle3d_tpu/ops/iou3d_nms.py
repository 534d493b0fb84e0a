"""Rotated BEV IoU and 3D NMS as fixed-shape XLA programs.

TPU-native replacement for the reference CUDA module
(reference: paddle3d/ops/iou3d_nms/iou3d_nms_kernel.cu:275,292,310 — rotated
IoU via cross-product line intersection; bitmask-block greedy NMS).

Design: the bitmask-block algorithm doesn't map to the TPU's vector units, so
instead we
  1. compute the full [K, K] rotated-IoU matrix with a vectorized
     Sutherland–Hodgman convex clip (all pairs at once — pure VPU work with
     static 4-edge / 8-vertex bounds), and
  2. run greedy suppression as a `lax.fori_loop` over the K score-sorted
     rows, each iteration vectorized over columns.
K is the post-topk candidate count (typically <= 1024 after score
pre-filtering), so the K² matrix is tiny by TPU standards.
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

_MAX_CLIP_VERTS = 8


def _clip_polygon_one_edge(verts: jnp.ndarray, count: jnp.ndarray,
                           a: jnp.ndarray, b: jnp.ndarray):
    """Clip a convex polygon (verts [V,2] with `count` valid, CCW) against
    the half-plane left of directed edge a->b. Returns (new_verts, new_count).
    """
    v = verts
    idx = jnp.arange(_MAX_CLIP_VERTS)
    nxt = jnp.where(idx + 1 < count, idx + 1, 0)
    s = v
    e = v[nxt]

    edge = b - a
    def side(p):
        return edge[0] * (p[..., 1] - a[1]) - edge[1] * (p[..., 0] - a[0])

    s_in = side(s) >= 0
    e_in = side(e) >= 0

    # Intersection of segment s-e with the clip line.
    ds, de = side(s), side(e)
    t = ds / jnp.where(ds - de == 0, 1e-12, ds - de)
    inter = s + t[:, None] * (e - s)

    edge_valid = idx < count
    # Sutherland–Hodgman emission per input edge: s if s inside, then the
    # intersection point if the edge crosses the boundary.
    emit0 = s_in & edge_valid                 # emit s
    emit1 = (s_in != e_in) & edge_valid       # emit intersection
    n_emit = emit0.astype(jnp.int32) + emit1.astype(jnp.int32)
    offsets = jnp.cumsum(n_emit) - n_emit     # exclusive prefix

    out = jnp.zeros_like(v)
    pos0 = jnp.where(emit0, offsets, _MAX_CLIP_VERTS)
    out = out.at[pos0].set(s, mode="drop")
    pos1 = jnp.where(emit1, offsets + emit0.astype(jnp.int32),
                     _MAX_CLIP_VERTS)
    out = out.at[pos1].set(inter, mode="drop")
    return out, jnp.sum(n_emit)


def _convex_intersection_area(quad_a: jnp.ndarray,
                              quad_b: jnp.ndarray) -> jnp.ndarray:
    """Intersection area of two CCW quads ([4,2] each)."""
    verts = jnp.zeros((_MAX_CLIP_VERTS, 2), quad_a.dtype)
    verts = verts.at[:4].set(quad_a)
    count = jnp.asarray(4, jnp.int32)
    for i in range(4):
        a = quad_b[i]
        b = quad_b[(i + 1) % 4]
        verts, count = _clip_polygon_one_edge(verts, count, a, b)
    # masked shoelace over the cyclic polygon
    idx = jnp.arange(_MAX_CLIP_VERTS)
    nxt = jnp.where(idx + 1 < count, idx + 1, 0)
    x, y = verts[:, 0], verts[:, 1]
    xn, yn = x[nxt], y[nxt]
    terms = jnp.where(idx < count, x * yn - xn * y, 0.)
    area = 0.5 * jnp.abs(jnp.sum(terms))
    return jnp.where(count >= 3, area, 0.)


_IOU_ROW_BLOCK = 256


@jax.jit
def boxes_overlap_bev(boxes_a: jnp.ndarray,
                      boxes_b: jnp.ndarray) -> jnp.ndarray:
    """[N,5|7] x [M,5|7] rotated boxes -> [N,M] BEV intersection areas
    (reference: iou3d_nms `boxes_overlap_bev_gpu`).

    Row-blocked with lax.map so the clipping intermediates
    (pairs x 8-vertex buffers x 4 clip stages) stay bounded at
    BLOCK x M instead of N x M — the full vmap materialization OOMs HBM
    at N=M=1000 batch 8.
    """
    ca = boxes_to_corners_bev(boxes_a)
    cb = boxes_to_corners_bev(boxes_b)

    def row(qa):
        return jax.vmap(lambda qb: _convex_intersection_area(qa, qb))(cb)

    n = ca.shape[0]
    block = _IOU_ROW_BLOCK
    if n <= block:
        return jax.vmap(row)(ca)
    pad = (-n) % block
    ca_pad = jnp.pad(ca, ((0, pad), (0, 0), (0, 0)))
    blocks = ca_pad.reshape(-1, block, 4, 2)
    out = jax.lax.map(jax.vmap(row), blocks)
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

    def body(i, state):
        alive = state
        is_kept = alive[i]
        suppress = (iou[i] > iou_threshold) & is_kept
        suppress = suppress.at[i].set(False)
        return alive & ~suppress

    alive = jax.lax.fori_loop(0, k, body, valid)
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
